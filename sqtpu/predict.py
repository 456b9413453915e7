"""Bulk inference: a directory of depth BMPs -> reference-format CSV.

The reference's only inference entry is single-image ``torch/test.py``
(load checkpoint, predict one BMP, print de-normalized params,
``torch/test.py:14-47``). Production recovery wants the batched version:
read every depth map, run the CNN (optionally + test-time refinement) in
large device batches, and emit the same 21-column CSV the reference's
dataset generator writes (``data/generation_scripts/gen_rand_rot.py:36-39``:
``fn, a1..a3, e1, e2, t1..t3, m11..m33, q1..q4``), so downstream tooling
that consumes reference annotations consumes sqtpu predictions unchanged.

Usage::

    python -m sqtpu.predict --inputs data/rot --ckpt-dir runs/c3_model \
        --out predictions.csv --batch-size 256 --refine lm

``--ckpt-dir`` also accepts a portable ``.npz`` weights artifact (e.g.
``artifacts/resnet_sq_flagship_fp16.npz``). ``--denormalize false``
writes normalized [0,1] parameters instead of reference units.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass

import numpy as np

from sqtpu.utils.config import parse_cli


@dataclass
class PredictConfig:
    inputs: str = ""                  # BMP directory or glob pattern
    ckpt_dir: str = "checkpoints/run0"  # Orbax run dir or portable .npz
    model: str = "resnet_sq"
    out: str = "predictions.csv"
    batch_size: int = 256
    image_size: int = 256
    denormalize: bool = True          # reference units (a,t in 0..255)
    refine: str = "none"              # none | lm | gd | lm+gd
    refine_steps: int = 30
    refine_size: int = 64
    refine_lr: float = 3e-3
    refine_robust_c: float = 0.0      # IRLS Tukey constant (0 = plain LSQ)
    refine_filter: str = "none"       # none | despeckle | median
    refine_residual: str = "sb"       # LM residual: sb | radial
    input_filter: str = "none"        # sensor preprocessing of the model
    #   input (none | despeckle | median) — median fills dropout holes
    platform: str = ""                # override jax platform (e.g. "cpu")


def list_inputs(pattern: str) -> list[str]:
    """Directory -> sorted *.bmp inside it; otherwise treat as a glob."""
    if os.path.isdir(pattern):
        return sorted(glob.glob(os.path.join(pattern, "*.bmp")))
    return sorted(glob.glob(pattern))


def predict_files(cfg: PredictConfig, files: list[str]) -> np.ndarray:
    """Run the model over ``files`` in device batches -> (N, 12) params
    (normalized [0,1] layout ``a1..a3 e1 e2 t1..t3 qx qy qz qw``)."""
    import jax
    import jax.numpy as jnp

    from sqtpu.data.bmp import read_bmp
    from sqtpu.evaluate import load_eval_state, predict

    model, state = load_eval_state(cfg)  # duck-typed: needs ckpt_dir/model
    step = jax.jit(lambda imgs: predict(model, state, imgs))
    if cfg.refine != "none":
        from sqtpu.fit import refine_params

        refine = jax.jit(lambda imgs, p: refine_params(
            imgs, p, method=cfg.refine, steps=cfg.refine_steps,
            n=cfg.refine_size, lr=cfg.refine_lr,
            robust_c=cfg.refine_robust_c,
            prefilter=cfg.refine_filter,
            residual=cfg.refine_residual))

    out = np.empty((len(files), 12), np.float32)
    bs = cfg.batch_size
    t0 = time.perf_counter()
    for lo in range(0, len(files), bs):
        chunk = files[lo:lo + bs]
        imgs = np.stack([read_bmp(f) for f in chunk]).astype(np.float32)
        imgs /= 255.0
        pad = bs - len(chunk)  # pad the tail so one compiled shape serves
        if pad:
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:1]).repeat(
                pad, axis=0)])
        x = jnp.asarray(imgs)[..., None]
        if cfg.input_filter != "none":
            from sqtpu.fit import apply_prefilter
            x = apply_prefilter(x[..., 0], cfg.input_filter)[..., None]
        p = step(x)
        if cfg.refine != "none":
            p = refine(x[..., 0], p)
        out[lo:lo + len(chunk)] = np.asarray(p)[:len(chunk)]
        done = min(lo + bs, len(files))
        rate = done / (time.perf_counter() - t0)
        print(f"\r{done}/{len(files)} images  ({rate:.0f} img/s)",
              end="", flush=True)
    print()
    return out


def write_csv(path: str, files: list[str], params: np.ndarray,
              denormalize: bool = True) -> None:
    """21-column reference CSV: fn, a1..a3, e1, e2, t1..t3, m11..m33,
    q1..q4 (``gen_rand_rot.py:36-39`` layout).

    ``params`` is normalized [0,1]; ``_csv_row`` applies the reference's
    a·255 / t·255 de-normalization. ``denormalize=False`` keeps the
    normalized values in the size/position columns instead."""
    from sqtpu.generate import _csv_row
    from sqtpu.ops.quaternion import to_matrix

    M = np.asarray(to_matrix(params[:, 8:12]))  # rotation from unit quat
    p = params if denormalize else params.copy()
    if not denormalize:  # undo _csv_row's ×255 so columns stay normalized
        p[:, 0:3] /= 255.0
        p[:, 5:8] /= 255.0
    with open(path, "w") as f:
        for fn, row, m in zip(files, p, M):
            f.write(_csv_row(os.path.basename(fn), row, m))


def main(argv=None):
    cfg = parse_cli(PredictConfig, argv)
    if cfg.platform:
        import jax
        jax.config.update("jax_platforms", cfg.platform)
    files = list_inputs(cfg.inputs)
    if not files:
        raise SystemExit(f"no input images match {cfg.inputs!r}")
    print(f"{len(files)} images -> {cfg.out} "
          f"(model={cfg.model}, refine={cfg.refine})")
    params = predict_files(cfg, files)
    write_csv(cfg.out, files, params, cfg.denormalize)
    print(f"wrote {cfg.out}")


if __name__ == "__main__":
    main()
