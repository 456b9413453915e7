"""Dataset generation entry point (reference L1 scripts:
``data/generation_scripts/gen_rand_rot.py`` / ``gen_rand_iso.py``).

The reference emits a 150k-line shell script of scanner commands plus a
21-column CSV, then runs one C++ process per image (SURVEY.md §3.5).
Here one command renders the whole dataset directly — on TPU (hard
ray-cast renderer, default) or on the host CPU via the native OpenMP
library — and writes the same artifacts: numbered BMPs + the 21-column
CSV (``fn, a1..a3, e1, e2, t1..t3, m11..m33, q1..q4``).

Usage::

    python -m sqtpu.generate --n 1000 --out data/rot --iso false
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

from sqtpu.utils.config import parse_cli


@dataclasses.dataclass
class GenerateConfig:
    n: int = 1000
    out: str = "data/generated"
    iso: bool = False                 # fixed q=(1,1,1,0)/sqrt(3) (2019 gen)
    image_size: int = 256
    seed: int = 0
    batch_size: int = 128
    backend: str = "tpu"              # tpu | native (host C++ OpenMP)
    csv_name: str = "data_labels.csv"
    platform: str = ""


def _csv_row(fn: str, p12: np.ndarray, M: np.ndarray) -> str:
    vals = np.concatenate([
        p12[0:3] * 255.0, p12[3:5], p12[5:8] * 255.0, M.ravel(), p12[8:12]])
    return (fn + "," + ("%f," * 21) % tuple(vals))[:-1] + "\n"


def generate(cfg: GenerateConfig):
    import jax
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    from sqtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from sqtpu.data.bmp import write_bmp
    from sqtpu.data.synthetic import sample_params
    from sqtpu.ops import quaternion as quat

    os.makedirs(cfg.out, exist_ok=True)
    csv = open(os.path.join(cfg.out, cfg.csv_name), "w")

    n_done = 0
    key = jax.random.PRNGKey(cfg.seed)
    while n_done < cfg.n:
        b = min(cfg.batch_size, cfg.n - n_done)
        key, sub = jax.random.split(key)
        # labels are fp32: without jax_enable_x64 a float64 request would
        # silently downgrade anyway, and the CSV's %f formatting (6
        # decimals, reference gen_rand_rot.py:36-39) makes fp32 vs fp64
        # observationally identical
        p = np.asarray(sample_params(sub, b, iso=cfg.iso))
        M = np.asarray(quat.to_matrix(jnp.asarray(p[:, 8:12])))

        if cfg.backend == "native":
            from sqtpu.data.native import render_batch_native
            imgs = render_batch_native(p, cfg.image_size)
        else:
            from sqtpu.ops.kernels import render_hard_auto
            imgs = np.asarray(render_hard_auto(
                jnp.asarray(p, jnp.float32), cfg.image_size,
                n_sweep=cfg.image_size, n_bisect=20,
                quantize=True)) * 255.0
            imgs = imgs.astype(np.uint8)

        for i in range(b):
            fn = "%06d.bmp" % (n_done + i)
            write_bmp(os.path.join(cfg.out, fn), imgs[i])
            csv.write(_csv_row(fn, p[i], M[i]))
        n_done += b
        print(f"\r{n_done}/{cfg.n}", end="", flush=True)
    csv.close()
    print(f"\nwrote {cfg.n} images + {cfg.csv_name} to {cfg.out}")


def main(argv=None):
    generate(parse_cli(GenerateConfig, argv))


if __name__ == "__main__":
    main(sys.argv[1:])
