"""Checkpoint / resume with Orbax (reference L6 equivalent).

Same semantics as ``save_model``/``load_model``
(``/root/reference/torch/helpers.py:42-68``): a checkpoint carries the
epoch, model params + batch stats, optimizer state, and the full loss
history; training saves only on a new best validation loss
(``torch/train.py:164-171``) and ``--continue-training`` resumes from it.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state_tree, history: dict, epoch: int,
                    config=None) -> None:
    """Write a full training checkpoint (overwrites).

    ``config`` (a dataclass or dict) is serialized into the sidecar
    ``.meta.json`` so the exact training recipe survives even if the
    run's log file is lost — the meta files are small enough to commit.
    """
    path = _abs(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            import shutil
            shutil.rmtree(tmp)
        ckptr.save(tmp, jax.device_get(state_tree))
        ckptr.wait_until_finished()
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.rename(tmp, path)
    meta = {"epoch": int(epoch),
            "history": jax.tree_util.tree_map(
                lambda x: np.asarray(x).tolist()
                if isinstance(x, (np.ndarray, jax.Array)) else x, history)}
    if config is not None:
        if dataclasses.is_dataclass(config):
            config = dataclasses.asdict(config)
        meta["config"] = {k: v for k, v in dict(config).items()
                          if isinstance(v, (str, int, float, bool, type(None)))}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, target_tree):
    """Restore (state_tree, history, epoch) from :func:`save_checkpoint`.

    ``target_tree`` supplies the structure/shapes (an abstract or concrete
    state of the same shape).
    """
    path = _abs(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype") else x,
            jax.device_get(target_tree),
        )
        state = ckptr.restore(path, abstract)
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        meta = {"epoch": 0, "history": {}}
    return state, meta.get("history", {}), meta.get("epoch", 0)


# ---------------------------------------------------------------------------
# Portable weights export (.npz) — model variables only, no optimizer
# ---------------------------------------------------------------------------
# Orbax checkpoints are directory trees keyed to a jax/orbax version and
# are too bulky to keep in the repo; a flat compressed .npz of the model
# variables (params + batch_stats) is the durable interop artifact —
# the analog of the reference's published ``model_*.pt`` files
# (README.md:24-28 download links).

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_weights_npz(path: str, variables: dict, dtype=np.float16) -> None:
    """Write model variables ({'params': ..., 'batch_stats': ...}) as a
    flat compressed npz. ``dtype`` trades file size for precision
    (float16 halves the artifact; BN running stats stay fp32).
    ``None`` subtrees (e.g. batch_stats of a BN-free model) are skipped."""
    variables = {k: v for k, v in variables.items() if v is not None}
    flat = _flatten(jax.device_get(variables))
    cast = {k: (v if "batch_stats" in k or v.dtype.kind != "f"
                else v.astype(dtype)) for k, v in flat.items()}
    os.makedirs(os.path.dirname(_abs(path)) or ".", exist_ok=True)
    np.savez_compressed(_abs(path), **cast)


def load_weights_npz(path: str, variables: dict) -> dict:
    """Restore variables saved by :func:`save_weights_npz` into the
    structure of ``variables`` (shapes/dtypes from the template)."""
    data = np.load(_abs(path))

    def rebuild(tree, prefix=""):
        if tree is None:
            # BN-free model: batch_stats was skipped at save time
            return None
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        key = prefix[:-1]
        arr = data[key]
        if arr.shape != tuple(np.shape(tree)):
            raise ValueError(
                f"weights npz mismatch at {key}: file has {arr.shape}, "
                f"model expects {tuple(np.shape(tree))}")
        return arr.astype(tree.dtype)

    return rebuild(jax.device_get(variables))
