"""Checkpoint / resume with Orbax (reference L6 equivalent).

Same semantics as ``save_model``/``load_model``
(``/root/reference/torch/helpers.py:42-68``): a checkpoint carries the
epoch, model params + batch stats, optimizer state, and the full loss
history; training saves only on a new best validation loss
(``torch/train.py:164-171``) and ``--continue-training`` resumes from it.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state_tree, history: dict, epoch: int) -> None:
    """Write a full training checkpoint (overwrites)."""
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
