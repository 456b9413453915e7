"""Device mesh construction and sharding helpers.

Axis convention:

* ``"data"`` — batch (DP). The voxel-grid losses are per-sample, so DP is
  embarrassingly parallel; XLA inserts the gradient all-reduce over ICI.
* ``"grid"`` — the voxel/pixel long axis (SP-analog, SURVEY.md §5.7): the
  N³ loss grids / render rows can be sharded over this axis with a psum
  of partial reductions (:mod:`sqtpu.parallel.sharded_losses`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_grid: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'grid') mesh over the available devices.

    Defaults to all devices on the data axis (the right layout for
    ResNet18-scale models: ~11M params fit per chip, so DP-only).
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_grid
    if n_data * n_grid != len(devices):
        devices = devices[: n_data * n_grid]
    arr = np.asarray(devices).reshape(n_data, n_grid)
    return Mesh(arr, axis_names=("data", "grid"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
