"""Mesh / sharding utilities (no reference equivalent — the reference is
single-process single-GPU, SURVEY.md §2.3; this is the TPU-native
scale-out layer)."""

from sqtpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding,
)
from sqtpu.parallel.sharded_losses import implicit_loss_gridsharded  # noqa: F401
