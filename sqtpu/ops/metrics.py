"""Evaluation metrics: voxel IoU and parameter errors.

Replaces ``IoUAccuracy`` (``/root/reference/torch/classes.py:374-447``).
Notable reference quirks resolved here (SURVEY.md Q4/Q7):

* IoU applies NO parameter clamping and NO zero-guard (unlike the losses)
  — kept identical.
* The reference's ``full=True`` flag was stored but never used, and
  ``test_random.py:87-89`` indexes a 3-vector that was never produced
  (latent crash). :func:`iou_full` implements the evidently-intended
  triple ``(rotation-isolated IoU, full IoU, rotation angle error)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sqtpu.ops import geometry
from sqtpu.ops import quaternion as quat


def _binary_voxels(p: jax.Array, render_size: int) -> jax.Array:
    """(B, N, N, N) bool occupancies, F^(e1) ≤ 1, no clamp / no guard
    (``classes.py:394-426``)."""
    ax = geometry.make_axis(render_size, "iou", dtype=p.dtype)
    f = jax.vmap(lambda pi: geometry.field_grid(ax, ax, ax, pi, guard=False))(p)
    return f <= 1.0


@partial(jax.jit, static_argnames=("render_size", "reduce"))
def iou(
    true_p: jax.Array, pred_p: jax.Array, render_size: int = 64,
    reduce: bool = True,
) -> jax.Array:
    """Voxel IoU. ``reduce=True`` pools intersection/union over the whole
    batch (the reference default, ``classes.py:436-439``); ``False``
    returns per-sample IoUs (``:441-445``)."""
    a = _binary_voxels(true_p, render_size)
    b = _binary_voxels(pred_p, render_size)
    inter = a & b
    union = a | b
    if reduce:
        return jnp.sum(inter) / jnp.sum(union)
    return (jnp.sum(inter, axis=(1, 2, 3)).astype(true_p.dtype)
            / jnp.sum(union, axis=(1, 2, 3)).astype(true_p.dtype))


@partial(jax.jit, static_argnames=("render_size",))
def iou_full(
    true_p: jax.Array, pred_p: jax.Array, render_size: int = 64
) -> jax.Array:
    """(B, 4) per sample: [rot-isolated IoU, full IoU, angle, sym-angle].

    Rotation-isolated IoU swaps only the predicted quaternion into the true
    parameters, isolating orientation error from size/shape/position error;
    ``angle`` = |rotation angle of q_true · q_pred*| in radians (the
    reference's evidently-intended "angle-magnitude", quirk Q7);
    ``sym-angle`` = the same minimized over the SQ's exact D2 symmetry
    orbit (:func:`angle_error_sym`) — the physically meaningful error,
    since the four orbit members render IDENTICAL depth images (raw angle
    against a random orbit representative is lower-bounded at ~2.36 rad
    chance level even for a perfect geometric recovery).
    """
    a_t, e_t, t_t, q_t = geometry.split_params(true_p)
    _, _, _, q_p = geometry.split_params(pred_p)
    rot_only = jnp.concatenate([a_t, e_t, t_t, q_p], axis=-1)

    iou_rot = iou(true_p, rot_only, render_size, reduce=False)
    iou_all = iou(true_p, pred_p, render_size, reduce=False)
    ang = angle_error(q_t, q_p)
    ang_sym = angle_error_sym(q_t, q_p)
    return jnp.stack([iou_rot, iou_all, ang, ang_sym], axis=-1)


def angle_error(q_true: jax.Array, q_pred: jax.Array) -> jax.Array:
    """Rotation angle between two unit quaternions, radians in [0, π]."""
    dq = quat.multiply(q_true, quat.conjugate(q_pred))
    ang = jnp.abs(quat.to_magnitude(dq))
    return jnp.minimum(ang, 2.0 * jnp.pi - ang)


def angle_error_sym(q_true: jax.Array, q_pred: jax.Array) -> jax.Array:
    """Rotation angle modulo the SQ's exact D2 symmetry: min over the
    orbit {q_true·f} of the 180°-flip quats (see
    :data:`sqtpu.ops.losses.SQ_FLIP_QUATS`). Radians in [0, π/2]·ish."""
    from sqtpu.ops.losses import _flip_orbit
    orbit = _flip_orbit(q_true)  # (4, ..., 4)
    angs = jax.vmap(lambda qt: angle_error(qt, q_pred))(orbit)
    return jnp.min(angs, axis=0)


def param_mae(pred: jax.Array, true: jax.Array) -> jax.Array:
    """Per-parameter MAE over the batch, shape (12,) — the eval metric of
    ``py/test_isometry.py:74-75`` / ``py/test_rotation.py:76-77``."""
    return jnp.mean(jnp.abs(pred - true), axis=0)
