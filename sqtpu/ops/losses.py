"""Objective functions — the heart of the framework (reference L4).

Re-designs of every objective in the reference, batched with ``vmap``
instead of the per-sample Python loops (``torch/classes.py:141,235,321``),
dtype-polymorphic (fp32 on TPU, fp64 on CPU for conformance tests):

* :func:`explicit_loss`     — occupancy-grid MSE (``classes.py:109-201``)
* :func:`implicit_loss`     — self-supervised depth re-projection MAE
                              (``classes.py:203-295``)
* :func:`least_squares_loss`— Solina–Bajcsy energy (``classes.py:297-371``)
* :func:`quaternion_loss`   — antipodal-symmetric quat distance
                              (``classes.py:96-106``)
* :func:`param_mse`         — plain label-space MSE (the 2019 Keras
                              pipeline's loss, ``py/models.py:52``)
* :func:`keras_occupancy_mse` — the 2019 TF "chamfer_loss" (a misnomer:
                              occupancy-field MSE in world units,
                              ``py/loss_functions.py:91-101``), including
                              its distinct un-conjugated rotation and
                              |x|^(2/e) conventions.

All take ``(batch, ...)`` arrays and return a scalar (or per-sample with
``reduce=False`` where the reference offered it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sqtpu.ops import geometry
from sqtpu.ops import quaternion as quat
from sqtpu.ops.image import nearest_resize
from sqtpu.ops.render import render_depth_soft


def _as_bhw(img: jax.Array) -> jax.Array:
    """Accept (B,H,W) or (B,1,H,W) images -> (B,H,W)."""
    if img.ndim == 4:
        return img[:, 0]
    return img


# ---------------------------------------------------------------------------
# Explicit (occupancy MSE)
# ---------------------------------------------------------------------------

def occupancy_explicit(p: jax.Array, render_size: int,
                       sharp: float = 5.0) -> jax.Array:
    """sigmoid(sharp·(1−F)) on the (N+1)³ explicit grid, params clamped.

    Batched equivalent of ``ExplicitLoss.occupancy`` (``classes.py:138-189``;
    the reference hardcodes sharp=5, quirk Q2 — kept as the default.
    Higher values localize the surface more tightly: at sharp=5 the
    occupancy transition spans ~10 voxels of a 128³ grid, so fine grids
    add little until the sigmoid sharpens with them).
    """
    ax = geometry.make_axis(render_size, "explicit", dtype=p.dtype)

    def one(pi):
        pp = geometry.clamp_params(pi)
        f = geometry.field_grid(ax, ax, ax, pp, guard=True)
        return jax.nn.sigmoid(sharp * (1.0 - f))

    return jax.vmap(one)(p)


@partial(jax.jit, static_argnames=("render_size", "reduce"))
def explicit_loss(
    true_p: jax.Array, pred_p: jax.Array, render_size: int = 32,
    reduce: bool = True, sharp: float = 5.0,
) -> jax.Array:
    """Occupancy-grid MSE ×100 (``classes.py:191-201``; the ×100 is the
    reference's gradient-scale quirk Q3, kept for parity)."""
    occ_t = occupancy_explicit(true_p, render_size, sharp)
    occ_p = occupancy_explicit(pred_p, render_size, sharp)
    per_sample = jnp.mean((occ_t - occ_p) ** 2, axis=(1, 2, 3)) * 100.0
    return jnp.mean(per_sample) if reduce else per_sample


# ---------------------------------------------------------------------------
# Implicit (self-supervised depth MAE)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("render_size", "reduce"))
def implicit_loss(
    true_img: jax.Array,
    pred_p: jax.Array,
    render_size: int = 64,
    tau: float = 1.5,
    sharpness: float = 260.0,
    reduce: bool = True,
) -> jax.Array:
    """MAE between the soft depth render of ``pred_p`` and the INPUT image
    (self-supervised — labels never enter; ``torch/train.py:92`` passes the
    image). Image is nearest-downsampled to the render size
    (``classes.py:286``). Defaults = training config ``train.py:64``.
    """
    img = _as_bhw(true_img).astype(pred_p.dtype)
    img_small = nearest_resize(img, (render_size, render_size))
    depth = jax.vmap(
        lambda pi: render_depth_soft(pi, render_size, tau, sharpness)
    )(pred_p)
    per_sample = jnp.mean(jnp.abs(img_small - depth), axis=(1, 2))
    return jnp.mean(per_sample) if reduce else per_sample


# ---------------------------------------------------------------------------
# Least squares (Solina–Bajcsy energy)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("render_size", "reduce"))
def least_squares_loss(
    true_img: jax.Array, pred_p: jax.Array, render_size: int = 64,
    reduce: bool = True,
) -> jax.Array:
    """Σ over depth-image points of (√(a1a2a3)·(F^e1 − 1))².

    The reference lifts nonzero pixels of the resized image to 3-D points
    ``(y, 1−x, z)`` with a ragged per-sample point list
    (``classes.py:358-369``). Ragged shapes don't jit, so here every pixel
    contributes a masked term — identical sum, static shapes.
    """
    img = _as_bhw(true_img).astype(pred_p.dtype)
    small = nearest_resize(img, (render_size, render_size))  # (B, N, N)
    n = render_size

    # Pixel -> point lift (classes.py:364-368): x = row/N, y = col/N, z = value.
    rows = (jnp.arange(n, dtype=pred_p.dtype) / n)[:, None]
    cols = (jnp.arange(n, dtype=pred_p.dtype) / n)[None, :]

    def one(img_i, p_i):
        mask = img_i > 0
        pts = jnp.stack(
            [jnp.broadcast_to(cols, (n, n)),          # y
             jnp.broadcast_to(1.0 - rows, (n, n)),    # 1 - x
             img_i],                                  # z
            axis=-1,
        ).reshape(-1, 3)
        pp = geometry.clamp_params(p_i)
        f = geometry.field_points(pts, pp, guard=True)
        a = pp[geometry.SIZE_SLICE]
        energy = (jnp.sqrt(a[0] * a[1] * a[2]) * (f - 1.0)) ** 2
        return jnp.sum(energy * mask.reshape(-1))

    per_sample = jax.vmap(one)(small, pred_p)
    return jnp.mean(per_sample) if reduce else per_sample


# ---------------------------------------------------------------------------
# Quaternion loss
# ---------------------------------------------------------------------------

def quaternion_loss(q_pred: jax.Array, q_true: jax.Array, reduce: bool = True):
    """θ = 1 − 2·|0.5 − ⟨q̂,q⟩²| — antipodal-symmetric (``classes.py:96-106``)."""
    dot = jnp.sum(q_true * q_pred, axis=-1)
    theta = 1.0 - 2.0 * jnp.abs(0.5 - dot**2)
    return jnp.mean(theta) if reduce else theta


# xyzw quaternions of the identity + 180° rotations about each principal
# axis: the superquadric's EXACT symmetry group (F depends only on squared
# body-frame coordinates, so R(q·f) produces the same surface for every f
# here — two such labels render byte-identical depth images).
SQ_FLIP_QUATS = (
    (0.0, 0.0, 0.0, 1.0),
    (1.0, 0.0, 0.0, 0.0),
    (0.0, 1.0, 0.0, 0.0),
    (0.0, 0.0, 1.0, 0.0),
)


def _flip_orbit(q: jax.Array) -> jax.Array:
    """(..., 4) -> (4, ..., 4): the D2 symmetry orbit q·f (body-frame
    flips = right multiplication)."""
    flips = jnp.asarray(SQ_FLIP_QUATS, q.dtype)
    return jax.vmap(lambda f: quat.multiply(q, jnp.broadcast_to(f, q.shape)))(
        flips)


def quaternion_loss_sym(q_pred: jax.Array, q_true: jax.Array,
                        reduce: bool = True):
    """Symmetry-aware quaternion loss: min over the SQ's exact D2 rotation
    symmetry orbit of ``1 − ⟨q̂,q·f⟩²``.

    Why this exists (not in the reference): the reference's
    ``QuaternionLoss`` (``classes.py:96-106``) handles only the q ↔ −q
    double cover. But a superquadric is also invariant under 180° flips
    about its principal axes, so a regression target q_true is one of
    FOUR quats producing identical geometry — plain regression averages
    across the orbit and never learns rotation (the chance-level rotation
    of naive supervision). Taking the min over the orbit makes the target
    well-posed; the reference sidesteps this only via its self-supervised
    implicit loss (``torch/train.py:62-66``).

    The per-flip distance is the standard antipodal-symmetric ``1 − dot²``
    rather than the reference's ``1 − 2|0.5 − dot²|`` shape, because the
    latter is ALSO zero at dot = 0 — i.e. it scores a 180° error about an
    ARBITRARY axis as perfect, which only coincides with a true symmetry
    when that axis is principal.
    """
    orbit = _flip_orbit(q_true)                     # (4, ..., 4)
    dots = jnp.sum(orbit * q_pred[None], axis=-1)   # (4, ...)
    theta = jnp.min(1.0 - dots**2, axis=0)
    return jnp.mean(theta) if reduce else theta


_SQ2 = 0.7071067811865476

# The FULL gauge group of the 12-parameter superquadric decomposition is
# D4, not just the D2 flip orbit: a 90° body rotation about z together
# with swapping a1 ↔ a2 leaves F (hence every rendered image AND every
# voxelization) exactly invariant for ALL exponents, because both x and
# y carry the same exponent 2/e2. Two decompositions related by any of
# the 8 elements are indistinguishable from data — discovered round 3
# when the explicit-loss model scored full IoU 0.92 with "chance-level"
# D2 sym-angle: it predicts xy-swapped decompositions freely.
SQ_GAUGE_QUATS_SWAP = (
    (0.0, 0.0, _SQ2, _SQ2),    # Rz(+90): swaps a1 <-> a2
    (0.0, 0.0, -_SQ2, _SQ2),   # Rz(-90)
    (_SQ2, _SQ2, 0.0, 0.0),    # 180° about (1,1,0)/√2
    (_SQ2, -_SQ2, 0.0, 0.0),   # 180° about (1,-1,0)/√2
)


def param_gauge_orbit(p: jax.Array) -> jax.Array:
    """(..., 12) -> (8, ..., 12): every equivalent decomposition of the
    same superquadric under the D4 gauge group. Elements 0-3 are the D2
    flips (sizes unchanged); elements 4-7 compose a z-axis quarter-turn
    with the exact a1 ↔ a2 swap. e, t are invariant throughout."""
    from sqtpu.ops import geometry
    a, e, t, q = geometry.split_params(p)
    a_sw = jnp.stack([a[..., 1], a[..., 0], a[..., 2]], axis=-1)

    def variant(g, a_v):
        qg = quat.multiply(q, jnp.broadcast_to(jnp.asarray(g, q.dtype),
                                               q.shape))
        return jnp.concatenate([a_v, e, t, qg], axis=-1)

    return jnp.stack([variant(g, a) for g in SQ_FLIP_QUATS]
                     + [variant(g, a_sw) for g in SQ_GAUGE_QUATS_SWAP])


def canonicalize_gauge(p: jax.Array) -> jax.Array:
    """Re-express params in the canonical xy-swap gauge: a1 ≥ a2.

    Where a1 < a2, swap the first two sizes and right-multiply the
    quaternion by Rz(+90°) — an exact equivalence (same rendered image,
    same voxelization; see :data:`SQ_GAUGE_QUATS_SWAP`).

    Why: a dataset whose labels are sampled with independent a1, a2 maps
    one image to TWO different regression targets (the two swap-gauge
    representatives, quaternions 90° apart about z) with equal
    probability. Supervised rotation regression then averages the
    mixture — the size components blur toward a1 ≈ a2 and the rotation
    gradient degenerates, which is the round-2 sym-angle plateau at
    ~0.8 rad ≈ the mixture average of {≈0, ≈π/2}. Canonicalizing the
    labels (training AND eval truth) makes image → decomposition a
    function again without changing the shape distribution at all."""
    from sqtpu.ops import geometry
    a, e, t, q = geometry.split_params(p)
    swap = (a[..., 0] < a[..., 1])[..., None]
    a_sw = jnp.stack([a[..., 1], a[..., 0], a[..., 2]], axis=-1)
    q_sw = quat.multiply(q, jnp.broadcast_to(
        jnp.asarray(SQ_GAUGE_QUATS_SWAP[0], q.dtype), q.shape))
    return jnp.concatenate([jnp.where(swap, a_sw, a), e, t,
                            jnp.where(swap, q_sw, q)], axis=-1)


def param_gauge_loss(pred: jax.Array, labels: jax.Array,
                     reduce: bool = True):
    """Fully gauge-aware supervised loss: min over the 8-element D4 orbit
    of [size/shape/position MSE + antipodal quat distance], per sample.

    Resolves the ill-posedness that remains in ``supervised_sym``: under
    D2-only symmetrization, a network whose natural output is the
    xy-swapped decomposition receives a ~π/2 rotation penalty AND a
    conflicting size-permutation gradient for a geometrically perfect
    answer."""
    orbit = param_gauge_orbit(labels[..., :12])          # (8, ..., 12)
    block = jnp.mean((pred[None, ..., :8] - orbit[..., :8]) ** 2, axis=-1)
    dots = jnp.sum(orbit[..., 8:12] * pred[None, ..., 8:12], axis=-1)
    per = jnp.min(block + (1.0 - dots**2), axis=0)
    return jnp.mean(per) if reduce else per


def rotation_moment_loss(q_pred: jax.Array, p_true: jax.Array,
                         reduce: bool = True):
    """Observability-weighted rotation supervision: match the SQ's
    normalized second-moment orientation matrix Σ = R·diag(σ²)·Rᵀ.

    σ² are the per-axis direction variances recovered from the ANALYTIC
    inertia integrals (:func:`sqtpu.ops.geometry.inertia`:
    Ixx = V(σy²+σz²) etc., so V·σ² = ΣI/2 − I), normalized to sum 1.
    Both sides use the TRUE size/shape, so this is pure rotation
    supervision. Properties that plain quaternion regression lacks:

    * exactly invariant under the D2 flip orbit (R(f)·diag·R(f)ᵀ = diag);
    * smooth everywhere (quadratic matrix distance, no orbit min);
    * the penalty for misrotation about axis pair (i, j) scales with
      |σi² − σj²| — when the true shape is rotationally symmetric in a
      plane (a_i ≈ a_j), the unobservable rotation component contributes
      NO gradient noise, the failure mode of direct quat regression.
    """
    from sqtpu.ops import geometry
    a, e, t, q_t = geometry.split_params(p_true)
    inert = geometry.inertia(p_true)                       # (..., 3)
    vs = jnp.sum(inert, -1, keepdims=True) / 2.0 - inert   # V·σ² per axis
    u = vs / jnp.sum(vs, -1, keepdims=True)

    def second_moment(q):
        rot = quat.to_matrix(q)                            # (..., 3, 3)
        return jnp.einsum("...ik,...k,...jk->...ij", rot, u, rot)

    d = second_moment(q_pred) - second_moment(q_t)
    per = jnp.sum(d * d, axis=(-2, -1))
    return jnp.mean(per) if reduce else per


# ---------------------------------------------------------------------------
# Plain supervised MSE (2019 Keras pipeline)
# ---------------------------------------------------------------------------

def param_mse(pred: jax.Array, true: jax.Array,
              reduce: bool = True, col_weight: jax.Array | None = None
              ) -> jax.Array:
    """Label-space MSE — the 2019 isometry model's loss (``py/models.py:52``).

    ``reduce=False`` returns the per-sample mean over the parameter axis
    (for per-sample loss weighting, e.g. elongation-aware training).
    ``col_weight`` (broadcastable to the last axis) re-weights parameter
    columns — e.g. up-weighting the shape exponents e1/e2, the hardest
    columns to regress from depth (their visual effect is subtle, so the
    uniform anchor under-trains them relative to size/position)."""
    sq = (pred - true) ** 2
    if col_weight is not None:
        sq = sq * col_weight
    per = jnp.mean(sq, axis=-1)
    return jnp.mean(per) if reduce else per


def param_mae(pred: jax.Array, true: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - true))


# ---------------------------------------------------------------------------
# 2019 TF "chamfer" loss (occupancy-field MSE, world units)
# ---------------------------------------------------------------------------

def torch_to_keras_norm(p: jax.Array) -> jax.Array:
    """Re-normalize a torch-convention 12-vector (a/255, e, t/255, q —
    ``torch/helpers.py:206-211``) to the keras convention ((a−25)/50, e,
    t/255, q — ``py/data_generators.py:27-30``, quirk Q10): only the size
    block changes, a_k = (255·a_t − 25)/50."""
    a = p[..., 0:3] * 5.1 - 0.5
    return jnp.concatenate([a, p[..., 3:]], axis=-1)


def _keras_field(p: jax.Array, size: int = 64) -> jax.Array:
    """The 2019 TF inside-outside variant (``py/loss_functions.py:26-53``):
    world-unit grid arange(−size/2, size/2), params mapped a→12.5a+6.25,
    t→64t−32 (``:19-24``), |x|^(2/e) powers, UN-conjugated rotation, and
    no final ^e1."""
    ax = jnp.arange(-(size // 2), size // 2, dtype=p.dtype)
    a, e, t, q = geometry.split_params(p)
    a = a * 12.5 + 6.25
    t = t * 64.0 - 32.0
    rot = quat.to_matrix(q)             # NOT conjugated (loss_functions.py:33)
    tr = quat.rotate(t[None, :], q[None, :])[0]  # rotate t by q (:35)
    X, Y, Z = ax[:, None, None], ax[None, :, None], ax[None, None, :]
    x = (rot[0, 0] * X + rot[0, 1] * Y + rot[0, 2] * Z - tr[0]) / a[0]
    y = (rot[1, 0] * X + rot[1, 1] * Y + rot[1, 2] * Z - tr[1]) / a[1]
    z = (rot[2, 0] * X + rot[2, 1] * Y + rot[2, 2] * Z - tr[2]) / a[2]
    A = jnp.abs(x) ** (2.0 / e[1])
    B = jnp.abs(y) ** (2.0 / e[1])
    C = jnp.abs(z) ** (2.0 / e[0])
    # E = |A+B|^(e2/e1) in log space with the exponent capped at 80:
    # the direct pow overflows fp32 (and poisons gradients with inf·0)
    # when A+B ≈ 1e25 meets e2/e1 up to 10 → 1e250. For clamped e
    # (ratio ≥ 0.1) the cap only bites where E ≥ exp(8) ≈ 3e3 anyway —
    # bit-exact below that, merely FINITE (≤ exp(80) ≈ 5.5e34) where the
    # TF original is inf (see keras_occupancy_mse's overflow note).
    log_d = jnp.log(jnp.maximum(A + B, jnp.asarray(1e-30, p.dtype)))
    E = jnp.exp(jnp.minimum((e[1] / e[0]) * log_d,
                            jnp.asarray(80.0, p.dtype)))
    return E + C


@partial(jax.jit, static_argnames=("size", "clip"))
def keras_occupancy_mse(true_p: jax.Array, pred_p: jax.Array, size: int = 64,
                        clip: float = 0.0):
    """The 2019 ``chamfer_loss`` (``py/loss_functions.py:91-101``) — an
    occupancy-field MSE despite its name (quirk Q9), batched (the TF
    original hardcoded batch=1).

    ``clip > 0`` caps the field at that value before the MSE. The TF
    original runs fp32 with NO cap, so at e = 0.1 the far-grid field
    reaches ~1e25 and its square overflows to inf — the 2019 rotation
    regime is numerically broken as written (alongside quirks Q8/Q9).
    The default (0 = no clip) is reference-parity for the golden tests;
    training passes a cap, which keeps the full gradient signal in the
    |F − clip-band| region around the surface (F = 1)."""
    f_t = jax.vmap(lambda p: _keras_field(p, size))(true_p)
    f_p = jax.vmap(lambda p: _keras_field(p, size))(pred_p)
    if clip > 0:
        f_t = jnp.minimum(f_t, clip)
        f_p = jnp.minimum(f_p, clip)
    return jnp.mean((f_t - f_p) ** 2)


def keras_quaternion_loss(q_true: jax.Array, q_pred: jax.Array) -> jax.Array:
    """Euclidean quat distance (``py/loss_functions.py:83-88``)."""
    return jnp.sqrt(jnp.sum((q_true - q_pred) ** 2, axis=-1))
