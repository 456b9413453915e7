"""Superquadric geometry in JAX: inside-outside field, surface sampling,
analytic volume / inertia.

TPU-native re-design of the reference's SQ math, which lives in three places:

* the per-sample Python loops inside the torch losses
  (``/root/reference/torch/classes.py:141-188, 232-282, 318-356, 394-426``),
* the TF graph losses (``/root/reference/py/loss_functions.py:26-80``),
* the C++ ``sq`` class inside the ``data/scanner`` binary (symbols
  ``sq::f``, ``sq::r``, ``sq::volume`` — SURVEY.md §2.2-N1).

Everything here is a pure function over the canonical 12-vector
``[a1,a2,a3, e1,e2, t1,t2,t3, qx,qy,qz,qw]`` (normalized units: a,t in
[0,1] ~ /255 world units). Batch = ``jax.vmap``; no Python loops over
samples (kills the reference hot loop, ``classes.py:235``).

Numerics follow the torch convention exactly (SURVEY.md §7 step 1):
``F = (((x²)^(1/e2) + (y²)^(1/e2))^(e2/e1) + (z²)^(1/e1))^(e1)`` with
``x² == 0 → += 1e-4`` guards — NOT the TF ``|x|^(2/e)`` variant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln

from sqtpu.ops import quaternion as quat

# Parameter vector layout: split (3, 2, 3, 4) — classes.py:132.
SIZE_SLICE = slice(0, 3)
SHAPE_SLICE = slice(3, 5)
POS_SLICE = slice(5, 8)
QUAT_SLICE = slice(8, 12)
N_PARAMS = 12

# Clamp ranges used by every loss (but not IoU) — classes.py:129-136.
A_MIN, A_MAX = 0.05, 1.0
E_MIN, E_MAX = 0.1, 1.0
T_MIN, T_MAX = 0.0, 1.0


class SQParams(NamedTuple):
    """Unpacked superquadric parameters (each (..., k))."""

    a: jax.Array  # (..., 3) sizes
    e: jax.Array  # (..., 2) shape exponents
    t: jax.Array  # (..., 3) position
    q: jax.Array  # (..., 4) xyzw unit quaternion


def split_params(p: jax.Array) -> SQParams:
    """(..., 12) -> SQParams."""
    return SQParams(
        a=p[..., SIZE_SLICE], e=p[..., SHAPE_SLICE],
        t=p[..., POS_SLICE], q=p[..., QUAT_SLICE],
    )


def join_params(sq: SQParams) -> jax.Array:
    return jnp.concatenate([sq.a, sq.e, sq.t, sq.q], axis=-1)


def clamp_params(p: jax.Array) -> jax.Array:
    """Clamp params into loss-safe ranges (``classes.py:129-136``).

    a ∈ [0.05, 1], e ∈ [0.1, 1], t ∈ [0, 1]; quaternion untouched.
    """
    a, e, t, q = split_params(p)
    return join_params(SQParams(
        a=jnp.clip(a, A_MIN, A_MAX),
        e=jnp.clip(e, E_MIN, E_MAX),
        t=jnp.clip(t, T_MIN, T_MAX),
        q=q,
    ))


# ---------------------------------------------------------------------------
# Discretized spaces
# ---------------------------------------------------------------------------

def make_axis(n: int, kind: str, dtype=jnp.float32) -> jax.Array:
    """1-D coordinate axis for the voxelized [0,1]³ space.

    The three reference grid conventions (SURVEY.md quirk Q1):

    * ``"explicit"``: N+1 points ``arange(0, 1+1/N, 1/N)`` with the zero
      nudged to +1e-4 (``classes.py:122-126``).
    * ``"implicit"``: N points ``linspace(0, 1, N)``, zero nudged
      (``classes.py:218-221``).
    * ``"iou"``: N points ``linspace(0, 1, N)``, NO nudge
      (``classes.py:389-391``).
    """
    if kind == "explicit":
        ax = jnp.arange(n + 1, dtype=dtype) / jnp.asarray(n, dtype)
        return jnp.where(ax == 0, jnp.asarray(1e-4, dtype), ax)
    if kind == "implicit":
        ax = jnp.linspace(0.0, 1.0, n, dtype=dtype)
        return jnp.where(ax == 0, jnp.asarray(1e-4, dtype), ax)
    if kind == "iou":
        return jnp.linspace(0.0, 1.0, n, dtype=dtype)
    raise ValueError(f"unknown grid kind: {kind}")


# ---------------------------------------------------------------------------
# Inside-outside field
# ---------------------------------------------------------------------------

def _power_chain(x2, y2, z2, e1, e2, *, guard: bool):
    """Shared exponent chain: squares -> F^(e1).

    ``guard`` adds the reference's +1e-4 at exact zeros of the squared
    coordinates (``classes.py:168-173``) in a gradient-preserving form
    (the torch in-place ``A1[A1==0] += 1e-4`` keeps d(A1)/dx intact, so we
    add rather than replace). IoU omits the guard (``classes.py:411-414``).
    """
    if guard:
        eps = jnp.asarray(1e-4, x2.dtype)
        zero = jnp.asarray(0.0, x2.dtype)
        x2 = x2 + jnp.where(x2 == 0, eps, zero)
        y2 = y2 + jnp.where(y2 == 0, eps, zero)
        z2 = z2 + jnp.where(z2 == 0, eps, zero)
    A = jnp.power(x2, 1.0 / e2)
    B = jnp.power(y2, 1.0 / e2)
    C = jnp.power(z2, 1.0 / e1)
    # In fp32, pow(x2, 1/e2) can UNDERFLOW to exactly 0 for in-distribution
    # params (x2 ~ 1e-6, 1/e2 ~ 8), making the outer pow's base-vjp
    # 0^(negative) = inf -> NaN gradients. The reference never hits this
    # because its losses run float64 (quirk Q6). Adding the dtype's
    # smallest normal (1.2e-38 fp32 / 2.2e-308 fp64) is a no-op at any
    # parity-relevant scale and keeps fp32 training NaN-free.
    tiny = jnp.asarray(jnp.finfo(x2.dtype).tiny, x2.dtype)
    E = jnp.power(A + B + tiny, e2 / e1)
    return jnp.power(E + C + tiny, e1)


def _rotated_frame(p: jax.Array):
    """Rotation matrix of the conjugated quaternion + rotated translation.

    The reference transforms the *space* instead of the SQ: rotate the
    grid by R(q*) and the translation vector likewise
    (``classes.py:152-158``).
    """
    a, e, t, q = split_params(p)
    rot = quat.to_matrix(quat.conjugate(q))  # (..., 3, 3)
    tr = jnp.einsum("...ij,...j->...i", rot, t)
    return a, e, tr, rot


def field_points(points: jax.Array, p: jax.Array, *, guard: bool = True) -> jax.Array:
    """Inside-outside F^(e1) at arbitrary points.

    Args:
      points: (..., 3) world-space points in the [0,1]³ cube.
      p: (12,) parameter vector (vmap for batches).

    Returns F^(e1) with F < 1 inside, > 1 outside. Matches the
    reference's per-loss implementations (e.g. ``classes.py:318-356``).
    """
    a, e, tr, rot = _rotated_frame(p)
    rp = jnp.einsum("ij,...j->...i", rot, points)
    x2 = ((rp[..., 0] - tr[0]) / a[0]) ** 2
    y2 = ((rp[..., 1] - tr[1]) / a[1]) ** 2
    z2 = ((rp[..., 2] - tr[2]) / a[2]) ** 2
    return _power_chain(x2, y2, z2, e[0], e[1], guard=guard)


def field_grid(
    ax_x: jax.Array, ax_y: jax.Array, ax_z: jax.Array,
    p: jax.Array, *, guard: bool = True,
) -> jax.Array:
    """Inside-outside F^(e1) on a separable grid, shape (Nx, Ny, Nz).

    Exploits grid separability: instead of materializing the (3, N³)
    meshgrid that the reference keeps resident on device
    (``classes.py:124-125``), the rotated coordinates are built by
    broadcasting three 1-D axes — XLA fuses the whole field evaluation
    into one elementwise kernel with no grid tensor in HBM.
    """
    a, e, tr, rot = _rotated_frame(p)
    X = ax_x[:, None, None]
    Y = ax_y[None, :, None]
    Z = ax_z[None, None, :]
    # coordinate_system[i] = R[i,0]*X + R[i,1]*Y + R[i,2]*Z  (classes.py:158)
    x2 = ((rot[0, 0] * X + rot[0, 1] * Y + rot[0, 2] * Z - tr[0]) / a[0]) ** 2
    y2 = ((rot[1, 0] * X + rot[1, 1] * Y + rot[1, 2] * Z - tr[1]) / a[1]) ** 2
    z2 = ((rot[2, 0] * X + rot[2, 1] * Y + rot[2, 2] * Z - tr[2]) / a[2]) ** 2
    return _power_chain(x2, y2, z2, e[0], e[1], guard=guard)


# ---------------------------------------------------------------------------
# Explicit surface parameterization (N1: sq::r(eta, omega))
# ---------------------------------------------------------------------------

def _spow(base: jax.Array, expo) -> jax.Array:
    """Signed power: sgn(x)·|x|^e (C++ ``spow`` in the scanner binary)."""
    return jnp.sign(base) * jnp.power(jnp.abs(base), expo)


def surface_point(p: jax.Array, eta: jax.Array, omega: jax.Array,
                  frame: str = "world") -> jax.Array:
    """Closed-form surface point r(η, ω) (``sq::r`` in the scanner
    binary, SURVEY.md §2.2-N1):

    ``x = a1·cos^e1(η)·cos^e2(ω), y = a2·cos^e1(η)·sin^e2(ω),
    z = a3·sin^e1(η)`` with signed powers. η ∈ [−π/2, π/2],
    ω ∈ [−π, π]; broadcasts over eta/omega shapes.
    """
    a, e, t, q = split_params(p)
    ce1 = _spow(jnp.cos(eta), e[0])
    x = a[0] * ce1 * _spow(jnp.cos(omega), e[1])
    y = a[1] * ce1 * _spow(jnp.sin(omega), e[1])
    z = a[2] * _spow(jnp.sin(eta), e[0]) * jnp.ones_like(x)
    pts = jnp.stack([x, y, z], axis=-1)
    if frame == "body":
        return pts
    return quat.rotate(pts.reshape(-1, 3), q[None, :]).reshape(pts.shape) \
        + t


def surface_normal(p: jax.Array, eta: jax.Array, omega: jax.Array,
                   frame: str = "world") -> jax.Array:
    """Closed-form outward unit surface normal n(η, ω)
    (``sq::normal(η,ω)`` in the scanner binary, SURVEY.md §2.2-N1;
    Jaklič/Solina closed form):

    ``n ∝ [cos^(2−e1)(η)·cos^(2−e2)(ω)/a1,
           cos^(2−e1)(η)·sin^(2−e2)(ω)/a2,  sin^(2−e1)(η)/a3]``
    with signed powers — parallel to ∇F at the surface point (tested
    against autodiff of :func:`field_points`).
    """
    a, e, t, q = split_params(p)
    ce = _spow(jnp.cos(eta), 2.0 - e[0])
    nx = ce * _spow(jnp.cos(omega), 2.0 - e[1]) / a[0]
    ny = ce * _spow(jnp.sin(omega), 2.0 - e[1]) / a[1]
    nz = _spow(jnp.sin(eta), 2.0 - e[0]) / a[2] * jnp.ones_like(nx)
    n = jnp.stack([nx, ny, nz], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    if frame == "body":
        return n
    return quat.rotate(n.reshape(-1, 3), q[None, :]).reshape(n.shape)


def map_eta_omega(points: jax.Array, p: jax.Array):
    """Inverse surface parameterization (``sq::map_eta``/``sq::map_omega``
    in the scanner binary, SURVEY.md §2.2-N1): world-space points →
    (η, ω) of the surface point on the same radial ray from the center.

    ω = atan2(spow(y/a2, 1/e2), spow(x/a1, 1/e2));
    η from whichever of the x/ω or y/ω branches is better conditioned
    (|cos ω| vs |sin ω|), so poles and the ω = ±π/2 meridians are exact.
    """
    a, e, t, q = split_params(p)
    body = quat.rotate(points.reshape(-1, 3) - t[None, :],
                       quat.conjugate(q)[None, :]).reshape(points.shape)
    x, y, z = body[..., 0] / a[0], body[..., 1] / a[1], body[..., 2] / a[2]
    omega = jnp.arctan2(_spow(y, 1.0 / e[1]), _spow(x, 1.0 / e[1]))
    cw, sw = jnp.cos(omega), jnp.sin(omega)
    ce1 = jnp.where(jnp.abs(cw) > jnp.abs(sw),
                    x / jnp.where(cw == 0, 1.0, _spow(cw, e[1])),
                    y / jnp.where(sw == 0, 1.0, _spow(sw, e[1])))
    eta = jnp.arctan2(_spow(z, 1.0 / e[0]), _spow(ce1, 1.0 / e[0]))
    return eta, omega


def signed_distance(points: jax.Array, p: jax.Array) -> jax.Array:
    """Signed radial distance |r0|·(1 − F^(−e1/2)) — the ``sq::sdistance``
    variant of :func:`radial_distance` (SURVEY.md §2.2-N1): positive
    outside the surface, negative inside, zero on it.
    """
    _, _, t, _ = split_params(p)
    f = field_points(points, p, guard=True)  # = F^(e1)
    r0 = jnp.linalg.norm(points - t, axis=-1)
    return r0 * (1.0 - jnp.power(f, -0.5))


def sample_surface(
    p: jax.Array, n_theta: int = 64, n_gamma: int = 32, dtype=jnp.float32
) -> jax.Array:
    """Closed-form surface point sampling, world frame, shape (T*G, 3).

    Vectorized re-design of ``torch/visu.py:15-32`` (which loops over
    theta in Python), then posed by (q, t) — visu.py applies the pose via
    an open3d 4x4 transform (``visu.py:107-111``); here it's fused in.
    """
    a, e, t, q = split_params(p)
    theta = jnp.arange(-jnp.pi, jnp.pi, 2 * jnp.pi / n_theta, dtype=dtype)
    gamma = jnp.arange(-jnp.pi / 2, jnp.pi / 2, jnp.pi / n_gamma, dtype=dtype)
    ct, st = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    cg, sg = jnp.cos(gamma)[None, :], jnp.sin(gamma)[None, :]
    x = a[0] * jnp.sign(cg * ct) * jnp.abs(cg) ** e[0] * jnp.abs(ct) ** e[1]
    y = a[1] * jnp.sign(cg * st) * jnp.abs(cg) ** e[0] * jnp.abs(st) ** e[1]
    z = a[2] * _spow(sg, e[0]) * jnp.ones_like(ct)
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return quat.rotate(pts, q[None, :]) + t[None, :]


# ---------------------------------------------------------------------------
# Analytic integrals (N1: sq::volume / sq::inertia via beta functions)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Homogeneous transforms (N3: the scanner binary's hmatrix/hvector algebra)
# ---------------------------------------------------------------------------

def pose_matrix(p: jax.Array) -> jax.Array:
    """4x4 homogeneous world-from-SQ transform of a parameter vector
    (rotation + translation; ``hmatrix`` equivalent, SURVEY.md §2.2-N3).
    Batched over leading dims."""
    a, e, t, q = split_params(p)
    R = quat.to_matrix(q)
    m = jnp.zeros(p.shape[:-1] + (4, 4), p.dtype)
    m = m.at[..., :3, :3].set(R)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def pose_inverse(m: jax.Array) -> jax.Array:
    """Inverse of a rigid 4x4 transform (``inverse(hmatrix const&)``)."""
    R = m[..., :3, :3]
    t = m[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(m)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_params(p: jax.Array, q2: jax.Array, t2: jax.Array) -> jax.Array:
    """Apply a rigid pose (q2, t2) to an SQ's parameters
    (``sq::transform_g(hmatrix)`` equivalent): q' = q2·q,
    t' = R(q2)·t + t2; sizes/shape unchanged."""
    a, e, t, q = split_params(p)
    q_new = quat.multiply(q2, q)
    t_new = quat.rotate(t, q2) + t2
    return join_params(SQParams(a=a, e=e, t=t_new, q=q_new))


def radial_distance(points: jax.Array, p: jax.Array) -> jax.Array:
    """Radial (Jaklič/Solina) point-to-surface distance |r0|·|1 − F^(−e1/2)|.

    Equivalent of ``sq::distance`` in the scanner binary (SURVEY.md
    §2.2-N1): the distance along the ray from the SQ center to the point,
    positive outside and inside alike. ``points``: (..., 3) world space.
    """
    a, e, t, q = split_params(p)
    f = field_points(points, p, guard=True)  # = F^(e1)
    r0 = jnp.linalg.norm(points - t, axis=-1)
    return r0 * jnp.abs(1.0 - jnp.power(f, -0.5))


def _beta(x, y):
    return jnp.exp(betaln(x, y))


def volume(p: jax.Array) -> jax.Array:
    """Analytic SQ volume 2·a1a2a3·e1e2·B(e1/2+1, e1)·B(e2/2, e2/2).

    Equivalent of ``sq::volume()`` (which links ``beta(double,double)``,
    SURVEY.md §2.2-N1). Sphere check: e=(1,1) → 4/3·π·a³.
    """
    a, e, _, _ = split_params(p)
    e1, e2 = e[..., 0], e[..., 1]
    prod_a = a[..., 0] * a[..., 1] * a[..., 2]
    return (2.0 * prod_a * e1 * e2
            * _beta(e1 / 2 + 1, e1) * _beta(e2 / 2, e2 / 2))


def inertia(p: jax.Array) -> jax.Array:
    """Principal moments (Ixx, Iyy, Izz) about the SQ's own frame,
    unit density (Jaklič/Solina closed forms; ``sq::inertia`` equivalent).

    Sphere check: e=(1,1), a1=a2=a3=a → each moment 8πa⁵/15 = (2/5)Ma².
    """
    a, e, _, _ = split_params(p)
    a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2]
    e1, e2 = e[..., 0], e[..., 1]
    coef = 0.5 * a1 * a2 * a3 * e1 * e2
    b_xy = _beta(1.5 * e2, 0.5 * e2) * _beta(0.5 * e1, 2.0 * e1 + 1.0)
    b_z = 4.0 * _beta(0.5 * e2, 0.5 * e2 + 1.0) * _beta(1.5 * e1, e1 + 1.0)
    ixx = coef * (a2**2 * b_xy + a3**2 * b_z)
    iyy = coef * (a1**2 * b_xy + a3**2 * b_z)
    izz = coef * (a1**2 + a2**2) * b_xy
    return jnp.stack([ixx, iyy, izz], axis=-1)


def z_support_window(a: jax.Array, rot: jax.Array, t: jax.Array,
                     n_sweep: int, dtype=None):
    """(z_lo, z_hi, step) of the renderer's bounded z-sweep.

    The SQ lies inside its body box [-a, a] (e1, e2 ≤ 1), whose support
    along world z is h = Σᵢ |rot[i, 2]|·aᵢ (rot column 2 = body z axis in
    world frame). Clipped to the scanner's representable z lattice [0, 1]
    (pixel = z·255). Shared by the XLA renderer and the Pallas hard-
    render kernel so their sweep windows agree; the kernel's inside test
    omits the exact-zero guard of _power_chain(guard=True), so the two
    renders agree to the TESTED tolerance (<0.1% of pixels off by >1 gray
    level, tests/test_pallas_kernel.py), not bit-exactly. Batched or
    unbatched: leading dims of a/rot/t broadcast through.
    """
    dtype = dtype or a.dtype
    h = (jnp.abs(rot[..., 0, 2]) * a[..., 0]
         + jnp.abs(rot[..., 1, 2]) * a[..., 1]
         + jnp.abs(rot[..., 2, 2]) * a[..., 2])
    z_lo = jnp.clip(t[..., 2] - h, 0.0, 1.0)
    z_hi = jnp.clip(t[..., 2] + h, z_lo + jnp.asarray(1e-6, dtype), 1.0)
    step = (z_hi - z_lo) / jnp.asarray(n_sweep - 1, dtype)
    return z_lo, z_hi, step
