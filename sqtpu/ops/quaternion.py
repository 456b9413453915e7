"""Quaternion algebra in JAX, xyzw layout (w last).

Functional equivalent of the reference's quaternion library
(``/root/reference/torch/quaternion.py:10-145``), redesigned for JAX: every
function is pure, dtype-preserving, and broadcasts over arbitrary leading
batch dimensions (the reference's ``mat_from_quaternion`` only handled a
single quaternion). All functions are jit/vmap/grad-compatible.

Conventions
-----------
* Quaternion layout: ``(..., 4) = (x, y, z, w)`` — Hamilton product, w last.
* ``to_matrix(q)`` returns the rotation matrix R such that ``R @ p`` rotates
  point ``p`` by ``q`` (for unit ``q``); matches the reference's
  ``mat_from_quaternion`` (``quaternion.py:46-67``) and the numpy
  ``quat2mat`` (``torch/helpers.py:17-24``) up to that function's extra
  normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2 in xyzw layout.

    Matches ``torch/quaternion.py:27-34``. Broadcasts over leading dims.
    """
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    x = x1 * w2 + y1 * z2 - z1 * y2 + w1 * x2
    y = -x1 * z2 + y1 * w2 + z1 * x2 + w1 * y2
    z = x1 * y2 - y1 * x2 + z1 * w2 + w1 * z2
    w = -x1 * x2 - y1 * y2 - z1 * z2 + w1 * w2
    return jnp.concatenate([x, y, z, w], axis=-1)


def conjugate(q: jax.Array) -> jax.Array:
    """(-x, -y, -z, w). Matches ``torch/quaternion.py:19-21``."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Project onto the unit sphere (safe at 0)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, jnp.asarray(eps, q.dtype))


def rotate(point: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate 3-vector(s) by quaternion(s): q * p * q⁻¹ (unit q assumed).

    Matches ``torch/quaternion.py:10-16``. ``point``: (..., 3).
    """
    p4 = jnp.concatenate([point, jnp.zeros_like(point[..., :1])], axis=-1)
    out = multiply(multiply(q, p4), conjugate(q))
    return out[..., :3]


def to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix, shape (..., 3, 3).

    Same expansion as ``torch/quaternion.py:46-67`` (which assumes unit
    quaternions and returns shape (1, 3, 3) for a single input); here the
    batch shape is preserved instead.
    """
    x, y, z, w = jnp.split(q, 4, axis=-1)
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz = ty * y, tz * y
    tzz = tz * z
    m = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    # each of the 9 entries above has a trailing singleton from the split
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion in **xyzw** layout (w last).

    Unlike the reference's ``py/utils.py:42-48`` (which returns w-first,
    inconsistently with the rest of the codebase — SURVEY.md quirk Q11),
    this returns the framework-wide xyzw layout. Uses the numerically
    robust 4-branch Shepperd method so it works for all rotations, not
    just trace > -1.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate reconstructions; pick per-element the best-conditioned.
    def _stack(x, y, z, w):
        return jnp.stack([x, y, z, w], axis=-1)

    qw = _stack(m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)
    qx = _stack(1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)
    qy = _stack(m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21, m02 - m20)
    qz = _stack(m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11, m10 - m01)

    cases = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cases, 4)
    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22,
         1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(
        cases, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return normalize(q)


def to_axis_angle(q: jax.Array) -> jax.Array:
    """(x, y, z, angle); matches ``torch/quaternion.py:103-114``."""
    xyz, w = q[..., :3], q[..., 3:]
    w_acos = jnp.arccos(jnp.clip(w, -1.0, 1.0)) + jnp.asarray(1e-8, q.dtype)
    s = jnp.sin(w_acos)
    return jnp.concatenate([xyz / s, 2.0 * w_acos], axis=-1)


def to_magnitude(q: jax.Array) -> jax.Array:
    """Rotation angle of q: 2·atan2(‖xyz‖, w). ``torch/quaternion.py:116-118``."""
    xyz, w = q[..., :3], q[..., 3]
    return 2.0 * jnp.arctan2(jnp.linalg.norm(xyz, axis=-1), w)


def to_euler(q: jax.Array) -> jax.Array:
    """(phi, theta, gamma) per the reference's convention
    (``torch/quaternion.py:129-137``).

    QUIRK (ported faithfully): the reference's theta term is
    ``acos(-qi^2 - qj^2 - qk^2 - qr^2)`` = acos(-|q|^2), which is
    constantly pi for unit quaternions — an evident sign typo in the
    reference (a standard convention would be -qi^2 - qj^2 + qk^2 + qr^2).
    Kept bit-compatible; use :func:`to_axis_angle` / :func:`to_magnitude`
    for meaningful angles."""
    qi, qj, qk, qr = jnp.split(q, 4, axis=-1)
    phi = jnp.arctan2(qi * qk + qj * qr, -(qj * qk - qi * qr))
    theta = jnp.arccos(jnp.clip(-(qi**2) - qj**2 - qk**2 - qr**2, -1.0, 1.0))
    gamma = jnp.arctan2(qi * qk - qj * qr, qj * qk + qi * qr)
    return jnp.concatenate([phi, theta, gamma], axis=-1)


def random_uniform(key: jax.Array, shape: tuple = (), dtype=jnp.float32) -> jax.Array:
    """Shoemake-uniform random unit quaternions, shape (..., 4).

    Same distribution as the reference's ``randquat``
    (``torch/quaternion.py:139-145``), driven by ``jax.random`` so data
    generation stays on device.
    """
    u = jax.random.uniform(key, shape + (3,), dtype=dtype)
    u0, u1, u2 = u[..., 0], u[..., 1], u[..., 2]
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype)
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u0) * jnp.sin(two_pi * u1),
            jnp.sqrt(1.0 - u0) * jnp.cos(two_pi * u1),
            jnp.sqrt(u0) * jnp.sin(two_pi * u2),
            jnp.sqrt(u0) * jnp.cos(two_pi * u2),
        ],
        axis=-1,
    )


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation; ``t`` may be an array of fractions.

    Branch-free re-design of ``torch/helpers.py:295-320`` (the reference's
    data-dependent ``if dot > 0.9995`` branch is replaced by ``jnp.where``
    so the function is jittable). Returns shape ``t.shape + (4,)``.
    """
    t = jnp.asarray(t)
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot_c = jnp.clip(dot, -1.0, 1.0)

    theta0 = jnp.arccos(dot_c)
    sin_theta0 = jnp.sin(theta0)
    theta = theta0 * t[..., None]
    # Safe divisor for the nearly-parallel case; result is discarded there.
    safe_sin = jnp.where(sin_theta0 > 1e-6, sin_theta0, 1.0)
    s0 = jnp.cos(theta) - dot_c * jnp.sin(theta) / safe_sin
    s1 = jnp.sin(theta) / safe_sin
    slerped = s0 * q0 + s1 * q1

    lerped = normalize(q0 + t[..., None] * (q1 - q0))
    return jnp.where(dot > 0.9995, lerped, slerped)
