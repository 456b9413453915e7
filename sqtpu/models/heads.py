"""Output heads for SQ parameter regression (reference L5 heads,
``/root/reference/torch/models.py:7-122``).

Each head optionally inserts a hidden dense layer (the reference's
``dense=`` flag). Activations match the reference exactly:

* Size / Shape / Position: Linear -> sigmoid (bounded [0,1] params)
* Rotation: Linear -> L2-normalize (unit quaternion, xyzw)
* Block: raw Linear (the reference's unused 8-param head, kept for parity)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _Head(nn.Module):
    features: int
    dense: bool = False
    dense_features: int = 64

    def _trunk(self, x):
        if self.dense:
            x = nn.Dense(self.dense_features)(x)
            x = nn.leaky_relu(x, 0.01)
        return nn.Dense(self.features)(x)


class SizeHead(_Head):
    features: int = 3

    @nn.compact
    def __call__(self, x):
        return nn.sigmoid(self._trunk(x))


class ShapeHead(_Head):
    features: int = 2

    @nn.compact
    def __call__(self, x):
        return nn.sigmoid(self._trunk(x))


class PositionHead(_Head):
    features: int = 3

    @nn.compact
    def __call__(self, x):
        return nn.sigmoid(self._trunk(x))


class RotationHead(_Head):
    """Linear -> unit quaternion (``torch/models.py:22-30``)."""

    features: int = 4

    @nn.compact
    def __call__(self, x):
        q = self._trunk(x)
        # The reference divides by the raw norm (models.py:28), which NaNs
        # in BOTH value and gradient on an exactly-zero logit vector (an
        # untrained encoder can emit exact zeros). Clamping the norm AFTER
        # computing it still NaNs the backward (norm's vjp at 0 is 0/0),
        # so clamp the sum of squares BEFORE the sqrt: identical to
        # q/||q|| whenever ||q|| > 1e-3, finite value and gradient at 0.
        sumsq = jnp.sum(q * q, axis=-1, keepdims=True)
        return q * jax.lax.rsqrt(jnp.maximum(sumsq, jnp.asarray(1e-6, q.dtype)))


class BlockHead(_Head):
    features: int = 8

    @nn.compact
    def __call__(self, x):
        return self._trunk(x)


def _safe_normalize(v, eps=1e-6):
    sumsq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sumsq, jnp.asarray(eps, v.dtype)))


class Rotation6DHead(_Head):
    """Linear -> 6D rotation representation -> unit quaternion.

    Not in the reference (which L2-normalizes 4 raw logits,
    ``torch/models.py:22-30``): the quaternion (and axis-angle) maps from
    R^n onto SO(3) are discontinuous, which hurts regression; the 6D
    rep — two raw R^3 vectors orthonormalized by Gram-Schmidt (Zhou et
    al., CVPR 2019, "On the Continuity of Rotation Representations in
    Neural Networks") — is continuous. The resulting matrix converts to
    an xyzw quaternion so every downstream consumer (losses, metrics,
    renderer) is unchanged.

    Zero logits (untrained encoder) map to the identity rotation via the
    (1,0,0)/(0,1,0) offsets — finite value and gradient everywhere.
    """

    features: int = 6

    @nn.compact
    def __call__(self, x):
        from sqtpu.ops import quaternion as quat

        raw = self._trunk(x)
        off = jnp.asarray([1, 0, 0, 0, 1, 0], raw.dtype)
        a1, a2 = jnp.split(raw + off, 2, axis=-1)
        b1 = _safe_normalize(a1)
        b2 = _safe_normalize(
            a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
        b3 = jnp.cross(b1, b2)
        rot = jnp.stack([b1, b2, b3], axis=-1)     # columns = basis
        return quat.from_matrix(rot)
