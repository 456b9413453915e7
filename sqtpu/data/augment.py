"""Depth-map noise models (beyond-reference capability).

The reference trains and evaluates exclusively on clean scanner renders
(``torch/test_random.py:41-50``); real depth sensors are not clean. This
module provides jit/vmap-friendly corruption models for [0,1]-normalized
orthographic depth maps with background == 0 (the scanner image contract,
SURVEY.md §2.2-N2), used by ``sqtpu.evaluate --noise-*`` to measure
recovery robustness:

* ``gaussian`` — additive depth noise on OBJECT pixels (sensor ranging
  error). Background stays exactly 0: real sensors return no depth where
  there is no surface, and the models key on the zero background.
* ``dropout`` — object pixels zeroed at random (missing returns /
  occlusion speckle, the classic Kinect shadow artifact).
* ``salt`` — background pixels set to a random depth (flying pixels /
  multipath ghosts).
* ``quantize`` — re-quantization to the scanner's 8-bit depth lattice
  (pixel = z·255), applied last like a sensor ADC.

Everything is pure and shape-preserving: (..., H, W) in -> same out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _active(x) -> bool:
    """Static guard: a python 0/0.0 disables a corruption branch at trace
    time; a traced scalar/array magnitude (domain randomization) always
    compiles the branch (magnitude 0 is then a runtime no-op)."""
    return not (isinstance(x, (int, float)) and x <= 0.0)


def depth_noise(key: jax.Array, imgs: jax.Array, *,
                gaussian=0.0, dropout=0.0,
                salt=0.0, quantize: bool = False) -> jax.Array:
    """Apply the configured corruptions to a batch of depth maps.

    Args:
      key: PRNG key.
      imgs: (..., H, W) depth maps in [0, 1], background exactly 0.
      gaussian: std of additive object-pixel noise (in depth units;
        0.01 ≈ 2.5 gray levels of the 8-bit scanner lattice).
      dropout: probability an object pixel is dropped to background.
      salt: probability a background pixel becomes a flying pixel.
      quantize: round the result to the 8-bit scanner lattice.

    Magnitudes may be python floats (static) or traced scalars/arrays
    broadcastable to ``imgs`` (e.g. per-sample ``(B, 1, 1)`` for
    domain-randomized training augmentation, ``--augment-randomize``).
    """
    kg, kd, ks, kv = jax.random.split(key, 4)
    obj = imgs > 0.0
    out = imgs
    if _active(gaussian):
        noise = gaussian * jax.random.normal(kg, imgs.shape, imgs.dtype)
        # clip into (0, 1]: noisy OBJECT pixels must stay object pixels
        # (eps floor), else noise would silently turn into dropout
        out = jnp.where(obj, jnp.clip(out + noise, 1.0 / 510.0, 1.0), out)
    if _active(dropout):
        keep = jax.random.bernoulli(
            kd, jnp.broadcast_to(1.0 - dropout, imgs.shape))
        out = jnp.where(obj & ~keep, 0.0, out)
    if _active(salt):
        hit = jax.random.bernoulli(
            ks, jnp.broadcast_to(jnp.asarray(salt, imgs.dtype),
                                 imgs.shape))
        depth = jax.random.uniform(kv, imgs.shape, imgs.dtype,
                                   1.0 / 255.0, 1.0)
        out = jnp.where(~obj & hit, depth, out)
    if quantize:
        out = jnp.round(out * 255.0) / 255.0
    return out
