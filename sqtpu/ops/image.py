"""Small image ops needed by the losses (no cv2/PIL dependency)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_resize(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize matching ``torch.nn.functional.interpolate``
    (mode="nearest") semantics: ``src_idx = floor(dst_idx * src/dst)``.

    Used by the implicit and least-squares losses to downsample the input
    depth image to the render size (``torch/classes.py:286, 359``).

    Args:
      img: (..., H, W).
      out_hw: (h, w) target size.
    """
    h_in, w_in = img.shape[-2], img.shape[-1]
    h_out, w_out = out_hw
    rows = (jnp.arange(h_out) * h_in // h_out).astype(jnp.int32)
    cols = (jnp.arange(w_out) * w_in // w_out).astype(jnp.int32)
    return img[..., rows[:, None], cols[None, :]]


def norm_img(img: jax.Array) -> jax.Array:
    """Min-max normalize to [0, 1] (``torch/helpers.py:12-14``)."""
    img = img - jnp.min(img)
    return img / jnp.maximum(jnp.max(img), 1e-12)


def despeckle(img: jax.Array, min_neighbors: int = 2) -> jax.Array:
    """Drop isolated object pixels (flying-pixel / multipath ghosts).

    An object pixel (depth > 0) is kept only if at least ``min_neighbors``
    of its 8 neighbors are also object pixels; a real SQ silhouette is
    contiguous, so the filter removes the salt corruption of
    :func:`sqtpu.data.augment.depth_noise` while leaving the surface
    intact (interior pixels have 8 object neighbors). Pure and
    shape-preserving on (..., H, W).
    """
    h, w = img.shape[-2], img.shape[-1]
    obj = (img > 0).astype(img.dtype)
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(obj, pad)
    cnt = -obj  # subtract self, then add the full 3x3 window
    for di in range(3):
        for dj in range(3):
            cnt = cnt + p[..., di:di + h, dj:dj + w]
    return jnp.where((img > 0) & (cnt < min_neighbors), 0.0, img)


def median3(img: jax.Array) -> jax.Array:
    """3×3 median filter — the classic depth-map cleanup: halves gaussian
    ranging noise, removes isolated flying pixels (median of a mostly-zero
    window is 0) and fills isolated dropout holes (median of a mostly-
    object window is an object depth). Zero padding means silhouette
    boundary pixels with fewer than 5 object neighbors erode by ≤1 px.
    Pure and shape-preserving on (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(img, pad)
    stack = jnp.stack([p[..., di:di + h, dj:dj + w]
                       for di in range(3) for dj in range(3)], axis=-1)
    return jnp.median(stack, axis=-1)


def depth_to_points(img, flip_vertical: bool = True):
    """Export nonzero depth pixels as an (N, 3) ``(x, y, z)`` point list —
    the ``to_pc`` utility (``py/utils.py:66-78``: cv2.flip then
    (col, row, value) rows). Host-side numpy (ragged output)."""
    import numpy as np

    a = np.asarray(img)
    if flip_vertical:
        a = a[::-1]
    r, c = np.nonzero(a)
    return np.stack([c, r, a[r, c]], axis=-1)
