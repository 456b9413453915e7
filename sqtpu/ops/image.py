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
