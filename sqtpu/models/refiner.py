"""Render-and-compare iterative refinement model (beyond-reference).

The reference's recognition path is one feedforward pass
(``torch/models.py:196-204``); its only refinement story is test-time
optimization (``torch/visu.py:123-209``'s gradient loop, or the classical
L-M solver in the scanner binary, SURVEY.md §2.2-N4). This module closes
the amortization gap *without* test-time optimization: a learned
corrector CNN repeatedly (1) renders the current parameter estimate with
the exact on-device ray-caster, (2) compares the rendering with the
input depth image, and (3) regresses a parameter update — "iterative
error feedback" / render-and-compare, run entirely in-graph. Inference
stays a fixed-depth feedforward network: no per-sample optimizer state,
no data-dependent control flow, one XLA program — the TPU-native shape
of a learned optimizer (a Python-unrolled loop of identical blocks, so
the compiler sees a deep but static graph).

Why it can beat the one-shot CNN: the measured stage-c4a flagship leaves
most of its error in exactly the columns whose visual evidence is
subtle at one glance (shape exponents e1/e2, fine rotation), while the
pixel-space L-M polish recovers them (full IoU 0.897 -> 0.945) — proof
the information is in the image. The corrector sees the *residual*
between rendering and observation, the same signal L-M exploits, but
amortized into weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from sqtpu.models.resnet import ResNet18, ResNetSQ
from sqtpu.ops import quaternion as quat


# valid parameter box (the loss-side clamp ranges, torch/classes.py:129-136)
_A_MIN, _A_MAX = 0.05, 1.0
_E_MIN, _E_MAX = 0.1, 1.0
_T_MIN, _T_MAX = 0.0, 1.0


def apply_delta(p: jax.Array, delta: jax.Array,
                scale: float = 0.2) -> jax.Array:
    """One parameter update: additive in (a, e, t), multiplicative on
    the quaternion via a small world-frame rotation.

    ``delta`` is (B, 11): [da(3), de(2), dt(3), dv(3)]; ``dv`` is the
    tangent of the rotation update, dq = normalize([dv·scale, 1]) —
    identity at dv = 0, so a zeros-initialized delta head makes the
    whole refiner an exact identity at init."""
    da, de, dt, dv = jnp.split(delta * scale, (3, 5, 8), axis=-1)
    a = jnp.clip(p[..., 0:3] + da, _A_MIN, _A_MAX)
    e = jnp.clip(p[..., 3:5] + de, _E_MIN, _E_MAX)
    t = jnp.clip(p[..., 5:8] + dt, _T_MIN, _T_MAX)
    dq = quat.normalize(jnp.concatenate(
        [dv, jnp.ones_like(dv[..., :1])], axis=-1))
    q = quat.normalize(quat.multiply(dq, p[..., 8:12]))
    return jnp.concatenate([a, e, t, q], axis=-1)


class RefineBlock(nn.Module):
    """One corrector pass: (input image ‖ rendering) -> parameter delta.

    Applied repeatedly with SHARED weights (the same instance is called
    n_refine times inside :class:`IterativeSQ`), like a recurrent cell.
    The current parameter vector is concatenated to the image features
    so the update can condition on the estimate itself, not only on the
    pixel residual."""

    fcn: int = 256
    dtype: type = None

    @nn.compact
    def __call__(self, img2, p, train: bool = False):
        feats = ResNet18(dtype=self.dtype, name="encoder")(img2, train)
        h = jnp.concatenate([feats, p.astype(feats.dtype)], axis=-1)
        h = nn.leaky_relu(nn.Dense(self.fcn, dtype=self.dtype,
                                   name="fc1")(h), 0.01)
        h = nn.leaky_relu(nn.Dense(self.fcn, dtype=self.dtype,
                                   name="fc2")(h), 0.01)
        # zeros-initialized delta head: the refiner starts as an identity
        # around the base prediction, so warm-started training begins at
        # the base model's loss instead of destroying it
        return nn.Dense(11, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        dtype=self.dtype, name="delta")(h)


class IterativeSQ(nn.Module):
    """Base ResNetSQ predictor + ``n_refine`` shared render-and-compare
    corrector steps, end-to-end trainable, drop-in for ``resnet_sq``
    (returns the same ``(size, shape, position, quaternion)`` tuple, so
    train/evaluate/serve all take it by registry name ``refine_sq``).

    The rendering is ``jax.lax.stop_gradient``-ed: gradients reach the
    corrector through its delta output and the base through the additive
    parameter chain, never through the (piecewise-constant-in-p
    bisection) ray-caster — the corrector learns from the loss on its
    *output*, exactly like iterative-error-feedback pose estimators.
    """

    n_refine: int = 2
    fcn: int = 256
    dtype: type = None
    delta_scale: float = 0.2
    n_sweep: int = 48   # coarse-sweep slabs for the in-loop renderings

    @nn.compact
    def __call__(self, x, train: bool = False):
        from sqtpu.ops.render import render_depth_hard_batch

        size, shape, pos, rot = ResNetSQ(
            fcn=self.fcn, dtype=self.dtype, name="base")(x, train)
        p = jnp.concatenate([size, shape, pos, rot], axis=-1)

        block = RefineBlock(fcn=self.fcn, dtype=self.dtype, name="refine")
        s = x.shape[1]
        for _ in range(self.n_refine):
            rendered = jax.lax.stop_gradient(
                render_depth_hard_batch(
                    jax.lax.stop_gradient(p).astype(jnp.float32), s,
                    n_sweep=self.n_sweep))
            img2 = jnp.concatenate(
                [x, rendered[..., None].astype(x.dtype)], axis=-1)
            p = apply_delta(p, block(img2, p, train), self.delta_scale)

        return p[..., 0:3], p[..., 3:5], p[..., 5:8], p[..., 8:12]


def warm_start_base(variables: dict, npz_path: str) -> dict:
    """Load an exported ``resnet_sq`` weights npz (flat ``params/...`` /
    ``batch_stats/...`` keys) into the ``base`` submodule of an
    :class:`IterativeSQ` variables tree, leaving the corrector at its
    (identity) init. Returns a new variables dict."""
    import numpy as np

    data = np.load(npz_path)

    def rebuild(tree, prefix):
        if tree is None:
            return None
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        key = prefix[:-1]
        if key not in data:
            return tree  # corrector weights: keep init
        arr = data[key]
        if arr.shape != tuple(jnp.shape(tree)):
            raise ValueError(
                f"warm-start mismatch at {key}: file {arr.shape}, "
                f"model {tuple(jnp.shape(tree))}")
        return jnp.asarray(arr, jnp.asarray(tree).dtype)

    out = {}
    for col, tree in variables.items():   # params / batch_stats
        new_col = dict(tree)
        if "base" in tree:
            # flagship npz keys have no "base/" prefix: strip it by
            # rebuilding the base subtree against "<col>/..." keys
            new_col["base"] = rebuild(tree["base"], f"{col}/")
        out[col] = new_col
    return out
