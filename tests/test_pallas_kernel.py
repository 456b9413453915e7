"""Fused Pallas implicit-loss kernel vs the XLA reference path.

Runs in interpreter mode on CPU (SQTPU_PALLAS_INTERPRET is forced here);
the same comparisons are run compiled on real TPU hardware by bench /
manual verification.
"""

import os

os.environ["SQTPU_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import losses
from sqtpu.ops import quaternion as quat
from sqtpu.ops.render import render_depth_soft


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(21)
    ka, ke, kt, kq = jax.random.split(key, 4)
    b = 4
    p = jnp.concatenate([
        jax.random.uniform(ka, (b, 3), jnp.float32, 25 / 255, 75 / 255),
        jax.random.uniform(ke, (b, 2), jnp.float32, 0.1, 1.0),
        jax.random.uniform(kt, (b, 3), jnp.float32, 88 / 255, 168 / 255),
        quat.random_uniform(kq, (b,), jnp.float32),
    ], axis=-1)
    imgs = jax.vmap(lambda pi: render_depth_soft(pi, 32, 1.5, 260.0))(
        jnp.roll(p, 1, axis=0))
    return imgs, p


def test_forward_matches_xla(batch):
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    imgs, p = batch
    ref = float(losses.implicit_loss(imgs, p, 32, 1.5, 260.0))
    got = float(implicit_loss_pallas(imgs, p, 32, 1.5, 260.0))
    assert got == pytest.approx(ref, rel=1e-5)


def test_gradient_matches_xla(batch):
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    imgs, p = batch
    g_ref = np.asarray(jax.grad(
        lambda pp: losses.implicit_loss(imgs, pp, 32, 1.5, 260.0))(p))
    g_pal = np.asarray(jax.grad(
        lambda pp: implicit_loss_pallas(imgs, pp, 32, 1.5, 260.0))(p))
    # fp32 recompute noise; all 12 parameter channels must agree
    np.testing.assert_allclose(g_pal, g_ref, rtol=5e-3, atol=1e-6)


def test_gradient_respects_clamp(batch):
    """Clamped-out parameters must get zero gradient (clip vjp semantics),
    exactly like the XLA path."""
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    imgs, p = batch
    p = p.at[0, 0].set(1.5)   # a1 above clamp max
    p = p.at[1, 3].set(0.05)  # e1 below clamp min
    g = np.asarray(jax.grad(
        lambda pp: implicit_loss_pallas(imgs, pp, 32, 1.5, 260.0))(p))
    assert g[0, 0] == 0.0
    assert g[1, 3] == 0.0


def test_unsupported_size_falls_back(batch):
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    imgs, p = batch
    # 24² = 576 not divisible by 128 -> must silently use the XLA path
    ref = float(losses.implicit_loss(imgs, p, 24, 1.5, 260.0))
    got = float(implicit_loss_pallas(imgs, p, 24, 1.5, 260.0))
    assert got == pytest.approx(ref, rel=1e-6)


def test_dispatcher_on_cpu_uses_xla(batch):
    from sqtpu.ops.kernels import implicit_loss_auto

    imgs, p = batch
    ref = float(losses.implicit_loss(imgs, p, 32, 1.5, 260.0))
    got = float(implicit_loss_auto(imgs, p, 32, 1.5, 260.0))
    assert got == pytest.approx(ref, rel=1e-6)
