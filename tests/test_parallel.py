"""Sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import losses
from sqtpu.ops import quaternion as quat
from sqtpu.ops.render import render_depth_soft
from sqtpu.parallel.mesh import batch_sharding, make_mesh
from sqtpu.parallel.sharded_losses import implicit_loss_gridsharded

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(11)
    ka, ke, kt, kq = jax.random.split(key, 4)
    b = 8
    a = jax.random.uniform(ka, (b, 3), jnp.float64, 25 / 255, 75 / 255)
    e = jax.random.uniform(ke, (b, 2), jnp.float64, 0.1, 1.0)
    t = jax.random.uniform(kt, (b, 3), jnp.float64, 88 / 255, 168 / 255)
    q = quat.random_uniform(kq, (b,), jnp.float64)
    p = jnp.concatenate([a, e, t, q], axis=-1)
    imgs = jax.vmap(lambda pi: render_depth_soft(pi, 32, 1.5, 260.0))(
        jnp.roll(p, 1, axis=0))
    return imgs, p


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_data,n_grid", [(4, 2), (1, 8)])
def test_gridsharded_implicit_matches_unsharded(batch, n_data, n_grid):
    """DP x SP sharded loss must be numerically identical to the plain
    single-device implementation."""
    imgs, p = batch
    mesh = make_mesh(n_data=n_data, n_grid=n_grid)
    want = float(losses.implicit_loss(imgs, p, 32, 1.5, 260.0))
    got = float(implicit_loss_gridsharded(imgs, p, mesh, 32, 1.5, 260.0))
    assert got == pytest.approx(want, rel=1e-12)


def test_gridsharded_gradients_match(batch):
    imgs, p = batch
    imgs, p = imgs[:4, :16:1][:, ::2, ::2], p[:4]
    mesh = make_mesh(n_data=2, n_grid=4)
    g_ref = jax.grad(lambda pp: losses.implicit_loss(imgs, pp, 16))(p)
    g_shd = jax.grad(
        lambda pp: implicit_loss_gridsharded(imgs, pp, mesh, 16))(p)
    np.testing.assert_allclose(np.asarray(g_shd), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("n_data,n_grid", [(2, 2), (1, 4)])
def test_gridsharded_kernel_matches_unsharded(batch, monkeypatch,
                                              n_data, n_grid):
    """The SP path composed with the fused Pallas kernel (interpret
    mode): each device's column-slab kernel partial sums psum to the
    same loss as the single-device kernel and the jnp reference."""
    monkeypatch.setenv("SQTPU_PALLAS_INTERPRET", "1")
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    imgs, p = batch
    imgs, p = imgs[:4].astype(jnp.float32), p[:4].astype(jnp.float32)
    mesh = make_mesh(n_data=n_data, n_grid=n_grid)
    want_jnp = float(losses.implicit_loss(imgs, p, 32, 1.5, 260.0))
    want_krn = float(implicit_loss_pallas(imgs, p, 32, 1.5, 260.0))
    got = float(implicit_loss_gridsharded(imgs, p, mesh, 32, 1.5, 260.0))
    assert got == pytest.approx(want_krn, rel=1e-6)
    assert got == pytest.approx(want_jnp, rel=1e-4)


def test_gridsharded_kernel_gradients_match(batch, monkeypatch):
    monkeypatch.setenv("SQTPU_PALLAS_INTERPRET", "1")
    imgs, p = batch
    imgs = imgs[:4, ::2, ::2].astype(jnp.float32)
    p = p[:4].astype(jnp.float32)
    mesh = make_mesh(n_data=2, n_grid=2)
    g_ref = jax.grad(lambda pp: losses.implicit_loss(
        imgs, pp, 16, 1.5, 260.0))(p)
    g_shd = jax.grad(lambda pp: implicit_loss_gridsharded(
        imgs, pp, mesh, 16, 1.5, 260.0))(p)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_shd), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5 * scale)


def test_batch_sharding_spreads_data(batch):
    imgs, p = batch
    mesh = make_mesh(n_data=8, n_grid=1)
    sharded = jax.device_put(imgs, batch_sharding(mesh))
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(imgs))


def test_make_batch_dp_shards_generation(monkeypatch):
    """DP data generation: each device renders its own batch shard; the
    combined output matches make_batch's distribution and conventions."""
    monkeypatch.setenv("SQTPU_PALLAS_INTERPRET", "1")
    from sqtpu.parallel.sharded_losses import make_batch_dp

    mesh = make_mesh(n_data=8, n_grid=1)
    key = jax.random.PRNGKey(7)
    with mesh:
        imgs, labels = jax.jit(
            lambda k: make_batch_dp(k, 16, mesh, 32, "hard"))(key)
    imgs, labels = np.asarray(imgs), np.asarray(labels)
    assert imgs.shape == (16, 32, 32, 1) and labels.shape == (16, 12)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert (imgs.reshape(16, -1).max(axis=1) > 0).all()   # every SQ visible
    # per-shard keys differ -> shards are not copies of each other
    assert not np.allclose(labels[:2], labels[2:4])
    # labels in the sampling ranges (a in [25,75]/255, unit quats)
    assert (labels[:, 0:3] >= 25 / 255 - 1e-6).all()
    assert (labels[:, 0:3] <= 75 / 255 + 1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(labels[:, 8:12], axis=1),
                               1.0, atol=1e-5)
