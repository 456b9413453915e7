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

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


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


def test_dispatcher_on_cpu_uses_xla(batch, monkeypatch):
    from sqtpu.ops.kernels import implicit_loss_auto, pallas_available

    imgs, p = batch
    ref = float(losses.implicit_loss(imgs, p, 32, 1.5, 260.0))
    # interpret mode (set at module import): the kernel path is available
    assert pallas_available()
    got = float(implicit_loss_auto(imgs, p, 32, 1.5, 260.0))
    assert got == pytest.approx(ref, rel=1e-5)
    # without interpret mode on CPU the dispatcher must use XLA
    monkeypatch.delenv("SQTPU_PALLAS_INTERPRET")
    assert not pallas_available()
    got = float(implicit_loss_auto(imgs, p, 32, 1.5, 260.0))
    assert got == pytest.approx(ref, rel=1e-6)


def test_image_gradient_matches_xla(batch):
    """The kernel emits the true image cotangent (sign(img-depth)·g), not
    zeros — image-fitting / adversarial uses differentiate through it.

    Uses noise images: the cotangent is a pure sign, and at exact-tie
    pixels (rendered backgrounds, where img == depth == 0) the two
    paths' fp32 rounding can legitimately disagree on sign(0±ulp).
    """
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    _, p = batch
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32),
                              jnp.float32, 0.05, 0.9)
    g_ref = np.asarray(jax.grad(
        lambda im: losses.implicit_loss(im, p, 32, 1.5, 260.0))(imgs))
    g_pal = np.asarray(jax.grad(
        lambda im: implicit_loss_pallas(im, p, 32, 1.5, 260.0))(imgs))
    assert np.abs(g_ref).sum() > 0
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4, atol=1e-8)


def test_dp_shard_map_matches_unsharded(batch):
    """DP x Pallas (VERDICT weak #4): the shard_map-wrapped kernel over
    the 8-virtual-device 'data' axis must match the unsharded XLA loss in
    value and parameter gradient."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sqtpu.parallel.mesh import make_mesh
    from sqtpu.parallel.sharded_losses import implicit_loss_dp

    imgs, p = batch
    imgs8 = jnp.concatenate([imgs, jnp.flip(imgs, axis=0)])     # batch 8
    p8 = jnp.concatenate([p, jnp.roll(p, 1, axis=0)])
    mesh = make_mesh(n_data=8, n_grid=1)
    sh = NamedSharding(mesh, P("data"))
    imgs8 = jax.device_put(imgs8, sh)
    p8 = jax.device_put(p8, sh)

    ref_v, ref_g = jax.value_and_grad(
        lambda pp: losses.implicit_loss(imgs8, pp, 32, 1.5, 260.0))(p8)

    @jax.jit
    def dp_loss_grad(pp):
        return jax.value_and_grad(
            lambda q: implicit_loss_dp(imgs8, q, mesh, 32, 1.5, 260.0))(pp)

    with mesh:
        got_v, got_g = dp_loss_grad(p8)
    assert float(got_v) == pytest.approx(float(ref_v), rel=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=5e-3, atol=1e-6)


class TestHardRenderKernel:
    """Fused hard-renderer kernel vs the XLA z-sweep renderer."""

    def test_byte_parity_with_xla_renderer(self, batch):
        from sqtpu.ops.kernels.hardrender import render_depth_hard_pallas
        from sqtpu.ops.render import render_depth_hard

        _, p = batch
        ref = jax.vmap(lambda pi: render_depth_hard(
            pi, 64, n_bisect=12, quantize=True, n_sweep=48))(p)
        got = render_depth_hard_pallas(p, 64, n_sweep=48, n_bisect=12,
                                       quantize=True)
        d = np.abs(np.asarray(ref) * 255 - np.asarray(got) * 255)
        assert (d > 1).mean() < 1e-3
        assert np.asarray(got).max() > 0.3           # actually rendered

    def test_unquantized_continuous(self, batch):
        from sqtpu.ops.kernels.hardrender import render_depth_hard_pallas

        _, p = batch
        img = np.asarray(render_depth_hard_pallas(p, 32, quantize=False))
        assert np.all(img >= 0) and np.all(img <= 1)
        assert ((img * 255) % 1 > 1e-3).any()        # not on the lattice

    def test_auto_dispatcher(self, batch):
        from sqtpu.ops.kernels import render_hard_auto
        from sqtpu.ops.render import render_depth_hard

        _, p = batch
        ref = jax.vmap(lambda pi: render_depth_hard(
            pi, 32, n_bisect=12, quantize=True, n_sweep=48))(p)
        got = render_hard_auto(p, 32)
        d = np.abs(np.asarray(ref) * 255 - np.asarray(got) * 255)
        assert (d > 1).mean() < 1e-3


def test_batch_chunking_parity(monkeypatch):
    """Batches above the per-call SMEM cap are chunked at the wrapper
    level; loss AND gradient must be identical to the single-call path."""
    import jax
    import jax.numpy as jnp

    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    monkeypatch.setenv("SQTPU_PALLAS_INTERPRET", "1")
    key = jax.random.PRNGKey(3)
    from sqtpu.data.synthetic import sample_params
    p = sample_params(key, 6)
    img = jax.vmap(lambda pi: render_depth_soft(pi, 32, 1.5, 260.0))(
        jnp.roll(p, 1, axis=0))

    def loss(pp):
        return implicit_loss_pallas(img, pp, 32)

    whole_l, whole_g = jax.value_and_grad(loss)(p)
    monkeypatch.setenv("SQTPU_KERNEL_MAX_BATCH", "2")  # force 3 chunks
    chunk_l, chunk_g = jax.value_and_grad(loss)(p)
    np.testing.assert_allclose(np.asarray(chunk_l), np.asarray(whole_l),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(chunk_g), np.asarray(whole_g),
                               rtol=1e-5, atol=1e-7)


def test_z_window_matches_full_sweep(batch):
    """Windowed sweep (default, closed-form out-of-window transmittance)
    vs the exact full sweep: value and gradient parity."""
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    imgs, p = batch
    full = float(implicit_loss_pallas(imgs, p, 32, z_window=False))
    win = float(implicit_loss_pallas(imgs, p, 32))
    assert win == pytest.approx(full, rel=1e-5)
    g_full = np.asarray(jax.grad(
        lambda pp: implicit_loss_pallas(imgs, pp, 32,
                                        z_window=False))(p))
    g_win = np.asarray(jax.grad(
        lambda pp: implicit_loss_pallas(imgs, pp, 32))(p))
    np.testing.assert_allclose(g_win, g_full, rtol=1e-4, atol=1e-7)
