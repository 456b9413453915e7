"""Fused Pallas explicit-loss kernel vs the XLA reference path.

Runs in interpreter mode on CPU (SQTPU_PALLAS_INTERPRET forced here);
the same comparisons run compiled on real TPU hardware by the training
probes / bench.
"""

import os

os.environ["SQTPU_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import losses
from sqtpu.ops import quaternion as quat

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(31)
    ka, ke, kt, kq, kp = jax.random.split(key, 5)
    b = 4
    p = jnp.concatenate([
        jax.random.uniform(ka, (b, 3), jnp.float32, 25 / 255, 75 / 255),
        jax.random.uniform(ke, (b, 2), jnp.float32, 0.1, 1.0),
        jax.random.uniform(kt, (b, 3), jnp.float32, 88 / 255, 168 / 255),
        quat.random_uniform(kq, (b,), jnp.float32),
    ], axis=-1)
    pred = p + 0.02 * jax.random.normal(kp, p.shape, jnp.float32)
    return p, pred


@pytest.mark.parametrize("n", [16, 32])  # 17², 33² — NOT lane-aligned
def test_forward_matches_xla(batch, n):
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    ref = float(losses.explicit_loss(true_p, pred, n))
    # full sweep: exact XLA parity
    got = float(explicit_loss_pallas(true_p, pred, n, z_window=False))
    assert got == pytest.approx(ref, rel=1e-5)
    # windowed sweep (the default): skipped saturated-tail planes only
    win = float(explicit_loss_pallas(true_p, pred, n))
    assert win == pytest.approx(ref, rel=1e-3)


def test_forward_per_sample(batch):
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    ref = np.asarray(losses.explicit_loss(true_p, pred, 16, reduce=False))
    got = np.asarray(explicit_loss_pallas(true_p, pred, 16, reduce=False,
                                          z_window=False))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    win = np.asarray(explicit_loss_pallas(true_p, pred, 16, reduce=False))
    np.testing.assert_allclose(win, ref, rtol=1e-3)


def test_windowed_batch_order_invariance(batch):
    """Windowed runs are one sample per program, so per-sample values
    must be independent of the batch order (regression guard for any
    future cross-sample tiling of the windowed path)."""
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    fwd = np.asarray(explicit_loss_pallas(true_p, pred, 16, reduce=False))
    perm = np.array([2, 0, 3, 1])
    shuf = np.asarray(explicit_loss_pallas(
        true_p[perm], pred[perm], 16, reduce=False))
    np.testing.assert_allclose(shuf, fwd[perm], rtol=1e-6)


@pytest.mark.parametrize("z_window", [False, True])
def test_gradient_matches_xla(batch, z_window):
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    g_ref = np.asarray(jax.grad(
        lambda pp: losses.explicit_loss(true_p, pp, 16))(pred))
    g_pal = np.asarray(jax.grad(
        lambda pp: explicit_loss_pallas(true_p, pp, 16,
                                        z_window=z_window))(pred))
    # fp32 recompute noise; all 12 parameter channels must agree.
    # Windowed: skipped planes' grad contributions are sigmoid tails
    # (measured 2.5e-4 max abs at the default 0.08 margin, n=16).
    atol = 5e-4 if z_window else 1e-6
    np.testing.assert_allclose(g_pal, g_ref, rtol=5e-3, atol=atol)


def test_gradient_respects_clamp(batch):
    """Clamped-out parameters must get zero gradient (clip vjp
    semantics), exactly like the XLA path."""
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    pred = pred.at[0, 0].set(1.5)   # a1 above clamp max
    pred = pred.at[1, 3].set(0.05)  # e1 below clamp min
    g = np.asarray(jax.grad(
        lambda pp: explicit_loss_pallas(true_p, pp, 16))(pred))
    assert g[0, 0] == 0.0
    assert g[1, 3] == 0.0


def test_true_side_gradient_contract(batch):
    """The kernel's documented contract: d/d true_p is exactly zero
    (labels are constants in every training consumer)."""
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    g = np.asarray(jax.grad(
        lambda tp: explicit_loss_pallas(tp, pred, 16))(true_p))
    assert (g == 0.0).all()


def test_dispatcher_on_cpu_uses_xla(batch, monkeypatch):
    from sqtpu.ops.kernels import explicit_loss_auto, pallas_available

    true_p, pred = batch
    ref = float(losses.explicit_loss(true_p, pred, 16))
    assert pallas_available()  # interpret mode, set at module import
    got = float(explicit_loss_auto(true_p, pred, 16))
    assert got == pytest.approx(ref, rel=1e-3)  # windowed default
    got = float(explicit_loss_auto(true_p, pred, 16, z_window=False))
    assert got == pytest.approx(ref, rel=1e-5)
    monkeypatch.delenv("SQTPU_PALLAS_INTERPRET")
    assert not pallas_available()
    got = float(explicit_loss_auto(true_p, pred, 16))
    assert got == pytest.approx(ref, rel=1e-6)


def test_loop_explicit_sym_routes_through_kernel(batch):
    """_compute_loss('explicit_sym') with use_pallas must equal the pure
    XLA path (value and pred-gradient) — the flagship recipe's loss."""
    from sqtpu.training.loop import _compute_loss
    from sqtpu.utils.config import TrainConfig

    true_p, pred = batch
    cfg_k = TrainConfig(loss="explicit_sym", render_size=16,
                        gauge_weight=2.0, use_pallas=True)
    cfg_x = TrainConfig(loss="explicit_sym", render_size=16,
                        gauge_weight=2.0, use_pallas=False)

    def loss_fn(cfg):
        return lambda pp: _compute_loss(cfg, pp, None, true_p)

    v_k = float(loss_fn(cfg_k)(pred))
    v_x = float(loss_fn(cfg_x)(pred))
    assert v_k == pytest.approx(v_x, rel=1e-3)  # windowed kernel default
    g_k = np.asarray(jax.grad(loss_fn(cfg_k))(pred))
    g_x = np.asarray(jax.grad(loss_fn(cfg_x))(pred))
    np.testing.assert_allclose(g_k, g_x, rtol=5e-3, atol=1e-5)


def test_dp_shard_map_matches_unsharded(batch):
    """DP×Pallas composition: value/grad identical to the single-device
    kernel on the virtual 8-device mesh."""
    from jax.sharding import Mesh
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas
    from sqtpu.parallel.sharded_losses import explicit_loss_dp

    true_p, pred = batch
    # 8 samples so the batch divides the 8-device mesh
    tp8 = jnp.concatenate([true_p, true_p])
    pp8 = jnp.concatenate([pred, pred])
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))

    ref = float(explicit_loss_pallas(tp8, pp8, 16))
    got = float(explicit_loss_dp(tp8, pp8, mesh, 16))
    assert got == pytest.approx(ref, rel=1e-6)

    g_ref = np.asarray(jax.grad(
        lambda pp: explicit_loss_pallas(tp8, pp, 16))(pp8))
    g_got = np.asarray(jax.grad(
        lambda pp: explicit_loss_dp(tp8, pp, mesh, 16))(pp8))
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-5, atol=1e-7)


def test_sharp_parameter_matches_xla(batch):
    """Configurable occupancy sharpness (sharpness annealing, round-4):
    kernel and XLA paths must agree at non-reference sharp values, and
    sharp must actually change the loss."""
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    for sharp in (10.0, 20.0):
        ref = float(losses.explicit_loss(true_p, pred, 16, sharp=sharp))
        got = float(explicit_loss_pallas(true_p, pred, 16, sharp=sharp,
                                         z_window=False))
        assert got == pytest.approx(ref, rel=1e-5)
        win = float(explicit_loss_pallas(true_p, pred, 16, sharp=sharp))
        assert win == pytest.approx(ref, rel=1e-3)
        g_ref = np.asarray(jax.grad(lambda pp: losses.explicit_loss(
            true_p, pp, 16, sharp=sharp))(pred))
        g_win = np.asarray(jax.grad(lambda pp: explicit_loss_pallas(
            true_p, pp, 16, sharp=sharp))(pred))
        np.testing.assert_allclose(g_win, g_ref, rtol=5e-3, atol=5e-4)
    ref5 = float(losses.explicit_loss(true_p, pred, 16))
    assert abs(ref - ref5) > 1e-4  # sharp is not a no-op


def test_fused_batch_chunking_parity(batch, monkeypatch):
    """Batches above the fused kernel's SMEM envelope are chunked at the
    wrapper. The fused value+grad sweep adds a (B, 24) SMEM gradient
    output over the implicit kernel's layout, so its cap is 256, NOT
    SQTPU_KERNEL_MAX_BATCH's 512 (measured: B=512 exceeds v5e's 1 MB
    SMEM by 144 B). Chunked value and gradient must match unchunked."""
    import sqtpu.ops.kernels.explicit as ek

    true_p, pred = batch

    def loss(pp):
        return ek.explicit_loss_pallas(true_p, pp, 16)

    whole_l, whole_g = jax.value_and_grad(loss)(pred)
    monkeypatch.setattr(ek, "_FUSED_MAX_BATCH", 2)  # force 2 chunks of 2
    chunk_l, chunk_g = jax.value_and_grad(loss)(pred)
    np.testing.assert_allclose(np.asarray(chunk_l), np.asarray(whole_l),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(chunk_g), np.asarray(whole_g),
                               rtol=1e-6)
    # the envelope itself: the wrapper cap must never exceed 256
    monkeypatch.undo()
    monkeypatch.setenv("SQTPU_KERNEL_MAX_BATCH", "1024")
    assert min(ek._max_batch(), ek._FUSED_MAX_BATCH) == 256


@pytest.mark.parametrize("z_window", [False, True])
def test_fused_value_and_grad(batch, z_window):
    """Under differentiation the loss comes from the FUSED one-sweep
    kernel (custom_vjp fwd), not the loss-only kernel — its value must
    match the XLA path too, not just its gradient."""
    from sqtpu.ops.kernels.explicit import explicit_loss_pallas

    true_p, pred = batch
    ref_v = float(losses.explicit_loss(true_p, pred, 16))
    ref_g = np.asarray(jax.grad(
        lambda pp: losses.explicit_loss(true_p, pp, 16))(pred))
    v, g = jax.value_and_grad(
        lambda pp: explicit_loss_pallas(true_p, pp, 16,
                                        z_window=z_window))(pred)
    rel = 1e-3 if z_window else 1e-5
    assert float(v) == pytest.approx(ref_v, rel=rel)
    atol = 5e-4 if z_window else 1e-6
    np.testing.assert_allclose(np.asarray(g), ref_g, rtol=5e-3, atol=atol)
