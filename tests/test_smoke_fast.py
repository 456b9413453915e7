"""Fast-tier parallelism / kernel smokes (NOT slow-marked).

The heavy parity suites (tests/test_parallel.py, test_kernels*.py,
test_loop_gridsharded.py) are all ``slow``-marked, so the quick pass
(``-m "not slow"``) used to exercise zero mesh / shard_map / Pallas
plumbing — an import or dispatch regression there would not show up
until the slow tier ran (round-4 verdict, weak #5).  These smokes use
tiny shapes (2 devices, 8–16³ grids) and assert only plumbing-level
facts; numerical parity stays in the slow tier.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import losses
from sqtpu.ops import quaternion as quat
from sqtpu.parallel.mesh import batch_sharding, make_mesh
from sqtpu.parallel.sharded_losses import implicit_loss_gridsharded


@pytest.fixture(scope="module")
def tiny_batch():
    key = jax.random.PRNGKey(3)
    ka, ke, kt, kq = jax.random.split(key, 4)
    b = 2
    a = jax.random.uniform(ka, (b, 3), jnp.float32, 25 / 255, 75 / 255)
    e = jax.random.uniform(ke, (b, 2), jnp.float32, 0.1, 1.0)
    t = jax.random.uniform(kt, (b, 3), jnp.float32, 88 / 255, 168 / 255)
    q = quat.random_uniform(kq, (b,), jnp.float32)
    p = jnp.concatenate([a, e, t, q], axis=-1)
    imgs = jnp.zeros((b, 16, 16), jnp.float32).at[:, 4:12, 4:12].set(0.5)
    return imgs, p


def test_mesh_and_batch_sharding_smoke(tiny_batch):
    imgs, _ = tiny_batch
    mesh = make_mesh(n_data=2, n_grid=1, devices=jax.devices()[:2])
    assert mesh.axis_names == ("data", "grid")
    sharded = jax.device_put(imgs, batch_sharding(mesh))
    assert len(sharded.sharding.device_set) == 2
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(imgs))


def test_gridsharded_loss_smoke(tiny_batch):
    """shard_map'd DPxSP loss dispatches and agrees loosely with the
    plain implementation on a tiny 16^3 grid (tight parity: slow tier)."""
    imgs, p = tiny_batch
    mesh = make_mesh(n_data=2, n_grid=2, devices=jax.devices()[:4])
    want = float(losses.implicit_loss(imgs, p, 16, 1.5, 260.0))
    got = float(implicit_loss_gridsharded(imgs, p, mesh, 16, 1.5, 260.0))
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=1e-4)


def test_pallas_interpret_dispatch_smoke(tiny_batch, monkeypatch):
    """Fused implicit kernel dispatches in interpret mode on CPU."""
    monkeypatch.setenv("SQTPU_PALLAS_INTERPRET", "1")
    from sqtpu.ops.kernels.implicit import implicit_loss_pallas

    imgs, p = tiny_batch
    got = float(implicit_loss_pallas(imgs.astype(jnp.float32),
                                     p.astype(jnp.float32), 16, 1.5, 260.0))
    want = float(losses.implicit_loss(imgs, p, 16, 1.5, 260.0))
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=1e-3)


def test_refiner_dispatch_smoke():
    """IterativeSQ (render-and-compare corrector) builds and runs one
    tiny forward pass — catches plumbing regressions in the in-graph
    render + delta chain without the slow tier's 256^2 renders."""
    from sqtpu.models.refiner import IterativeSQ

    model = IterativeSQ(n_refine=1, fcn=16, n_sweep=8)
    x = jnp.zeros((2, 32, 32, 1), jnp.float32).at[:, 8:24, 8:24].set(0.4)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    size, shape, pos, rot = model.apply(variables, x, train=False)
    assert size.shape == (2, 3) and shape.shape == (2, 2)
    assert pos.shape == (2, 3) and rot.shape == (2, 4)
    out = np.concatenate([np.asarray(size), np.asarray(shape),
                          np.asarray(pos), np.asarray(rot)], axis=-1)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rot), axis=-1),
                               1.0, rtol=1e-5)


def test_make_batch_dp_smoke(monkeypatch):
    monkeypatch.setenv("SQTPU_PALLAS_INTERPRET", "1")
    from sqtpu.parallel.sharded_losses import make_batch_dp

    mesh = make_mesh(n_data=2, n_grid=1, devices=jax.devices()[:2])
    with mesh:
        imgs, labels = jax.jit(
            lambda k: make_batch_dp(k, 4, mesh, 16, "hard"))(
                jax.random.PRNGKey(5))
    assert imgs.shape == (4, 16, 16, 1) and labels.shape == (4, 12)
    assert np.isfinite(np.asarray(imgs)).all()


def test_grad_clip_optimizer_jit_smoke():
    """make_optimizer(grad_clip>0) must build a transform whose injected
    hyperparams work UNDER JIT for both adam and adamw — the first cut
    branched on a traced weight_decay inside the injected fn and crashed
    at step-trace time (TracerBoolConversionError)."""
    import optax

    from sqtpu.training.state import make_optimizer

    for wd in (0.0, 1e-4):
        tx = make_optimizer(1e-4, wd, grad_clip=1.0)
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)

        @jax.jit
        def step(opt_state, params):
            grads = {"w": jnp.full((3,), 100.0)}
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params2, opt_state = step(opt_state, params)
        # global-norm clip to 1.0 bounds the Adam step to ~lr per coord
        assert float(jnp.abs(params2["w"] - params["w"]).max()) < 3e-4
        assert float(opt_state.hyperparams["learning_rate"]) > 0


def test_keras_rot_fixed_neutral_init():
    """The fixed 2019 head must START at the neutral shape: mid-range
    sigmoid blocks and an identity quaternion (the anti-saturation
    repair; a default-init Dense(12) collapses to the shrink-to-sliver
    spurious minimum under the explicit loss — runs/krf_train.log)."""
    from sqtpu.models import build_model

    model = build_model("keras_rot_fixed")
    x = jnp.zeros((2, 64, 64, 1), jnp.float32).at[:, 16:48, 16:48].set(0.5)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pred = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(pred[:, :8], 0.5, atol=0.05)
    np.testing.assert_allclose(
        pred[:, 8:12], np.tile([0.0, 0.0, 0.0, 1.0], (2, 1)), atol=0.05)
