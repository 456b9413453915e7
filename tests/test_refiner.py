"""Render-and-compare refiner (models/refiner.py): identity-at-init,
warm start, gradient flow, and delta semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.data.synthetic import sample_params
from sqtpu.models import build_model, params_vector
from sqtpu.models.refiner import IterativeSQ, apply_delta, warm_start_base
from sqtpu.models.resnet import ResNetSQ
from sqtpu.ops import quaternion as quat
from sqtpu.ops.render import render_depth_hard_batch

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def batch():
    labels = sample_params(jax.random.PRNGKey(11), 2)
    imgs = render_depth_hard_batch(labels, 64, n_sweep=24)[..., None]
    return imgs.astype(jnp.float32), labels.astype(jnp.float32)


@pytest.fixture(scope="module")
def model_and_vars(batch):
    imgs, _ = batch
    model = IterativeSQ(n_refine=2, n_sweep=16)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    return model, variables


def test_apply_delta_zero_is_identity(batch):
    _, labels = batch
    out = apply_delta(labels, jnp.zeros(labels.shape[:-1] + (11,)))
    # a is clipped into the loss-clamp box [0.05, 1]; everything inside
    # passes through exactly
    np.testing.assert_allclose(np.asarray(out[..., 3:]),
                               np.asarray(labels[..., 3:]), atol=1e-7)


def test_apply_delta_quat_stays_unit(batch):
    _, labels = batch
    d = jax.random.normal(jax.random.PRNGKey(1), labels.shape[:-1] + (11,))
    out = apply_delta(labels, d)
    n = jnp.linalg.norm(out[..., 8:12], axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-6)
    # ranges respected
    assert float(out[..., 0:3].min()) >= 0.05 - 1e-7
    assert float(out[..., 3:5].min()) >= 0.1 - 1e-7
    assert float(out[..., 5:8].max()) <= 1.0 + 1e-7


def test_identity_at_init_matches_base(batch, model_and_vars):
    """Zeros-initialized delta head => refined output == base output."""
    imgs, _ = batch
    model, variables = model_and_vars
    refined = params_vector(model.apply(variables, imgs, train=False))

    base = ResNetSQ()
    base_vars = {"params": variables["params"]["base"],
                 "batch_stats": variables["batch_stats"]["base"]}
    want = params_vector(base.apply(base_vars, imgs, train=False))
    np.testing.assert_allclose(np.asarray(refined), np.asarray(want),
                               atol=1e-6)


def test_registry_and_output_contract(batch):
    imgs, _ = batch
    model = build_model("refine_sq", n_refine=1, n_sweep=16)
    variables = model.init(jax.random.PRNGKey(2), imgs, train=False)
    out = model.apply(variables, imgs, train=False)
    assert isinstance(out, tuple) and len(out) == 4
    p = params_vector(out)
    assert p.shape == (imgs.shape[0], 12)
    assert bool(jnp.all(jnp.isfinite(p)))


def test_gradients_reach_both_base_and_corrector(batch, model_and_vars):
    imgs, labels = batch
    model, variables = model_and_vars

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"])
        p = params_vector(out)
        return jnp.mean((p - labels) ** 2)

    g = jax.grad(loss)(variables["params"])
    g_delta = g["refine"]["delta"]["kernel"]
    g_base = g["base"]["fc1"]["kernel"]
    assert float(jnp.abs(g_delta).max()) > 0.0
    assert float(jnp.abs(g_base).max()) > 0.0
    assert bool(jnp.all(jnp.isfinite(g_delta)))


def test_warm_start_base_loads_flagship_npz(tmp_path, batch,
                                            model_and_vars):
    from sqtpu.utils.checkpoint import save_weights_npz

    imgs, _ = batch
    model, variables = model_and_vars
    # a "flagship": freshly initialized ResNetSQ with distinct weights
    base = ResNetSQ()
    bv = base.init(jax.random.PRNGKey(33), imgs, train=False)
    npz = str(tmp_path / "flagship.npz")
    save_weights_npz(npz, {"params": bv["params"],
                           "batch_stats": bv["batch_stats"]},
                     dtype=jnp.float32)

    warm = warm_start_base(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, npz)
    got = warm["params"]["base"]["fc1"]["kernel"]
    want = bv["params"]["fc1"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-7)
    # corrector untouched (still the identity init)
    assert float(jnp.abs(
        warm["params"]["refine"]["delta"]["kernel"]).max()) == 0.0
    # warm-started model == flagship at step 0 (identity corrector)
    out = params_vector(model.apply(warm, imgs, train=False))
    want_out = params_vector(base.apply(bv, imgs, train=False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-6)


def test_refinement_actually_updates(batch, model_and_vars):
    """A nonzero delta head must move the prediction (the rendering +
    corrector path is live, not constant-folded away)."""
    imgs, _ = batch
    model, variables = model_and_vars
    p0 = params_vector(model.apply(variables, imgs, train=False))

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    k = params["refine"]["delta"]["kernel"]
    params["refine"]["delta"] = dict(
        params["refine"]["delta"],
        kernel=jnp.full_like(k, 0.01))
    p1 = params_vector(model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        imgs, train=False))
    assert float(jnp.abs(p1 - p0).max()) > 1e-4


def test_freeze_base_trains_only_corrector(batch):
    """--freeze-base: one train step must leave base params bit-identical
    while the corrector moves."""
    from sqtpu.training.loop import make_train_step
    from sqtpu.training.state import create_train_state
    from sqtpu.utils.config import TrainConfig

    imgs, labels = batch
    cfg = TrainConfig(model="refine_sq", loss="supervised_sym",
                      image_size=imgs.shape[1], batch_size=imgs.shape[0],
                      learning_rate=1e-3, freeze_base=True,
                      use_pallas=False, remat=False)
    model = build_model("refine_sq", n_refine=1, n_sweep=16)
    state = create_train_state(model, jax.random.PRNGKey(5), cfg)
    # snapshot before the step: donation invalidates the old buffers
    b0 = np.asarray(state.params["base"]["fc1"]["kernel"])
    # at the identity init only the delta head sees gradient (the rest
    # of the corrector's upstream flows through the still-zero kernel)
    r0 = np.asarray(state.params["refine"]["delta"]["kernel"])
    step = make_train_step(model, cfg)
    new_state, loss = step(state, imgs, labels)
    assert bool(jnp.isfinite(loss))
    b1 = np.asarray(new_state.params["base"]["fc1"]["kernel"])
    np.testing.assert_array_equal(b0, b1)
    r1 = np.asarray(new_state.params["refine"]["delta"]["kernel"])
    assert float(np.abs(r1 - r0).max()) > 0.0
