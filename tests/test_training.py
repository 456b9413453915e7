"""Training-layer tests: scheduler, state, checkpointing, one real step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.models import ResNetSQ
from sqtpu.training.loop import make_eval_step, make_train_step
from sqtpu.training.lr import ReduceLROnPlateau, step_schedule_2019
from sqtpu.training.state import create_train_state, get_lr, set_lr
from sqtpu.utils.checkpoint import load_checkpoint, save_checkpoint
from sqtpu.utils.config import TrainConfig

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


class TestReduceLROnPlateau:
    def test_reduces_after_patience(self):
        s = ReduceLROnPlateau(lr=1e-4, patience=2, factor=0.1)
        assert s.step(1.0) == 1e-4        # first: becomes best
        assert s.step(1.0) == 1e-4        # bad 1
        assert s.step(1.0) == 1e-4        # bad 2
        assert s.step(1.0) == pytest.approx(1e-5)  # bad 3 > patience: reduce

    def test_improvement_resets(self):
        s = ReduceLROnPlateau(lr=1e-4, patience=1)
        s.step(1.0)
        s.step(1.0)
        assert s.step(0.5) == 1e-4        # improvement: no reduction
        assert s.bad_epochs == 0

    def test_relative_threshold(self):
        s = ReduceLROnPlateau(lr=1e-3, patience=0, threshold=1e-4)
        s.step(1.0)
        # an improvement smaller than 0.01% counts as a plateau
        assert s.step(0.99999) == pytest.approx(1e-4)


def test_step_schedule_2019():
    assert step_schedule_2019(0) == 1e-3
    assert step_schedule_2019(249) == 1e-3
    assert step_schedule_2019(250) == 1e-4
    assert step_schedule_2019(500) == 1e-5


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = TrainConfig(image_size=32, render_size=8, acc_render_size=16,
                      batch_size=2, use_pallas=False, donate=False)
    model = ResNetSQ()
    state = create_train_state(model, jax.random.PRNGKey(0), cfg,
                               input_shape=(1, 32, 32, 1))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1),
                              jnp.float32)
    labels = jnp.tile(jnp.asarray(
        [[0.2, 0.2, 0.2, 0.5, 0.5, 0.5, 0.5, 0.5, 0, 0, 0, 1]],
        jnp.float32), (2, 1))
    return cfg, model, state, imgs, labels


def test_lr_get_set(tiny_setup):
    _, _, state, _, _ = tiny_setup
    assert get_lr(state) == pytest.approx(1e-4)
    state2 = set_lr(state, 1e-5)
    assert get_lr(state2) == pytest.approx(1e-5)


def test_train_step_updates_params_and_stats(tiny_setup):
    cfg, model, state, imgs, labels = tiny_setup
    step = make_train_step(model, cfg, mesh=None)
    new_state, loss = step(state, imgs, labels)
    assert np.isfinite(float(loss))
    # params moved
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    after = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert not np.allclose(before, after)
    # bn stats moved
    b = np.asarray(state.batch_stats["encoder"]["bn1"]["mean"])
    a = np.asarray(new_state.batch_stats["encoder"]["bn1"]["mean"])
    assert not np.allclose(b, a)
    assert int(new_state.step) == int(state.step) + 1


def test_train_step_loss_decreases_over_steps(tiny_setup):
    cfg, model, state, imgs, labels = tiny_setup
    step = make_train_step(model, cfg, mesh=None)
    first = None
    for _ in range(8):
        state, loss = step(state, imgs, labels)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_eval_step(tiny_setup):
    cfg, model, state, imgs, labels = tiny_setup
    estep = make_eval_step(model, cfg, mesh=None)
    loss, acc, ang, pred = estep(state, imgs, labels)
    assert np.isfinite(float(ang))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0
    assert pred.shape == (2, 12)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    cfg, model, state, imgs, labels = tiny_setup
    step = make_train_step(model, cfg, mesh=None)
    state, _ = step(state, imgs, labels)
    history = {"loss": [0.5, 0.4], "val_loss": [0.6], "val_acc": [0.1]}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, history, epoch=7)

    fresh = create_train_state(model, jax.random.PRNGKey(42), cfg,
                               input_shape=(1, 32, 32, 1))
    restored, hist, epoch = load_checkpoint(path, fresh)
    assert epoch == 7
    assert hist["loss"] == [0.5, 0.4]
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_checkpoint_meta_embeds_config(tiny_setup, tmp_path):
    # The sidecar meta.json must carry the training recipe: a VM reset
    # once wiped an uncommitted run log, leaving a converged checkpoint
    # with no record of the flags that produced it.
    import json

    cfg, model, state, imgs, labels = tiny_setup
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, {"loss": [0.5]}, epoch=3, config=cfg)
    meta = json.load(open(path + ".meta.json"))
    assert meta["config"]["model"] == cfg.model
    assert meta["config"]["loss"] == cfg.loss
    assert meta["config"]["render_size"] == cfg.render_size
    # every scalar field of the dataclass must survive the round-trip
    import dataclasses

    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if isinstance(v, (str, int, float, bool, type(None))):
            assert meta["config"][f.name] == v


def test_synthetic_batch_shapes():
    from sqtpu.data.synthetic import make_batch, sample_params

    imgs, labels = make_batch(jax.random.PRNGKey(0), 4, 32, "hard")
    assert imgs.shape == (4, 32, 32, 1)
    assert labels.shape == (4, 12)
    a = np.asarray(imgs)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert a.max() > 0.1  # objects actually rendered

    p = np.asarray(sample_params(jax.random.PRNGKey(1), 256,
                                 dtype=jnp.float64))
    assert p[:, 0:3].min() >= 25 / 255 and p[:, 0:3].max() <= 75 / 255
    assert p[:, 3:5].min() >= 0.1 and p[:, 3:5].max() <= 1.0
    assert p[:, 5:8].min() >= 88 / 255 and p[:, 5:8].max() <= 168 / 255
    np.testing.assert_allclose(np.linalg.norm(p[:, 8:12], axis=-1), 1.0,
                               atol=1e-6)

    imgs_iso, labels_iso = make_batch(jax.random.PRNGKey(2), 2, 32, "hard",
                                      iso=True)
    np.testing.assert_allclose(
        np.asarray(labels_iso[:, 8:12]),
        np.tile(np.array([1, 1, 1, 0]) / np.sqrt(3), (2, 1)), atol=1e-6)


def test_nan_policy_skip_preserves_state(tiny_setup):
    """nan_policy='skip' must discard the whole update in-graph (with
    donation the pre-update state no longer exists host-side)."""
    cfg, model, state, imgs, labels = tiny_setup
    cfg_skip = TrainConfig(**{**cfg.__dict__, "nan_policy": "skip"})
    step = make_train_step(model, cfg_skip, mesh=None)
    bad_imgs = imgs.at[0, 0, 0, 0].set(jnp.nan)
    new_state, loss = step(state, bad_imgs, labels)
    assert not np.isfinite(float(loss))
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    after = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    np.testing.assert_array_equal(before, after)       # update discarded
    assert int(new_state.step) == int(state.step)       # step not advanced
    # a good batch still updates
    new_state2, loss2 = step(new_state, imgs, labels)
    assert np.isfinite(float(loss2))
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(new_state2.params)[0]), before)


@pytest.mark.parametrize("loss_name", ["supervised_sym", "implicit_sym",
                                       "supervised_geo", "keras_chamfer",
                                       "supervised_gauge", "explicit_gauge",
                                       "implicit_gauge"])
def test_new_loss_selections_train(tiny_setup, loss_name):
    """The rotation-recipe losses — and the 2019 rotation regime's
    keras_chamfer (py/train_rotation.py:36-40 under
    py/loss_functions.py:91-101) — must compile and produce finite grads
    in the full train step."""
    import dataclasses
    cfg, model, state, imgs, labels = tiny_setup
    cfg2 = dataclasses.replace(cfg, loss=loss_name, aux_weight=0.05)
    step = make_train_step(model, cfg2)
    new_state, loss = step(state, imgs, labels)
    assert np.isfinite(float(loss))
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
        new_state.params, state.params)
    assert any(jax.tree_util.tree_leaves(moved))


def test_elongation_weighting():
    """elong_weight > 0 reweights supervised per-sample losses toward
    elongated shapes; a uniform-elongation batch is unaffected (weights
    normalize to mean 1)."""
    import dataclasses
    from sqtpu.training.loop import _compute_loss

    cfg = TrainConfig(loss="supervised_sym")
    labels = jnp.asarray(
        [[0.1, 0.1, 0.1, 0.5, 0.5, 0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 1.0],
         [0.3, 0.1, 0.1, 0.5, 0.5, 0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 1.0]])
    pred = labels.at[0, 0].add(0.05).at[1, 0].add(0.05)
    base = float(_compute_loss(cfg, pred, None, labels))
    cfgw = dataclasses.replace(cfg, elong_weight=2.0)
    weighted = float(_compute_loss(cfgw, pred, None, labels))
    # sample 1 (elongation 3) carries the same error as sample 0
    # (elongation 1) -> upweighting it must NOT change the mean here...
    assert weighted == pytest.approx(base, rel=1e-6)
    # ...but when only the ELONGATED sample errs, the weighted loss rises
    pred2 = labels.at[1, 0].add(0.1)
    base2 = float(_compute_loss(cfg, pred2, None, labels))
    weighted2 = float(_compute_loss(cfgw, pred2, None, labels))
    assert weighted2 > base2 * 1.2
    # uniform elongation: weighting is a no-op
    labels_u = jnp.tile(labels[:1], (2, 1))
    pred_u = labels_u.at[0, 0].add(0.1)
    assert float(_compute_loss(cfgw, pred_u, None, labels_u)) == \
        pytest.approx(float(_compute_loss(cfg, pred_u, None, labels_u)),
                      rel=1e-6)


def test_remat_train_step_matches(tiny_setup):
    """jax.checkpoint'd step: identical loss, finite grads."""
    import dataclasses
    cfg, model, state, imgs, labels = tiny_setup
    step = make_train_step(model, cfg)
    step_r = make_train_step(model, dataclasses.replace(cfg, remat=True))
    _, loss = step(state, imgs, labels)
    new_state, loss_r = step_r(state, imgs, labels)
    assert float(loss_r) == pytest.approx(float(loss), rel=1e-6)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(new_state.params))


def test_rotation_only_model_trains(tiny_setup):
    """GenericNetSQ (rotation-only experiments, torch/models.py:125-169)
    trains with the quaternion losses and evaluates via sym-angle."""
    import dataclasses
    from sqtpu.models import GenericNetSQ

    cfg, _, _, imgs, labels = tiny_setup
    cfg2 = dataclasses.replace(cfg, model="generic_sq",
                               loss="quaternion_sym")
    model = GenericNetSQ()
    state = create_train_state(model, jax.random.PRNGKey(0), cfg2,
                               input_shape=(1, 32, 32, 1))
    step = make_train_step(model, cfg2)
    new_state, loss = step(state, imgs, labels)
    assert np.isfinite(float(loss))
    estep = make_eval_step(model, cfg2)
    l, acc, ang, pred = estep(new_state, imgs, labels)
    assert pred.shape == (2, 4)
    assert 0.0 <= float(ang) <= np.pi
    # reference-shape quaternion loss path too
    cfg3 = dataclasses.replace(cfg2, loss="quaternion")
    _, loss3 = make_train_step(model, cfg3)(state, imgs, labels)
    assert np.isfinite(float(loss3))


def test_weights_npz_roundtrip(tmp_path):
    """Portable fp16 weights artifact: save -> load restores the model
    variables to fp16 precision, and the evaluate npz-loading path
    produces identical predictions."""
    import numpy as np
    from sqtpu.models import build_model
    from sqtpu.training.state import create_train_state
    from sqtpu.utils.checkpoint import load_weights_npz, save_weights_npz
    from sqtpu.utils.config import TrainConfig

    model = build_model("resnet_sq")
    state = create_train_state(model, jax.random.PRNGKey(3), TrainConfig())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "w.npz")
    save_weights_npz(path, variables)
    restored = load_weights_npz(path, variables)
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.dtype == y.dtype and x.shape == y.shape
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-4)
