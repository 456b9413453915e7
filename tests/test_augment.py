"""Depth-noise model tests (sqtpu.data.augment) + eval wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from sqtpu.data.augment import depth_noise

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


def _img(batch=2, size=32):
    # synthetic depth map: central square object at depth 0.5
    img = np.zeros((batch, size, size), np.float32)
    img[:, 8:24, 8:24] = 0.5
    return jnp.asarray(img)


def test_noop_is_identity():
    img = _img()
    out = depth_noise(jax.random.PRNGKey(0), img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_gaussian_object_only():
    img = _img()
    out = np.asarray(depth_noise(jax.random.PRNGKey(1), img, gaussian=0.02))
    obj = np.asarray(img) > 0
    assert (out[~obj] == 0).all()          # background untouched
    assert (out[obj] > 0).all()            # object pixels stay object
    d = out[obj] - 0.5
    assert 0.01 < d.std() < 0.03           # roughly the requested std
    assert abs(d.mean()) < 0.01


def test_dropout_rate_and_salt():
    img = _img(size=64)
    out = np.asarray(depth_noise(jax.random.PRNGKey(2), img, dropout=0.3))
    obj = np.asarray(img) > 0
    dropped = (out[obj] == 0).mean()
    assert 0.2 < dropped < 0.4

    out = np.asarray(depth_noise(jax.random.PRNGKey(3), img, salt=0.1))
    flying = (out[~obj] > 0).mean()
    assert 0.05 < flying < 0.15
    assert (out[~obj][out[~obj] > 0] >= 1 / 255 - 1e-7).all()


def test_quantize_lattice():
    img = _img() * 0.777
    out = np.asarray(depth_noise(jax.random.PRNGKey(4), img,
                                 gaussian=0.01, quantize=True))
    np.testing.assert_allclose(out * 255, np.round(out * 255), atol=1e-4)


def test_jit_and_grad_safe():
    img = _img()
    f = jax.jit(lambda k, x: depth_noise(k, x, gaussian=0.01, dropout=0.1,
                                         salt=0.01).sum())
    val = f(jax.random.PRNGKey(5), img)
    assert np.isfinite(float(val))


def test_eval_random_noise_flag(tmp_path):
    # the full protocol with noise enabled runs end to end (random-init
    # model, tiny n — a smoke of the evaluate wiring, CPU)
    from sqtpu.evaluate import eval_random
    from sqtpu.utils.config import EvalConfig

    cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), n=4, batch_size=4,
                     acc_render_size=16, image_size=64,
                     out_dir=str(tmp_path / "out"),
                     noise_gaussian=0.02, noise_dropout=0.1)
    res = eval_random(cfg)
    assert np.isfinite(res["full_iou_mean"])


def test_eval_random_input_filter(tmp_path):
    # --input-filter median: deployment-style sensor preprocessing of
    # the model input; same seed => same shapes as the unfiltered run
    from sqtpu.evaluate import eval_random
    from sqtpu.utils.config import EvalConfig

    cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), n=4, batch_size=4,
                     acc_render_size=16, image_size=64,
                     out_dir=str(tmp_path / "out"),
                     noise_dropout=0.2, noise_salt=0.005,
                     input_filter="median")
    res = eval_random(cfg)
    assert np.isfinite(res["full_iou_mean"])


def test_depth_noise_traced_magnitudes():
    # domain randomization: magnitudes as traced per-sample arrays
    import jax
    import jax.numpy as jnp
    from sqtpu.data.augment import depth_noise

    imgs = jnp.ones((4, 16, 16)) * 0.5
    imgs = imgs.at[:, :2].set(0.0)  # some background

    @jax.jit
    def f(k, g, d, s):
        return depth_noise(k, imgs, gaussian=g, dropout=d, salt=s)

    k = jax.random.PRNGKey(0)
    g = jnp.asarray([0.0, 0.01, 0.02, 0.03]).reshape(4, 1, 1)
    d = jnp.asarray([0.0, 0.1, 0.2, 0.3]).reshape(4, 1, 1)
    s = jnp.asarray([0.0, 0.005, 0.01, 0.02]).reshape(4, 1, 1)
    out = f(k, g, d, s)
    assert out.shape == imgs.shape
    # sample 0 has all-zero magnitudes -> untouched
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(imgs[0]))
    # sample 3 must differ (dropout 0.3 on a 14x16 object region)
    assert float(jnp.mean(out[3] != imgs[3])) > 0.05


def test_train_with_randomized_augmentation():
    from sqtpu.training.loop import train
    from sqtpu.utils.config import TrainConfig

    _, hist = train(TrainConfig(
        max_epochs=1, steps_per_epoch=2, val_steps=1, batch_size=4,
        image_size=32, render_size=16, acc_render_size=16,
        loss="supervised", use_pallas=False, donate=False, ckpt_dir="",
        log_interval=100, augment_gaussian=0.02, augment_dropout=0.2,
        augment_salt=0.005, augment_randomize=True),
        synthetic_size=8)
    assert np.isfinite(hist["loss"]).all()
