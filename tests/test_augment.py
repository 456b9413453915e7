"""Depth-noise model tests (sqtpu.data.augment) + eval wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from sqtpu.data.augment import depth_noise


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
