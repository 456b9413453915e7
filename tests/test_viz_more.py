"""Extra viz / evaluate coverage: loss-landscape branches, single-image CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import quaternion as quat

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def base_p():
    p = jnp.asarray([0.18, 0.11, 0.26, 0.65, 0.15, 0.5, 0.5, 0.5,
                     -0.45, -0.24, 0.78, -0.35], dtype=jnp.float64)
    return p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))


@pytest.mark.parametrize("loss_name", ["implicit", "quaternion"])
def test_slerp_sweep_other_losses(base_p, loss_name, tmp_path):
    from sqtpu.viz import slerp_sweep

    q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64)
    q1 = quat.random_uniform(jax.random.PRNGKey(3), (), jnp.float64)
    angs, ls, ious = slerp_sweep(base_p, q0, q1, loss_name, n=8,
                                 render_size=16)
    assert np.all(np.isfinite(ls)) and np.all(np.isfinite(ious))
    assert len(angs) == 8


def test_quaternion_loss_minimum_at_true_rotation(base_p):
    """Landscape sanity: the quaternion loss is minimal at the true
    orientation along a slerp through it."""
    from sqtpu.viz import slerp_sweep

    q_true = base_p[8:12]
    q_far = quat.random_uniform(jax.random.PRNGKey(9), (), jnp.float64)
    angs, ls, _ = slerp_sweep(base_p, q_true, q_far, "quaternion", n=16,
                              render_size=8)
    assert np.argmin(ls) == 0  # t=0 is exactly q_true


def test_eval_single_cli(tmp_path, capsys):
    from sqtpu.data.bmp import write_bmp
    from sqtpu.evaluate import eval_single
    from sqtpu.utils.config import EvalConfig

    img = (np.random.default_rng(0).uniform(0, 1, (32, 32)) * 255
           ).astype(np.uint8)
    path = str(tmp_path / "in.bmp")
    write_bmp(path, img)
    cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), image_size=32)
    pred = eval_single(cfg, path)
    assert pred.shape == (12,)
    out = capsys.readouterr().out
    assert "Size a:" in out and "Rotation q:" in out


def test_voxel_scatter_all_modes(base_p, tmp_path):
    """One artifact per plot_render display mode (helpers.py:117-133)."""
    from sqtpu.viz import PLOT_RENDER_MODES, voxel_scatter

    for mode in PLOT_RENDER_MODES:
        out = tmp_path / f"vox_{mode}.png"
        voxel_scatter(base_p, str(out), n=10, mode=mode)
        assert out.exists() and out.stat().st_size > 1000
    with pytest.raises(ValueError):
        voxel_scatter(base_p, str(tmp_path / "x.png"), n=8, mode="nope")


def test_plot_points(base_p, tmp_path):
    from sqtpu.ops.geometry import sample_surface
    from sqtpu.viz import plot_points

    pts = sample_surface(base_p, n_theta=8, n_gamma=4)
    out = tmp_path / "points.png"
    plot_points(pts, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_fit_view(base_p, tmp_path):
    """Headless visu.py fitting-window equivalent: panels render, fit
    loss decreases across frames."""
    from sqtpu.utils.config import FitConfig
    from sqtpu.viz import fit_view

    cfg = FitConfig(loss="explicit", render_size=12, steps=60,
                    learning_rate=5e-3, optimizer="adam", seed=1)
    out = tmp_path / "fitview.png"
    frames = fit_view(cfg, base_p.astype(jnp.float32), str(out), n_frames=3)
    assert out.exists() and out.stat().st_size > 1000
    assert len(frames) == 3


def test_eval_random_iso_model(tmp_path):
    """2019-family eval: 8-param keras_iso model through eval_random
    (py/test_isometry.py protocol — fixed view quat padded in)."""
    from sqtpu.evaluate import eval_random
    from sqtpu.utils.config import EvalConfig

    cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), model="keras_iso",
                     iso=True, n=4, batch_size=2, image_size=32,
                     acc_render_size=16, out_dir=str(tmp_path / "out"))
    res = eval_random(cfg)
    assert np.isfinite(res["full_iou_mean"])
    assert len(res["param_mae"]) == 12
    assert np.allclose(res["param_mae"][8:], 0.0, atol=1e-6)  # padded quat


def test_eval_random_iso_guard(tmp_path):
    """8-param models must demand --iso: padding the true quat into a
    random-view eval would report fake-perfect rotation."""
    from sqtpu.evaluate import eval_random
    from sqtpu.utils.config import EvalConfig

    cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), model="keras_iso",
                     iso=False, n=2, batch_size=2, image_size=32,
                     acc_render_size=16, out_dir=str(tmp_path / "out"))
    with pytest.raises(ValueError, match="iso"):
        eval_random(cfg)

def test_fit_animation(base_p, tmp_path):
    """Animated playback of the GD fit (torch/visu.py:96-141 live-window
    equivalent): self-contained HTML with per-step frames, loss falls."""
    from sqtpu.utils.config import FitConfig
    from sqtpu.viz import fit_animation

    cfg = FitConfig(loss="explicit", render_size=12, steps=80,
                    learning_rate=5e-3, optimizer="adam", seed=1)
    out = tmp_path / "fit.html"
    losses = fit_animation(cfg, base_p.astype(jnp.float32), str(out),
                           n_frames=4)
    html = out.read_text()
    assert html.count("data:image/png") == 1  # one <img>, injected via JS
    assert html.count('"iVBOR') == 4          # 4 base64 PNG frames
    assert losses[-1] < losses[0]
