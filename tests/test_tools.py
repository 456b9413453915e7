"""Tests for fit / evaluate / scan / viz entry-point layers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import metrics
from sqtpu.ops.render import render_depth_hard
from sqtpu.utils.config import EvalConfig, FitConfig

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def true_setup():
    p = jnp.asarray([0.18, 0.22, 0.15, 0.5, 0.7, 0.5, 0.45, 0.55,
                     0.2, -0.1, 0.3, 0.92], dtype=jnp.float32)
    p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
    img = render_depth_hard(p, 128, n_bisect=12, quantize=True)
    return p, img


class TestGDFit:
    def test_explicit_fit_converges(self, true_setup):
        from sqtpu.fit import gd_fit

        p_true, _ = true_setup
        cfg = FitConfig(loss="explicit", render_size=16, steps=300,
                        learning_rate=5e-3, optimizer="adam")
        # start from a perturbed copy
        p0 = p_true + jnp.asarray(
            [0.05, -0.04, 0.03, 0.1, -0.1, 0.04, -0.05, 0.03, 0, 0, 0, 0],
            jnp.float32)
        p_fit, hist = gd_fit(cfg, target_params=p_true, p0=p0)
        assert float(hist[-1]) < float(hist[0]) * 0.2
        iou = float(metrics.iou(p_true[None].astype(jnp.float64),
                                p_fit[None].astype(jnp.float64), 32))
        assert iou > 0.9

    def test_sgd_parity_path_runs(self, true_setup):
        from sqtpu.fit import gd_fit

        p_true, img = true_setup
        cfg = FitConfig(loss="implicit", render_size=16, steps=50,
                        learning_rate=1e-3, optimizer="sgd")
        p_fit, hist = gd_fit(cfg, target_image=img)
        assert np.all(np.isfinite(np.asarray(hist)))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(p_fit[8:12])), 1.0, atol=1e-5)


class TestClassicalRecovery:
    def test_moments_init_reasonable(self, true_setup):
        from sqtpu.fit import image_points, moments_init

        p_true, img = true_setup
        pts, mask = image_points(img, 64)
        p0 = moments_init(pts, mask)
        # centroid lands near the (visible) object center
        np.testing.assert_allclose(np.asarray(p0[5:8]),
                                   np.asarray(p_true[5:8]), atol=0.25)

    def test_lm_recover_improves_iou(self, true_setup):
        from sqtpu.fit import image_points, moments_init, recover

        p_true, img = true_setup
        pts, mask = image_points(img, 64)
        p0 = moments_init(pts, mask)
        p_fit, hist = recover(img, n_points=64, iters=30)
        iou0 = float(metrics.iou(p_true[None].astype(jnp.float64),
                                 p0[None].astype(jnp.float64), 32))
        iou1 = float(metrics.iou(p_true[None].astype(jnp.float64),
                                 p_fit[None].astype(jnp.float64), 32))
        assert float(hist[-1]) <= float(hist[0])
        assert iou1 > iou0
        assert iou1 > 0.5

    @pytest.mark.parametrize("method", ["lm", "gd", "lm+gd"])
    def test_refine_params_improves_iou(self, true_setup, method):
        """CNN-init + classical-polish hybrid: from a perturbed estimate,
        refinement against the depth image must raise IoU."""
        from sqtpu.fit import refine_params

        p_true, img = true_setup
        p0 = p_true + jnp.asarray(
            [0.04, -0.04, 0.03, 0.08, -0.08, 0.02, -0.02, 0.02,
             0.05, -0.05, 0.0, 0.0], jnp.float32)
        p0 = p0.at[8:12].set(p0[8:12] / jnp.linalg.norm(p0[8:12]))
        p_ref = refine_params(img[None], p0[None], method=method,
                              steps=25, n=32, lr=5e-3)[0]
        iou0 = float(metrics.iou(p_true[None].astype(jnp.float64),
                                 p0[None].astype(jnp.float64), 32))
        iou1 = float(metrics.iou(p_true[None].astype(jnp.float64),
                                 p_ref[None].astype(jnp.float64), 32))
        assert np.all(np.isfinite(np.asarray(p_ref)))
        assert iou1 > iou0


class TestScanCLI:
    def test_matches_reference_bmp(self, tmp_path, example_labels):
        """The scan CLI must reproduce the shipped scanner BMP ~byte-exactly
        from the same 18-argument command line."""
        from sqtpu.data.bmp import read_bmp
        from sqtpu.ops import quaternion as quat
        from sqtpu.scan import render_from_cli_args

        names, labels = example_labels
        p = labels[0]
        a, e, t = p[0:3] * 255, p[3:5], p[5:8] * 255
        M = np.asarray(quat.to_matrix(jnp.asarray(p[8:12] /
                                                  np.linalg.norm(p[8:12]))))
        args = [str(tmp_path / "o.bmp")] + [
            "%f" % v for v in np.concatenate([a, e, t, M.ravel()])]
        _, img = render_from_cli_args(args)
        ref = read_bmp("/root/reference/data/example_imgs/000000.bmp")
        mismatch = (np.abs(img.astype(int) - ref.astype(int)) > 1).mean()
        assert mismatch < 1e-3

    def test_usage_error(self):
        from sqtpu.scan import render_from_cli_args

        with pytest.raises(SystemExit):
            render_from_cli_args(["only", "three", "args"])


class TestEvaluate:
    def test_eval_random_tiny(self, tmp_path):
        from sqtpu.evaluate import eval_random

        cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), n=4, batch_size=2,
                         acc_render_size=16, image_size=32, save_pairs=1,
                         out_dir=str(tmp_path / "out"))
        res = eval_random(cfg)
        assert 0.0 <= res["full_iou_mean"] <= 1.0
        assert os.path.exists(tmp_path / "out" / "results.txt")
        assert os.path.exists(tmp_path / "out" / "accs.npz")
        assert os.path.exists(tmp_path / "out" / "0_true.bmp")
        data = np.load(tmp_path / "out" / "accs.npz")
        assert data["full_iou"].shape == (4,)
        assert data["mae"].shape == (4, 12)

    def test_eval_random_with_refine(self, tmp_path):
        from sqtpu.evaluate import eval_random

        cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), n=2, batch_size=2,
                         acc_render_size=16, image_size=32,
                         out_dir=str(tmp_path / "out"),
                         refine="lm", refine_steps=5, refine_size=16)
        res = eval_random(cfg)
        assert 0.0 <= res["full_iou_mean"] <= 1.0

    def test_eval_random_classical(self, tmp_path):
        # --model classical: no-CNN baseline (moments init + L-M); must
        # beat a random-init network by a wide margin on the same protocol
        from sqtpu.evaluate import eval_random

        cfg = EvalConfig(ckpt_dir=str(tmp_path / "none"), model="classical",
                         n=4, batch_size=2, acc_render_size=24,
                         image_size=64, out_dir=str(tmp_path / "out"),
                         refine_steps=20, refine_size=32)
        res = eval_random(cfg)
        assert res["full_iou_mean"] > 0.3
        assert os.path.exists(tmp_path / "out" / "accs.npz")


class TestViz:
    def test_slerp_sweep(self, tmp_path):
        from sqtpu.ops import quaternion as quat
        from sqtpu.viz import slerp_sweep

        p = jnp.asarray([0.18, 0.11, 0.26, 0.65, 0.15, 0.5, 0.5, 0.5,
                         -0.45, -0.24, 0.78, -0.35], dtype=jnp.float64)
        p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
        q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64)
        q1 = quat.random_uniform(jax.random.PRNGKey(0), (), jnp.float64)
        png = str(tmp_path / "sweep.png")
        angs, ls, ious = slerp_sweep(p, q0, q1, "explicit", n=16,
                                     render_size=16, out_png=png)
        assert len(angs) == 16 and np.all(np.isfinite(ls))
        # identical rotation -> maximal IoU at the sweep point closest to q_true
        assert os.path.getsize(png) > 0

    def test_grad_flow_plot(self, tmp_path):
        from sqtpu.viz import plot_grad_flow

        grads = {"layer1": {"kernel": jnp.ones((3, 3)) * 0.1,
                            "bias": jnp.ones((3,))},
                 "layer2": {"kernel": jnp.ones((3, 3)) * 0.01}}
        png = str(tmp_path / "gf.png")
        names, means, maxs = plot_grad_flow(grads, png)
        assert "layer1/kernel" in names and "layer2/kernel" in names
        assert all("bias" not in n for n in names)
        assert os.path.getsize(png) > 0

    def test_depth_grid_and_voxel(self, tmp_path, true_setup):
        from sqtpu.viz import depth_grid, voxel_scatter

        p, img = true_setup
        depth_grid([np.asarray(img)], [np.asarray(img)],
                   str(tmp_path / "grid.png"))
        voxel_scatter(p, str(tmp_path / "vox.png"), n=12)
        assert os.path.getsize(tmp_path / "grid.png") > 0
        assert os.path.getsize(tmp_path / "vox.png") > 0


class TestRobustRecovery:
    """Hardened fitting under the sensor-noise corruption model
    (fit.lm_fit robust_c/residual + prefilters; measured behavior
    documented in fit.refine_params)."""

    def test_despeckle_removes_isolated_keeps_surface(self, true_setup):
        from sqtpu.data.augment import depth_noise
        from sqtpu.ops.image import despeckle

        _, img = true_setup
        noisy = depth_noise(jax.random.PRNGKey(5), img, salt=0.01)
        clean = despeckle(noisy)
        # flying pixels are isolated background hits -> removed (the few
        # survivors land adjacent to the silhouette or to each other)
        added = (noisy > 0) & (img == 0)
        removed = float(jnp.sum((clean == 0) & added) / jnp.sum(added))
        assert removed > 0.9
        # interior surface pixels untouched
        kept = float(jnp.mean((clean == img)[img > 0]))
        assert kept > 0.98

    def test_median3_denoises_and_despeckles(self, true_setup):
        from sqtpu.data.augment import depth_noise
        from sqtpu.ops.image import median3

        _, img = true_setup
        noisy = depth_noise(jax.random.PRNGKey(5), img,
                            gaussian=0.02, salt=0.01)
        filt = median3(noisy)
        obj = img > 0
        # ranging noise roughly halved on the object interior
        assert float(jnp.std((filt - img)[obj])) < \
            0.6 * float(jnp.std((noisy - img)[obj]))
        # isolated flying pixels wiped (median of a mostly-zero window)
        added = (noisy > 0) & ~obj
        removed = float(jnp.sum((filt == 0) & added) / jnp.sum(added))
        assert removed > 0.9

    def test_robust_lm_survives_salt_noise(self, true_setup):
        """Tukey IRLS + despeckle fully fix the salt corruption that
        collapses plain LM (flying pixels are true outliers)."""
        from sqtpu.data.augment import depth_noise
        from sqtpu.fit import refine_params

        p_true, img = true_setup
        noisy = depth_noise(jax.random.PRNGKey(7), img, salt=0.005,
                            quantize=True)
        p0 = p_true + jnp.asarray(
            [0.04, -0.03, 0.03, 0.08, -0.08, 0.03, -0.03, 0.02,
             0, 0, 0, 0], jnp.float32)

        def iou_of(p):
            return float(metrics.iou(p_true[None].astype(jnp.float64),
                                     p[None].astype(jnp.float64), 32))

        robust = refine_params(noisy[None], p0[None], "lm", steps=30,
                               robust_c=4.685, prefilter="despeckle")[0]
        assert iou_of(robust) > 0.85
        # and on a CLEAN image the robust path must not hurt
        clean_fit = refine_params(img[None], p0[None], "lm", steps=30,
                                  robust_c=4.685, prefilter="despeckle")[0]
        assert iou_of(clean_fit) > 0.9

    def test_radial_residual_resists_gaussian_collapse(self, true_setup):
        """Ranging noise (even sigma=0.005) tips the SB energy into its
        inflated-box pathology; the radial residual does not collapse."""
        from sqtpu.data.augment import depth_noise
        from sqtpu.fit import refine_params

        p_true, img = true_setup
        noisy = depth_noise(jax.random.PRNGKey(7), img, gaussian=0.02,
                            quantize=True)
        p0 = p_true + jnp.asarray(
            [0.04, -0.03, 0.03, 0.08, -0.08, 0.03, -0.03, 0.02,
             0, 0, 0, 0], jnp.float32)

        def iou_of(p):
            return float(metrics.iou(p_true[None].astype(jnp.float64),
                                     p[None].astype(jnp.float64), 32))

        sb = refine_params(noisy[None], p0[None], "lm", steps=30)[0]
        radial = refine_params(noisy[None], p0[None], "lm", steps=30,
                               residual="radial")[0]
        assert iou_of(sb) < 0.5          # the documented SB collapse
        assert iou_of(radial) > 0.45     # radial holds the basin
        # clean-image parity: radial matches SB where SB works
        clean = refine_params(img[None], p0[None], "lm", steps=30,
                              residual="radial")[0]
        assert iou_of(clean) > 0.9

    def test_gd_refine_is_noise_robust(self, true_setup):
        """The implicit depth-MAE refine (an L1 norm) is the robust
        method under the full mixed corruption: it IMPROVES on the init
        where every LM variant falls below it."""
        from sqtpu.data.augment import depth_noise
        from sqtpu.fit import refine_params

        p_true, img = true_setup
        noisy = depth_noise(jax.random.PRNGKey(7), img, gaussian=0.02,
                            dropout=0.2, salt=0.005, quantize=True)
        p0 = p_true + jnp.asarray(
            [0.04, -0.03, 0.03, 0.08, -0.08, 0.03, -0.03, 0.02,
             0, 0, 0, 0], jnp.float32)

        def iou_of(p):
            return float(metrics.iou(p_true[None].astype(jnp.float64),
                                     p[None].astype(jnp.float64), 32))

        init_iou = iou_of(p0)
        gd = refine_params(noisy[None], p0[None], "gd", steps=60,
                           prefilter="median")[0]
        assert iou_of(gd) > max(0.85, init_iou)
