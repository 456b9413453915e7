"""Conformance goldens vs the reference implementation (SURVEY.md §6.2).

Every number here was produced by executing the reference torch code in
fp64 on the params of ``example_imgs/000000.bmp`` (labels.txt row 2) —
the north-star requirement is parity ≤ 1e-5 (BASELINE.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import losses, metrics
from sqtpu.ops.image import nearest_resize
from sqtpu.ops.render import render_depth_soft


@pytest.fixture()
def p(golden_params):
    return jnp.asarray(golden_params)[None]  # (1, 12) fp64


@pytest.fixture()
def p_bumped(p):
    """a1 += 0.05 — the perturbation used for all reference goldens."""
    return p.at[0, 0].add(0.05)


class TestExplicitLoss:
    def test_self_is_zero(self, p):
        assert float(losses.explicit_loss(p, p, 32)) == pytest.approx(0.0, abs=1e-12)

    def test_golden_bump(self, p, p_bumped):
        # reference: ExplicitLoss(32)(p, a1+=0.05) = 0.255026
        v = float(losses.explicit_loss(p, p_bumped, 32))
        assert v == pytest.approx(0.255026, abs=1e-5)


class TestIoU:
    def test_self_is_one(self, p):
        assert float(metrics.iou(p, p, 64)) == pytest.approx(1.0)

    def test_golden_bump(self, p, p_bumped):
        # reference: IoUAccuracy(64)(p, a1+=0.05) = 0.8383
        v = float(metrics.iou(p, p_bumped, 64))
        assert v == pytest.approx(0.8383, abs=1e-3)

    def test_reduce_false_matches(self, p, p_bumped):
        per = metrics.iou(p, p_bumped, 64, reduce=False)
        assert per.shape == (1,)
        assert float(per[0]) == pytest.approx(
            float(metrics.iou(p, p_bumped, 64)), abs=1e-12
        )


class TestLeastSquares:
    def test_golden(self, p, golden_image):
        img = jnp.asarray(golden_image)[None]
        v = float(losses.least_squares_loss(img, p, 64))
        assert v == pytest.approx(0.004131, abs=1e-5)

    def test_golden_bump(self, p_bumped, golden_image):
        img = jnp.asarray(golden_image)[None]
        v = float(losses.least_squares_loss(img, p_bumped, 64))
        assert v == pytest.approx(0.177608, abs=1e-5)


class TestImplicitRender:
    def test_corr_and_mae_vs_scanner_image(self, p, golden_image):
        # reference relationship: corr 0.9800, MAE 0.0073 (N=64, tau=1.5,
        # sharpness=260) between the soft render and the scanner image.
        depth = np.asarray(render_depth_soft(p[0], 64, 1.5, 260.0))
        small = np.asarray(nearest_resize(jnp.asarray(golden_image)[None], (64, 64))[0])
        corr = np.corrcoef(depth.ravel(), small.ravel())[0, 1]
        mae = np.abs(depth - small).mean()
        assert corr == pytest.approx(0.9800, abs=2e-3)
        assert mae == pytest.approx(0.0073, abs=2e-4)

    def test_implicit_loss_equals_render_mae(self, p, golden_image):
        img = jnp.asarray(golden_image)[None]
        v = float(losses.implicit_loss(img, p, 64, 1.5, 260.0))
        assert v == pytest.approx(0.0073342, abs=1e-5)


class TestQuaternionLoss:
    def test_antipodal_symmetric(self, p):
        q = p[:, 8:12]
        v1 = float(losses.quaternion_loss(q, q))
        v2 = float(losses.quaternion_loss(q, -q))
        # reference golden ≈ 2e-6 for this (slightly non-unit) stored quat
        assert v1 == pytest.approx(v2, abs=1e-12)
        assert v1 == pytest.approx(2.4356e-06, abs=1e-8)
