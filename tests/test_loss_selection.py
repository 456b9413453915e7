"""Every selectable training loss yields a finite value and finite
gradients on a real rendered batch.

The reference selects its loss by editing a commented-out line
(``torch/train.py:62-64``); sqtpu promotes that to ``TrainConfig.loss``.
This sweep pins the full menu: a new loss wired into
``training/loop._compute_loss`` without a case here (or a case that
NaNs at step 0, as the un-guarded keras_chamfer regime did in round 3)
fails fast on CPU instead of mid-queue on the TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from sqtpu.data.synthetic import sample_params
from sqtpu.ops.render import render_depth_hard_batch
from sqtpu.training.loop import _compute_loss
from sqtpu.utils.config import TrainConfig

# every value accepted by _compute_loss (keep in sync with the
# TrainConfig.loss docstring in sqtpu/utils/config.py)
ALL_LOSSES = [
    "implicit",
    "explicit",
    "leastsquares",
    "param_mse",
    "supervised",
    "supervised_sym",
    "supervised_geo",
    "supervised_gauge",
    "quaternion",
    "quaternion_sym",
    "keras_chamfer",
    "implicit_sym",
    "implicit_gauge",
    "explicit_sym",
    "explicit_gauge",
]


@pytest.fixture(scope="module")
def batch():
    labels = sample_params(jax.random.PRNGKey(7), 3)
    imgs = render_depth_hard_batch(labels, 32)[..., None]
    # a slightly-off prediction with a non-normalized quaternion, as a raw
    # head would emit before its output activation
    pred = labels + 0.03
    return imgs.astype(jnp.float32), labels.astype(jnp.float32), pred


@pytest.mark.parametrize("loss", ALL_LOSSES)
def test_loss_finite_value_and_grad(batch, loss):
    imgs, labels, pred = batch
    cfg = TrainConfig(loss=loss, render_size=16, elong_weight=1.0,
                      use_pallas=False)

    def f(p):
        return _compute_loss(cfg, p, imgs, labels)

    val, grad = jax.value_and_grad(f)(pred)
    assert val.shape == (), loss
    assert bool(jnp.isfinite(val)), (loss, float(val))
    assert bool(jnp.all(jnp.isfinite(grad))), loss
    # the self-prediction should not score worse than the perturbed one
    # (sanity that the labels feed through). Only for losses without the
    # reference's quat-dot term 1-2|0.5-<q,q'>^2|, which goes negative
    # for the fixture's deliberately non-normalized quaternion.
    if loss in ("param_mse", "explicit"):
        self_val = f(labels)
        assert float(self_val) <= float(val) + 1e-6, loss


def test_unknown_loss_raises(batch):
    imgs, labels, pred = batch
    cfg = TrainConfig(loss="nope")
    with pytest.raises(ValueError):
        _compute_loss(cfg, pred, imgs, labels)


def test_explicit_sharp_config_wires_through(batch):
    """--explicit-sharp (round-4 sharpness annealing) must reach the
    explicit geometry term in every explicit-family loss."""
    imgs, labels, pred = batch
    for loss in ("explicit", "explicit_sym"):
        vals = []
        for sharp in (5.0, 20.0):
            cfg = TrainConfig(loss=loss, render_size=16, gauge_weight=2.0,
                              explicit_sharp=sharp, use_pallas=False)
            vals.append(float(_compute_loss(cfg, pred, imgs, labels)))
        assert abs(vals[0] - vals[1]) > 1e-5, loss
    # and it matches the direct loss call
    cfg = TrainConfig(loss="explicit", render_size=16,
                      explicit_sharp=20.0, use_pallas=False)
    from sqtpu.ops import losses as L
    direct = float(L.explicit_loss(labels[..., :12], pred[..., :12], 16,
                                   sharp=20.0))
    assert float(_compute_loss(cfg, pred, imgs, labels)) == pytest.approx(
        direct, rel=1e-6)


def test_shape_weight_config_wires_through(batch):
    """--shape-weight must scale the e1/e2 columns of the explicit_sym
    anchor: perturbing only the shape exponents moves the loss more
    under a higher weight, while a size-only perturbation is
    unaffected."""
    imgs, labels, pred = batch

    def val(p, sw):
        cfg = TrainConfig(loss="explicit_sym", render_size=16,
                          gauge_weight=2.0, shape_weight=sw,
                          use_pallas=False)
        return float(_compute_loss(cfg, p, imgs, labels))

    e_off = labels.at[..., 3:5].add(0.2)
    assert val(e_off, 4.0) > val(e_off, 1.0) + 1e-5
    # size perturbation: anchor term identical under either weight
    # (the geometry term never sees shape_weight)
    a_off = labels.at[..., 0:3].add(0.2)
    assert val(a_off, 4.0) == pytest.approx(val(a_off, 1.0), rel=1e-6)
