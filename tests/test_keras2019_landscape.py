"""Pinned failure analysis of the 2019 rotation regime (quirks Q8/Q9).

The reference's 2019 rotation training (``py/train_rotation.py:36-40``)
regresses 12 SQ params through ``chamfer_loss`` — an MSE between RAW
inside-outside field values on a world-unit grid
(``py/loss_functions.py:26-53,91-101``), with no occupancy squashing and
no final ^e1 compression. Honest reproduction (runs/eval_kerasrot3)
showed the loss decreasing stably while closed-loop IoU stayed ~0.
These tests pin WHY, via direct gradient descent on the 12 parameters —
a strictly easier problem than learning a CNN head through the same
loss (perfect "features", one instance, tuned optimizer):

1. the raw fp32 field overflows to inf (its square crosses fp32 max)
   for small shape exponents — training at reference settings NaNs;
2. with overflow capped, the loss has near-zero minima at WRONG
   rotations: beyond ~0.9 rad offset, tuned Adam drives the loss to its
   floor while the shape stays wrong (full sweep:
   ``tools/probe_keras2019.py`` / ``runs/probe_keras2019.jsonl`` —
   capture range ends by 1.57 rad, mean IoU 0.58-0.67 at every clip);
3. the 2020 explicit loss (bounded occupancy, full exponent chain)
   recovers from the SAME inits at ANY offset (0.92-0.99 mean IoU in
   the sweep) — the failure is the 2019 objective, not the optimizer,
   the head, or the data.

A CNN head at init emits effectively random rotations (~pi/2 mean
offset) — outside the 2019 loss's capture range — so its rotation
gradient points at spurious minima from step 0. No head capacity fixes
that; repairing the objective does (``keras_rot_fixed`` + ``explicit``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
import pytest

from sqtpu.data.synthetic import sample_params
from sqtpu.ops import losses, metrics
from sqtpu.ops import quaternion as quat

ROT = 1.57  # rotation offset (rad) of the perturbed init — just past
            # the measured capture range, far below a random init's mean


def _perturb(key, p, rot):
    ka, ke, kt, kq = jax.random.split(key, 4)
    a = jnp.clip(p[0:3] + jax.random.uniform(ka, (3,), p.dtype, -0.04, 0.04),
                 25 / 255, 75 / 255)
    e = jnp.clip(p[3:5] + jax.random.uniform(ke, (2,), p.dtype, -0.15, 0.15),
                 0.1, 1.0)
    t = p[5:8] + jax.random.uniform(kt, (3,), p.dtype, -0.04, 0.04)
    ax = jax.random.normal(kq, (3,), p.dtype)
    ax = ax / jnp.linalg.norm(ax)
    dq = jnp.concatenate([ax * jnp.sin(rot / 2), jnp.cos(rot / 2)[None]])
    q = quat.multiply(dq[None], p[None, 8:12])[0]
    return jnp.concatenate([a, e, t, q])


def _fit(loss_fn, steps=300, lr=3e-3, seeds=2, rot=ROT):
    """Tuned Adam descent on the 12 params from a perturbed-truth init;
    returns per-seed (final full IoU @64, final loss)."""
    def one(key):
        kp, ki = jax.random.split(key)
        truth = sample_params(kp, 1, canonical=False)[0]
        p0 = _perturb(ki, truth, rot)
        opt = optax.adam(lr)

        def step(c, _):
            p, s = c
            loss, g = jax.value_and_grad(lambda pp: loss_fn(truth, pp))(p)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            u, s = opt.update(g, s, p)
            p = p + u
            p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
            return (p, s), loss

        (pf, _), ls = jax.lax.scan(step, (p0, opt.init(p0)), None,
                                   length=steps)
        return truth, pf, ls[-1]

    keys = jax.random.split(jax.random.PRNGKey(7), seeds)
    truth, pf, lf = jax.jit(jax.vmap(one))(keys)
    return metrics.iou(truth, pf, 64, reduce=False), lf


def test_keras2019_unclipped_objective_is_numerically_unusable():
    """Numerics of the raw (unclipped) 2019 objective in fp32:

    * INSIDE the reference's own label ranges (e >= 0.1) the loss is
      finite but astronomically scaled — O(1e32) values with O(1e34)
      gradients (|x/a|^(2/e) far-grid tails, no squashing, no final
      ^e1 compression);
    * one step of drift below e = 0.1 — which the unconstrained raw
      Dense(12) head emits at init with probability ~1, and which
      nothing in the 2019 code clamps — makes the loss inf and the
      gradient NaN.

    The ``clip=`` cap (sqtpu's documented repair) restores a finite,
    sane-scaled objective; the spurious-minima test below shows what
    that repair can and cannot buy."""
    tk = losses.torch_to_keras_norm
    p = jnp.asarray([30 / 255, 30 / 255, 30 / 255, 0.1, 1.0,
                     0.3, 0.5, 0.5, 0.0, 0.0, 0.0, 1.0], jnp.float32)
    q = p.at[5].set(0.7)

    def raw_loss(pred, true):
        return losses.keras_occupancy_mse(tk(true)[None], tk(pred)[None],
                                          64, clip=0.0)

    val, grad = jax.value_and_grad(raw_loss)(q, p)
    assert bool(jnp.isfinite(val)) and float(val) > 1e30, val
    assert float(jnp.max(jnp.abs(grad))) > 1e33, grad

    val_d, grad_d = jax.value_and_grad(raw_loss)(q.at[3].set(0.05), p)
    assert not bool(jnp.isfinite(val_d))
    assert not bool(jnp.all(jnp.isfinite(grad_d)))

    capped = losses.keras_occupancy_mse(tk(p)[None], tk(q)[None], 64,
                                        clip=100.0)
    assert bool(jnp.isfinite(capped)) and float(capped) < 1e5


@pytest.mark.slow
def test_keras2019_spurious_minima_vs_explicit_recovery():
    """Past its ~0.9 rad capture range the (overflow-capped) 2019 loss is
    MINIMIZED — loss driven to its floor — at params whose shape is
    still wrong, while the 2020 explicit loss recovers the shape from
    the SAME inits. Measured here at a 1.57 rad offset (reduced sizes
    for CI speed; full sweep in runs/probe_keras2019.jsonl)."""
    tk = losses.torch_to_keras_norm
    iou_k, loss_k = _fit(lambda tp, pp: losses.keras_occupancy_mse(
        tk(tp)[None], tk(pp)[None], 48, clip=2.0))
    # the loss reaches its floor ...
    assert float(jnp.max(loss_k)) < 0.05, loss_k
    # ... at the wrong shape (a solved instance scores >= 0.95)
    assert float(jnp.mean(iou_k)) < 0.8, iou_k

    iou_e, _ = _fit(lambda tp, pp: losses.explicit_loss(
        tp[None], pp[None], 24))
    assert float(jnp.mean(iou_e)) > 0.85, iou_e
