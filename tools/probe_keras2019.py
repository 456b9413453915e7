"""Loss-landscape probe for the 2019 rotation regime (`keras_chamfer`).

Settles VERDICT item 8 quantitatively: direct gradient descent on the 12
SQ parameters is a STRICTLY EASIER problem than training a CNN head
through the same loss (no estimation, perfect "features", one instance).
If tuned Adam from a near-truth init cannot recover the shape under the
2019 occupancy-field MSE (`/root/reference/py/loss_functions.py:91-101`,
field `:26-53` — raw F, no final ^e1, no occupancy squashing), while the
same optimizer under the 2020 explicit loss (`torch/classes.py:109-201`)
does recover it from the same inits, then the 2019 loss landscape — not
the Dense(12) head, not the data — is what cannot support recovery.

Protocol per seed:
  truth ~ sample_params (reference raw label convention), init = truth
  perturbed (sizes/positions +-0.04, shapes +-0.15, rotation ~0.35 rad);
  Adam, quaternion renormalized every step, LR swept per loss (each loss
  gets its best LR — the comparison is tuned FOR the 2019 loss, not
  against it). Full-IoU@64 scored on parameter snapshots every 100 steps.

Writes one JSON line per (loss, lr) config to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from sqtpu.data.synthetic import sample_params
from sqtpu.ops import losses, metrics
from sqtpu.ops import quaternion as quat


def perturb(key, p, rot_rad=0.35):
    ka, ke, kt, kq = jax.random.split(key, 4)
    a = jnp.clip(p[0:3] + jax.random.uniform(ka, (3,), p.dtype, -0.04, 0.04),
                 25 / 255, 75 / 255)
    e = jnp.clip(p[3:5] + jax.random.uniform(ke, (2,), p.dtype, -0.15, 0.15),
                 0.1, 1.0)
    t = p[5:8] + jax.random.uniform(kt, (3,), p.dtype, -0.04, 0.04)
    axis = jax.random.normal(kq, (3,), p.dtype)
    axis = axis / jnp.linalg.norm(axis)
    dq = jnp.concatenate([axis * jnp.sin(rot_rad / 2),
                          jnp.cos(rot_rad / 2)[None]])
    q = quat.multiply(dq[None], p[None, 8:12])[0]
    return jnp.concatenate([a, e, t, q])


def make_loss(name):
    tk = losses.torch_to_keras_norm
    if name.startswith("keras_clip"):
        clip = float(name.split("=")[1])
        return lambda tp, pp: losses.keras_occupancy_mse(
            tk(tp)[None], tk(pp)[None], 64, clip=clip)
    if name == "keras_raw":
        return lambda tp, pp: losses.keras_occupancy_mse(
            tk(tp)[None], tk(pp)[None], 64, clip=0.0)
    if name == "explicit2020":
        return lambda tp, pp: losses.explicit_loss(tp[None], pp[None], 32)
    raise ValueError(name)


def run_config(loss_name, lr, steps, seeds, rot_rad=0.35):
    loss_fn = make_loss(loss_name)

    def fit_one(key):
        kp, ki = jax.random.split(key)
        truth = sample_params(kp, 1, canonical=False)[0]
        p0 = perturb(ki, truth, rot_rad)
        opt = optax.adam(lr)

        def step(carry, _):
            p, ostate = carry
            g = jax.grad(lambda pp: loss_fn(truth, pp))(p)
            g = jnp.where(jnp.isfinite(g), g, 0.0)  # NaN grads recorded, not fatal
            upd, ostate = opt.update(g, ostate, p)
            p = p + upd
            p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
            return (p, ostate), (loss_fn(truth, p),
                                 jnp.any(~jnp.isfinite(g)))
        (pf, _), (ls, nang) = jax.lax.scan(
            step, (p0, opt.init(p0)), None, length=steps)
        return truth, p0, pf, ls, nang

    keys = jax.random.split(jax.random.PRNGKey(7), seeds)
    truth, p0, pf, ls, nang = jax.jit(jax.vmap(fit_one))(keys)
    iou0 = metrics.iou(truth, p0, 64, reduce=False)
    iouf = metrics.iou(truth, pf, 64, reduce=False)
    return {
        "loss": loss_name, "lr": lr, "steps": steps, "seeds": seeds,
        "rot_rad": rot_rad,
        "init_iou": [round(float(x), 4) for x in iou0],
        "final_iou": [round(float(x), 4) for x in iouf],
        "final_loss": [float(x) for x in ls[:, -1]],
        "any_nan_grad": [bool(x) for x in jnp.any(nang, axis=1)],
        "mean_init_iou": round(float(jnp.mean(iou0)), 4),
        "mean_final_iou": round(float(jnp.mean(iouf)), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--losses", default="keras_raw,keras_clip=100,"
                    "keras_clip=2,explicit2020")
    ap.add_argument("--lrs", default="3e-3,1e-3,3e-4")
    ap.add_argument("--rots", default="0.35",
                    help="rotation-offset radians of the perturbed init "
                    "(a CNN head at init is at ~pi/2 mean offset)")
    ap.add_argument("--out", default="runs/probe_keras2019.jsonl")
    args = ap.parse_args()
    with open(args.out, "w") as f:
        for rot in (float(x) for x in args.rots.split(",")):
            for loss_name in args.losses.split(","):
                for lr in (float(x) for x in args.lrs.split(",")):
                    r = run_config(loss_name, lr, args.steps, args.seeds,
                                   rot)
                    line = json.dumps(r)
                    print(line, flush=True)
                    f.write(line + "\n")
                    f.flush()


if __name__ == "__main__":
    main()
