"""Roofline decomposition of the explicit_sym@128³ flagship recipe step.

VERDICT round-4 weak #2: the recipe that produced every flagship
artifact (explicit_sym @128³ sharp-20) ran at ~2,017 imgs/s/chip with no
speed-of-light argument. This tool measures the step's three components
separately on the attached device and derives the kernel's transcendental
bound from its ACTUAL per-sample work:

1. the fused value+grad explicit kernel alone (`_fused_call` via
   value_and_grad of `explicit_loss_pallas`) — 26 transcendentals/point
   (`ops/kernels/explicit.py` module doc) over the measured mean
   z-window plane count of the benchmark batch (the window is data-
   dependent: union of the two SQs' z-support boxes ± margin);
2. the encoder train step alone (ResNetSQ fwd+bwd+Adam under param-MSE,
   fp32 and bf16) — the MXU side;
3. the full explicit_sym train step (what training actually runs).

Speed of light: the implicit kernel's measured ceiling is ≈1.9e11
transcendentals/s on this v5e chip (README "Measured performance") —
both kernels bottleneck on the same VPU transcendental pipe, so
kernel_transc_per_sec / 1.9e11 is the fraction of light speed.

Prints one JSON object. Timing uses the final-scalar-fetch fence
(block_until_ready is unreliable over the axon tunnel — bench.py note).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores JAX_PLATFORMS; only the config API works
# (see __graft_entry__.dryrun_multichip) — CPU smoke runs set this
if os.environ.get("SQTPU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

BATCH = int(os.environ.get("SQTPU_BENCH_BATCH", "512"))
ITERS = int(os.environ.get("SQTPU_BENCH_ITERS", "10"))
N = 128
SHARP = 20.0
TRANSC_PER_POINT = 26          # fused value+grad sweep (explicit.py doc)
TRANSC_PER_POINT_EVAL = 22     # loss-only sweep
VPU_LIGHT_SPEED = 1.9e11       # measured ceiling, implicit kernel (README)


def _fence(x):
    return float(jnp.ravel(x)[0])


def _time(fn, *args):
    out = fn(*args)           # compile
    _fence(out)
    out = fn(*args)           # steady state
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / ITERS


def _time_train(step, state, imgs, labels):
    """Train steps donate their state: thread it through each call."""
    state, loss = step(state, imgs, labels)   # compile
    _fence(loss)
    state, loss = step(state, imgs, labels)   # steady state
    _fence(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, imgs, labels)
    _fence(loss)
    return (time.perf_counter() - t0) / ITERS


def main():
    from sqtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from sqtpu.data.synthetic import make_batch, sample_params
    from sqtpu.models import ResNetSQ, params_vector
    from sqtpu.ops.kernels.explicit import (explicit_loss_pallas,
                                            z_window_indices)
    from sqtpu.parallel.mesh import make_mesh
    from sqtpu.training.loop import make_train_step
    from sqtpu.training.state import create_train_state
    from sqtpu.utils.config import TrainConfig

    key = jax.random.PRNGKey(1)
    imgs, labels = jax.jit(lambda k: make_batch(k, BATCH, 256, "hard"))(key)
    # pred side: a SECOND random param set (early-training-like window
    # unions — wider than converged training, so the bound is conservative)
    preds = sample_params(jax.random.PRNGKey(2), BATCH)

    # ---- 1. fused kernel alone (value + grad, the training path)
    def kernel_vg(tp, pp):
        return jax.value_and_grad(
            lambda p: explicit_loss_pallas(tp, p, N, sharp=SHARP))(pp)[0]

    dt_kernel = _time(jax.jit(kernel_vg), labels, preds)

    # actual per-sample work: mean evaluated planes of THIS batch
    jlo, jhi = z_window_indices(labels, preds, N)
    mean_planes = float(jnp.mean(jhi - jlo + 1.0))
    pts_per_sample = mean_planes * (N + 1) ** 2
    transc_per_sec = BATCH * pts_per_sample * TRANSC_PER_POINT / dt_kernel
    kernel_imgs_per_sec = BATCH / dt_kernel

    # ---- 2. encoder step alone (param-MSE: loss cost ~0)
    mesh = make_mesh()

    def enc_step(dtype, model_dtype):
        cfg = TrainConfig(batch_size=BATCH, loss="supervised",
                          dtype=dtype)
        model = (ResNetSQ(dtype=model_dtype) if model_dtype
                 else ResNetSQ())
        state = create_train_state(model, jax.random.PRNGKey(3), cfg)
        step = make_train_step(model, cfg, mesh)
        return _time_train(step, state, imgs, labels)

    dt_enc32 = enc_step("float32", None)
    dt_enc16 = enc_step("bfloat16", jnp.bfloat16)

    # ---- 3. full explicit_sym step (fp32, the shipping recipe)
    def full_step(dtype, model_dtype):
        cfg = TrainConfig(batch_size=BATCH, render_size=N,
                          loss="explicit_sym", gauge_weight=2.0,
                          explicit_sharp=SHARP, dtype=dtype)
        model = ResNetSQ(dtype=model_dtype) if model_dtype else ResNetSQ()
        state = create_train_state(model, jax.random.PRNGKey(3), cfg)
        step = make_train_step(model, cfg, mesh)
        return _time_train(step, state, imgs, labels)

    dt_full = full_step("float32", None)
    # bf16 encoder + fp32 Pallas loss (the bench headline's mixed-precision
    # recipe applied to the explicit path): the encoder is the non-kernel
    # 60% of the fp32 step, so this is where the remaining speedup lives
    dt_full16 = full_step("bfloat16", jnp.bfloat16)

    print(json.dumps({
        "batch": BATCH, "render_size": N, "sharp": SHARP,
        "mean_window_planes": round(mean_planes, 1),
        "kernel_ms": round(dt_kernel * 1e3, 2),
        "kernel_imgs_per_sec": round(kernel_imgs_per_sec, 1),
        "kernel_transc_per_sec": f"{transc_per_sec:.3e}",
        "fraction_of_vpu_light_speed": round(
            transc_per_sec / VPU_LIGHT_SPEED, 3),
        "encoder_fp32_ms": round(dt_enc32 * 1e3, 2),
        "encoder_bf16_ms": round(dt_enc16 * 1e3, 2),
        "full_step_ms": round(dt_full * 1e3, 2),
        "full_imgs_per_sec_per_chip": round(BATCH / dt_full, 1),
        "full_step_bf16_ms": round(dt_full16 * 1e3, 2),
        "full_bf16_imgs_per_sec_per_chip": round(BATCH / dt_full16, 1),
        "sum_kernel_plus_encoder_ms": round(
            (dt_kernel + dt_enc32) * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
