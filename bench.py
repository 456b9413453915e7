"""Headline benchmark: rotated-SQ training throughput (train step).

Measures the FULL flagship training step — ResNetSQ forward, implicit
(self-supervised depth re-projection) loss on a 64³ voxel grid, backward,
Adam update — in steady state on the available device(s), and reports
depth-images/sec/chip.

Baseline: the reference never measured training throughput (BASELINE.md);
the north-star target from BASELINE.json is ≥20,000 imgs/s on a v5e-8,
i.e. 2,500 imgs/s/chip. ``vs_baseline`` is measured imgs/s/chip divided
by that 2,500 target.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: first-ever run pays the multi-minute
# remote compile; every rerun starts in seconds.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = int(os.environ.get("SQTPU_BENCH_BATCH", "512"))
ITERS = int(os.environ.get("SQTPU_BENCH_ITERS", "10"))
BASELINE_PER_CHIP = 2500.0  # north-star v5e-8 target / 8 chips


def main():
    from sqtpu.data.synthetic import make_batch
    from sqtpu.models import ResNetSQ
    from sqtpu.parallel.mesh import make_mesh
    from sqtpu.training.loop import make_train_step
    from sqtpu.training.state import create_train_state
    from sqtpu.utils.config import TrainConfig
    from sqtpu.utils.profiling import StepTimer

    n_chips = len(jax.devices())
    # the shipping performance config: bf16 encoder compute (fp32 params),
    # fp32 fused Pallas implicit loss (use_pallas default)
    cfg = TrainConfig(batch_size=BATCH, render_size=64, loss="implicit",
                      dtype="bfloat16")
    mesh = make_mesh()
    model = ResNetSQ(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), cfg)
    step = make_train_step(model, cfg, mesh)

    # Headline batch = REAL rendered depth maps with their labels (one
    # resident batch, rendered once, reused each iter): BN sees real image
    # statistics and final_loss is meaningful. Batch/iters unchanged from
    # the round-1/2 uniform-noise bench, so numbers stay comparable.
    key = jax.random.PRNGKey(1)
    imgs, labels = jax.jit(
        lambda k: make_batch(k, BATCH, 256, "hard"))(key)

    # Timing notes for the axon TPU tunnel: block_until_ready is NOT a
    # reliable fence (measured 50x optimistic); fetching a scalar to host
    # (float()) is. Each step depends on the previous step's state, so
    # dispatching ITERS steps asynchronously and fetching only the FINAL
    # loss measures the whole chain with one round-trip — and avoids the
    # several-minute compile of a lax.scan-wrapped copy of the step.
    state, loss = step(state, imgs, labels)   # compile
    _ = float(loss)
    for _ in range(2):                         # warm steady state
        state, loss = step(state, imgs, labels)
    _ = float(loss)

    timer = StepTimer()
    timer.start()
    for _ in range(ITERS):
        state, loss = step(state, imgs, labels)
    dt = timer.stop(loss)  # fences on the end of the dependency chain

    imgs_per_sec = BATCH * ITERS / dt
    per_chip = imgs_per_sec / n_chips
    point_evals_per_sec = imgs_per_sec * cfg.render_size**3

    # ---- end-to-end ONLINE training: in-graph hard-render data gen +
    # train step ("rotated-SQ training" including producing the rotated
    # SQs — data/synthetic.py make_batch fused into the step)
    if n_chips > 1:
        # the Pallas render kernel is a custom call XLA cannot auto-
        # partition; generate each chip's shard locally via shard_map
        from sqtpu.parallel.sharded_losses import make_batch_dp
        _gen = lambda k: make_batch_dp(k, BATCH, mesh, 256, "hard")
    else:
        _gen = lambda k: make_batch(k, BATCH, 256, "hard")

    @jax.jit
    def online_step(state, k):
        imgs, labels = _gen(k)
        return step(state, imgs, labels)

    key = jax.random.PRNGKey(2)
    state, loss = online_step(state, key)      # compile
    _ = float(loss)
    state, loss = online_step(state, jax.random.fold_in(key, 1))
    _ = float(loss)
    timer.start()
    for i in range(ITERS):
        state, loss = online_step(state, jax.random.fold_in(key, 2 + i))
    dt_online = timer.stop(loss)
    online_per_chip = BATCH * ITERS / dt_online / n_chips

    # ---- the flagship RECIPE's steps: explicit_sym supervision (fused
    # Pallas explicit kernel with the z-windowed sweep; fp32 model,
    # matching the shipping training configs) — the numbers behind the
    # staged-recipe wall-clock. 96³ kept for cross-round comparability;
    # 128³ (+ sharp-annealed) is the current stage-6/7 config.
    def time_step(cfg_x, batch=None, model_dtype=None):
        b = batch or BATCH
        imgs_x, labels_x = imgs[:b], labels[:b]
        model_x = ResNetSQ(dtype=model_dtype) if model_dtype else ResNetSQ()
        state_x = create_train_state(model_x, jax.random.PRNGKey(3), cfg_x)
        step_x = make_train_step(model_x, cfg_x, mesh)
        state_x, loss_x = step_x(state_x, imgs_x, labels_x)   # compile
        _ = float(loss_x)
        state_x, loss_x = step_x(state_x, imgs_x, labels_x)
        _ = float(loss_x)
        timer.start()
        for _ in range(ITERS):
            state_x, loss_x = step_x(state_x, imgs_x, labels_x)
        dt_x = timer.stop(loss_x)
        return b * ITERS / dt_x / n_chips

    explicit_per_chip = time_step(TrainConfig(
        batch_size=BATCH, render_size=96, loss="explicit_sym",
        gauge_weight=2.0, dtype="float32"))
    explicit128_per_chip = time_step(TrainConfig(
        batch_size=BATCH, render_size=128, loss="explicit_sym",
        gauge_weight=2.0, dtype="float32"))
    explicit128_s20_per_chip = time_step(TrainConfig(
        batch_size=BATCH, render_size=128, loss="explicit_sym",
        gauge_weight=2.0, explicit_sharp=20.0, dtype="float32"))
    # bf16 encoder + the same fp32 fused explicit kernel: the explicit
    # recipe step is part encoder-bound (see README roofline note); this
    # quantifies the headroom a mixed-precision recipe would buy
    explicit128_s20_bf16_per_chip = time_step(
        TrainConfig(batch_size=BATCH, render_size=128, loss="explicit_sym",
                    gauge_weight=2.0, explicit_sharp=20.0,
                    dtype="bfloat16"),
        model_dtype=jnp.bfloat16)

    # ---- the SP ("long axis") path's single-chip cost pair: the fused
    # kernel vs the jnp loss at 128³ where SP would actually be used
    # (round-3 VERDICT weak #9). Since round 4 the grid-sharded path
    # runs the kernel per column slab (sharded_losses.use_kernel), so
    # the jnp number is the cost of the use_pallas=False fallback, not
    # of SP itself. Small batch: the jnp backward materializes O(B·N³)
    # intermediates.
    sp_batch = 64
    implicit128_pallas = time_step(TrainConfig(
        batch_size=sp_batch, render_size=128, loss="implicit",
        use_pallas=True, remat=True, dtype="float32"), batch=sp_batch)
    implicit128_jnp = time_step(TrainConfig(
        batch_size=sp_batch, render_size=128, loss="implicit",
        use_pallas=False, remat=True, dtype="float32"), batch=sp_batch)

    # ---- data generation alone (fused Pallas hard-render kernel)
    @jax.jit
    def gen_only(k):
        return _gen(k)[0]

    out = gen_only(key)
    _ = float(out[0, 0, 0, 0])
    timer.start()
    for i in range(ITERS):
        out = gen_only(jax.random.fold_in(key, 100 + i))
    dt_gen = timer.stop(out[0, 0, 0, 0])
    gen_per_chip = BATCH * ITERS / dt_gen / n_chips

    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "256x256 depth imgs/sec/chip (full train step, implicit loss @64^3)",
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 4),
        "detail": {
            "imgs_per_sec_total": round(imgs_per_sec, 2),
            "n_chips": n_chips,
            "batch": BATCH,
            "loss_point_evals_per_sec": round(point_evals_per_sec, 1),
            "final_loss": float(loss),
            "online_imgs_per_sec_per_chip": round(online_per_chip, 2),
            "online_note": "in-graph data gen (hard ray-cast render) + train step",
            "explicit96_imgs_per_sec_per_chip": round(explicit_per_chip, 2),
            "explicit96_note": "flagship recipe step (explicit_sym @96^3, z-windowed Pallas explicit kernel, fp32)",
            "explicit128_imgs_per_sec_per_chip": round(
                explicit128_per_chip, 2),
            "explicit128_sharp20_imgs_per_sec_per_chip": round(
                explicit128_s20_per_chip, 2),
            "explicit128_note": "stage-6/7 recipe step (explicit_sym @128^3; sharp20 = round-4 annealed stage, tighter z-window; round-5 fused value+grad sweep)",
            "explicit128_sharp20_bf16_imgs_per_sec_per_chip": round(
                explicit128_s20_bf16_per_chip, 2),
            "explicit128_bf16_note": "same step with a bf16 encoder (fp32 fused kernel unchanged) - the mixed-precision headroom of the explicit recipe",
            "sp_implicit128_pallas_imgs_per_sec_per_chip": round(
                implicit128_pallas, 2),
            "sp_implicit128_jnp_imgs_per_sec_per_chip": round(
                implicit128_jnp, 2),
            "sp_note": "SP composes with the fused kernel since round 4 (column-slab kernel per grid shard); the jnp number is the use_pallas=False fallback cost, implicit @128^3 batch 64",
            "datagen_imgs_per_sec_per_chip": round(gen_per_chip, 2),
        },
    }))


if __name__ == "__main__":
    main()
