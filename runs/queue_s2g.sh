#!/bin/bash
# Domain-randomized robustness fine-tune (final TPU stage): the fixed-
# level noise fine-tune (c3n) specializes to its training corruption
# (clean 0.886->0.663; off-level noise worse than the clean model).
# Per-sample magnitudes U(0, max) should cover the whole range. Evals
# mirror the c3n rows exactly for apples-to-apples.
set -u
cd /root/repo
while [ ! -f runs/queue_s2f.done ]; do sleep 60; done

done_mark() { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }

if ! is_done c3r_s1; then
  RESUME=""
  [ -d runs/c3r_model/last ] && \
    RESUME="--continue-training --resume-from last" || \
    RESUME="--init-weights artifacts/resnet_sq_hires_fp16.npz"
  timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 64 --gauge-weight 2.0 --elong-weight 1.0 \
    $RESUME \
    --augment-gaussian 0.03 --augment-dropout 0.3 --augment-salt 0.01 \
    --augment-randomize true \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 1e-5 \
    --plateau-patience 20 --max-epochs 130 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c3r_model --compare-images 0 --log-interval 50 \
    >> runs/c3_randft.log 2>&1 \
    && done_mark c3r_s1 \
    || echo "c3r_s1 train exited nonzero — resume on relaunch" \
         >> runs/c3_randft.log
fi

run_eval() {  # $1 out name, extra flags...
  local out=$1; shift
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir runs/c3r_model --n 1000 \
    --batch-size 125 --out-dir "runs/$out" "$@" > "runs/$out/eval.log" 2>&1
}
if is_done c3r_s1 && ! is_done c3r_eval && [ -d runs/c3r_model/best ]; then
  run_eval eval_c3r_mixed --noise-gaussian 0.02 --noise-dropout 0.2 \
    --noise-salt 0.005
  run_eval eval_c3r_clean
  run_eval eval_c3r_ng03 --noise-gaussian 0.03
  run_eval eval_c3r_nd20 --noise-dropout 0.2
  python - <<'PYEOF' > runs/c3_export4.log 2>&1
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint("runs/c3r_model/best", state)
save_weights_npz("artifacts/resnet_sq_robust_fp16.npz",
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported robust artifact from epoch", ep)
PYEOF
  done_mark c3r_eval
fi

# clean classical baseline (never recorded before): plain and hardened
if ! is_done s2g_classical_clean; then
  mkdir -p runs/eval_classical runs/eval_classical_robust
  python -m sqtpu.evaluate --model classical --n 200 --batch-size 25 \
    --refine-steps 30 --out-dir runs/eval_classical \
    > runs/eval_classical/eval.log 2>&1
  python -m sqtpu.evaluate --model classical --n 200 --batch-size 25 \
    --refine-steps 30 --refine-robust-c 4.685 --refine-filter median \
    --refine-residual radial --out-dir runs/eval_classical_robust \
    > runs/eval_classical_robust/eval.log 2>&1
  done_mark s2g_classical_clean
fi

echo DONE > runs/queue_s2g.done
