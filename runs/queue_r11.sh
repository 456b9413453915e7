#!/bin/bash
# Round-4 stage 8: render-and-compare refinement (models/refiner.py).
# The pixel-space LM polish proves ~0.045 full-IoU is recoverable from
# the residual image (0.901 -> ~0.95); train the corrector to amortize
# it into a feedforward pass:
#   c4r1: refine_sq, base warm-started from c4b + FROZEN, corrector at
#         LR 1e-4, explicit_sym @128^3 sharp 20 + shape-weight 4
#   c4r2: unfreeze everything, LR 3e-6 end-to-end polish
# Waits for queue_r12 (c4c annealed-stage retrain; the original c4b
# weights were lost to a VM reset) to release the chip.
set -u
cd /root/repo

while [ ! -f runs/queue_r12.done ]; do sleep 60; done

done_mark() { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }

export_npz() {  # $1 model name, $2 ckpt dir, $3 out npz
  python - "$1" "$2" "$3" <<'PYEOF'
import sys
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
model = build_model(sys.argv[1])
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint(sys.argv[2] + "/best", state)
save_weights_npz(sys.argv[3],
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported", sys.argv[3], "from epoch", ep)
PYEOF
}

run_eval() {  # $1 ckpt dir, $2 out name, extra flags...
  local ckpt=$1 out=$2; shift 2
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --model refine_sq --ckpt-dir "$ckpt" \
    --n 1000 --batch-size 125 --out-dir "runs/$out" "$@" \
    > "runs/$out/eval.log" 2>&1
}

# ---- stage 8a: frozen-base corrector training
if ! is_done c4r1_train; then
  RESUME="--init-base artifacts/resnet_sq_c4_fp16.npz"
  [ -d runs/c4r1_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 14400 python -m sqtpu.train --model refine_sq --loss explicit_sym \
    --render-size 128 --explicit-sharp 20.0 \
    --gauge-weight 2.0 --elong-weight 1.5 --shape-weight 4.0 \
    --freeze-base true \
    --data online --image-size 256 \
    --batch-size 128 --remat true --learning-rate 1e-4 \
    $RESUME \
    --plateau-patience 15 --max-epochs 120 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c4r1_model --compare-images 0 --log-interval 50 \
    >> runs/c4r1_train.log 2>&1 \
    && done_mark c4r1_train \
    || echo "c4r1 train exited nonzero — resume on relaunch" \
         >> runs/c4r1_train.log
fi
if is_done c4r1_train && ! is_done c4r1_eval && [ -d runs/c4r1_model/best ]; then
  export_npz refine_sq runs/c4r1_model runs/c4r1_model/weights_fp16.npz \
    > runs/c4r1_export.log 2>&1
  run_eval runs/c4r1_model eval_c4r1
  done_mark c4r1_eval
fi

# ---- stage 8b: end-to-end polish (unfrozen, tiny LR)
if is_done c4r1_eval && ! is_done c4r2_train; then
  RESUME="--init-weights runs/c4r1_model/weights_fp16.npz"
  [ -d runs/c4r2_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 14400 python -m sqtpu.train --model refine_sq --loss explicit_sym \
    --render-size 128 --explicit-sharp 20.0 \
    --gauge-weight 2.0 --elong-weight 1.5 --shape-weight 4.0 \
    --data online --image-size 256 \
    --batch-size 128 --remat true --learning-rate 3e-6 \
    $RESUME \
    --plateau-patience 15 --max-epochs 100 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c4r2_model --compare-images 0 --log-interval 50 \
    >> runs/c4r2_train.log 2>&1 \
    && done_mark c4r2_train \
    || echo "c4r2 train exited nonzero — resume on relaunch" \
         >> runs/c4r2_train.log
fi
if is_done c4r2_train && ! is_done c4r2_eval && [ -d runs/c4r2_model/best ]; then
  export_npz refine_sq runs/c4r2_model runs/c4r2_model/weights_fp16.npz \
    > runs/c4r2_export.log 2>&1
  run_eval runs/c4r2_model eval_c4r2
  run_eval runs/c4r2_model eval_c4r2_mixed \
    --noise-gaussian 0.02 --noise-dropout 0.2 --noise-salt 0.005
  done_mark c4r2_eval
fi

echo DONE > runs/queue_r11.done
