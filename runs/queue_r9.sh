#!/bin/bash
# Round-3 stage 5/6: push CNN-only accuracy with finer explicit grids,
# now affordable thanks to the fused explicit-loss Pallas kernel
# (explicit_sym @96^3 trains at ~1,955 imgs/s vs 285 before).
#   stage 5 (c3x): 96^3 grid, LR 5e-6, 200 ep online, from the hires
#                  flagship artifact
#   stage 6 (c3y): 128^3 grid — supervision matched to the closed-loop
#                  eval's IoU@128^3 — LR 3e-6, 150 ep, from stage 5
# Evals mirror eval_c3h exactly (n=1000, reference protocol).
set -u
cd /root/repo

done_mark() { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }

export_npz() {  # $1 ckpt dir, $2 out npz
  python - "$1" "$2" <<'PYEOF'
import sys
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint(sys.argv[1] + "/best", state)
save_weights_npz(sys.argv[2],
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported", sys.argv[2], "from epoch", ep)
PYEOF
}

run_eval() {  # $1 ckpt dir, $2 out name, extra flags...
  local ckpt=$1 out=$2; shift 2
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir "$ckpt" --n 1000 --batch-size 125 \
    --out-dir "runs/$out" "$@" > "runs/$out/eval.log" 2>&1
}

# ---- stage 5: 96^3
if ! is_done c3x_train; then
  RESUME="--init-weights artifacts/resnet_sq_hires_fp16.npz"
  [ -d runs/c3x_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 7200 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 96 --gauge-weight 2.0 --elong-weight 1.5 \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 5e-6 \
    $RESUME \
    --plateau-patience 25 --max-epochs 200 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c3x_model --compare-images 0 --log-interval 50 \
    >> runs/c3x_train.log 2>&1 \
    && done_mark c3x_train \
    || echo "c3x train exited nonzero — resume on relaunch" \
         >> runs/c3x_train.log
fi
if is_done c3x_train && ! is_done c3x_eval && [ -d runs/c3x_model/best ]; then
  export_npz runs/c3x_model runs/c3x_model/weights_fp16.npz \
    > runs/c3x_export.log 2>&1
  run_eval runs/c3x_model eval_c3x
  run_eval runs/c3x_model eval_c3x_refine_lm --refine lm --refine-steps 30
  done_mark c3x_eval
fi

# ---- stage 6: 128^3 (matches the eval grid)
if is_done c3x_eval && ! is_done c3y_train; then
  RESUME="--init-weights runs/c3x_model/weights_fp16.npz"
  [ -d runs/c3y_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 10800 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 128 --gauge-weight 2.0 --elong-weight 1.5 \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 3e-6 \
    $RESUME \
    --plateau-patience 25 --max-epochs 150 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c3y_model --compare-images 0 --log-interval 50 \
    >> runs/c3y_train.log 2>&1 \
    && done_mark c3y_train \
    || echo "c3y train exited nonzero — resume on relaunch" \
         >> runs/c3y_train.log
fi
if is_done c3y_train && ! is_done c3y_eval && [ -d runs/c3y_model/best ]; then
  export_npz runs/c3y_model runs/c3y_model/weights_fp16.npz \
    > runs/c3y_export.log 2>&1
  run_eval runs/c3y_model eval_c3y
  run_eval runs/c3y_model eval_c3y_refine_lm --refine lm --refine-steps 30
  done_mark c3y_eval
fi

echo DONE > runs/queue_r9.done
