#!/bin/bash
# Round-4 recovery stage: the c4a/c4b (sharpness-annealed) checkpoints were
# lost to a VM reset (runs/**/best/ and weights_*.npz are gitignored; only
# the eval artifacts survived).  Retrain the annealed stage from the
# committed c3y flagship artifact, time-boxed, and this time EXPORT+COMMIT
# the weights to artifacts/ as soon as the stage finishes.
#   c4c: 128^3, sharp 20, LR 5e-6, from artifacts/resnet_sq_128_fp16.npz
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

if ! is_done c4c_train; then
  RESUME="--init-weights artifacts/resnet_sq_128_fp16.npz"
  [ -d runs/c4c_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 840 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 128 --explicit-sharp 20.0 \
    --gauge-weight 2.0 --elong-weight 1.5 \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 5e-6 \
    $RESUME \
    --plateau-patience 20 --max-epochs 60 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c4c_model --compare-images 0 --log-interval 50 \
    >> runs/c4c_train.log 2>&1
  # timeout kill is expected: best/ is written on every val improvement
  [ -d runs/c4c_model/best ] && done_mark c4c_train
fi
if is_done c4c_train && ! is_done c4c_eval && [ -d runs/c4c_model/best ]; then
  export_npz runs/c4c_model artifacts/resnet_sq_c4_fp16.npz \
    > runs/c4c_export.log 2>&1
  run_eval runs/c4c_model eval_c4c
  run_eval runs/c4c_model eval_c4c_refine_lm --refine lm --refine-steps 30
  done_mark c4c_eval
fi
echo DONE > runs/queue_r12.done
