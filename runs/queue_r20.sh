#!/bin/bash
# Round-5 chip queue, part 4: the VM reset wiped the converged krf
# Orbax checkpoint (runs/krf_model/{best,last} gone; only the committed
# meta/history survived — val_acc 0.827 at epoch 40, reached in ~4 min).
# Retrain the 2019 fixed variant with the recorded recipe (queue_r17
# stage D + the commit-55c3572 repair: --grad-clip 1.0, neutral-start
# head is in the model), then export + closed-loop eval. Waits for
# queue_r19 to release the chip.
set -u
cd /root/repo

mark()    { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }
commit_now() { local msg=$1; shift; git add "$@" && git commit -q -m "$msg" || true; }

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
state = create_train_state(model, jax.random.PRNGKey(0),
                           TrainConfig(model=sys.argv[1]))
state, _, ep = load_checkpoint(sys.argv[2] + "/best", state)
save_weights_npz(sys.argv[3],
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported", sys.argv[3], "from epoch", ep)
PYEOF
}

best_val_acc() {  # $1 ckpt dir -> prints max val_acc or 0
  python - "$1" <<'PYEOF'
import json, sys
try:
    m = json.load(open(sys.argv[1] + "/best.meta.json"))
    print(max(m["history"]["val_acc"]))
except Exception:
    print(0)
PYEOF
}

run_eval() {  # $1 ckpt (dir or npz), $2 out name, extra flags...
  local ckpt=$1 out=$2; shift 2
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir "$ckpt" \
    --n 1000 --batch-size 125 --out-dir "runs/$out" "$@" \
    > "runs/$out/eval.log" 2>&1
}

# ---- wait for queue_r19 to release the chip -----------------------------
if [ -f /tmp/q19.pid ]; then
  while kill -0 "$(cat /tmp/q19.pid)" 2>/dev/null; do sleep 30; done
fi

# ---- stage A: krf retrain ------------------------------------------------
if ! is_done krf2_train; then
  RESUME=""
  [ -d runs/krf2_model/last ] && RESUME="--continue-training --resume-from last"
  timeout 1500 python -m sqtpu.train --model keras_rot_fixed --loss explicit \
    --render-size 32 --data online --image-size 256 \
    --batch-size 256 --learning-rate 1e-4 --grad-clip 1.0 \
    $RESUME \
    --plateau-patience 25 --max-epochs 70 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/krf2_model --compare-images 0 --log-interval 50 \
    >> runs/krf2_train.log 2>&1
  [ -d runs/krf2_model/best ] && mark krf2_train
fi

# ---- stage B: krf export + eval, quality-gated ---------------------------
if is_done krf2_train && ! is_done krf2_eval; then
  ACC=$(best_val_acc runs/krf2_model)
  echo "krf2 best val_acc: $ACC"
  if python -c "import sys; sys.exit(0 if float('$ACC') >= 0.2 else 1)"; then
    if export_npz keras_rot_fixed runs/krf2_model \
         artifacts/keras_rot_fixed_fp16.npz > runs/krf2_export.log 2>&1 \
       && [ -s artifacts/keras_rot_fixed_fp16.npz ]; then
      commit_now "Ship the 2019 fixed-variant artifact (keras_rot_fixed: repaired objective + grad clip + neutral-start head)" \
        artifacts/keras_rot_fixed_fp16.npz runs/krf2_model/best.meta.json \
        runs/krf2_model/train_metrics.jsonl
      run_eval artifacts/keras_rot_fixed_fp16.npz eval_krf \
          --model keras_rot_fixed \
        && commit_now "2019 fixed-variant closed-loop eval (n=1000): the repaired regime recovers" \
             runs/eval_krf \
        && mark krf2_eval
    fi
  else
    echo "krf2 did not converge (val_acc $ACC < 0.2)" > runs/krf2_gate.log
    mark krf2_eval
  fi
fi

echo "queue_r20 pass complete"
