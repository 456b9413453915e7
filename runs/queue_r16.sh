#!/bin/bash
# Round-5 fourth chip queue: starts when queue_r15 finishes. One stage
# family: c4r3 — the NOISE-ROBUST render-and-compare corrector.
#
# Motivation (runs/eval_c4r2_mixed): the clean-trained corrector
# collapses on the hardened mixed-noise protocol (full IoU 0.537)
# because its rendered comparison no longer commensurates with a
# corrupted input. Fix = the same recipe that fixed the base CNN
# (queue_s2g.sh): domain-randomized sensor-noise augmentation, with the
# frozen base swapped for the ROBUST flagship and the corrector
# warm-started from the clean corrector (c4r1).
set -u
cd /root/repo

mark()    { echo DONE > "runs/$1.done"; }
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

run_eval() {  # $1 ckpt (dir or npz), $2 out name, extra flags...
  local ckpt=$1 out=$2; shift 2
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir "$ckpt" \
    --n 1000 --batch-size 125 --out-dir "runs/$out" "$@" \
    > "runs/$out/eval.log" 2>&1
}

commit_now() {  # $1 message, rest: paths
  local msg=$1; shift
  git add "$@" && git commit -q -m "$msg" || true
}

R15PID=$(cat /tmp/queue_r15.pid 2>/dev/null || echo 0)
while [ ! -f runs/queue_r15.done ] && kill -0 "$R15PID" 2>/dev/null; do
  sleep 60
done

# ---- stage A: c4r3 noise-robust corrector -----------------------------
if ! is_done c4r3_train; then
  RESUME="--init-weights artifacts/refine_sq_c4r1_fp16.npz --init-base artifacts/resnet_sq_robust_fp16.npz"
  [ -d runs/c4r3_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 3600 python -m sqtpu.train --model refine_sq --loss explicit_sym \
    --render-size 128 --explicit-sharp 20.0 \
    --gauge-weight 2.0 --elong-weight 1.5 --shape-weight 4.0 \
    --freeze-base true \
    --augment-gaussian 0.03 --augment-dropout 0.3 --augment-salt 0.01 \
    --augment-randomize true \
    --data online --image-size 256 \
    --batch-size 128 --remat true --learning-rate 1e-4 \
    $RESUME \
    --plateau-patience 15 --max-epochs 100 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c4r3_model --compare-images 0 --log-interval 50 \
    >> runs/c4r3_train.log 2>&1
  [ -d runs/c4r3_model/best ] && mark c4r3_train
fi

# ---- stage B: export + closed-loop evals (clean + hardened mixed) -----
if is_done c4r3_train && ! is_done c4r3_eval; then
  if export_npz refine_sq runs/c4r3_model artifacts/refine_sq_c4r3_fp16.npz \
       > runs/c4r3_export.log 2>&1 \
     && [ -s artifacts/refine_sq_c4r3_fp16.npz ]; then
    commit_now "Ship the noise-robust corrector artifact (robust base + domain-randomized corrector)" \
      artifacts/refine_sq_c4r3_fp16.npz
    run_eval artifacts/refine_sq_c4r3_fp16.npz eval_c4r3 --model refine_sq \
      && run_eval artifacts/refine_sq_c4r3_fp16.npz eval_c4r3_mixed \
           --model refine_sq \
           --noise-gaussian 0.02 --noise-dropout 0.2 --noise-salt 0.005 \
           --input-filter median \
      && commit_now "Noise-robust corrector closed-loop evals (clean + hardened mixed, n=1000)" \
           runs/eval_c4r3 runs/eval_c4r3_mixed \
      && mark c4r3_eval
  fi
fi

is_done c4r3_eval && echo DONE > runs/queue_r16.done
