#!/bin/bash
# Round-5 follow-on chip queue: starts when queue_r13 finishes (done-file
# or its process exiting, whichever first — if r13 died mid-stage the
# chip is free and proceeding is safe). Stages:
#   A  roofline_explicit: component decomposition of the explicit_sym
#      @128^3 sharp-20 recipe step (VERDICT round-4 weak #2).
#   B  bench refresh: full bench.py with the round-5 fused value+grad
#      explicit kernel and the bf16-encoder explicit variant.
#   C  krf: the 2019 fixed-variant — keras_rot_fixed (2019 conv stack,
#      bounded activations + unit quat) under the repaired 2020 explicit
#      objective, canonical labels; closed-loop n=1000 eval. Completes
#      the README "2019 rotation regime: settled" story with a number.
set -u
cd /root/repo

mark()    { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }
commit_now() { local msg=$1; shift; git add "$@" && git commit -q -m "$msg" || true; }

R13PID=$(cat /tmp/queue_r13.pid 2>/dev/null || echo 0)
while [ ! -f runs/queue_r13.done ] && kill -0 "$R13PID" 2>/dev/null; do
  sleep 60
done

# ---- stage A: explicit-kernel roofline ------------------------------
if ! is_done r14_roofline; then
  timeout 1800 python tools/roofline_explicit.py \
    > runs/roofline_explicit.json 2> runs/roofline_explicit.log \
    && [ -s runs/roofline_explicit.json ] \
    && commit_now "Roofline decomposition of the explicit_sym@128^3 recipe step" \
         runs/roofline_explicit.json \
    && mark r14_roofline
fi

# ---- stage B: bench refresh ------------------------------------------
if ! is_done r14_bench; then
  timeout 2400 python bench.py > runs/bench_r05.json 2> runs/bench_r05.log \
    && [ -s runs/bench_r05.json ] \
    && commit_now "Round-5 bench refresh (fused value+grad explicit kernel, bf16 variant)" \
         runs/bench_r05.json \
    && mark r14_bench
fi

# ---- stage C: 2019 fixed variant -------------------------------------
if ! is_done krf_train; then
  RESUME=""
  [ -d runs/krf_model/last ] && RESUME="--continue-training --resume-from last"
  timeout 2400 python -m sqtpu.train --model keras_rot_fixed --loss explicit \
    --render-size 32 --data online --image-size 256 \
    --batch-size 256 --learning-rate 1e-4 \
    $RESUME \
    --plateau-patience 25 --max-epochs 200 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/krf_model --compare-images 0 --log-interval 50 \
    >> runs/krf_train.log 2>&1
  [ -d runs/krf_model/best ] && mark krf_train
fi
if is_done krf_train && ! is_done krf_eval; then
  if python - keras_rot_fixed runs/krf_model artifacts/keras_rot_fixed_fp16.npz \
       > runs/krf_export.log 2>&1 <<'PYEOF'
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
  then
    [ -s artifacts/keras_rot_fixed_fp16.npz ] \
      && commit_now "Ship the 2019 fixed-variant artifact (keras_rot_fixed under the repaired objective)" \
           artifacts/keras_rot_fixed_fp16.npz
    mkdir -p runs/eval_krf
    python -m sqtpu.evaluate --ckpt-dir artifacts/keras_rot_fixed_fp16.npz \
      --model keras_rot_fixed --n 1000 --batch-size 125 \
      --out-dir runs/eval_krf > runs/eval_krf/eval.log 2>&1 \
      && commit_now "2019 fixed-variant closed-loop eval (n=1000): the repaired objective converges" \
           runs/eval_krf \
      && mark krf_eval
  fi
fi

is_done krf_eval && echo DONE > runs/queue_r14.done
