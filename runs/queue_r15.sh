#!/bin/bash
# Round-5 third chip queue: starts when queue_r14 finishes (done-file or
# its process exiting). Stages:
#   A  ssl2: resolution-annealed SELF-SUPERVISED fine-tune — implicit
#      loss only (no label terms anywhere in training), 96^3, warm-started
#      from the ssl1 from-scratch 64^3 artifact. The whole chain is
#      label-free end-to-end; labels feed only the val IoU meter, exactly
#      the reference regime (torch/train.py:92,146).
#   B  ssl2 export + closed-loop n=1000 eval (+LM).
#   C  corrector + LM combined evals: does 30-step LM on top of the
#      feedforward corrector beat the 0.948 base+LM number?
# Weights/evals are committed the moment each stage lands.
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

R14PID=$(cat /tmp/queue_r14.pid 2>/dev/null || echo 0)
while [ ! -f runs/queue_r14.done ] && kill -0 "$R14PID" 2>/dev/null; do
  sleep 60
done

# ---- stage A: ssl2 — self-supervised 96^3 fine-tune -------------------
# Gated on ssl1 having produced its artifact (queue_r13 stage D).
if [ -s artifacts/resnet_sq_ssl_fp16.npz ] && ! is_done ssl2_train; then
  RESUME="--init-weights artifacts/resnet_sq_ssl_fp16.npz"
  [ -d runs/ssl2_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 3600 python -m sqtpu.train --model resnet_sq --loss implicit \
    --render-size 96 --sigmoid-sharpness 260.0 --tau 1.5 \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 3e-5 \
    $RESUME \
    --plateau-patience 20 --max-epochs 200 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/ssl2_model --compare-images 0 --log-interval 50 \
    >> runs/ssl2_train.log 2>&1
  [ -d runs/ssl2_model/best ] && mark ssl2_train
fi

# ---- stage B: ssl2 export + eval --------------------------------------
if is_done ssl2_train && ! is_done ssl2_eval; then
  if export_npz resnet_sq runs/ssl2_model artifacts/resnet_sq_ssl96_fp16.npz \
       > runs/ssl2_export.log 2>&1 \
     && [ -s artifacts/resnet_sq_ssl96_fp16.npz ]; then
    commit_now "Ship the resolution-annealed self-supervised artifact (implicit-only, 64->96 cubed)" \
      artifacts/resnet_sq_ssl96_fp16.npz
    run_eval artifacts/resnet_sq_ssl96_fp16.npz eval_ssl2 \
      && run_eval artifacts/resnet_sq_ssl96_fp16.npz eval_ssl2_refine_lm \
           --refine lm --refine-steps 30 \
      && commit_now "Annealed self-supervised closed-loop evals (n=1000, +LM)" \
           runs/eval_ssl2 runs/eval_ssl2_refine_lm \
      && mark ssl2_eval
  fi
fi

# ---- stage C: corrector + LM combined evals ----------------------------
if ! is_done c4r_lm_eval; then
  run_eval artifacts/refine_sq_c4r1_fp16.npz eval_c4r1_refine_lm \
      --model refine_sq --refine lm --refine-steps 30 \
    && run_eval artifacts/refine_sq_c4r2_fp16.npz eval_c4r2_refine_lm \
         --model refine_sq --refine lm --refine-steps 30 \
    && commit_now "Corrector + 30-step LM combined closed-loop evals (n=1000)" \
         runs/eval_c4r1_refine_lm runs/eval_c4r2_refine_lm \
    && mark c4r_lm_eval
fi

is_done c4r_lm_eval && { is_done ssl2_eval || [ ! -s artifacts/resnet_sq_ssl_fp16.npz ]; } \
  && echo DONE > runs/queue_r15.done
