#!/bin/bash
# Round-5 chip queue. Stages (each gated on the previous stage's EXIT
# STATUS and on its artifacts actually existing — the round-4 advisor
# flagged unconditional done-marks):
#   A  c4c finalize: export the epoch-106 best (val IoU 0.9008, the
#      un-time-boxed resume of the annealed 128^3 sharp-20 stage) and
#      evaluate THE NPZ ARTIFACT ITSELF (advisor: the shipped fp16 file
#      was never directly evaluated), n=1000 closed loop + LM refine.
#   B  c4r1: render-and-compare corrector (models/refiner.py), base
#      frozen at the c4c artifact, corrector LR 1e-4 @128^3 sharp 20.
#   C  c4r2: end-to-end polish, everything unfrozen, LR 3e-6.
#   D  ssl1: the reference's self-supervised-ONLY regime on the current
#      stack — implicit loss (no label terms), from scratch, 64^3
#      sharp 260 (torch/train.py:62-66,92 semantics), fused kernel.
#   E  serve_bench: concurrent-client latency of the serving daemon.
# Weights/evals are committed the moment each stage lands (VM resets
# wipe gitignored checkpoints; runs/queue_r12.sh learned this).
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

# ---- stage A: finalize c4c ------------------------------------------
if ! is_done r13_export; then
  if export_npz resnet_sq runs/c4c_model artifacts/resnet_sq_c4_fp16.npz \
       > runs/r13_export.log 2>&1 \
     && [ -s artifacts/resnet_sq_c4_fp16.npz ]; then
    commit_now "Ship the un-time-boxed c4c flagship artifact (epoch-106 best, val IoU 0.9008)" \
      artifacts/resnet_sq_c4_fp16.npz
    mark r13_export
  else
    echo "export failed; aborting queue" >> runs/r13_export.log
    exit 1
  fi
fi

if is_done r13_export && ! is_done r13_c4c_eval; then
  run_eval artifacts/resnet_sq_c4_fp16.npz eval_c4c3 \
    && run_eval artifacts/resnet_sq_c4_fp16.npz eval_c4c3_refine_lm \
         --refine lm --refine-steps 30 \
    && commit_now "Eval the shipped c4c fp16 artifact directly (n=1000 closed loop, +LM refine)" \
         runs/eval_c4c3 runs/eval_c4c3_refine_lm \
    && mark r13_c4c_eval
fi

# ---- stage B: c4r1 frozen-base corrector ----------------------------
if is_done r13_c4c_eval && ! is_done c4r1_train; then
  RESUME="--init-base artifacts/resnet_sq_c4_fp16.npz"
  [ -d runs/c4r1_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 5400 python -m sqtpu.train --model refine_sq --loss explicit_sym \
    --render-size 128 --explicit-sharp 20.0 \
    --gauge-weight 2.0 --elong-weight 1.5 --shape-weight 4.0 \
    --freeze-base true \
    --data online --image-size 256 \
    --batch-size 128 --remat true --learning-rate 1e-4 \
    $RESUME \
    --plateau-patience 15 --max-epochs 150 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c4r1_model --compare-images 0 --log-interval 50 \
    >> runs/c4r1_train.log 2>&1
  # timeout kill is fine: best/ is written on every val improvement
  [ -d runs/c4r1_model/best ] && mark c4r1_train
fi
if is_done c4r1_train && ! is_done c4r1_eval; then
  if export_npz refine_sq runs/c4r1_model artifacts/refine_sq_c4r1_fp16.npz \
       > runs/c4r1_export.log 2>&1 \
     && [ -s artifacts/refine_sq_c4r1_fp16.npz ]; then
    commit_now "Ship the c4r1 frozen-base corrector artifact" \
      artifacts/refine_sq_c4r1_fp16.npz
    run_eval artifacts/refine_sq_c4r1_fp16.npz eval_c4r1 --model refine_sq \
      && commit_now "c4r1 corrector closed-loop eval (n=1000)" runs/eval_c4r1 \
      && mark c4r1_eval
  fi
fi

# ---- stage C: c4r2 end-to-end polish --------------------------------
if is_done c4r1_eval && ! is_done c4r2_train; then
  RESUME="--init-weights artifacts/refine_sq_c4r1_fp16.npz"
  [ -d runs/c4r2_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 2700 python -m sqtpu.train --model refine_sq --loss explicit_sym \
    --render-size 128 --explicit-sharp 20.0 \
    --gauge-weight 2.0 --elong-weight 1.5 --shape-weight 4.0 \
    --data online --image-size 256 \
    --batch-size 128 --remat true --learning-rate 3e-6 \
    $RESUME \
    --plateau-patience 15 --max-epochs 100 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c4r2_model --compare-images 0 --log-interval 50 \
    >> runs/c4r2_train.log 2>&1
  [ -d runs/c4r2_model/best ] && mark c4r2_train
fi
if is_done c4r2_train && ! is_done c4r2_eval; then
  if export_npz refine_sq runs/c4r2_model artifacts/refine_sq_c4r2_fp16.npz \
       > runs/c4r2_export.log 2>&1 \
     && [ -s artifacts/refine_sq_c4r2_fp16.npz ]; then
    commit_now "Ship the c4r2 end-to-end-polished corrector artifact" \
      artifacts/refine_sq_c4r2_fp16.npz
    run_eval artifacts/refine_sq_c4r2_fp16.npz eval_c4r2 --model refine_sq \
      && run_eval artifacts/refine_sq_c4r2_fp16.npz eval_c4r2_mixed \
           --model refine_sq \
           --noise-gaussian 0.02 --noise-dropout 0.2 --noise-salt 0.005 \
           --input-filter median \
      && commit_now "c4r2 corrector closed-loop evals (clean + mixed noise)" \
           runs/eval_c4r2 runs/eval_c4r2_mixed \
      && mark c4r2_eval
  fi
fi

# ---- stage D: self-supervised-only regime, current stack ------------
if is_done c4r2_eval && ! is_done ssl1_train; then
  RESUME=""
  [ -d runs/ssl1_model/last ] && \
    RESUME="--continue-training --resume-from last"
  timeout 4200 python -m sqtpu.train --model resnet_sq --loss implicit \
    --render-size 64 --sigmoid-sharpness 260.0 --tau 1.5 \
    --data online --image-size 256 \
    --batch-size 512 --learning-rate 1e-4 \
    $RESUME \
    --plateau-patience 25 --max-epochs 300 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/ssl1_model --compare-images 0 --log-interval 50 \
    >> runs/ssl1_train.log 2>&1
  [ -d runs/ssl1_model/best ] && mark ssl1_train
fi
if is_done ssl1_train && ! is_done ssl1_eval; then
  if export_npz resnet_sq runs/ssl1_model artifacts/resnet_sq_ssl_fp16.npz \
       > runs/ssl1_export.log 2>&1 \
     && [ -s artifacts/resnet_sq_ssl_fp16.npz ]; then
    commit_now "Ship the self-supervised-only (implicit, no labels) artifact" \
      artifacts/resnet_sq_ssl_fp16.npz
    run_eval artifacts/resnet_sq_ssl_fp16.npz eval_ssl1 \
      && run_eval artifacts/resnet_sq_ssl_fp16.npz eval_ssl1_refine_lm \
           --refine lm --refine-steps 30 \
      && commit_now "Self-supervised-only closed-loop evals (n=1000, +LM)" \
           runs/eval_ssl1 runs/eval_ssl1_refine_lm \
      && mark ssl1_eval
  fi
fi

# ---- stage E: serving latency under concurrent load ------------------
if is_done ssl1_eval && ! is_done serve_bench; then
  timeout 1200 python tools/serve_bench.py \
    --ckpt artifacts/resnet_sq_c4_fp16.npz \
    --out runs/serve_bench.json > runs/serve_bench.log 2>&1 \
    && [ -s runs/serve_bench.json ] \
    && commit_now "Serving-daemon latency benchmark (concurrent clients)" \
         runs/serve_bench.json \
    && mark serve_bench
fi

is_done serve_bench && echo DONE > runs/queue_r13.done
