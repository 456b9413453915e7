#!/bin/bash
# Round-5 chip queue, part 2 (after queue_r17): the r17 krf stage
# collapsed to the shrink-to-sliver spurious minimum (runs/krf_train.log
# epoch 0-91, IoU exactly 0) — the trainer now has --grad-clip and
# keras_rot_fixed a neutral-start head (commit 55c3572), and the fixed
# run was relaunched OUTSIDE the queue (pid in /tmp/krf.pid). Stages:
#   A  krf export+eval   — waits for that trainer, gated on val_acc>=0.2
#                          (no "converges" commit for a non-converged model)
#   B  c4r_lm_eval       — corrector + 30-step LM combined evals
#   C  bench refresh     — fused value+grad explicit kernel numbers
#   D  ssl2              — self-supervised 64->96^3 anneal + eval
#   E  c4r3              — noise-robust corrector + eval
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

# ---- stage A: krf — wait for the external trainer, then gate on quality --
if ! is_done krf_eval; then
  while [ -f /tmp/krf.pid ] && kill -0 "$(cat /tmp/krf.pid)" 2>/dev/null; do
    sleep 60
  done
  ACC=$(best_val_acc runs/krf_model)
  echo "krf best val_acc: $ACC"
  if python -c "import sys; sys.exit(0 if float('$ACC') >= 0.2 else 1)"; then
    if export_npz keras_rot_fixed runs/krf_model \
         artifacts/keras_rot_fixed_fp16.npz > runs/krf_export.log 2>&1 \
       && [ -s artifacts/keras_rot_fixed_fp16.npz ]; then
      commit_now "Ship the 2019 fixed-variant artifact (keras_rot_fixed, repaired objective + bounded optimization)" \
        artifacts/keras_rot_fixed_fp16.npz runs/krf_model/best.meta.json \
        runs/krf_model/train_metrics.jsonl
      run_eval artifacts/keras_rot_fixed_fp16.npz eval_krf \
          --model keras_rot_fixed \
        && commit_now "2019 fixed-variant closed-loop eval (n=1000)" runs/eval_krf \
        && mark krf_eval
    fi
  else
    echo "krf did not converge (val_acc $ACC < 0.2); leaving unmarked" \
      > runs/krf_gate.log
    mark krf_eval  # do not block the rest of the queue
  fi
fi

# ---- stage B: corrector + LM combined evals -----------------------------
if ! is_done c4r_lm_eval; then
  run_eval artifacts/refine_sq_c4r1_fp16.npz eval_c4r1_refine_lm \
      --model refine_sq --refine lm --refine-steps 30 \
    && run_eval artifacts/refine_sq_c4r2_fp16.npz eval_c4r2_refine_lm \
         --model refine_sq --refine lm --refine-steps 30 \
    && commit_now "Corrector + 30-step LM combined closed-loop evals (n=1000)" \
         runs/eval_c4r1_refine_lm runs/eval_c4r2_refine_lm \
    && mark c4r_lm_eval
fi

# ---- stage C: bench refresh ----------------------------------------------
if ! is_done r14_bench; then
  timeout 2400 python bench.py > runs/bench_r05.json 2> runs/bench_r05.log \
    && [ -s runs/bench_r05.json ] \
    && commit_now "Round-5 bench refresh (fused value+grad explicit kernel)" \
         runs/bench_r05.json \
    && mark r14_bench
fi

# ---- stage D: ssl2 — self-supervised 96^3 anneal -------------------------
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
if is_done ssl2_train && ! is_done ssl2_eval; then
  if export_npz resnet_sq runs/ssl2_model artifacts/resnet_sq_ssl96_fp16.npz \
       > runs/ssl2_export.log 2>&1 \
     && [ -s artifacts/resnet_sq_ssl96_fp16.npz ]; then
    commit_now "Ship the resolution-annealed self-supervised artifact (implicit-only, 64->96 cubed)" \
      artifacts/resnet_sq_ssl96_fp16.npz runs/ssl2_model/best.meta.json \
      runs/ssl2_model/train_metrics.jsonl
    run_eval artifacts/resnet_sq_ssl96_fp16.npz eval_ssl2 \
      && run_eval artifacts/resnet_sq_ssl96_fp16.npz eval_ssl2_refine_lm \
           --refine lm --refine-steps 30 \
      && commit_now "Annealed self-supervised closed-loop evals (n=1000, +LM)" \
           runs/eval_ssl2 runs/eval_ssl2_refine_lm \
      && mark ssl2_eval
  fi
fi

# ---- stage E: c4r3 noise-robust corrector --------------------------------
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
if is_done c4r3_train && ! is_done c4r3_eval; then
  if export_npz refine_sq runs/c4r3_model artifacts/refine_sq_c4r3_fp16.npz \
       > runs/c4r3_export.log 2>&1 \
     && [ -s artifacts/refine_sq_c4r3_fp16.npz ]; then
    commit_now "Ship the noise-robust corrector artifact (robust base + domain-randomized corrector)" \
      artifacts/refine_sq_c4r3_fp16.npz runs/c4r3_model/best.meta.json \
      runs/c4r3_model/train_metrics.jsonl
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

echo "queue_r18 pass complete: $(ls runs/*.done 2>/dev/null | wc -l) markers"
