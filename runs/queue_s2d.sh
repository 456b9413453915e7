#!/bin/bash
# Robustness-closure queue (chained behind queue_s2b's graded-noise
# evals): the clean-trained flagship collapses under mixed sensor
# corruption (measured by eval_c3_mixed); fine-tune it WITH the new
# training-time noise augmentation (--augment-*, same corruption model
# as the eval protocol) and re-run the SAME evals. Done = the
# robustness story has its fix, not just its measurement.
set -u
cd /root/repo
while [ ! -f runs/queue_s2b.done ]; do sleep 60; done

done_mark() { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }

# ---- Noise-augmented fine-tune from the stage-3 polish artifact.
# Supervised gauge-anchored loss (labels untouched by the corruption);
# online data so every step sees fresh shapes AND fresh noise.
# done-marker only on clean exit: a timeout/crash leaves the stage
# resumable from the 'last' checkpoint on the next queue launch.
if ! is_done c3n_s1; then
  RESUME=""
  [ -d runs/c3n_model/last ] && \
    RESUME="--continue-training --resume-from last" || \
    RESUME="--init-weights artifacts/resnet_sq_hires_fp16.npz"
  timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 64 --gauge-weight 2.0 --elong-weight 1.0 \
    $RESUME \
    --augment-gaussian 0.02 --augment-dropout 0.2 --augment-salt 0.005 \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 1e-5 \
    --plateau-patience 20 --max-epochs 130 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c3n_model --compare-images 0 --log-interval 50 \
    >> runs/c3_noiseft.log 2>&1 \
    && done_mark c3n_s1 \
    || echo "c3n_s1 train exited nonzero (rc=$?) — will resume on relaunch" \
         >> runs/c3_noiseft.log
fi

# ---- Re-run the robustness protocol on the augmented model:
# mixed corruption (the config the clean model collapsed under),
# plus clean (did robustness cost clean accuracy?). Requires a real
# best checkpoint — evaluating a random init would poison the table.
run_eval() {  # $1 out name, extra flags...
  local out=$1; shift
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir runs/c3n_model --n 1000 \
    --batch-size 125 --out-dir "runs/$out" "$@" > "runs/$out/eval.log" 2>&1
}
if is_done c3n_s1 && ! is_done c3n_eval && [ -d runs/c3n_model/best ]; then
  run_eval eval_c3n_mixed --noise-gaussian 0.02 --noise-dropout 0.2 \
    --noise-salt 0.005
  run_eval eval_c3n_clean
  run_eval eval_c3n_ng03 --noise-gaussian 0.03
  run_eval eval_c3n_nd20 --noise-dropout 0.2
  done_mark c3n_eval
fi

# Release the chain even if the fine-tune failed: queue_s2e's
# c3_model rows don't need c3n_model (it records a skip marker for
# the one row that does). A later manual relaunch of this script can
# still resume the fine-tune and fill in the c3n evals.
echo DONE > runs/queue_s2d.done
