#!/bin/bash
# Stage E experiment: online (per-step in-graph fresh data) implicit_sym
# fine-tune from the stage-D model — infinite data, zero memorization.
# Trains into a COPY so the r3 evals stay reproducible, then evals.
set -u
cd /root/repo
while [ ! -f runs/queue_r3b.done ]; do sleep 60; done

rm -rf runs/r3e_model && cp -r runs/r3_model runs/r3e_model

python -m sqtpu.train --loss implicit_sym --data online \
  --image-size 256 --batch-size 256 --render-size 96 \
  --learning-rate 2e-5 --plateau-patience 20 \
  --max-epochs 600 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r3e_model --continue-training --resume-from best \
  --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
  > runs/r3_stageE.log 2>&1

mkdir -p runs/eval_r3e runs/eval_r3e_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/r3e_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r3e \
  > runs/eval_r3e/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/r3e_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r3e_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_r3e_refine_lm/eval.log 2>&1

echo DONE > runs/queue_r3c.done
