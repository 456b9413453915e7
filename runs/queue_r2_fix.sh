#!/bin/bash
# Stages B-D + final eval (stage A already done in runs/r2_model).
# Fixes the bare --continue-training flags that killed the first queue.
set -u
cd /root/repo

python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --learning-rate 1e-4 --max-epochs 180 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r2_model --continue-training true --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r2_stageB.log 2>&1

python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --render-size 96 \
  --learning-rate 1e-4 --max-epochs 340 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r2_model --continue-training true --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r2_stageC.log 2>&1

python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --render-size 96 \
  --learning-rate 2e-5 --max-epochs 440 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r2_model --continue-training true --resume-from best \
  --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
  > runs/r2_stageD.log 2>&1

mkdir -p runs/eval_r2
python -m sqtpu.evaluate --ckpt-dir runs/r2_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r2 --save-pairs 4 \
  > runs/eval_r2/eval.log 2>&1

echo DONE > runs/queue_r2.done
