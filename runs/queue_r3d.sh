#!/bin/bash
# 6D-rotation-head comparison: same stage A+B recipe as runs/r3_model but
# with --model resnet_sq6d (continuous rotation representation). Lets the
# README compare rotation learning head-to-head at matched budgets.
set -u
cd /root/repo
while [ ! -f runs/queue_r3c.done ]; do sleep 60; done

python -m sqtpu.train --model resnet_sq6d --loss supervised_sym \
  --data synthetic --synthetic-size 100000 --image-size 256 \
  --batch-size 256 \
  --learning-rate 3e-4 --max-epochs 100 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r6d_model --compare-images 0 --log-interval 50 \
  > runs/r6d_stageA.log 2>&1

python -m sqtpu.train --model resnet_sq6d --loss implicit_sym \
  --data synthetic --synthetic-size 100000 --image-size 256 \
  --batch-size 256 \
  --learning-rate 1e-4 --plateau-patience 20 --max-epochs 240 \
  --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r6d_model --continue-training --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r6d_stageB.log 2>&1

mkdir -p runs/eval_r6d
python -m sqtpu.evaluate --model resnet_sq6d --ckpt-dir runs/r6d_model \
  --n 1000 --batch-size 125 --out-dir runs/eval_r6d \
  > runs/eval_r6d/eval.log 2>&1

echo DONE > runs/queue_r3d.done
