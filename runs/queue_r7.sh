#!/bin/bash
# keras_chamfer stability fix rerun: natural clamp subgradient + penalty
set -u
cd /root/repo
timeout 2400 python -m sqtpu.train --model keras_rot --loss keras_chamfer \
  --data synthetic --synthetic-size 30000 --image-size 256 \
  --batch-size 128 --learning-rate 1e-3 --lr-schedule step2019 \
  --max-epochs 60 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/kerasrot3_model --compare-images 0 --log-interval 50 \
  > runs/kerasrot3_train.log 2>&1
mkdir -p runs/eval_kerasrot3
python -m sqtpu.evaluate --ckpt-dir runs/kerasrot3_model --model keras_rot \
  --n 1000 --batch-size 125 --out-dir runs/eval_kerasrot3 \
  > runs/eval_kerasrot3/eval.log 2>&1
echo DONE > runs/queue_r7.done
