#!/bin/bash
# Post-queue: hybrid lm+gd refined eval on the final r3 model.
set -u
cd /root/repo
while [ ! -f runs/queue_r3.done ]; do sleep 60; done

mkdir -p runs/eval_r3_refine_lmgd
python -m sqtpu.evaluate --ckpt-dir runs/r3_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r3_refine_lmgd \
  --refine lm+gd --refine-steps 30 --refine-size 64 --refine-lr 3e-3 \
  > runs/eval_r3_refine_lmgd/eval.log 2>&1

echo DONE > runs/queue_r3b.done
