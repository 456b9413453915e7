#!/bin/bash
# Round-3 revised queue (replaces queue_r4d stages 2-tail/3): the implicit
# fine-tune's fixed point (val IoU ~0.795 and flat) is BELOW the explicit
# canon model (0.884), so the @128 implicit stage is dropped. Stage-1
# diagnosis: the x100-scaled explicit term drowned the weight-1.0 rotation
# anchor (supervised_sym alone warms rotation to ~0.85 rad sym-angle;
# explicit_sym with gauge-weight 1.0 left it at 1.06 while geometry hit
# 0.879 full IoU). canon2 re-runs explicit_sym warm-started from the saved
# stage-1 weights with gauge-weight 8 so the anchor competes.
set -u
cd /root/repo

# 0. wait for the detached stage-2 train to end naturally
while kill -0 $(cat /tmp/stage2.pid) 2>/dev/null; do sleep 20; done

# 1. closed-loop eval of the implicit@96 fine-tune (info: rotation/geometry trade)
mkdir -p runs/eval_canon96
python -m sqtpu.evaluate --ckpt-dir runs/canon_model --n 500 \
  --batch-size 125 --out-dir runs/eval_canon96 > runs/eval_canon96/eval.log 2>&1

# 2. canon2: explicit_sym, strong anchor, warm-start from stage-1 weights
timeout 4500 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
  --render-size 32 --gauge-weight 8.0 --elong-weight 1.0 \
  --init-weights runs/canon_model/weights_explicit_fp16.npz \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --learning-rate 5e-5 \
  --plateau-patience 25 --max-epochs 200 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/canon2_model --compare-images 0 --log-interval 50 \
  > runs/canon2_train.log 2>&1
mkdir -p runs/eval_canon2
python -m sqtpu.evaluate --ckpt-dir runs/canon2_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_canon2 --save-pairs 4 \
  > runs/eval_canon2/eval.log 2>&1

echo DONE > runs/queue_r5.done
