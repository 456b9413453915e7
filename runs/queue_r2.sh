#!/bin/bash
# Round-2 (session 2) training queue: rebuild the staged rotation recipe
# (the round's earlier weights were workspace-local and lost on reset),
# with a longer stage C and a new low-LR stage D to push full IoU.
set -u
cd /root/repo

# Stage A: symmetry-aware supervised warm-up
python -m sqtpu.train --loss supervised_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --learning-rate 1e-4 --max-epochs 100 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r2_model --compare-images 2 --log-interval 50 \
  > runs/r2_stageA.log 2>&1

# Stage B: implicit_sym fine-tune @64^3 (self-supervised + sym anchor)
python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --learning-rate 1e-4 --max-epochs 180 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r2_model --continue-training --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r2_stageB.log 2>&1

# Stage C: implicit_sym @96^3, LR restart, longer than last time
python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --render-size 96 \
  --learning-rate 1e-4 --max-epochs 340 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r2_model --continue-training --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r2_stageC.log 2>&1

# Stage D: low-LR polish @96^3
python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --render-size 96 \
  --learning-rate 2e-5 --max-epochs 440 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r2_model --continue-training --resume-from best \
  --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
  > runs/r2_stageD.log 2>&1

# Final closed-loop eval (reference protocol, n=1000, IoU@128^3)
mkdir -p runs/eval_r2
python -m sqtpu.evaluate --ckpt-dir runs/r2_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r2 --save-pairs 4 \
  > runs/eval_r2/eval.log 2>&1

echo DONE > runs/queue_r2.done
