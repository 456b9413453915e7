#!/bin/bash
# Round-3 training queue (VERDICT round-2 tasks 1, 3, 4):
#  1. keras_rot under keras_chamfer — the 2019 rotation regime
#     (py/train_rotation.py:36-40 + py/loss_functions.py:91-101),
#     newly selectable via --loss keras_chamfer.
#  2. An explicit-loss-trained ResNetSQ (torch/train.py:62-63's other
#     headline mode) + closed-loop eval -> the explicit-vs-implicit row.
#  3. The upgraded staged rotation recipe: supervised_geo warm-up (the
#     untried observability-weighted loss), 150k images (reference scale,
#     gen_rand_rot.py:17), --elong-weight 1 (full-IoU residual correlates
#     r=-0.61 with elongation), and 128^3 fine-tune stages.
# Stages checkpoint + eval incrementally so partial completion still
# yields artifacts.
set -u
cd /root/repo

# ---------------------------------------------------------------- 1
timeout 2400 python -m sqtpu.train --model keras_rot --loss keras_chamfer \
  --data synthetic --synthetic-size 30000 --image-size 256 \
  --batch-size 128 --learning-rate 1e-3 --lr-schedule step2019 \
  --max-epochs 40 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/kerasrot_model --compare-images 0 --log-interval 50 \
  > runs/kerasrot_train.log 2>&1
mkdir -p runs/eval_kerasrot
python -m sqtpu.evaluate --ckpt-dir runs/kerasrot_model --model keras_rot \
  --n 1000 --batch-size 125 --out-dir runs/eval_kerasrot \
  > runs/eval_kerasrot/eval.log 2>&1

# ---------------------------------------------------------------- 2
timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit --render-size 32 \
  --data synthetic --synthetic-size 100000 --image-size 256 \
  --batch-size 256 --learning-rate 1e-4 --plateau-patience 25 \
  --max-epochs 150 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/explicit_model --compare-images 2 --log-interval 50 \
  > runs/explicit_train.log 2>&1
mkdir -p runs/eval_explicit
python -m sqtpu.evaluate --ckpt-dir runs/explicit_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_explicit --save-pairs 4 \
  > runs/eval_explicit/eval.log 2>&1

# ---------------------------------------------------------------- 3
# Stage A: supervised_geo warm-up (quat-sym + second-moment orientation
# + param MSE, elongation-weighted), 150k images
timeout 3600 python -m sqtpu.train --loss supervised_geo --geo-weight 1.0 \
  --elong-weight 1.0 --data synthetic --synthetic-size 150000 \
  --image-size 256 --batch-size 256 --remat true \
  --learning-rate 3e-4 --max-epochs 120 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r4_model --compare-images 2 --log-interval 50 \
  > runs/r4_stageA.log 2>&1
mkdir -p runs/eval_r4_warmup
python -m sqtpu.evaluate --ckpt-dir runs/r4_model --n 500 \
  --batch-size 125 --out-dir runs/eval_r4_warmup \
  > runs/eval_r4_warmup/eval.log 2>&1

# Stage B: implicit_sym fine-tune @64^3
timeout 7200 python -m sqtpu.train --loss implicit_sym --elong-weight 1.0 \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true \
  --learning-rate 1e-4 --plateau-patience 20 --max-epochs 260 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r4_model --continue-training --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r4_stageB.log 2>&1

# Stage C: implicit_sym @96^3, LR restart
timeout 7200 python -m sqtpu.train --loss implicit_sym --elong-weight 1.0 \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --render-size 96 \
  --learning-rate 1e-4 --plateau-patience 20 --max-epochs 420 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r4_model --continue-training --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r4_stageC.log 2>&1
mkdir -p runs/eval_r4_stageC
python -m sqtpu.evaluate --ckpt-dir runs/r4_model --n 500 \
  --batch-size 125 --out-dir runs/eval_r4_stageC \
  > runs/eval_r4_stageC/eval.log 2>&1

# Stage D: implicit_sym @128^3 (first time at eval resolution)
timeout 7200 python -m sqtpu.train --loss implicit_sym --elong-weight 1.0 \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --render-size 128 \
  --learning-rate 5e-5 --plateau-patience 20 --max-epochs 540 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r4_model --continue-training --resume-from best \
  --reset-lr 5e-5 --compare-images 0 --log-interval 50 \
  > runs/r4_stageD.log 2>&1

# Stage E: low-LR polish @128^3
timeout 7200 python -m sqtpu.train --loss implicit_sym --elong-weight 1.0 \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --render-size 128 \
  --learning-rate 1e-5 --plateau-patience 20 --max-epochs 600 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r4_model --continue-training --resume-from best \
  --reset-lr 1e-5 --compare-images 0 --log-interval 50 \
  > runs/r4_stageE.log 2>&1

# Final closed-loop evals (reference protocol, n=1000, IoU@128^3)
mkdir -p runs/eval_r4 runs/eval_r4_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/r4_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r4 --save-pairs 4 \
  > runs/eval_r4/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/r4_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r4_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_r4_refine_lm/eval.log 2>&1

# Portable weights artifact
python - <<'EOF' > runs/export_weights_r4.log 2>&1
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model, export_torchvision_resnet18
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
import numpy as np

model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint("runs/r4_model/best", state)
v = {"params": state.params, "batch_stats": state.batch_stats}
save_weights_npz("runs/r4_model/weights_fp16.npz", v)
sd = export_torchvision_resnet18(v)
np.savez_compressed("runs/r4_model/encoder.npz", **sd)
print("exported weights from epoch", ep)
EOF

# headline bench refresh (now on real rendered images)
python bench.py > runs/bench_r03.json 2> runs/bench_r03.err

echo DONE > runs/queue_r4.done
