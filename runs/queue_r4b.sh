#!/bin/bash
# Round-3 follow-up queue (after queue_r4):
#  1. Re-eval the explicit model with the new D4 gauge metrics — expect
#     the "chance" D2 sym-angle to collapse to a small gauge-angle,
#     quantifying the decomposition-gauge discovery.
#  2. Re-run the 2019 keras rotation regime with the straight-through
#     clamp + range-penalty fix.
#  3. Train the explicit_gauge candidate: occupancy-MSE geometry (0.92
#     full IoU on its own) + the D4 gauge-aware decomposition anchor, to
#     get canonical decompositions (high rot-IoU / low gauge-angle) WITH
#     the explicit model's geometry.
#  4. implicit_gauge self-supervised polish of that model (the 2020
#     paper's implicit story, now with a well-posed anchor).
set -u
cd /root/repo

# ---------------------------------------------------------------- 1
mkdir -p runs/eval_explicit_gaugemetrics
python -m sqtpu.evaluate --ckpt-dir runs/explicit_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_explicit_gaugemetrics \
  > runs/eval_explicit_gaugemetrics/eval.log 2>&1

# ---------------------------------------------------------------- 2
timeout 2400 python -m sqtpu.train --model keras_rot --loss keras_chamfer \
  --data synthetic --synthetic-size 30000 --image-size 256 \
  --batch-size 128 --learning-rate 1e-3 --lr-schedule step2019 \
  --max-epochs 60 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/kerasrot2_model --compare-images 0 --log-interval 50 \
  > runs/kerasrot2_train.log 2>&1
mkdir -p runs/eval_kerasrot2
python -m sqtpu.evaluate --ckpt-dir runs/kerasrot2_model --model keras_rot \
  --n 1000 --batch-size 125 --out-dir runs/eval_kerasrot2 \
  > runs/eval_kerasrot2/eval.log 2>&1

# ---------------------------------------------------------------- 3
timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit_gauge \
  --render-size 32 --gauge-weight 1.0 --elong-weight 1.0 \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --learning-rate 1e-4 \
  --plateau-patience 25 --max-epochs 180 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/gauge_model --compare-images 2 --log-interval 50 \
  > runs/gauge_train.log 2>&1
mkdir -p runs/eval_gauge runs/eval_gauge_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/gauge_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_gauge --save-pairs 4 \
  > runs/eval_gauge/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/gauge_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_gauge_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_gauge_refine_lm/eval.log 2>&1

# ---------------------------------------------------------------- 4
timeout 5400 python -m sqtpu.train --loss implicit_gauge --aux-weight 0.1 \
  --elong-weight 1.0 --data synthetic --synthetic-size 150000 \
  --image-size 256 --batch-size 256 --remat true --render-size 96 \
  --learning-rate 5e-5 --plateau-patience 20 --max-epochs 280 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/gauge_model --continue-training --resume-from best \
  --reset-lr 5e-5 --compare-images 0 --log-interval 50 \
  > runs/gauge_implicit.log 2>&1
mkdir -p runs/eval_gauge_impl
python -m sqtpu.evaluate --ckpt-dir runs/gauge_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_gauge_impl \
  > runs/eval_gauge_impl/eval.log 2>&1

# Portable weights
python - <<'EOF' > runs/export_weights_gauge.log 2>&1
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig

model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint("runs/gauge_model/best", state)
save_weights_npz("runs/gauge_model/weights_fp16.npz",
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported weights from epoch", ep)
EOF

echo DONE > runs/queue_r4b.done
