#!/bin/bash
# Round-3 revised main queue. Replaces queue_r4's stages B-E and
# supersedes queue_r4b: the supervised_geo warm-up measured WORSE than
# round-2's supervised_sym (val sym-angle 1.28 @63 vs 1.12 @50 — the geo
# term is a negative result, kept documented in runs/r4_stageA.log), and
# the D4 gauge discovery points at a better recipe:
#  1. Re-eval the explicit model with gauge metrics (quantify discovery).
#  2. explicit_gauge: occupancy-MSE geometry + D4 decomposition anchor —
#     target: canonical decompositions WITH the 0.92 full IoU.
#  3-4. implicit_gauge self-supervised fine-tune @96^3 then @128^3 (the
#     2020 implicit story with a well-posed anchor), same ckpt dir.
#  5. 2019 keras rotation regime re-run (straight-through clamp fix).
#  6. supervised_gauge solo warm-up (science row vs supervised_sym 0.87).
set -u
cd /root/repo

# ---------------------------------------------------------------- 1
mkdir -p runs/eval_explicit_gaugemetrics
python -m sqtpu.evaluate --ckpt-dir runs/explicit_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_explicit_gaugemetrics \
  > runs/eval_explicit_gaugemetrics/eval.log 2>&1

# ---------------------------------------------------------------- 2
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
# snapshot the explicit_gauge weights before fine-tuning continues
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
save_weights_npz("runs/gauge_model/weights_explicit_gauge_fp16.npz",
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported explicit_gauge weights from epoch", ep)
EOF

# ---------------------------------------------------------------- 3
timeout 5400 python -m sqtpu.train --loss implicit_gauge --aux-weight 0.1 \
  --elong-weight 1.0 --data synthetic --synthetic-size 150000 \
  --image-size 256 --batch-size 256 --remat true --render-size 96 \
  --learning-rate 5e-5 --plateau-patience 20 --max-epochs 340 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/gauge_model --continue-training --resume-from best \
  --reset-lr 5e-5 --compare-images 0 --log-interval 50 \
  > runs/gauge_impl96.log 2>&1
mkdir -p runs/eval_gauge_impl96
python -m sqtpu.evaluate --ckpt-dir runs/gauge_model --n 500 \
  --batch-size 125 --out-dir runs/eval_gauge_impl96 \
  > runs/eval_gauge_impl96/eval.log 2>&1

# ---------------------------------------------------------------- 4
timeout 7200 python -m sqtpu.train --loss implicit_gauge --aux-weight 0.1 \
  --elong-weight 1.0 --data synthetic --synthetic-size 150000 \
  --image-size 256 --batch-size 256 --remat true --render-size 128 \
  --learning-rate 2e-5 --plateau-patience 20 --max-epochs 460 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/gauge_model --continue-training --resume-from best \
  --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
  > runs/gauge_impl128.log 2>&1
mkdir -p runs/eval_gauge_final runs/eval_gauge_final_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/gauge_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_gauge_final --save-pairs 4 \
  > runs/eval_gauge_final/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/gauge_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_gauge_final_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_gauge_final_refine_lm/eval.log 2>&1

# ---------------------------------------------------------------- 5
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

# ---------------------------------------------------------------- 6
timeout 3600 python -m sqtpu.train --loss supervised_gauge \
  --elong-weight 1.0 --data synthetic --synthetic-size 150000 \
  --image-size 256 --batch-size 256 --remat true \
  --learning-rate 3e-4 --max-epochs 120 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/supgauge_model --compare-images 0 --log-interval 50 \
  > runs/supgauge_train.log 2>&1
mkdir -p runs/eval_supgauge
python -m sqtpu.evaluate --ckpt-dir runs/supgauge_model --n 500 \
  --batch-size 125 --out-dir runs/eval_supgauge \
  > runs/eval_supgauge/eval.log 2>&1

# Final portable weights + bench refresh
python - <<'EOF' > runs/export_weights_gauge_final.log 2>&1
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
print("exported final weights from epoch", ep)
EOF
python bench.py > runs/bench_r03.json 2> runs/bench_r03.err

echo DONE > runs/queue_r4c.done
