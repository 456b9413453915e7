#!/bin/bash
# Round-3 canonical-gauge queue (supersedes r4c items 2-6): train with
# gauge-CANONICAL labels (a1 >= a2; sample_params default since
# canonicalize_gauge landed) so image -> decomposition is well-posed.
#  1. explicit_sym on canonical labels (explicit geometry + D2 anchor) — headline candidate: explicit
#     geometry (0.92 full IoU) + now-unambiguous decomposition anchor.
#  2. implicit_sym self-supervised fine-tune @96^3 then @128^3.
#  3. 2019 keras rotation regime re-run (straight-through clamp fix).
set -u
cd /root/repo

# ---------------------------------------------------------------- 1
timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
  --render-size 32 --gauge-weight 1.0 --elong-weight 1.0 \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --learning-rate 1e-4 \
  --plateau-patience 25 --max-epochs 180 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/canon_model --compare-images 2 --log-interval 50 \
  > runs/canon_train.log 2>&1
mkdir -p runs/eval_canon
python -m sqtpu.evaluate --ckpt-dir runs/canon_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_canon --save-pairs 4 \
  > runs/eval_canon/eval.log 2>&1
python - <<'EOF' > runs/export_weights_canon.log 2>&1
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint("runs/canon_model/best", state)
save_weights_npz("runs/canon_model/weights_explicit_fp16.npz",
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported canonical explicit_gauge weights from epoch", ep)
EOF

# ---------------------------------------------------------------- 2
timeout 5400 python -m sqtpu.train --loss implicit_sym --aux-weight 0.1 \
  --elong-weight 1.0 --data synthetic --synthetic-size 150000 \
  --image-size 256 --batch-size 256 --remat true --render-size 96 \
  --learning-rate 5e-5 --plateau-patience 20 --max-epochs 340 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/canon_model --continue-training --resume-from best \
  --reset-lr 5e-5 --compare-images 0 --log-interval 50 \
  > runs/canon_impl96.log 2>&1
mkdir -p runs/eval_canon96
python -m sqtpu.evaluate --ckpt-dir runs/canon_model --n 500 \
  --batch-size 125 --out-dir runs/eval_canon96 \
  > runs/eval_canon96/eval.log 2>&1

timeout 7200 python -m sqtpu.train --loss implicit_sym --aux-weight 0.1 \
  --elong-weight 1.0 --data synthetic --synthetic-size 150000 \
  --image-size 256 --batch-size 256 --remat true --render-size 128 \
  --learning-rate 2e-5 --plateau-patience 20 --max-epochs 460 \
  --steps-per-epoch 100 --val-steps 5 --acc-render-size 64 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/canon_model --continue-training --resume-from best \
  --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
  > runs/canon_impl128.log 2>&1
mkdir -p runs/eval_canon_final runs/eval_canon_final_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/canon_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_canon_final --save-pairs 4 \
  > runs/eval_canon_final/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/canon_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_canon_final_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_canon_final_refine_lm/eval.log 2>&1

# ---------------------------------------------------------------- 3
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

# Final portable weights + bench refresh
python - <<'EOF' > runs/export_weights_canon_final.log 2>&1
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint("runs/canon_model/best", state)
save_weights_npz("runs/canon_model/weights_fp16.npz",
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported final canonical weights from epoch", ep)
EOF
python bench.py > runs/bench_r03.json 2> runs/bench_r03.err

echo DONE > runs/queue_r4d.done
