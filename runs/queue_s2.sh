#!/bin/bash
# Round-3 session-2 queue: the round restart wiped every gitignored
# checkpoint payload (runs/**/best/, weights_*.npz), so the flagship
# canon2p model survives only as committed metadata/eval artifacts.
# This queue (a) re-trains the flagship via the proven recipe
# (queue_r4d stage 1 -> queue_r5 canon2 -> queue_r6 polish), (b) runs
# the never-executed 64^3 hires fine-tune (queue_r8), (c) exports the
# final weights into artifacts/ (NOT gitignored) so the model itself
# survives future restarts, (d) re-runs the closed-loop evals + bench.
set -u
cd /root/repo

export_npz() {  # $1 ckpt dir, $2 out npz
python - "$1" "$2" <<'PYEOF'
import sys, jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint(sys.argv[1] + "/best", state)
save_weights_npz(sys.argv[2],
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported", sys.argv[2], "from epoch", ep)
PYEOF
}

# ---- Stage 1: canonical-label explicit_sym, gauge anchor w=1
# (geometry-dominated warm start; reference result full IoU 0.879)
timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
  --render-size 32 --gauge-weight 1.0 --elong-weight 1.0 \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --learning-rate 1e-4 \
  --plateau-patience 25 --max-epochs 180 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/c3_stage1 --compare-images 0 --log-interval 50 \
  > runs/c3_stage1.log 2>&1
export_npz runs/c3_stage1 runs/c3_stage1/weights_fp16.npz \
  > runs/c3_export1.log 2>&1

# ---- Stage 2: gauge anchor w=8 (rotation organizes), warm start
timeout 4500 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
  --render-size 32 --gauge-weight 8.0 --elong-weight 1.0 \
  --init-weights runs/c3_stage1/weights_fp16.npz \
  --data synthetic --synthetic-size 150000 --image-size 256 \
  --batch-size 256 --remat true --learning-rate 5e-5 \
  --plateau-patience 25 --max-epochs 200 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/c3_model --compare-images 0 --log-interval 50 \
  > runs/c3_stage2.log 2>&1

# ---- Stage 3: online-data polish, anchor w=2, LR 2e-5 (the final
# round-3 recipe; reference result full IoU 0.877 / rot-IoU 0.902)
timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
  --render-size 32 --gauge-weight 2.0 --elong-weight 1.0 \
  --data online --image-size 256 \
  --batch-size 256 --remat true --learning-rate 2e-5 \
  --plateau-patience 20 --max-epochs 380 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/c3_model --continue-training --resume-from best \
  --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
  > runs/c3_polish.log 2>&1
export_npz runs/c3_model runs/c3_model/weights_polish_fp16.npz \
  > runs/c3_export2.log 2>&1

# ---- Evals of the reproduced flagship (reference protocol, n=1000,
# IoU@128^3, torch/test_random.py semantics)
mkdir -p runs/eval_c3 runs/eval_c3_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/c3_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_c3 --save-pairs 4 \
  > runs/eval_c3/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/c3_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_c3_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_c3_refine_lm/eval.log 2>&1

# ---- Stage 4 (NEW, queue_r8's hires stage): 64^3 explicit grid.
# The 32^3 occupancy grid quantizes the surface at ~2x the residual
# size error; 8x finer supervision at low LR sharpens geometry without
# moving rotation. Fresh dir so the stage-3 artifact stays intact.
timeout 7200 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
  --render-size 64 --gauge-weight 2.0 --elong-weight 1.0 \
  --data online --image-size 256 \
  --batch-size 256 --remat true --learning-rate 1e-5 \
  --init-weights runs/c3_model/weights_polish_fp16.npz \
  --plateau-patience 20 --max-epochs 200 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/c3h_model --compare-images 0 --log-interval 50 \
  > runs/c3_hires.log 2>&1

mkdir -p runs/eval_c3h runs/eval_c3h_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/c3h_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_c3h --save-pairs 4 \
  > runs/eval_c3h/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/c3h_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_c3h_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_c3h_refine_lm/eval.log 2>&1

# ---- Persist the flagship OUTSIDE the gitignored patterns
mkdir -p artifacts
cp runs/c3_model/weights_polish_fp16.npz artifacts/resnet_sq_flagship_fp16.npz
export_npz runs/c3h_model artifacts/resnet_sq_hires_fp16.npz \
  > runs/c3_export3.log 2>&1 || true

# ---- bench refresh (warms compile cache for the driver's run)
python bench.py > runs/bench_s2.json 2> runs/bench_s2.err

echo DONE > runs/queue_s2.done
