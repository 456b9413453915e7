#!/bin/bash
# Round-3 session-3 queue: RESUME of queue_s2.sh, which died with the
# session restart at stage 1 epoch 106/180 (best @99, val IoU 0.8746 —
# at the stage-1 target 0.879, plateaued since ~78, so stage 1 is
# declared done). Stages are guarded by done-markers and training
# stages resume from their 'last' checkpoint, so this script is safe
# to re-launch after any future restart.
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

done_mark() { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }

# ---- Stage 1 (declared done): export the surviving best checkpoint
if ! is_done c3_s1; then
  export_npz runs/c3_stage1 runs/c3_stage1/weights_fp16.npz \
    > runs/c3_export1.log 2>&1
  done_mark c3_s1
fi

# ---- Stage 2: gauge anchor w=8 (rotation organizes), warm start
if ! is_done c3_s2; then
  RESUME=""
  [ -d runs/c3_model/last ] && \
    RESUME="--continue-training --resume-from last" || \
    RESUME="--init-weights runs/c3_stage1/weights_fp16.npz"
  timeout 4500 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 32 --gauge-weight 8.0 --elong-weight 1.0 \
    $RESUME \
    --data synthetic --synthetic-size 150000 --image-size 256 \
    --batch-size 256 --remat true --learning-rate 5e-5 \
    --plateau-patience 25 --max-epochs 200 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c3_model --compare-images 0 --log-interval 50 \
    >> runs/c3_stage2.log 2>&1
  done_mark c3_s2
fi

# ---- Stage 3: online-data polish, anchor w=2, LR 2e-5 (the final
# round-3 recipe; reference result full IoU 0.877 / rot-IoU 0.902)
if ! is_done c3_s3; then
  timeout 5400 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 32 --gauge-weight 2.0 --elong-weight 1.0 \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 2e-5 \
    --plateau-patience 20 --max-epochs 380 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c3_model --continue-training --resume-from best \
    --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
    >> runs/c3_polish.log 2>&1
  export_npz runs/c3_model runs/c3_model/weights_polish_fp16.npz \
    > runs/c3_export2.log 2>&1
  mkdir -p artifacts
  cp runs/c3_model/weights_polish_fp16.npz artifacts/resnet_sq_flagship_fp16.npz
  done_mark c3_s3
fi

# ---- Evals of the reproduced flagship (reference protocol, n=1000,
# IoU@128^3, torch/test_random.py semantics)
if ! is_done c3_eval; then
  mkdir -p runs/eval_c3 runs/eval_c3_refine_lm
  python -m sqtpu.evaluate --ckpt-dir runs/c3_model --n 1000 \
    --batch-size 125 --out-dir runs/eval_c3 --save-pairs 4 \
    > runs/eval_c3/eval.log 2>&1
  python -m sqtpu.evaluate --ckpt-dir runs/c3_model --n 1000 \
    --batch-size 125 --out-dir runs/eval_c3_refine_lm \
    --refine lm --refine-steps 30 \
    > runs/eval_c3_refine_lm/eval.log 2>&1
  done_mark c3_eval
fi

# ---- Stage 4 (queue_r8's hires stage): 64^3 explicit grid. The 32^3
# occupancy grid quantizes the surface at ~2x the residual size error;
# 8x finer supervision at low LR sharpens geometry without moving
# rotation. Fresh dir so the stage-3 artifact stays intact.
if ! is_done c3_s4; then
  RESUME=""
  [ -d runs/c3h_model/last ] && \
    RESUME="--continue-training --resume-from last" || \
    RESUME="--init-weights runs/c3_model/weights_polish_fp16.npz"
  timeout 7200 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
    --render-size 64 --gauge-weight 2.0 --elong-weight 1.0 \
    $RESUME \
    --data online --image-size 256 \
    --batch-size 256 --remat true --learning-rate 1e-5 \
    --plateau-patience 20 --max-epochs 200 --steps-per-epoch 100 \
    --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
    --ckpt-dir runs/c3h_model --compare-images 0 --log-interval 50 \
    >> runs/c3_hires.log 2>&1
  done_mark c3_s4
fi

if ! is_done c3h_eval; then
  mkdir -p runs/eval_c3h runs/eval_c3h_refine_lm
  python -m sqtpu.evaluate --ckpt-dir runs/c3h_model --n 1000 \
    --batch-size 125 --out-dir runs/eval_c3h --save-pairs 4 \
    > runs/eval_c3h/eval.log 2>&1
  python -m sqtpu.evaluate --ckpt-dir runs/c3h_model --n 1000 \
    --batch-size 125 --out-dir runs/eval_c3h_refine_lm \
    --refine lm --refine-steps 30 \
    > runs/eval_c3h_refine_lm/eval.log 2>&1
  export_npz runs/c3h_model artifacts/resnet_sq_hires_fp16.npz \
    > runs/c3_export3.log 2>&1 || true
  done_mark c3h_eval
fi

# ---- bench refresh (warms compile cache for the driver's run)
python bench.py > runs/bench_s2.json 2> runs/bench_s2.err

# release queue_s2b (graded-noise robustness evals) only now — the
# single tunneled TPU chip can't be shared with a training stage
echo DONE > runs/queue_s2.done
echo DONE > runs/queue_s2c.done
