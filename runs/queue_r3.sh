#!/bin/bash
# Round-2 (session 3, take 2) training queue — run 1's proven LRs:
# warm-up at 3e-4 (1e-4 halves the epoch-28 progress), implicit stages
# with plateau patience 20 (run 1's patience-6 fine-tune froze early).
# Original header:
# Round-2 (session 3) training queue: re-run of the PROVEN staged rotation
# recipe from run 1 of this round. The session-2 rebuild mistakenly used
# --synthetic-size 20000 (vs run 1's 100k): the model memorized the 20k
# images (train loss 0.0027 vs val 0.40) and rotation stayed at chance.
# Run 1's stage A on 100k images generalized (val_loss 0.40 -> 0.19,
# closed-loop sym-angle 0.848). This queue uses 100k throughout and
# extends stages C/D, then runs the full eval battery.
set -u
cd /root/repo

# Stage A: symmetry-aware supervised warm-up (run 1 proven: 90-100 ep)
python -m sqtpu.train --loss supervised_sym --data synthetic \
  --synthetic-size 100000 --image-size 256 --batch-size 256 \
  --learning-rate 3e-4 --max-epochs 100 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r3_model --compare-images 2 --log-interval 50 \
  > runs/r3_stageA.log 2>&1

# Stage B: implicit_sym fine-tune @64^3 (self-supervised + sym anchor)
python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 100000 --image-size 256 --batch-size 256 \
  --learning-rate 1e-4 --plateau-patience 20 --max-epochs 240 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r3_model --continue-training --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r3_stageB.log 2>&1

# Stage C: implicit_sym @96^3, LR restart
python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 100000 --image-size 256 --batch-size 256 \
  --render-size 96 \
  --learning-rate 1e-4 --plateau-patience 20 --max-epochs 420 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r3_model --continue-training --resume-from best \
  --reset-lr 1e-4 --compare-images 0 --log-interval 50 \
  > runs/r3_stageC.log 2>&1

# Stage D: low-LR polish @96^3
python -m sqtpu.train --loss implicit_sym --data synthetic \
  --synthetic-size 100000 --image-size 256 --batch-size 256 \
  --render-size 96 \
  --learning-rate 2e-5 --plateau-patience 20 --max-epochs 500 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/r3_model --continue-training --resume-from best \
  --reset-lr 2e-5 --compare-images 0 --log-interval 50 \
  > runs/r3_stageD.log 2>&1

# Final closed-loop eval (reference protocol, n=1000, IoU@128^3)
mkdir -p runs/eval_r3 runs/eval_r3_refine_lm runs/eval_r3_refine_gd
python -m sqtpu.evaluate --ckpt-dir runs/r3_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r3 --save-pairs 4 \
  > runs/eval_r3/eval.log 2>&1

# Refined evals: CNN init + classical polish (test-time refinement)
python -m sqtpu.evaluate --ckpt-dir runs/r3_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r3_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_r3_refine_lm/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/r3_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r3_refine_gd \
  --refine gd --refine-steps 100 --refine-size 64 --refine-lr 3e-3 \
  > runs/eval_r3_refine_gd/eval.log 2>&1

# Portable weights artifact
python - <<'EOF' > runs/export_weights_r3.log 2>&1
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
state, _, ep = load_checkpoint("runs/r3_model/best", state)
v = {"params": state.params, "batch_stats": state.batch_stats}
save_weights_npz("runs/r3_model/weights_fp16.npz", v)
sd = export_torchvision_resnet18(v)
np.savez_compressed("runs/r3_model/encoder.npz", **sd)
print("exported weights from epoch", ep)
EOF

# headline bench refresh
python bench.py > runs/bench_r02.json 2> runs/bench_r02.err

echo DONE > runs/queue_r3.done
