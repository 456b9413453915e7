#!/bin/bash
# Post-queue: refined closed-loop evals, portable weights export, bench
# refresh. Waits for queue_r2.sh to finish.
set -u
cd /root/repo
while [ ! -f runs/queue_r2.done ]; do sleep 60; done

# 1) refined evals: CNN init + classical polish (test-time refinement)
mkdir -p runs/eval_r2_refine_lm runs/eval_r2_refine_gd
python -m sqtpu.evaluate --ckpt-dir runs/r2_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r2_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_r2_refine_lm/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/r2_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_r2_refine_gd \
  --refine gd --refine-steps 100 --refine-size 64 --refine-lr 3e-3 \
  > runs/eval_r2_refine_gd/eval.log 2>&1

# 2) portable weights artifact (survives workspace resets, loadable by
#    evaluate --ckpt-dir runs/r2_model/weights_fp16.npz)
python - <<'EOF' > runs/export_weights.log 2>&1
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
state, _, ep = load_checkpoint("runs/r2_model/best", state)
v = {"params": state.params, "batch_stats": state.batch_stats}
save_weights_npz("runs/r2_model/weights_fp16.npz", v)
sd = export_torchvision_resnet18(v)
np.savez_compressed("runs/r2_model/encoder.npz", **sd)
print("exported weights from epoch", ep)
EOF

# 3) headline bench refresh (new online kernel path; warms driver cache)
python bench.py > runs/bench_r02.json 2> runs/bench_r02.err

echo DONE > runs/queue_r2b.done
