#!/bin/bash
# Post-finetune TPU job queue (waits for the fine-tune pid, then runs
# each stage back-to-back). Launched detached; logs under runs/.
set -u
FT_PID=$1
while kill -0 "$FT_PID" 2>/dev/null; do sleep 20; done

cd /root/repo

# 1) closed-loop eval of the fine-tuned model (reference protocol, n=1000)
mkdir -p runs/eval_finetune
python -m sqtpu.evaluate --ckpt-dir runs/sup_warmup --n 1000 \
  --batch-size 125 --out-dir runs/eval_finetune --save-pairs 4 \
  > runs/eval_finetune/eval.log 2>&1

# 2) export the trained encoder as a torchvision-layout state_dict
python - <<'EOF' > runs/export_encoder.log 2>&1
import numpy as np, jax
from sqtpu.models import build_model, export_torchvision_resnet18
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint
from sqtpu.utils.config import TrainConfig

model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint("runs/sup_warmup/best", state)
sd = export_torchvision_resnet18(
    {"params": state.params, "batch_stats": state.batch_stats})
np.savez_compressed("runs/sup_warmup/encoder.npz", **sd)
print("exported encoder from epoch", ep, "->", len(sd), "tensors")
EOF

# 3) pretrained-encoder training demo: fresh heads + exported encoder
python -m sqtpu.train --loss supervised_sym --data synthetic \
  --synthetic-size 20000 --image-size 256 --batch-size 256 \
  --learning-rate 1e-4 --max-epochs 4 --steps-per-epoch 100 --val-steps 5 \
  --acc-render-size 64 --dtype float32 --nan-policy skip \
  --pretrained runs/sup_warmup/encoder.npz \
  --ckpt-dir runs/pretrained_demo --compare-images 2 \
  > runs/pretrained_demo.log 2>&1

# 4) 2019 isometry family end-to-end: keras_iso + param_mse + iso data
python -m sqtpu.train --model keras_iso --loss param_mse --iso true \
  --data synthetic --synthetic-size 20000 --image-size 256 \
  --batch-size 256 --learning-rate 1e-3 --lr-schedule step2019 \
  --max-epochs 12 --steps-per-epoch 100 --val-steps 5 \
  --dtype float32 --nan-policy skip \
  --ckpt-dir runs/keras_iso_demo --compare-images 0 \
  > runs/keras_iso_demo.log 2>&1
python -m sqtpu.evaluate --model keras_iso --iso true \
  --ckpt-dir runs/keras_iso_demo --n 250 --batch-size 125 \
  --out-dir runs/eval_keras_iso > runs/eval_keras_iso/eval.log 2>&1 \
  || (mkdir -p runs/eval_keras_iso && python -m sqtpu.evaluate \
      --model keras_iso --iso true --ckpt-dir runs/keras_iso_demo \
      --n 250 --batch-size 125 --out-dir runs/eval_keras_iso \
      > runs/eval_keras_iso/eval.log 2>&1)

echo QUEUE_DONE > runs/queue.done
