#!/bin/bash
# 64^3-grid explicit_sym fine-tune of the final canon2 model: the 32^3
# occupancy grid quantizes the surface at ~2x the residual size error;
# 8x finer supervision at low LR should sharpen geometry without moving
# rotation. Fresh ckpt dir (warm-start from the polished npz) so the
# canon2_model best checkpoint stays the round-3 reference artifact.
# Chained behind queue_r7 (kerasrot3) for the TPU.
set -u
cd /root/repo
while [ ! -f runs/queue_r7.done ]; do sleep 30; done

timeout 4800 python -m sqtpu.train --model resnet_sq --loss explicit_sym \
  --render-size 64 --gauge-weight 2.0 --elong-weight 1.0 \
  --data online --image-size 256 \
  --batch-size 256 --remat true --learning-rate 1e-5 \
  --init-weights runs/canon2_model/weights_final_fp16.npz \
  --plateau-patience 20 --max-epochs 250 --steps-per-epoch 100 \
  --val-steps 5 --acc-render-size 64 --dtype float32 --nan-policy skip \
  --ckpt-dir runs/canon2h_model --compare-images 0 --log-interval 50 \
  > runs/canon2_hires.log 2>&1

mkdir -p runs/eval_canon2h runs/eval_canon2h_refine_lm
python -m sqtpu.evaluate --ckpt-dir runs/canon2h_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_canon2h --save-pairs 4 \
  > runs/eval_canon2h/eval.log 2>&1
python -m sqtpu.evaluate --ckpt-dir runs/canon2h_model --n 1000 \
  --batch-size 125 --out-dir runs/eval_canon2h_refine_lm \
  --refine lm --refine-steps 30 \
  > runs/eval_canon2h_refine_lm/eval.log 2>&1

python - <<'PYEOF' > runs/export_weights_canon2h.log 2>&1
import jax
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.models import build_model
from sqtpu.training.state import create_train_state
from sqtpu.utils.checkpoint import load_checkpoint, save_weights_npz
from sqtpu.utils.config import TrainConfig
model = build_model("resnet_sq")
state = create_train_state(model, jax.random.PRNGKey(0), TrainConfig())
state, _, ep = load_checkpoint("runs/canon2h_model/best", state)
save_weights_npz("runs/canon2h_model/weights_hires_fp16.npz",
                 {"params": state.params, "batch_stats": state.batch_stats})
print("exported hires canon2 weights from epoch", ep)
PYEOF
echo DONE > runs/queue_r8.done
