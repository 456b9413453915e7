#!/bin/bash
# Sensor-noise robustness protocol (chained behind queue_s2): evaluate
# the retrained hires flagship (c3h, the best CNN) on the SAME 1000 shapes with corrupted inputs
# (sqtpu.data.augment), CNN-only and with LM refinement — the classical
# polish fits the noisy visible surface, so its degradation under noise
# is a finding, not a given. Plus the classical no-CNN baseline row.
set -u
cd /root/repo
while [ ! -f runs/queue_s2.done ]; do sleep 60; done

CKPT=runs/c3h_model
run_eval() {  # $1 out name, extra flags...
  local out=$1; shift
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir $CKPT --n 1000 --batch-size 125 \
    --out-dir "runs/$out" "$@" > "runs/$out/eval.log" 2>&1
}

# mild / moderate / heavy sensor corruption
run_eval eval_c3_ng01  --noise-gaussian 0.01
run_eval eval_c3_ng03  --noise-gaussian 0.03
run_eval eval_c3_nd20  --noise-dropout 0.2
run_eval eval_c3_mixed --noise-gaussian 0.02 --noise-dropout 0.2 \
  --noise-salt 0.005
# does classical LM refinement survive noise? (it fits the noisy points)
run_eval eval_c3_mixed_lm --noise-gaussian 0.02 --noise-dropout 0.2 \
  --noise-salt 0.005 --refine lm --refine-steps 30
# classical no-CNN baseline under the same mixed corruption
mkdir -p runs/eval_classical_mixed
python -m sqtpu.evaluate --model classical --n 200 --batch-size 25 \
  --refine-steps 30 --noise-gaussian 0.02 --noise-dropout 0.2 \
  --noise-salt 0.005 --out-dir runs/eval_classical_mixed \
  > runs/eval_classical_mixed/eval.log 2>&1

echo DONE > runs/queue_s2b.done
