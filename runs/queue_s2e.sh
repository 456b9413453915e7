#!/bin/bash
# Robust-refinement comparison (chained behind queue_s2d): can
# TEST-TIME hardening rescue the clean-trained flagship under the
# mixed corruption, without any retraining? Rows for the README
# robustness table:
#   - gd refine (implicit depth-MAE, L1) + median prefilter
#   - robust radial LM (IRLS Tukey + sq::sdistance residual)
#   - classical baseline with the same hardening
# Compare against: eval_c3_mixed (clean model, collapse),
# eval_c3n_mixed (noise-augmented retrain), eval_c3_mixed_lm (plain
# LM under noise — the documented SB collapse).
set -u
cd /root/repo
while [ ! -f runs/queue_s2d.done ]; do sleep 60; done

NOISE="--noise-gaussian 0.02 --noise-dropout 0.2 --noise-salt 0.005"
run_eval() {  # $1 ckpt, $2 out name, extra flags...
  local ckpt=$1 out=$2; shift 2
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir "$ckpt" --n 1000 --batch-size 125 \
    --out-dir "runs/$out" "$@" > "runs/$out/eval.log" 2>&1
}

run_eval runs/c3_model eval_c3_mixed_gd $NOISE \
  --refine gd --refine-steps 60 --refine-filter median
run_eval runs/c3_model eval_c3_mixed_lmrobust $NOISE \
  --refine lm --refine-steps 30 --refine-robust-c 4.685 \
  --refine-filter median --refine-residual radial
# the noise-augmented model + gd refine (best of both)
if [ -d runs/c3n_model/best ]; then
  run_eval runs/c3n_model eval_c3n_mixed_gd $NOISE \
    --refine gd --refine-steps 60 --refine-filter median
fi
# classical, hardened, on the mixed corruption (vs eval_classical_mixed)
mkdir -p runs/eval_classical_mixed_robust
python -m sqtpu.evaluate --model classical --n 200 --batch-size 25 \
  --refine-steps 30 $NOISE --refine-robust-c 4.685 \
  --refine-filter median --refine-residual radial \
  --out-dir runs/eval_classical_mixed_robust \
  > runs/eval_classical_mixed_robust/eval.log 2>&1

echo DONE > runs/queue_s2e.done
