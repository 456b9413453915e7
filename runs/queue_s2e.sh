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

done_mark() { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }

NOISE="--noise-gaussian 0.02 --noise-dropout 0.2 --noise-salt 0.005"
run_eval() {  # $1 ckpt, $2 out name, extra flags...
  local ckpt=$1 out=$2; shift 2
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir "$ckpt" --n 1000 --batch-size 125 \
    --out-dir "runs/$out" "$@" > "runs/$out/eval.log" 2>&1
}

# deployment-style sensor preprocessing of the CNN input: the median
# filter fills isolated dropout holes — measured (CPU, n=16) to rescue
# the dropout-0.2 collapse from full IoU 0.000 to ~0.44 with no
# retraining; quantify at n=1000, alone and with gd refine on top
if ! is_done s2e_if; then
  run_eval runs/c3h_model eval_c3_mixed_if $NOISE --input-filter median
  done_mark s2e_if
fi
if ! is_done s2e_if_gd; then
  run_eval runs/c3h_model eval_c3_mixed_if_gd $NOISE --input-filter median \
    --refine gd --refine-steps 60 --refine-filter median
  done_mark s2e_if_gd
fi
if ! is_done s2e_gd; then
  run_eval runs/c3h_model eval_c3_mixed_gd $NOISE \
    --refine gd --refine-steps 60 --refine-filter median
  done_mark s2e_gd
fi
if ! is_done s2e_lmrobust; then
  run_eval runs/c3h_model eval_c3_mixed_lmrobust $NOISE \
    --refine lm --refine-steps 30 --refine-robust-c 4.685 \
    --refine-filter median --refine-residual radial
  done_mark s2e_lmrobust
fi
# the noise-augmented model + gd refine (best of both)
if ! is_done s2e_c3n_gd; then
  if [ -d runs/c3n_model/best ]; then
    run_eval runs/c3n_model eval_c3n_mixed_gd $NOISE \
      --refine gd --refine-steps 60 --refine-filter median
    done_mark s2e_c3n_gd
  else
    echo "SKIPPED: runs/c3n_model/best missing (s2d fine-tune failed?)" \
      | tee runs/eval_c3n_mixed_gd.SKIPPED
    done_mark s2e_c3n_gd
  fi
fi
# classical, hardened, on the mixed corruption (vs eval_classical_mixed)
if ! is_done s2e_classical; then
  mkdir -p runs/eval_classical_mixed_robust
  python -m sqtpu.evaluate --model classical --n 200 --batch-size 25 \
    --refine-steps 30 $NOISE --refine-robust-c 4.685 \
    --refine-filter median --refine-residual radial \
    --out-dir runs/eval_classical_mixed_robust \
    > runs/eval_classical_mixed_robust/eval.log 2>&1
  done_mark s2e_classical
fi

echo DONE > runs/queue_s2e.done
