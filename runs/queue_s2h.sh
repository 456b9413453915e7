#!/bin/bash
# Refinement-method shootout on the clean flagship (n=1000): LM already
# measured 0.944; does the gd (implicit depth-MAE) or the lm+gd hybrid
# beat it? Plus robust-model + LM refine (deployment combo).
set -u
cd /root/repo
done_mark() { echo DONE > "runs/$1.done"; }
is_done() { [ -f "runs/$1.done" ]; }
run_eval() {  # $1 ckpt, $2 out, extra...
  local ckpt=$1 out=$2; shift 2
  mkdir -p "runs/$out"
  python -m sqtpu.evaluate --ckpt-dir "$ckpt" --n 1000 --batch-size 125 \
    --out-dir "runs/$out" "$@" > "runs/$out/eval.log" 2>&1
}
if ! is_done s2h_gd; then
  run_eval runs/c3h_model eval_c3h_refine_gd --refine gd --refine-steps 60
  done_mark s2h_gd
fi
if ! is_done s2h_lmgd; then
  run_eval runs/c3h_model eval_c3h_refine_lmgd --refine lm+gd --refine-steps 30
  done_mark s2h_lmgd
fi
if ! is_done s2h_robust_lm; then
  run_eval runs/c3r_model eval_c3r_mixed_lmrobust \
    --noise-gaussian 0.02 --noise-dropout 0.2 --noise-salt 0.005 \
    --refine lm --refine-steps 30 --refine-robust-c 4.685 \
    --refine-filter median --refine-residual radial
  done_mark s2h_robust_lm
fi
echo DONE > runs/queue_s2h.done
