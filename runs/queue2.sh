#!/bin/bash
# Post-stage-C queue: throughput demo at the bench config, final eval,
# then the headline bench (compiles cached for the driver's run).
set -u
FT_PID=$1
while kill -0 "$FT_PID" 2>/dev/null; do sleep 30; done

cd /root/repo

# 1) real-epoch throughput at the bench config (bf16, b512, implicit@64)
python -m sqtpu.train --loss implicit --data synthetic \
  --synthetic-size 4096 --image-size 256 --batch-size 512 \
  --learning-rate 1e-4 --max-epochs 10 --steps-per-epoch 100 \
  --val-steps 2 --acc-render-size 64 --dtype bfloat16 --nan-policy skip \
  --log-interval 50 --ckpt-dir runs/throughput_bf16 --compare-images 0 \
  > runs/throughput_bf16.log 2>&1

# 2) final closed-loop eval of stage C
mkdir -p runs/eval_stagec
python -m sqtpu.evaluate --ckpt-dir runs/sup_warmup --n 1000 \
  --batch-size 125 --out-dir runs/eval_stagec --save-pairs 4 \
  > runs/eval_stagec/eval.log 2>&1

# 3) headline bench (also warms the compile cache for the driver)
python bench.py > runs/bench_r02.json 2> runs/bench_r02.err

echo DONE > runs/queue2.done
