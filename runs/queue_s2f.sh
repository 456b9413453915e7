#!/bin/bash
# Perf-tuning queue (chained last): batch-size sweep of the headline
# train step (is 512 the throughput-optimal batch on one v5e chip?)
# plus a profiler trace of the shipping config. Each new batch shape
# pays a cold remote compile (minutes) once; results inform whether
# bench.py's default batch should move. Write-to-tmp + mv keeps the
# skip-if-exists guards honest after a timeout/crash.
set -u
cd /root/repo
while [ ! -f runs/queue_s2e.done ]; do sleep 60; done

for B in 1024 256 2048; do
  if [ ! -s "runs/bench_b$B.json" ]; then
    if SQTPU_BENCH_BATCH=$B timeout 3000 python bench.py \
        > "runs/bench_b$B.tmp" 2> "runs/bench_b$B.err" \
        && [ -s "runs/bench_b$B.tmp" ]; then
      mv "runs/bench_b$B.tmp" "runs/bench_b$B.json"
    else
      echo "bench batch=$B failed/timed out" >> "runs/bench_b$B.err"
      rm -f "runs/bench_b$B.tmp"
    fi
  fi
done

# profile the shipping config (trace lands in runs/profile_bench/)
if [ ! -f runs/profile_bench.done ]; then
  timeout 3000 python -m sqtpu.train --model resnet_sq --loss implicit \
    --render-size 64 --data online --image-size 256 --batch-size 512 \
    --dtype bfloat16 --max-epochs 1 --steps-per-epoch 30 --val-steps 1 \
    --acc-render-size 32 --ckpt-dir "" --compare-images 0 \
    --profile-dir runs/profile_bench --log-interval 10 \
    > runs/profile_bench.log 2>&1 \
    && echo DONE > runs/profile_bench.done
fi

echo DONE > runs/queue_s2f.done
