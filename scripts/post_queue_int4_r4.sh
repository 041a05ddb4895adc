#!/bin/bash
# TPU queue stage 2: runs after scripts/post_eval_bench_r4.sh finishes.
#   1. int4/int8c4 KV-format worst-case ablation on the flagship
#   2. quality delta of int8c4 vs exact on the trained r4 checkpoint
# Logs to /tmp/tpu_queue2_r4.log.
set -u
cd /root/repo
LOG=/tmp/tpu_queue2_r4.log

while ! grep -q "queue done" /tmp/tpu_queue_r4.log 2>/dev/null; do
  sleep 60
done

echo "$(date) [1/2] int4 KV ablation" >> "$LOG"
timeout 1500 python -u scripts/bench_int4_r3.py >> "$LOG" 2>&1

echo "$(date) [2/2] int8c4 quality delta on mc13_r4" >> "$LOG"
timeout 1800 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r4/last \
  -d synth_mc --split test -b 8 --max-tracks 16 --kv-quant int8c4 \
  --output-json artifacts/eval_r4_int8c4.json >> "$LOG" 2>&1
echo "$(date) queue2 done" >> "$LOG"
