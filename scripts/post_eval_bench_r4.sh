#!/bin/bash
# TPU work queue for after the mc13_r4 post-train evals finish. Runs
# unattended so chip time is never idle:
#   1. phases×unroll decode ablation -> artifacts/decode_tuning.json
#   2. full bench matrix refresh (picks up the tuning file)
#   3. realistic public-path benches with the trained r4 checkpoint
# Everything logs to /tmp/tpu_queue_r4.log.
set -u
cd /root/repo
LOG=/tmp/tpu_queue_r4.log

while ! grep -q "post-train eval done" /tmp/posttrain_r4.log 2>/dev/null; do
  sleep 60
done

echo "$(date) [1/3] phase ablation" >> "$LOG"
timeout 1200 python -u scripts/bench_phase_ablation.py >> "$LOG" 2>&1

echo "$(date) [2/3] bench matrix" >> "$LOG"
timeout 3000 python -u bench.py --matrix >> "$LOG" 2>&1

echo "$(date) [3/3] realistic transcribe benches (r4 ckpt)" >> "$LOG"
timeout 900 python -u bench.py --transcribe-ckpt=runs/mc13_r4/last \
  > artifacts/transcribe_r4.json 2>> "$LOG"
timeout 900 python -u bench.py --transcribe-ckpt=runs/mc13_r4/last \
  --early-exit-regime > artifacts/early_exit_regime_r4.json 2>> "$LOG"
echo "$(date) queue done" >> "$LOG"
