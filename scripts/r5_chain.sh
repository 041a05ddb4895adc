#!/bin/bash
# Round-3 (fresh-host rerun) TPU work chain. The host was reset and all
# gitignored checkpoints were lost, so runs/mc13_r5 retrains the flagship
# from scratch (28k cosine, the mc13_r4 recipe + time-signal fix). This
# chain waits for that training to complete, then banks evals + benches
# in value order. Markers -> /tmp/r5_chain.log ("CHAIN DONE" releases
# stage 2 = scripts/r5_stage2_t5base.sh).
set -u
cd /root/repo
LOG=/tmp/r5_chain.log
RUN=runs/mc13_r5
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

retry() { # retry <timeout_s> <name> <cmd...>
  local t=$1 name=$2; shift 2
  for i in 1 2 3; do
    mark "START $name (attempt $i)"
    timeout "$t" "$@" >> "$LOG" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then mark "OK $name"; return 0; fi
    mark "FAIL $name rc=$rc (attempt $i)"
    sleep 30
  done
  mark "GIVEUP $name"
  return 1
}

# 0. wait for flagship training to finish (watchdog handles wedges)
while ! grep -q "done; checkpoints" /tmp/train_mc13_r5.log 2>/dev/null; do sleep 60; done
touch /tmp/stop_watchdog
sleep 10
mark "training complete"

# 1. headline F1 evals on the final checkpoint (the round's keystone)
retry 3600 eval_test python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split test \
  -b 8 --output-json "$RUN/eval_test.json"
retry 2400 eval_train python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split train \
  -b 8 --max-tracks 16 --output-json "$RUN/eval_train.json"
retry 3600 eval_test_beam2 python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split test \
  -b 8 --beam-size 2 --output-json "$RUN/eval_test_beam2.json"

# 2. bench queue (tuning table first: bench.py consumes it)
retry 1800 phase_ablation python -u scripts/bench_phase_ablation.py
retry 3600 bench_matrix python -u bench.py --matrix
retry 1200 transcribe_r5 sh -c "python -u bench.py --transcribe-ckpt=runs/mc13_r5/last > artifacts/transcribe_r5.json"
retry 1800 int4_ablation python -u scripts/bench_int4_r3.py
retry 2400 int8c4_quality python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split test \
  -b 8 --max-tracks 16 --kv-quant int8c4 --output-json artifacts/eval_r5_int8c4.json
mark "CHAIN DONE"
