#!/bin/bash
# Resilient TPU work chain for the flagship mc13_r4 run. Ordering is
# value-per-chip-minute: the round can be cut at any time, so the cheap
# headline F1 evals (the round's keystone numbers) run FIRST on the
# existing step-19k checkpoint, then training resumes to complete the
# 28k cosine schedule, then the final-checkpoint evals + bench queue.
# Every stage runs under `timeout` with retries; training under the
# wedge watchdog. Markers -> /tmp/r4_chain.log ("CHAIN DONE" releases
# stage 2 = scripts/r4_stage2_t5base.sh).
set -u
cd /root/repo
LOG=/tmp/r4_chain.log
RUN=runs/mc13_r4
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

# 0. probe until the tunnel answers (10 min/try; loop long: the chain is
# useless without the chip, so just keep knocking)
for i in $(seq 1 72); do
  mark "probe attempt $i"
  if timeout 600 python -c "import jax,jax.numpy as jnp; assert float(jnp.ones((8,8)).sum())==64.0"; then
    mark "TPU ALIVE"
    break
  fi
  sleep 30
done

# 1. headline F1 evals on the EXISTING 19k checkpoint (cheap, banked first)
retry 2400 eval_test_19k python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split test \
  -b 8 --output-json "$RUN/eval_test.json"
retry 1800 eval_train_19k python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split train \
  -b 8 --max-tracks 16 --output-json "$RUN/eval_train.json"

# 2. resume flagship training 19000 -> 28000 (completes the schedule)
mark "resume mc13_r4 training to 28000"
rm -f /tmp/stop_watchdog
nohup bash scripts/train_watchdog.sh "$RUN" /tmp/train_mc13_r4.log /tmp/train_r4.pid -- \
  mc13_r4 -d synth_mc -m perceiver_tf_mc13 -b 16 -s 28000 -lr 3e-4 \
  --warmup-steps 2000 --ckpt-every 1000 --log-every 50 > /dev/null 2>&1 &
while ! grep -q "done; checkpoints" /tmp/train_mc13_r4.log 2>/dev/null; do sleep 60; done
touch /tmp/stop_watchdog
sleep 5
mark "training complete"

# 3. final-checkpoint evals (overwrite the 19k numbers with the real finals)
retry 2400 eval_test python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split test \
  -b 8 --output-json "$RUN/eval_test.json"
retry 1800 eval_train python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split train \
  -b 8 --max-tracks 16 --output-json "$RUN/eval_train.json"

# 4. bench queue
retry 1800 phase_ablation python -u scripts/bench_phase_ablation.py
retry 3600 bench_matrix python -u bench.py --matrix
retry 1200 transcribe_r4 sh -c "python -u bench.py --transcribe-ckpt=runs/mc13_r4/last > artifacts/transcribe_r4.json"
retry 1200 early_exit_regime sh -c "python -u bench.py --transcribe-ckpt=runs/mc13_r4/last --early-exit-regime > artifacts/early_exit_regime_r4.json"
retry 1800 int4_ablation python -u scripts/bench_int4_r3.py
retry 2400 int8c4_quality python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split test \
  -b 8 --max-tracks 16 --kv-quant int8c4 --output-json artifacts/eval_r4_int8c4.json
mark "CHAIN DONE"
