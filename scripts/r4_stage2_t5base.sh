#!/bin/bash
# TPU queue stage 2 (after scripts/r4_eval_chain.sh): close BASELINE
# config 2 with a MEASURED realistic t5_base number instead of the
# roofline extrapolation. Plan:
#   1. short t5_base train on synth_big (3 k steps — enough for the model
#      to emit realistic EOS-terminated decode lengths; quality is NOT the
#      point of this run)
#   2. realistic public-path bench at B=64 (BASELINE config 2 shape) and
#      B=16 with the trained checkpoint
#   3. small test-split eval for an honesty row (F1 will be modest at 3 k)
# Logs to /tmp/r4_stage2.log.
set -u
cd /root/repo
LOG=/tmp/r4_stage2.log
RUN=runs/t5base_r3
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q "CHAIN DONE" /tmp/r4_chain.log 2>/dev/null; do sleep 60; done

mark "stage2 start: t5_base short train"
rm -f /tmp/stop_watchdog
nohup bash scripts/train_watchdog.sh "$RUN" /tmp/train_t5base.log /tmp/train_t5base.pid -- \
  t5base_r3 -d synth_big -m t5_base -b 16 -s 3000 -lr 3e-4 \
  --warmup-steps 500 --ckpt-every 1000 --log-every 50 > /dev/null 2>&1 &
echo $! > /tmp/watchdog_t5base.pid

while ! grep -q "done; checkpoints" /tmp/train_t5base.log 2>/dev/null; do sleep 60; done
touch /tmp/stop_watchdog
sleep 5
mark "train done"

for b in 64 16; do
  for i in 1 2 3; do
    mark "bench B=$b attempt $i"
    if timeout 1200 python -u bench.py --transcribe-ckpt="$RUN/last" \
        --transcribe-batch=$b > "artifacts/transcribe_t5base_b$b.json" 2>> "$LOG"; then
      mark "OK bench B=$b"; break
    fi
    sleep 30
  done
done

mark "eval (honesty row)"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_big --split test \
  -b 8 --max-tracks 8 --output-json "$RUN/eval_test.json" >> "$LOG" 2>&1
mark "STAGE2 DONE"
