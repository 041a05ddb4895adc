#!/bin/bash
# TPU queue stage 2 (after scripts/r5_chain.sh): close BASELINE config 2
# with a MEASURED realistic t5_base number (fresh-host rerun of
# r4_stage2_t5base.sh; the original's checkpoints died with the host).
#   1. short t5_base train on synth_big (3 k steps — enough for realistic
#      EOS-terminated decode lengths; quality is NOT the point)
#   2. realistic public-path bench at B=64 (BASELINE config 2 shape) + B=16
#   3. small test-split eval for an honesty row
# Logs to /tmp/r5_stage2.log.
set -u
cd /root/repo
LOG=/tmp/r5_stage2.log
RUN=runs/t5base_r3
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q "CHAIN DONE" /tmp/r5_chain.log 2>/dev/null; do sleep 60; done

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
