#!/bin/bash
# TPU queue stage 3 (after scripts/r5_stage2_t5base.sh): the Conformer
# encoder (SURVEY C23) is the one encoder family that has never produced
# an end-to-end quality number — unit tests only. Short train + eval to
# prove the ablation path transcribes, mirroring what round 3 did for the
# flagship. Quality at 6 k steps will be modest; the point is a nonzero
# end-to-end F1 through the conformer forward.
# Logs to /tmp/r5_stage3.log.
set -u
cd /root/repo
LOG=/tmp/r5_stage3.log
RUN=runs/conformer_r3
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q "STAGE2 DONE" /tmp/r5_stage2.log 2>/dev/null; do sleep 60; done

mark "stage3 start: conformer_small short train"
rm -f /tmp/stop_watchdog
nohup bash scripts/train_watchdog.sh "$RUN" /tmp/train_conformer.log /tmp/train_conformer.pid -- \
  conformer_r3 -d synth_big -m conformer_small -b 16 -s 6000 -lr 3e-4 \
  --warmup-steps 1000 --ckpt-every 1000 --log-every 50 > /dev/null 2>&1 &
echo $! > /tmp/watchdog_conformer.pid

while ! grep -q "done; checkpoints" /tmp/train_conformer.log 2>/dev/null; do sleep 60; done
touch /tmp/stop_watchdog
sleep 5
mark "train done"

for i in 1 2 3; do
  mark "eval attempt $i"
  if timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_big --split test \
      -b 8 --max-tracks 16 --output-json "$RUN/eval_test.json" >> "$LOG" 2>&1; then
    mark "OK eval"; break
  fi
  sleep 30
done
cp "$RUN/eval_test.json" artifacts/eval_conformer_6k.json 2>/dev/null
mark "STAGE3 DONE"
