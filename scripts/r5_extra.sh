#!/bin/bash
# TPU queue stage 4 (after r5_stage3 / alongside harvest): the two items
# the earlier chain stages do not cover.
#   1. early-exit regime measurement on the trained flagship (VERDICT r2
#      item 4's second half: prove/refute the claimed win regime on the
#      public path, post-retrace-fix)
#   2. if enough wall-clock remains: a short drums_only quality run
#      (BASELINE config 4 has bench rows but no trained drum-vocab
#      quality number)
# Logs to /tmp/r5_extra.log.
set -u
cd /root/repo
LOG=/tmp/r5_extra.log
ROUND_END=1787100000
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q "STAGE3 DONE" /tmp/r5_stage3.log 2>/dev/null; do
  # if stage3 never lands, start anyway 2.5h before round end
  [ "$(date +%s)" -gt $((ROUND_END - 9000)) ] && break
  sleep 60
done
mark "extra start"

for i in 1 2 3; do
  mark "early-exit regime attempt $i"
  if timeout 1500 python -u bench.py --transcribe-ckpt=runs/mc13_r5/last \
      --early-exit-regime > artifacts/early_exit_regime_r5.json 2>> "$LOG"; then
    mark "OK early-exit regime"; break
  fi
  sleep 30
done

# drums quality run only with >=100 min of round left
if [ "$(date +%s)" -lt $((ROUND_END - 6000)) ]; then
  RUN=runs/drums_r3
  mark "drums_only short train"
  rm -f /tmp/stop_watchdog
  nohup bash scripts/train_watchdog.sh "$RUN" /tmp/train_drums.log /tmp/train_drums.pid -- \
    drums_r3 -d synth_mc -t drums_only -m t5_small -b 16 -s 4000 -lr 3e-4 \
    --warmup-steps 500 --ckpt-every 1000 --log-every 50 > /dev/null 2>&1 &
  # hard stop for this train 45 min before round end
  nohup bash scripts/deadline_cut.sh $((ROUND_END - 2700)) /tmp/train_drums.log /tmp/train_drums.pid > /dev/null 2>&1 &
  while ! grep -q "done; checkpoints" /tmp/train_drums.log 2>/dev/null; do sleep 60; done
  touch /tmp/stop_watchdog
  sleep 5
  mark "drums train done"
  # task comes from the checkpoint bundle (cli.test has no task flag)
  timeout 1800 python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc \
    --split test -b 8 --max-tracks 16 --output-json artifacts/eval_drums_4k.json >> "$LOG" 2>&1
  mark "drums eval done"
  cp "$RUN/drums_r3_log.jsonl" artifacts/drums_r3_log.jsonl 2>/dev/null
fi

git add artifacts/ 2>/dev/null
git commit -q -m "Bank stage-4 artifacts: early-exit regime measurement + drums_only quality run" 2>>"$LOG"
mark "EXTRA DONE"
