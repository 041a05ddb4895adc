#!/bin/bash
# Wait for the mc13_r4 training run to finish, then evaluate the final
# checkpoint on the synth_mc test and train splits (multi_f1 via the
# preset's gm_instr_class_mc12 eval vocab). TPU-exclusive: only starts
# once the trainer process is gone.
set -u
LOG=/tmp/train_mc13_r4.log
PIDF=/tmp/train_r4.pid
RUN=runs/mc13_r4

while true; do
  if grep -q "done; checkpoints" "$LOG" 2>/dev/null; then
    PID=$(cat "$PIDF" 2>/dev/null || echo 0)
    kill -0 "$PID" 2>/dev/null || break
  fi
  sleep 60
done
touch /tmp/stop_watchdog
sleep 5
echo "$(date) post-train eval starting" >> /tmp/posttrain_r4.log
python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split test \
  -b 8 --output-json "$RUN/eval_test.json" >> /tmp/posttrain_r4.log 2>&1
python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_mc --split train \
  -b 8 --max-tracks 16 --output-json "$RUN/eval_train.json" >> /tmp/posttrain_r4.log 2>&1
echo "$(date) post-train eval done" >> /tmp/posttrain_r4.log
