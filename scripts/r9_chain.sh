#!/bin/bash
# Round-5 TPU chain: runs after the (carried-over) stage-4/5 chain ends.
#   1. flagship corpus-v3 fine-tune: warm-start from the 45k checkpoint,
#      fresh 15k cosine on synth_mc3 (offset-observability + piano levers,
#      VERDICT r4 items 4/5)
#   2. evals on the v3 test split: greedy / repair2 / beam2
#   3. bench.py --eval-suite (config-5 analogue table)
#   4. realistic transcribe bench on the fine-tuned checkpoint
set -u
cd /root/repo
LOG=/tmp/r9_chain.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "r9 start: waiting for stage5 (carried-over r8 chain)"
while ! grep -q "STAGE5 DONE" /tmp/r8_stage5.log 2>/dev/null; do
  sleep 60
done
mark "stage5 done; default-path repair2 eval on the 45k flagship first"
# VERDICT item 2's DONE condition: onset >= 0.65 AND decode errors < 60 on
# the DEFAULT public path. Plain greedy at 45k reads 0.7437 / 93 errors;
# this banks the repair-pass (public transcribe default) numbers.
mkdir -p artifacts/mc13_r7
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 --repair-beam 2 \
  --output-json artifacts/mc13_r7/eval_test_repair2.json >> "$LOG" 2>&1 \
  || mark "repair2 eval FAILED"
mark "repair2 eval: $(python3 -c "import json;d=json.load(open('artifacts/mc13_r7/eval_test_repair2.json'))['synthmc'];print(round(d['onset_f1'],4), d['decode_errors'])" 2>/dev/null)"

mark "launching mc3 fine-tune (init-from 45k, 15k @ 8e-5)"

rm -f /tmp/stop_watchdog /tmp/train_mc3.log
nohup bash scripts/train_watchdog.sh runs/mc13_mc3 /tmp/train_mc3.log \
  /tmp/train_mc3.pid -- \
  mc13_mc3 -d synth_mc3 -m perceiver_tf_mc13 -b 16 -s 15000 -lr 8e-5 \
  --warmup-steps 0 --ckpt-every 3000 --log-every 100 \
  --init-from runs/mc13_r6/last --ckpt-dir runs/mc13_mc3 > /dev/null 2>&1 &
echo $! > /tmp/wd_mc3.pid
while ! grep -q "done; checkpoints" /tmp/train_mc3.log 2>/dev/null; do
  sleep 60
done
touch /tmp/stop_watchdog
sleep 10
mark "mc3 fine-tune done"

mkdir -p artifacts/mc13_mc3
mark "mc3 eval greedy"
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_mc3/last \
  -d synth_mc3 --split test -b 8 \
  --output-json artifacts/mc13_mc3/eval_test.json >> "$LOG" 2>&1
mark "mc3 eval repair2 (public-path default)"
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_mc3/last \
  -d synth_mc3 --split test -b 8 --repair-beam 2 \
  --output-json artifacts/mc13_mc3/eval_test_repair2.json >> "$LOG" 2>&1
mark "mc3 eval beam2"
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_mc3/last \
  -d synth_mc3 --split test -b 8 --beam-size 2 \
  --output-json artifacts/mc13_mc3/eval_test_beam2.json >> "$LOG" 2>&1

mark "eval-suite (config-5 analogue)"
timeout 5400 python -u bench.py --eval-suite \
  > artifacts/eval_suite_stdout.json 2>> "$LOG" || mark "eval-suite FAILED"

mark "realistic transcribe bench on mc3 ckpt"
timeout 1500 python -u bench.py --transcribe-ckpt=runs/mc13_mc3/last \
  > artifacts/mc13_mc3/transcribe.json 2>> "$LOG" \
  || mark "transcribe bench FAILED"
mark "transcribe: $(cat artifacts/mc13_mc3/transcribe.json 2>/dev/null)"
mark "R9 CHAIN DONE"
