#!/bin/bash
# Round-5 post-train chip chain: fires when the MQA flagship finishes its
# 16k from-scratch run on synth_mc3 (runs/mc13_mc3). Priority-ordered —
# the round can end mid-chain, so the must-have quality evals go first.
#   1. test-split eval, plain greedy      (quality bars on corpus v3, MQA)
#   2. test-split eval, repair-beam 2     (DEFAULT public path: errors < 60)
#   3. realistic transcribe bench          (public-path audio-s/s, trained)
#   4. eval-suite table                    (config-5 analogue; live rows only)
#   5. train-step MFU profile              (first banked train MFU number)
#   6. int8c4p single bench row on TPU     (promote-or-delete verdict)
#   7. beam2 eval                          (comparison row)
set -u
cd /root/repo
LOG=/tmp/r10_chain.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "waiting for mc13_mc3 train"
while ! grep -q "done; checkpoints" /tmp/train_mc3.log 2>/dev/null; do
  sleep 30
done
touch /tmp/stop_watchdog
sleep 5
mark "train done; eval greedy"
mkdir -p artifacts/mc13_mc3

timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_mc3/last \
  -d synth_mc3 --split test -b 8 \
  --output-json artifacts/mc13_mc3/eval_test.json >> "$LOG" 2>&1 \
  || mark "greedy eval FAILED"
mark "greedy: $(python3 -c "import json;d=json.load(open('artifacts/mc13_mc3/eval_test.json'))['synthmc3'];print(round(d['onset_f1'],4), round(d['offset_f1'],4), round(d['multi_f1'],4), d['decode_errors'])" 2>/dev/null)"

mark "eval repair2 (DEFAULT public path)"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_mc3/last \
  -d synth_mc3 --split test -b 8 --repair-beam 2 \
  --output-json artifacts/mc13_mc3/eval_test_repair2.json >> "$LOG" 2>&1 \
  || mark "repair2 eval FAILED"
mark "repair2: $(python3 -c "import json;d=json.load(open('artifacts/mc13_mc3/eval_test_repair2.json'))['synthmc3'];print(round(d['onset_f1'],4), round(d['offset_f1'],4), round(d['multi_f1'],4), d['decode_errors'])" 2>/dev/null)"

mark "realistic transcribe bench (trained MQA ckpt)"
timeout 1500 python -u bench.py --transcribe-ckpt=runs/mc13_mc3/last \
  > artifacts/mc13_mc3/transcribe.json 2>> "$LOG" \
  || mark "transcribe bench FAILED"
mark "transcribe: $(cat artifacts/mc13_mc3/transcribe.json 2>/dev/null)"

mark "eval-suite (config-5 analogue; only live rows)"
timeout 2400 python -u bench.py --eval-suite \
  > artifacts/eval_suite_stdout.json 2>> "$LOG" || mark "eval-suite FAILED"

mark "train-step MFU profile"
timeout 1200 python -u scripts/profile_train_step.py \
  > artifacts/train_mfu_r5.json 2>> "$LOG" || mark "MFU profile FAILED"
mark "mfu: $(cat artifacts/train_mfu_r5.json 2>/dev/null | head -c 300)"

mark "int8c4p single row (promote-or-delete)"
timeout 1500 python -u bench.py --kv-quant=int8c4p --batch=32 \
  > artifacts/int8c4p_r5.json 2>> "$LOG" || mark "int8c4p FAILED"
mark "int8c4p: $(cat artifacts/int8c4p_r5.json 2>/dev/null)"

mark "beam2 eval"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_mc3/last \
  -d synth_mc3 --split test -b 8 --beam-size 2 \
  --output-json artifacts/mc13_mc3/eval_test_beam2.json >> "$LOG" 2>&1 \
  || mark "beam2 eval FAILED"
mark "beam2: $(python3 -c "import json;d=json.load(open('artifacts/mc13_mc3/eval_test_beam2.json'))['synthmc3'];print(round(d['onset_f1'],4), d['decode_errors'])" 2>/dev/null)"
mark "R10 CHAIN DONE"
