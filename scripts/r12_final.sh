#!/bin/bash
# Round-5 final polish chain, fires after r11 (MQA promotion). Priority
# ordered — the round can end mid-chain:
#   1. BENCH_MATRIX refresh (all BASELINE configs under the promoted tuning)
#   2. drums retrain (BASELINE config 4 re-validation on this host; the
#      durable r4 PASS artifact survives either way) + eval
#   3. eval-suite refresh (now 2 live rows: flagship + drums)
set -u
cd /root/repo
LOG=/tmp/r12_chain.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "waiting for r11 chain"
while ! grep -q "R11 CHAIN DONE" /tmp/r11_chain.log 2>/dev/null; do
  sleep 30
done

mark "BENCH_MATRIX refresh (promoted tuning)"
timeout 2700 python -u bench.py --matrix > /tmp/bench_matrix_r5.json 2>> "$LOG" \
  || mark "matrix FAILED"
mark "matrix flagship row: $(python3 -c "import json;r=json.load(open('BENCH_MATRIX.json'))[-1];print(r['config'],r['audio_s_per_s_per_chip'],r['decode_path'].get('decoder_kv_heads'))" 2>/dev/null)"

mark "launching drums_r5 (8k steps, synth_drum)"
rm -f /tmp/stop_watchdog /tmp/train_drums.log
nohup bash scripts/train_watchdog.sh runs/drums_r5 /tmp/train_drums.log \
  /tmp/train_drums.pid -- \
  drums_r5 -d synth_drum -m t5_small -b 16 -s 8000 -lr 1.2e-4 \
  --warmup-steps 1000 --ckpt-every 2000 --log-every 100 \
  --ckpt-dir runs/drums_r5 > /dev/null 2>&1 &
echo $! > /tmp/wd_drums.pid
while ! grep -q "done; checkpoints" /tmp/train_drums.log 2>/dev/null; do
  sleep 60
done
touch /tmp/stop_watchdog
sleep 5
mark "drums train done; eval"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/drums_r5/last \
  -d synth_drum --split test -b 8 \
  --output-json artifacts/eval_drums_r5.json >> "$LOG" 2>&1 \
  || mark "drums eval FAILED"
mark "drums: $(head -c 200 artifacts/eval_drums_r5.json 2>/dev/null)"

mark "eval-suite refresh (flagship + drums live)"
timeout 2400 python -u bench.py --eval-suite \
  > artifacts/eval_suite_stdout.json 2>> "$LOG" || mark "eval-suite FAILED"
mark "R12 CHAIN DONE"
