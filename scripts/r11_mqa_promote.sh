#!/bin/bash
# Round-5 follow-on: after the r10 post-train chain finishes, promote the
# MQA decode config into the headline tuning IF the trained MQA flagship's
# eval validates quality (gate: plain-greedy onset F1 >= 0.55 on the unseen
# test split — round-4's MHA 30k read 0.602 on the EASIER corpus v2; the
# v3 corpus has per-track program subsets and is harder).  Then one final
# `python bench.py` confirms the headline the driver will record.
set -u
cd /root/repo
LOG=/tmp/r11_chain.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "waiting for r10 chain"
while ! grep -q "R10 CHAIN DONE" /tmp/r10_chain.log 2>/dev/null; do
  sleep 30
done

GATE=$(python3 -c "
import json
try:
    d = json.load(open('artifacts/mc13_mc3/eval_test.json'))['synthmc3']
    print('PASS' if d['onset_f1'] >= 0.55 else 'FAIL', round(d['onset_f1'], 4))
except Exception as e:
    print('FAIL', 'no-eval:', e)")
mark "quality gate: $GATE"
case "$GATE" in
  PASS*) ;;
  *) mark "gate failed; NOT promoting MQA; done"; exit 0 ;;
esac

mark "MQA idle-chip batch sweep"
timeout 2400 python -u scripts/bench_mqa_sweep.py \
  artifacts/batch_sweep_r5_mqa.jsonl >> "$LOG" 2>&1 || mark "sweep FAILED"
mark "tuning now: $(cat artifacts/decode_tuning.json | head -c 400)"

mark "final headline bench confirm"
timeout 1200 python -u bench.py > /tmp/bench_final_r5.json 2>> "$LOG" \
  || mark "final bench FAILED"
mark "headline: $(cat /tmp/bench_final_r5.json 2>/dev/null)"
cp /tmp/bench_final_r5.json artifacts/bench_headline_r5.json 2>/dev/null
mark "R11 CHAIN DONE"
