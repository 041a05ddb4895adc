#!/bin/bash
# Round-5 follow-on: after the r10 post-train chain, promote the winning
# decode config (MQA decoder and/or int4-cross KV cache) into the headline
# tuning, each lever gated on trained-checkpoint eval quality:
#   gate A (mqa): plain-greedy onset F1 >= 0.55 on the unseen test split
#     (the greedy eval IS the MQA model — the checkpoint is MQA-trained).
#   gate B (c4p): eval with --kv-quant int8c4 (the DENSE int4-cross path —
#     the only one the MQA checkpoint can run; config/model.py:136 rejects
#     GQA x int8c4p) reads onset within 0.02 of plain greedy and decode
#     errors < 150. tests/test_int4_cross_kernel.py asserts int8c4p greedy
#     decode is token-identical to int8c4, so this gate covers the Pallas
#     kernel's quantization quality too.
# Then scripts/bench_mqa_sweep.py sweeps the allowed arms on the idle chip
# and promotes the winner; one final `python bench.py` confirms the
# headline the driver will record.
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
mark "gate A (mqa quality): $GATE"
case "$GATE" in
  PASS*) ARMS="mqa" ;;
  *) mark "gate A failed; nothing to promote; done"; exit 0 ;;
esac

mark "gate B: int8c4p quality eval on the trained MQA checkpoint"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_mc3/last \
  -d synth_mc3 --split test -b 8 --kv-quant int8c4 \
  --output-json artifacts/mc13_mc3/eval_test_int8c4.json >> "$LOG" 2>&1 \
  || mark "int8c4p eval FAILED"
GATEB=$(python3 -c "
import json
try:
    plain = json.load(open('artifacts/mc13_mc3/eval_test.json'))['synthmc3']
    c4p = json.load(open('artifacts/mc13_mc3/eval_test_int8c4.json'))['synthmc3']
    ok = (c4p['onset_f1'] >= plain['onset_f1'] - 0.02
          and c4p['decode_errors'] < 150)
    print('PASS' if ok else 'FAIL',
          round(c4p['onset_f1'], 4), c4p['decode_errors'])
except Exception as e:
    print('FAIL', 'no-eval:', e)")
mark "gate B (int8c4p quality): $GATEB"
case "$GATEB" in
  PASS*) ARMS="mqa c4p" ;;
  *) mark "gate B failed; sweeping MQA only" ;;
esac

mark "idle-chip arm sweep: $ARMS"
timeout 3600 python -u scripts/bench_mqa_sweep.py \
  artifacts/batch_sweep_r5_mqa.jsonl $ARMS >> "$LOG" 2>&1 || mark "sweep FAILED"
mark "tuning now: $(cat artifacts/decode_tuning.json | head -c 400)"

mark "final headline bench confirm"
timeout 1200 python -u bench.py > /tmp/bench_final_r5.json 2>> "$LOG" \
  || mark "final bench FAILED"
mark "headline: $(cat /tmp/bench_final_r5.json 2>/dev/null)"
cp /tmp/bench_final_r5.json artifacts/bench_headline_r5.json 2>/dev/null
mark "R11 CHAIN DONE"
