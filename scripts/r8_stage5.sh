#!/bin/bash
# Round-4 TPU chain, stage 5 (perf, after stage 4): decode-step component
# microbench + the int4-Pallas-cross candidate (kv_quant="int8c4p") vs the
# int8-dense incumbent, worst-case at the tuned batch, plus its quality
# gate on the 45k flagship checkpoint.
set -u
cd /root/repo
LOG=/tmp/r8_stage5.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "stage5 start: waiting for stage4"
while ! grep -q "STAGE4 DONE" /tmp/r8_stage4.log 2>/dev/null; do
  sleep 60
done

mark "decode parts microbench (B=16)"
timeout 1800 python -u scripts/bench_decode_parts.py 16 200 >> "$LOG" 2>&1 \
  || mark "parts bench FAILED"
mv -f artifacts/decode_parts_r4.json artifacts/decode_parts_r4_b16.json \
  2>/dev/null
mark "decode parts microbench (B=32)"
timeout 1800 python -u scripts/bench_decode_parts.py 32 200 >> "$LOG" 2>&1 \
  || mark "parts bench b32 FAILED"
mv -f artifacts/decode_parts_r4.json artifacts/decode_parts_r4_b32.json \
  2>/dev/null

mark "worst-case e2e: int8c4p @ tuned batch"
timeout 1500 python -u bench.py --batch=32 --kv-quant=int8c4p \
  > artifacts/bench_int8c4p_b32.json 2>> "$LOG" \
  || mark "int8c4p bench FAILED"
mark "int8c4p: $(cat artifacts/bench_int8c4p_b32.json 2>/dev/null)"

mark "unroll probe @ tuned batch (unroll=8 vs tuned 4)"
timeout 1500 python -u bench.py --batch=32 --unroll=8 \
  > artifacts/bench_unroll8_b32.json 2>> "$LOG" \
  || mark "unroll8 bench FAILED"
mark "unroll8: $(cat artifacts/bench_unroll8_b32.json 2>/dev/null)"

mark "int8c4p + unroll8 compose probe"
timeout 1500 python -u bench.py --batch=32 --kv-quant=int8c4p --unroll=8 \
  > artifacts/bench_int8c4p_u8_b32.json 2>> "$LOG" \
  || mark "compose bench FAILED"
mark "compose: $(cat artifacts/bench_int8c4p_u8_b32.json 2>/dev/null)"

mark "quality gate: flagship eval with int8c4p (8 tracks)"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 --max-tracks 8 --kv-quant int8c4p \
  --output-json artifacts/mc13_r7/eval_int8c4p.json >> "$LOG" 2>&1 \
  || mark "int8c4p eval FAILED"
mark "int8c4p eval: $(head -c 300 artifacts/mc13_r7/eval_int8c4p.json 2>/dev/null)"
mark "STAGE5 DONE"
