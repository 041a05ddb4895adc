#!/bin/bash
# Final stage: bank every durable artifact of the r5 chain into artifacts/
# (runs/ is gitignored — anything left there dies with the host) and
# commit. Runs after stage 3; also fires if stage 3 stalls >3 h past
# stage 2 (cut-safety: harvest what exists).
set -u
cd /root/repo
LOG=/tmp/r5_harvest.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q "STAGE2 DONE" /tmp/r5_stage2.log 2>/dev/null; do sleep 60; done
for i in $(seq 1 180); do
  grep -q "STAGE3 DONE" /tmp/r5_stage3.log 2>/dev/null && break
  sleep 60
done
mark "harvest start"

mkdir -p artifacts/mc13_r5 artifacts/t5base_r3 artifacts/conformer_r3
cp runs/mc13_r5/mc13_r5_log.jsonl artifacts/mc13_r5/ 2>/dev/null
for f in eval_test eval_train eval_test_beam2; do
  cp "runs/mc13_r5/$f.json" artifacts/mc13_r5/ 2>/dev/null
done
cp runs/t5base_r3/t5base_r3_log.jsonl artifacts/t5base_r3/ 2>/dev/null
cp runs/t5base_r3/eval_test.json artifacts/t5base_r3/ 2>/dev/null
cp runs/conformer_r3/conformer_r3_log.jsonl artifacts/conformer_r3/ 2>/dev/null
cp runs/conformer_r3/eval_test.json artifacts/conformer_r3/ 2>/dev/null
cp /tmp/r5_chain.log /tmp/r5_stage2.log /tmp/r5_stage3.log artifacts/ 2>/dev/null

git add artifacts/ BENCH_MATRIX.json 2>/dev/null
git commit -q -m "Bank r5 chain artifacts: flagship/t5_base/conformer logs, evals, bench matrix" 2>>"$LOG"
mark "HARVEST DONE"
