#!/bin/bash
# After the t5_base stage: re-measure the flagship's PUBLIC transcribe
# path and the early-exit regime on the trained mc13_r5 checkpoint. Both
# previous numbers are invalid: (1) the timed run paid a ~3 s detok
# extract recompile (fixed: bucket-padded extract + full-shape warm) and
# (2) plain vs early-exit decoded from differently-fused encoder programs
# and diverged under int8 KV (fixed: shared canonical encode/cross-KV
# programs) — the regime rows must now agree on notes/decode_errors.
set -u
cd /root/repo
LOG=/tmp/r6_post.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q "R6 STAGE DONE" /tmp/r6_t5base.log 2>/dev/null; do sleep 60; done

for i in 1 2 3; do
  mark "flagship transcribe-path attempt $i"
  if timeout 1200 python -u bench.py --transcribe-ckpt=runs/mc13_r5/last \
      > artifacts/transcribe_r6_mc13.json 2>> "$LOG"; then
    mark "OK transcribe-path"; break
  fi
  sleep 30
done

for i in 1 2 3; do
  mark "early-exit regime attempt $i"
  if timeout 1800 python -u bench.py --transcribe-ckpt=runs/mc13_r5/last \
      --early-exit-regime > artifacts/early_exit_regime_r6.json 2>> "$LOG"; then
    mark "OK regime"; break
  fi
  sleep 30
done
mark "R6 POST DONE"
