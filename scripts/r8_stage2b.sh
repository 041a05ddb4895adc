#!/bin/bash
# Round-4 TPU chain, stage 2b: resume of r8_stage2.sh after the session
# restart killed it mid-"flagship realistic bench" (17:43 UTC). Picks up
# exactly where it died: bench -> batch sweep -> conformer anchor probe ->
# drums quality run (reordered: probe is cheap and chip-bound, drums is the
# long leg so it goes last and runs while the host session does CPU work).
set -u
cd /root/repo
LOG=/tmp/r8_stage2b.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "stage2b start"
mkdir -p artifacts/mc13_r6

mark "flagship realistic bench"
timeout 1500 python -u bench.py --transcribe-ckpt=runs/mc13_r6/last \
  --transcribe-batch=16 > artifacts/mc13_r6/transcribe_b16.json 2>> "$LOG" \
  || mark "realistic bench FAILED"
mark "bench done: $(cat artifacts/mc13_r6/transcribe_b16.json 2>/dev/null)"

mark "batch sweep"
timeout 3000 python -u scripts/bench_batch_sweep.py \
  artifacts/batch_sweep_r4.jsonl >> "$LOG" 2>&1 || mark "batch sweep FAILED"

mark "conformer anchor probe (2k steps)"
timeout 3000 python -u scripts/probe_conformer_anchor.py 2000 \
  >> "$LOG" 2>&1 || mark "conformer probe FAILED"

# ---- drums quality run (BASELINE config 4) ------------------------------
rm -f /tmp/stop_watchdog
# lr: t5_small is d=512 / 8+8 layers — a deep preset on the measured 3e-4
# post-q-init-fix divergence cliff (RECIPES.md rule 2; onset ~5k steps,
# this run is 8k). 1.2e-4 is the measured-stable deep-preset peak.
mark "launching drums_r4 (8k steps, synth_drum full-kit corpus)"
nohup bash scripts/train_watchdog.sh runs/drums_r4 /tmp/train_drums.log \
  /tmp/train_drums.pid -- \
  drums_r4 -d synth_drum -m t5_small -b 16 -s 8000 -lr 1.2e-4 \
  --warmup-steps 1000 --ckpt-every 2000 --log-every 100 > /dev/null 2>&1 &
echo $! > /tmp/wd_drums.pid
while ! grep -q "done; checkpoints" /tmp/train_drums.log 2>/dev/null; do
  sleep 60
done
touch /tmp/stop_watchdog
sleep 10
mark "drums train done"
mark "drums eval (ksh vocab, 32 test tracks)"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/drums_r4/last \
  -d synth_drum --split test -b 8 \
  --output-json artifacts/eval_drums_r4.json >> "$LOG" 2>&1
mark "drums eval done: $(head -c 200 artifacts/eval_drums_r4.json 2>/dev/null)"
mark "STAGE2B DONE"
