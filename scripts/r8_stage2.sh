#!/bin/bash
# Round-4 TPU chain, stage 2: flagship (mc13_r6) evals + realistic bench,
# then the drums quality run (config 4), the conformer per-block-anchor
# probe, and the flagship batch-size sweep. Started manually once stage 1
# has launched the flagship train.
set -u
cd /root/repo
LOG=/tmp/r8_stage2.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "stage2 start: waiting for mc13_r6"
while ! grep -q "done; checkpoints" /tmp/train_mc13.log 2>/dev/null; do
  sleep 60
done
touch /tmp/stop_watchdog
sleep 10
mark "flagship train done"
mkdir -p artifacts/mc13_r6

# evals on the full 32 unseen test tracks: plain greedy (the VERDICT bar),
# greedy + repetition guard, beam=2 (round-3 compat row)
mark "flagship eval greedy"
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 \
  --output-json artifacts/mc13_r6/eval_test.json >> "$LOG" 2>&1
mark "flagship eval greedy+guard"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 --repetition-guard 8 \
  --output-json artifacts/mc13_r6/eval_test_guard8.json >> "$LOG" 2>&1
mark "flagship eval beam2"
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 --beam-size 2 \
  --output-json artifacts/mc13_r6/eval_test_beam2.json >> "$LOG" 2>&1
mark "flagship train-split eval (gap check, 16 tracks)"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split train -b 8 --max-tracks 16 \
  --output-json artifacts/mc13_r6/eval_train.json >> "$LOG" 2>&1

mark "flagship realistic bench"
timeout 1500 python -u bench.py --transcribe-ckpt=runs/mc13_r6/last \
  --transcribe-batch=16 > artifacts/mc13_r6/transcribe_b16.json 2>> "$LOG" \
  || mark "realistic bench FAILED"

# ---- flagship worst-case batch sweep (VERDICT item 5) -------------------
mark "batch sweep"
timeout 3000 python -u scripts/bench_batch_sweep.py \
  artifacts/batch_sweep_r4.jsonl >> "$LOG" 2>&1 || mark "batch sweep FAILED"
# ---- drums quality run (BASELINE config 4) ------------------------------
rm -f /tmp/stop_watchdog
mark "launching drums_r4 (8k steps, synth_drum full-kit corpus)"
nohup bash scripts/train_watchdog.sh runs/drums_r4 /tmp/train_drums.log \
  /tmp/train_drums.pid -- \
  drums_r4 -d synth_drum -m t5_small -b 16 -s 8000 -lr 3e-4 \
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

# ---- conformer per-block anchor probe (VERDICT item 4, A/B evidence) ----
rm -f /tmp/stop_watchdog
mark "conformer anchor probe (2k steps)"
timeout 3000 python -u scripts/probe_conformer_anchor.py 2000 \
  >> "$LOG" 2>&1 || mark "conformer probe FAILED"

mark "STAGE2 DONE"
