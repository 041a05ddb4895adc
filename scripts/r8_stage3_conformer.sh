#!/bin/bash
# Round-4 TPU chain, stage 3 (OPTIONAL — run only if wall clock allows):
# the conformer quality run behind the per-block time anchor
# (encoder_abs_pos="sinusoidal_per_block", conformer_small default).
# Prerequisite: stage-2's 2k-step anchor probe read healthy
# (artifacts/conformer_anchor/probe.json: shift_argmax_moved >= ~8/11).
#
# Usage: r8_stage3_conformer.sh [steps] [lr] (default 6000 1.2e-4)
# lr default is the measured-safe deep-preset peak: post q-init fix, 3e-4
# slow-diverges every d>=512 preset after ~5k steps (flagship:
# artifacts/mc13_r6/diverged_3e-4_leg.jsonl; t5_base:
# artifacts/t5base_r4/diverged_3e-4_full.jsonl) — and conformer_small is
# default dims (d=512, deep), so it sits on the same cliff.
set -u
cd /root/repo
LOG=/tmp/r8_stage3.log
STEPS=${1:-6000}
LR=${2:-1.2e-4}
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

rm -f /tmp/stop_watchdog
mark "launching conformer_r4 ($STEPS steps)"
nohup bash scripts/train_watchdog.sh runs/conformer_r4 /tmp/train_conf.log \
  /tmp/train_conf.pid -- \
  conformer_r4 -d synth_big -m conformer_small -b 16 -s "$STEPS" -lr "$LR" \
  --warmup-steps 1000 --ckpt-every 2000 --log-every 100 > /dev/null 2>&1 &
echo $! > /tmp/wd_conf.pid
while ! grep -q "done; checkpoints" /tmp/train_conf.log 2>/dev/null; do
  sleep 60
done
touch /tmp/stop_watchdog
sleep 10
mark "conformer train done"
mkdir -p artifacts/conformer_r4
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/conformer_r4/last \
  -d synth_big --split test -b 8 --max-tracks 16 \
  --output-json artifacts/conformer_r4/eval_test.json >> "$LOG" 2>&1
mark "conformer eval done: $(head -c 200 artifacts/conformer_r4/eval_test.json 2>/dev/null)"
mark "STAGE3 DONE"
