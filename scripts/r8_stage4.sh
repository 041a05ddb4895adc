#!/bin/bash
# Round-4 TPU chain, stage 4: runs after stage 2b (drums leg) completes.
#   1. clean batch sweep on an idle chip (the two 18:18 sweeps were
#      contention-contaminated; VERDICT item 5 needs a clean floor)
#   2. conformer stage-3 quality run (probe read 10/11 — anchor fixed)
#   3. flagship extension 30k -> 45k @ 1.2e-4 cosine (train/test gap
#      0.065 at 30k says steps-limited; VERDICT item 3 plain-greedy bar)
#   4. flagship evals (greedy / guard8 / beam2) + realistic bench at the
#      sweep-tuned batch
set -u
cd /root/repo
LOG=/tmp/r8_stage4.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "stage4 start: waiting for stage2b (drums leg)"
while ! grep -q "STAGE2B DONE" /tmp/r8_stage2b.log 2>/dev/null; do
  sleep 60
done
mark "stage2b done; clean batch sweep (idle chip)"
timeout 3000 python -u scripts/bench_batch_sweep.py \
  artifacts/batch_sweep_r4_clean.jsonl >> "$LOG" 2>&1 || mark "sweep FAILED"

mark "conformer stage-3 quality run (6k steps)"
rm -f /tmp/train_conf.log   # stale done-marker would skip the wait loop
bash scripts/r8_stage3_conformer.sh 6000 1.2e-4
mark "conformer stage-3 returned"

# ---- flagship extension 30k -> 45k --------------------------------------
rm -f /tmp/stop_watchdog
rm -f /tmp/train_mc13.log   # 30k leg's done-marker would skip the wait loop
mark "flagship extension 30k -> 45k @ 1.2e-4"
nohup bash scripts/train_watchdog.sh runs/mc13_r6 /tmp/train_mc13.log \
  /tmp/train_mc13.pid -- \
  mc13_r6 -d synth_mc -m perceiver_tf_mc13 -b 16 -s 45000 -lr 1.2e-4 \
  --warmup-steps 0 --ckpt-every 5000 --log-every 100 > /dev/null 2>&1 &
echo $! > /tmp/wd_mc13.pid
while ! grep -q "done; checkpoints" /tmp/train_mc13.log 2>/dev/null; do
  sleep 60
done
touch /tmp/stop_watchdog
sleep 10
mark "flagship 45k train done"

mkdir -p artifacts/mc13_r7
mark "flagship 45k eval greedy"
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 \
  --output-json artifacts/mc13_r7/eval_test.json >> "$LOG" 2>&1
mark "flagship 45k eval greedy+guard8"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 --repetition-guard 8 \
  --output-json artifacts/mc13_r7/eval_test_guard8.json >> "$LOG" 2>&1
mark "flagship 45k eval beam2"
timeout 3600 python -u -m yourmt3_tpu.cli.test -ckpt runs/mc13_r6/last \
  -d synth_mc --split test -b 8 --beam-size 2 \
  --output-json artifacts/mc13_r7/eval_test_beam2.json >> "$LOG" 2>&1

mark "flagship 45k realistic bench (tuned batch)"
timeout 1500 python -u bench.py --transcribe-ckpt=runs/mc13_r6/last \
  > artifacts/mc13_r7/transcribe_tuned.json 2>> "$LOG" \
  || mark "realistic bench FAILED"
mark "bench: $(cat artifacts/mc13_r7/transcribe_tuned.json 2>/dev/null)"
mark "STAGE4 DONE"
