#!/bin/bash
# Round-3 final TPU stage: close BASELINE config 2 with a t5_base that is
# actually trained enough to EOS-terminate its decodes.
#
# Stage-2's 3 k-step t5_base (runs/t5base_r3) emitted garbage-length
# decodes (1596 decode errors on the realistic workload), so the public
# transcribe path measured 22 audio-s/s (0.44x) — the model, not the
# runtime, was the bottleneck. This stage resumes that checkpoint and
# trains to 20 k total steps (same recipe: synth_big, b16, lr 3e-4 cosine,
# warmup 500), then re-measures the realistic bench at B=64/B=16 and a
# 16-track test-split eval for the honesty row.
#
# A deadline cut (scripts/deadline_cut.sh) SIGTERMs the trainer in time
# for the bench+eval to land before round end, whatever step it reached.
set -u
cd /root/repo
LOG=/tmp/r6_t5base.log
RUN=runs/t5base_r3
CUT_EPOCH=${1:?deadline epoch required}
LR=${2:-3e-4}
# lr history: the 3k->8.45k leg ran the original 3e-4 peak and STALLED
# (loss pinned at ~3.0 for 5k steps — the resume jumped lr from the 3k
# run's decayed ~5e-5 tail back to ~3e-4, too hot for d=768); the final
# leg resumes the 8.45k state at a 1.2e-4 peak.
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

rm -f /tmp/stop_watchdog
mark "stage start: t5_base resume -> 20k @ lr $LR"
nohup bash scripts/train_watchdog.sh "$RUN" /tmp/train_t5base.log /tmp/train_t5base.pid -- \
  t5base_r3 -d synth_big -m t5_base -b 16 -s 20000 -lr "$LR" \
  --warmup-steps 500 --ckpt-every 1000 --log-every 50 > /dev/null 2>&1 &
echo $! > /tmp/watchdog_t5base.pid
nohup bash scripts/deadline_cut.sh "$CUT_EPOCH" /tmp/train_t5base.log \
  /tmp/train_t5base.pid > /dev/null 2>&1 &

while ! grep -q "done; checkpoints" /tmp/train_t5base.log 2>/dev/null; do sleep 60; done
touch /tmp/stop_watchdog
sleep 5
mark "train done"

for b in 64 16; do
  for i in 1 2 3; do
    mark "bench B=$b attempt $i"
    if timeout 1200 python -u bench.py --transcribe-ckpt="$RUN/last" \
        --transcribe-batch=$b > "artifacts/transcribe_t5base20k_b$b.json" 2>> "$LOG"; then
      mark "OK bench B=$b"; break
    fi
    sleep 30
  done
done

mark "eval (honesty row)"
timeout 2400 python -u -m yourmt3_tpu.cli.test -ckpt "$RUN/last" -d synth_big --split test \
  -b 8 --max-tracks 16 --output-json "artifacts/t5base_r3/eval_test_20k.json" >> "$LOG" 2>&1
mark "R6 STAGE DONE"
