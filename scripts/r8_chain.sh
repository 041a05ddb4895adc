#!/bin/bash
# Round-4 TPU chain, stage 1: when the t5_base 22k run (lr 1.2e-4) lands,
# measure BASELINE config 2 (realistic public-path bench B=64/B=16 + a
# 32-track test eval), then immediately launch the flagship retrain on the
# round-4 synthmc corpus (4096 tracks, timbre-transient renderer) so the
# chip never idles. Stage 2+ (flagship eval, drums, conformer) are driven
# manually/by r8_stage2.
set -u
cd /root/repo
LOG=/tmp/r8_chain.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

mark "stage1 start: waiting for t5_base"
while ! grep -q "done; checkpoints" /tmp/train_t5base.log 2>/dev/null; do
  sleep 60
done
touch /tmp/stop_watchdog
sleep 10
mark "t5_base train done"

mkdir -p artifacts/t5base_r4
for b in 64 16; do
  for i in 1 2 3; do
    mark "t5_base realistic bench B=$b attempt $i"
    if timeout 1500 python -u bench.py --transcribe-ckpt=runs/t5base_r4/last \
        --transcribe-batch=$b > "artifacts/t5base_r4/transcribe_b$b.json" \
        2>> "$LOG"; then
      mark "OK bench B=$b: $(cat artifacts/t5base_r4/transcribe_b$b.json)"
      break
    fi
    sleep 30
  done
done

mark "t5_base eval (32 test tracks)"
timeout 3000 python -u -m yourmt3_tpu.cli.test -ckpt runs/t5base_r4/last \
  -d synth_big --split test -b 8 \
  --output-json artifacts/t5base_r4/eval_test_22k.json >> "$LOG" 2>&1
mark "t5_base eval done: $(python -c "import json;d=json.load(open('artifacts/t5base_r4/eval_test_22k.json'));print({k:round(v,4) for k,v in d.items() if isinstance(v,float)})" 2>/dev/null | head -c 300)"

# ---- launch the flagship retrain (28k, 4096-track round-4 corpus) ------
rm -f /tmp/stop_watchdog
mark "launching flagship mc13_r6 (28k steps)"
nohup bash scripts/train_watchdog.sh runs/mc13_r6 /tmp/train_mc13.log \
  /tmp/train_mc13.pid -- \
  mc13_r6 -d synth_mc -m perceiver_tf_mc13 -b 16 -s 28000 -lr 3e-4 \
  --warmup-steps 2000 --ckpt-every 2000 --log-every 100 > /dev/null 2>&1 &
echo $! > /tmp/wd_mc13.pid
mark "stage1 done (flagship training in background)"
