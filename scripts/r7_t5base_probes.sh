#!/bin/bash
# Round-4: t5_base recipe probes (VERDICT r3 item 2).
#
# The round-3 t5_base never trained (onset F1 0.031 at 20k; loss stall on
# resume at 3e-4 — EVIDENCE "t5_base training honesty note"). Root-cause
# candidate fixed at HEAD: the missing T5 query-init compensation left init
# attention logits at std≈sqrt(d_kv)=8 (near-saturated softmax), which
# compounds at 12+12 layers where the 4-layer presets trained through it.
#
# This chain A/Bs the RECIPE on top of the fixed init with cheap 2k-step
# probes (the protocol that validated the perceiver time-signal fix before
# its 28k retrain): loss + teacher-forced shift-accuracy at 2k decide the
# full run's lr. Short warmup (500) so the probe actually tests peak lr.
#
# Usage: r7_t5base_probes.sh [steps]
set -u
cd /root/repo
LOG=/tmp/r7_probes.log
STEPS=${1:-2000}
mkdir -p artifacts/t5base_r4
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

for arm in 3e-4 1.2e-4; do
  name="t5base_probe_${arm}"
  mark "START probe lr=$arm ($STEPS steps)"
  timeout 5400 python -u -m yourmt3_tpu.cli.train "$name" \
    -d synth_big -m t5_base -b 16 -s "$STEPS" -lr "$arm" \
    --warmup-steps 500 --ckpt-every "$STEPS" --log-every 100 \
    >> "$LOG" 2>&1
  rc=$?
  mark "END probe lr=$arm rc=$rc"
  if [ -f "runs/$name/${name}_log.jsonl" ]; then
    cp "runs/$name/${name}_log.jsonl" "artifacts/t5base_r4/probe_${arm}.jsonl"
  else
    mark "MISSING log for lr=$arm (rc=$rc) — arm failed"
  fi
done

python - <<'EOF' >> "$LOG" 2>&1
import json, os
out = {}
for arm in ("3e-4", "1.2e-4"):
    p = f"artifacts/t5base_r4/probe_{arm}.jsonl"
    if not os.path.exists(p):
        out[arm] = {"status": "FAILED — no log"}
        continue
    rows = [json.loads(l) for l in open(p)]
    out[arm] = {
        "steps": [r["step"] for r in rows][-5:],
        "loss": [round(r["loss"], 4) for r in rows][-5:],
        "shift_accuracy": [round(r.get("shift_accuracy", 0.0), 4)
                           for r in rows][-5:],
    }
json.dump(out, open("artifacts/t5base_r4/probe_summary.json", "w"), indent=1)
print("PROBE SUMMARY", json.dumps(out))
EOF
mark "CHAIN DONE"
