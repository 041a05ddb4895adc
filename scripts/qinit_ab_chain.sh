#!/bin/bash
# Round-3 (continued): A/B the T5 query-init fix on t5_base trainability.
# Two identical short t5_base legs (synth_big, b16, lr 3e-4, warmup 200,
# same seed) differing ONLY in the MultiHeadAttention query init:
#   fixed  = HEAD (q std = (d_model*d_kv)^-0.5, the T5 convention)
#   legacy = the un-compensated variance_scaling(1.0) init every round-3
#            t5_base run trained with (monkeypatched by the probe script).
# Verdict artifact: artifacts/qinit_ab/summary.json (loss + shift-acc
# trajectories side by side).
set -u
cd /root/repo
LOG=/tmp/qinit_ab.log
STEPS=${1:-800}
mkdir -p artifacts/qinit_ab
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

for arm in fixed legacy; do
  mark "START $arm ($STEPS steps)"
  timeout 2400 python -u scripts/probe_qinit_ab.py "$arm" "$STEPS" >> "$LOG" 2>&1
  rc=$?
  mark "END $arm rc=$rc"
  if [ -f "runs/qinit_$arm/qinit_${arm}_log.jsonl" ]; then
    cp "runs/qinit_$arm/qinit_${arm}_log.jsonl" "artifacts/qinit_ab/$arm.jsonl"
  else
    mark "ARM FAILED: $arm (rc=$rc, no jsonl) — summary will flag it"
  fi
done

python - <<'EOF' >> "$LOG" 2>&1
import json
out = {}
for arm in ("fixed", "legacy"):
    import os
    if not os.path.exists(f"artifacts/qinit_ab/{arm}.jsonl"):
        out[arm] = {"status": "FAILED - no log (see /tmp/qinit_ab.log)"}
        continue
    rows = [json.loads(l) for l in open(f"artifacts/qinit_ab/{arm}.jsonl")]
    out[arm] = {
        "steps": [r["step"] for r in rows],
        "loss": [round(r["loss"], 4) for r in rows],
        "accuracy": [round(r.get("accuracy", 0.0), 4) for r in rows],
        "shift_accuracy": [round(r.get("shift_accuracy", 0.0), 4)
                           for r in rows],
    }
json.dump(out, open("artifacts/qinit_ab/summary.json", "w"), indent=1)
print("SUMMARY", {a: ({"final_loss": v["loss"][-1],
                       "final_shift_acc": v["shift_accuracy"][-1]}
                      if "loss" in v else v)
                  for a, v in out.items()})
EOF
mark "CHAIN DONE"
