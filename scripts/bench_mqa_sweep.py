"""Flagship decode-config sweep: MQA × int4-cross KV, idle chip, + promotion.

Two independent HBM levers on the single-token decode loop, finally both
measured on TPU (round 5):
  - MQA (decoder_kv_heads=1): shares K/V across the 6 query heads — cuts
    the per-step SELF-cache reads (probe: 83.5 vs 71.2 audio-s/s,
    artifacts/gqa_throughput_r5.jsonl).
  - kv_quant=int8c4p: int8 self / Pallas nibble-packed int4 CROSS cache —
    cuts the per-step cross (encoder-memory) reads (measured 101.4 at
    B=32 MHA, artifacts/int8c4p_r5.json).
They attack disjoint byte streams, so this sweeps the arms and their
composition at the tuned B=32, then sweeps batch for the winner, and
promotes the winning config into artifacts/decode_tuning.json (consumed
by bench.py's headline). The caller (scripts/r11_mqa_promote.sh) gates
promotion on trained-checkpoint eval quality for each lever it enables:
pass arm names to allow on argv, e.g.
    python scripts/bench_mqa_sweep.py out.jsonl mqa c4p
Only levers named on argv are swept/promoted ("mqa", "c4p").

Usage: python scripts/bench_mqa_sweep.py [out.jsonl] [mqa] [c4p]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_config, load_decode_tuning  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/batch_sweep_r5_mqa.jsonl"
ALLOW = set(a for a in sys.argv[2:]) or {"mqa"}
KEYS = ("perceiver_tf_mc13/mc13_full_plus_256",
        "perceiver_tf_mc13_moe/mc13_full_plus_256")

# NOTE: no "mqa+c4p" composition arm — config/model.py:136 rejects
# decoder_kv_heads != num_heads with the Pallas int4-cross kernel (the
# kernel indexes per-KV-head blocks; shared-head broadcast is future
# kernel work). MQA composes with the DENSE int8c4 path, but dense int4
# formats measured slower than int8 at this shape (r3 ablation), so the
# meaningful arms are the two single levers.
ARMS = {
    "mqa": {"decoder_kv_heads": 1},
    "c4p": {"kv_quant": "int8c4p"},
}


def main():
    rows = []

    def run(batch, overrides, label):
        row = bench_config("perceiver_tf_mc13", "mc13_full_plus_256", batch,
                           extra_overrides=dict(overrides))
        row["arm"] = label
        print(json.dumps(row), flush=True)
        rows.append(row)
        with open(OUT, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return row

    arms = {k: v for k, v in ARMS.items()
            if set(k.split("+")) <= ALLOW}
    best = None
    for label, ov in arms.items():
        row = run(32, ov, label)
        if best is None or (row["audio_s_per_s_per_chip"]
                            > best["audio_s_per_s_per_chip"]):
            best = row
    # batch sweep around the winning arm (32 already measured)
    for b in (24, 48, 64):
        row = run(b, arms[best["arm"]], best["arm"])
        if row["audio_s_per_s_per_chip"] > best["audio_s_per_s_per_chip"]:
            best = row
    print("BEST", json.dumps({k: best[k] for k in (
        "arm", "batch", "audio_s_per_s_per_chip", "vs_baseline",
        "batch_latency_ms", "p50_segment_latency_ms")}))

    incumbent = load_decode_tuning().get(KEYS[0], {}).get(
        "measured_audio_s_per_s", 0.0)
    if best["audio_s_per_s_per_chip"] <= incumbent:
        print(f"NOT PROMOTED: best {best['audio_s_per_s_per_chip']} "
              f"<= incumbent {incumbent}")
        return
    path = "artifacts/decode_tuning.json"
    with open(path) as f:
        tune = json.load(f)
    winner_ov = arms[best["arm"]]
    for key in KEYS:
        t = tune.setdefault(key, {})
        t.pop("decoder_kv_heads", None)
        t.pop("kv_quant", None)
        t.update(winner_ov)
        t["batch"] = best["batch"]
        t["measured_audio_s_per_s"] = best["audio_s_per_s_per_chip"]
        t["provenance"] = (
            f"idle-chip arm sweep {OUT} (winner: {best['arm']}); quality "
            "gated on trained-flagship evals in artifacts/mc13_mc3/")
    with open(path, "w") as f:
        json.dump(tune, f, indent=1)
    print(f"PROMOTED {winner_ov} batch={best['batch']} into {path}")


if __name__ == "__main__":
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    main()
