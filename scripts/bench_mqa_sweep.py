"""Flagship MQA (decoder_kv_heads=1) idle-chip batch sweep + promotion.

The GQA/MQA probe (`scripts/bench_gqa.py`, artifacts/gqa_throughput_r5.jsonl)
measured MQA at +17% over the MHA incumbent at the tuned B=32 — single-token
decode is HBM-bound on self-KV-cache reads, and sharing the K/V head across
the 6 query heads cuts exactly that traffic. This sweeps batch size for the
MQA decode path (worst case: EOS banned, full L) and, if the best MQA row
beats the incumbent tuning, promotes `decoder_kv_heads=1` + the new batch +
the clean-sweep number into artifacts/decode_tuning.json (consumed by
bench.py's headline). Promotion is gated by the caller (r11 chain) on the
trained MQA flagship's eval quality — see scripts/r11_mqa_promote.sh.

Usage: python scripts/bench_mqa_sweep.py [out.jsonl]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_config, load_decode_tuning  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/batch_sweep_r5_mqa.jsonl"
KEYS = ("perceiver_tf_mc13/mc13_full_plus_256",
        "perceiver_tf_mc13_moe/mc13_full_plus_256")


def main():
    rows = []
    for b in (16, 24, 32, 48, 64):
        row = bench_config("perceiver_tf_mc13", "mc13_full_plus_256", b,
                           extra_overrides={"decoder_kv_heads": 1})
        print(json.dumps(row), flush=True)
        rows.append(row)
        with open(OUT, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    best = max(rows, key=lambda r: r["audio_s_per_s_per_chip"])
    print("BEST", json.dumps({k: best[k] for k in (
        "batch", "audio_s_per_s_per_chip", "vs_baseline",
        "batch_latency_ms", "p50_segment_latency_ms")}))
    incumbent = load_decode_tuning().get(KEYS[0], {}).get(
        "measured_audio_s_per_s", 0.0)
    if best["audio_s_per_s_per_chip"] <= incumbent:
        print(f"NOT PROMOTED: MQA best {best['audio_s_per_s_per_chip']} "
              f"<= incumbent {incumbent}")
        return
    path = "artifacts/decode_tuning.json"
    with open(path) as f:
        tune = json.load(f)
    for key in KEYS:
        t = tune.setdefault(key, {})
        t["decoder_kv_heads"] = 1
        t["batch"] = best["batch"]
        t["measured_audio_s_per_s"] = best["audio_s_per_s_per_chip"]
        t["provenance"] = (
            f"idle-chip MQA clean sweep {OUT}; quality validated by the "
            "trained MQA flagship (artifacts/mc13_mc3/eval_test.json)")
    with open(path, "w") as f:
        json.dump(tune, f, indent=1)
    print(f"PROMOTED decoder_kv_heads=1 batch={best['batch']} into {path}")


if __name__ == "__main__":
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    main()
