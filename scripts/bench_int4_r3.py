"""Flagship worst-case decode: KV-cache format ablation (int8 vs int8c4
vs int4), composed with the measured phases/unroll tuning if present.

Cross-attention KV reads are step-invariant full-T traffic — the
flagship's dominant decode bytes — and phase-chunking cannot touch them;
nibble-packed int4 halves them (ops/kv_quant.py). Run on the real chip:
  python scripts/bench_int4_r3.py
Appends one JSON line per config to artifacts/int4_ablation_r3.jsonl.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

OUT = "artifacts/int4_ablation_r3.jsonl"


def main():
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import bench

    tune = bench.load_decode_tuning().get(
        "perceiver_tf_mc13/mc13_full_plus_256", {})
    phases, unroll = tune.get("phases", 1), tune.get("unroll", 1)
    # kv format × decoder-weight format (ops/weight_quant.py). wq="bf16"
    # on one row isolates whether XLA was already hoisting the fp32→bf16
    # weight convert out of the while-loop (bf16 == none ⇒ it was).
    combos = [("int8", "none"), ("int8", "bf16"), ("int8", "int8"),
              ("int8c4", "none"), ("int8c4", "int8"),
              ("int4", "none"), ("int4", "int8")]
    with open(OUT, "a") as f:
        for kv, wq in combos:
            bundle = bench.build("perceiver_tf_mc13", "mc13_full_plus_256",
                                 {"kv_quant": kv, "weight_quant": wq})
            thr, lat = bench.measure(bundle, 16, 256, n_iters=3,
                                     phases=phases, unroll=unroll)
            row = {"kv_quant": kv, "weight_quant": wq,
                   "phases": phases, "unroll": unroll,
                   "audio_s_per_s": round(thr, 3),
                   "batch_ms": round(lat * 1e3, 1),
                   "vs_baseline": round(thr / bench.TARGET, 4)}
            print(json.dumps(row), flush=True)
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
