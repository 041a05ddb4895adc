"""Decoder GQA/MQA throughput probe (round 5).

Single-token decode is HBM-bound on self-KV-cache reads (EVIDENCE.md
roofline); decoder_kv_heads shares K/V heads across query heads, cutting
that traffic num_heads/Hkv x. This banks the measurement the feature was
built for: flagship worst-case decode at the tuned settings (B=32,
phases=16, unroll=4, int8 decoder weights, int8 KV) for MHA (incumbent),
MQA (Hkv=1) and GQA2 (Hkv=2). Rows append to
artifacts/gqa_throughput_r5.jsonl as they land so a wedged tunnel can't
lose earlier legs.

Usage: python scripts/bench_gqa.py [kv_heads ...]   (default: mha 1 2)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import build, load_decode_tuning, decode_path_overrides, measure  # noqa: E402

PRESET, TASK = "perceiver_tf_mc13", "mc13_full_plus_256"
OUT = "artifacts/gqa_throughput_r5.jsonl"


def main():
    arms = sys.argv[1:] or ["mha", "1", "2"]
    tune = load_decode_tuning()[f"{PRESET}/{TASK}"]
    batch, phases, unroll = tune["batch"], tune["phases"], tune["unroll"]
    for arm in arms:
        ov = decode_path_overrides(13, 1024)  # flagship: 13ch -> int8 KV
        ov["weight_quant"] = tune["weight_quant"]
        if arm != "mha":
            ov["decoder_kv_heads"] = int(arm)
        t0 = time.time()
        bundle = build(PRESET, TASK, ov)
        L = bundle.task_manager.max_token_length
        thr, lat = measure(bundle, batch, L, n_iters=3, phases=phases,
                           unroll=unroll)
        row = {"arm": ("mha" if arm == "mha" else f"kv_heads={arm}"),
               "batch": batch, "phases": phases, "unroll": unroll,
               "decode_path": ov, "audio_s_per_s": round(thr, 3),
               "batch_ms": round(lat * 1e3, 1),
               "wall_incl_compile_s": round(time.time() - t0, 1)}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
