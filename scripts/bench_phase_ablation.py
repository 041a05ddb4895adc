"""Flagship worst-case decode ablation: phases × unroll grid.

Run on the real chip AFTER training frees it:
  python scripts/bench_phase_ablation.py
Prints one JSON line per config and appends them to
artifacts/phase_ablation_r3.jsonl. If a (phases, unroll) combination beats
the (1, 1) baseline by >2%, writes artifacts/decode_tuning.json — the
hardware-measured tuning table bench.py picks up (both knobs are
token-identical to the default, tested in tests/test_model_t5.py).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

OUT_LINES = "artifacts/phase_ablation_r3.jsonl"


def main():
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import bench

    grid = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (1, 2), (2, 2)]
    bundle = bench.build("perceiver_tf_mc13", "mc13_full_plus_256",
                         bench.decode_path_overrides(13, 256))
    rows = []
    with open(OUT_LINES, "a") as f:
        for phases, unroll in grid:
            thr, lat = bench.measure(bundle, 16, 256, n_iters=3,
                                     phases=phases, unroll=unroll)
            row = {"phases": phases, "unroll": unroll,
                   "audio_s_per_s": round(thr, 3),
                   "batch_ms": round(lat * 1e3, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
            f.write(json.dumps(row) + "\n")

    base = next(r for r in rows if r["phases"] == 1 and r["unroll"] == 1)
    best = max(rows, key=lambda r: r["audio_s_per_s"])
    if best["audio_s_per_s"] > 1.02 * base["audio_s_per_s"]:
        tuning = {}
        if os.path.exists(bench.TUNING_FILE):
            with open(bench.TUNING_FILE) as f:
                tuning = json.load(f)
        entry = {"phases": best["phases"], "unroll": best["unroll"],
                 "measured_audio_s_per_s": best["audio_s_per_s"],
                 "baseline_audio_s_per_s": base["audio_s_per_s"]}
        # the MoE flagship shares the decoder shape exactly (same decode
        # loop, same L=256×13ch), so the tuning transfers
        tuning["perceiver_tf_mc13/mc13_full_plus_256"] = entry
        tuning["perceiver_tf_mc13_moe/mc13_full_plus_256"] = dict(entry)
        with open(bench.TUNING_FILE, "w") as f:
            json.dump(tuning, f, indent=1)
        print(f"tuning written: {entry}", file=sys.stderr)
    else:
        print(f"no winner beyond 2% (best {best}, base {base})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
