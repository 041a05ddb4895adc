"""Flagship worst-case decode ablation: phases × unroll grid.

Run on the real chip AFTER training frees it:
  python scripts/bench_phase_ablation.py
Prints one JSON line per config; pick the winner for bench.py defaults.
"""
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import bench

    grid = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (1, 2)]
    bundle = bench.build("perceiver_tf_mc13", "mc13_full_plus_256",
                         bench.decode_path_overrides(13, 256))
    for phases, unroll in grid:
        thr, lat = bench.measure(bundle, 16, 256, n_iters=3,
                                 phases=phases, unroll=unroll)
        print(json.dumps({"phases": phases, "unroll": unroll,
                          "audio_s_per_s": round(thr, 3),
                          "batch_ms": round(lat * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
