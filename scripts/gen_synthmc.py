"""Generate the synthmc corpus: multi-instrument synthetic tracks with
timbre-distinct programs across 6 MC12 classes + drums.

Round-4 note: the renderer gained onset transients (piano hammer / guitar
pluck), inharmonicity, per-note detune, velocity-coupled brightness, and a
full-kit drum synth (synth.py), and the default track count rose to 4096
(the 28k-step round-3 flagship read train 0.65 vs test 0.57 — data-limited).
Seeds are unchanged (30/31/32) but the rendered corpus is a NEW version;
round-3 eval JSONs under artifacts/mc13_r5 are against the old corpus and
are not bit-comparable.

Usage: python scripts/gen_synthmc.py [n_train] [root]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from yourmt3_tpu.data.preprocess.synth import build_synth_dataset

PROGRAMS = (0, 24, 32, 40, 56, 64)  # piano guitar bass strings brass reed

n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
root = sys.argv[2] if len(sys.argv) > 2 else "/root/ymt3_data"
# v3 (round 5): new dataset name so the v2 corpus stays intact for
# in-flight evals; per-track 2–4-program subsets + the synth.py renderer
# upgrades (see config/data_presets.py synth_mc3 note)
name = sys.argv[3] if len(sys.argv) > 3 else "synthmc3"
subset = (2, 4)

t0 = time.time()
build_synth_dataset(root, n_tracks=n_train, duration=8.0,
                    splits=("train",), programs=PROGRAMS, seed=40,
                    dataset_name=name, track_subset=subset)
print(f"train done {time.time()-t0:.0f}s", flush=True)
build_synth_dataset(root, n_tracks=32, duration=8.0,
                    splits=("validation",), programs=PROGRAMS, seed=41,
                    dataset_name=name, track_subset=subset)
build_synth_dataset(root, n_tracks=32, duration=8.0,
                    splits=("test",), programs=PROGRAMS, seed=42,
                    dataset_name=name, track_subset=subset)
print(f"all done {time.time()-t0:.0f}s", flush=True)
