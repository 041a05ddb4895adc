"""Generate the synthdrum corpus: full-kit drum-only tracks (groove backbone
+ off-grid fills) for the DTM quality loop (BASELINE config 4).

Seeds 40/41/42 are the durable definition — regeneration is bit-identical
(tests/test_synth_determinism.py locks the property).

Usage: python scripts/gen_synthdrum.py [n_train] [root]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from yourmt3_tpu.data.preprocess.synth import build_synth_dataset

n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
root = sys.argv[2] if len(sys.argv) > 2 else "/root/ymt3_data"

t0 = time.time()
build_synth_dataset(root, n_tracks=n_train, duration=8.0,
                    splits=("train",), seed=40, dataset_name="synthdrum",
                    drums_only=True)
print(f"train done {time.time()-t0:.0f}s", flush=True)
build_synth_dataset(root, n_tracks=32, duration=8.0,
                    splits=("validation",), seed=41, dataset_name="synthdrum",
                    drums_only=True)
build_synth_dataset(root, n_tracks=32, duration=8.0,
                    splits=("test",), seed=42, dataset_name="synthdrum",
                    drums_only=True)
print(f"all done {time.time()-t0:.0f}s", flush=True)
