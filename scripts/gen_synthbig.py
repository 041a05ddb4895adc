"""Regenerate the synthbig corpus (single-instrument-mix convergence corpus,
data preset `synth_big`) after a host reset.

The original round-2 corpus died with its host and its generating seeds were
not recorded; since every checkpoint trained on it is also gone, nothing
alive requires bit-identity with the old corpus. These seeds (20/21/22) are
now the durable definition — committed so any future regeneration IS
bit-identical from here on (see tests/test_synth_determinism.py).

Usage: python scripts/gen_synthbig.py [n_train] [root]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from yourmt3_tpu.data.preprocess.synth import build_synth_dataset

PROGRAMS = (0, 24, 32)  # piano guitar bass (round-2 default set)

n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
root = sys.argv[2] if len(sys.argv) > 2 else "/root/ymt3_data"

t0 = time.time()
build_synth_dataset(root, n_tracks=n_train, duration=8.0,
                    splits=("train",), programs=PROGRAMS, seed=20,
                    dataset_name="synthbig")
print(f"train done {time.time()-t0:.0f}s", flush=True)
build_synth_dataset(root, n_tracks=32, duration=8.0,
                    splits=("validation",), programs=PROGRAMS, seed=21,
                    dataset_name="synthbig")
build_synth_dataset(root, n_tracks=32, duration=8.0,
                    splits=("test",), programs=PROGRAMS, seed=22,
                    dataset_name="synthbig")
print(f"all done {time.time()-t0:.0f}s", flush=True)
