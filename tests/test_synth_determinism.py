"""The synthetic corpora are the cross-host reproducibility anchor: train/
eval splits are regenerated from seeds after a host reset, and committed
eval JSONs stay comparable only if regeneration is bit-identical
(EVIDENCE.md host-reset note). Lock that property."""

import hashlib
import json
import os

from yourmt3_tpu.data.preprocess.synth import build_synth_dataset


def _tree_digest(root: str) -> dict:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as fh:
                data = fh.read()
            if f.endswith(".json"):
                # index files embed absolute paths; compare structure-free
                data = json.dumps(
                    json.loads(data), sort_keys=True, default=str
                ).replace(root, "").encode()
            out[rel] = hashlib.sha256(data).hexdigest()
    return out


def test_build_synth_dataset_bit_identical(tmp_path):
    kw = dict(n_tracks=2, duration=2.0, splits=("test",),
              programs=(0, 40), seed=32, dataset_name="synthmc")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_synth_dataset(a, **kw)
    build_synth_dataset(b, **kw)
    da, db = _tree_digest(a), _tree_digest(b)
    assert da.keys() == db.keys() and len(da) >= 5
    assert da == db
