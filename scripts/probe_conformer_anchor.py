"""Probe: does per-block time re-anchoring fix the conformer's weak
absolute-time signal?

Round-3 control (committed, artifacts/conformer_r3/): input-only sinusoid
injection → at 2 k steps loss 2.855 / shift-acc ±50 ms 0.143, and at 6 k
steps only 1/11 shift argmaxes moved under a +0.5 s audio shift — the
anchor washes out behind bidirectional rel-bias attention + conv, and
end-to-end onset F1 read 0.0185.

This probe trains conformer_small at HEAD (per-block re-anchor + the
query-init fix) for the same recipe's first N steps on the SAME seeded
corpus (synth_big, seed-20 regeneration is bit-identical), then measures
the same two signals: teacher-forced shift accuracy trajectory (in the
train log) and the +0.5 s audio-shift sensitivity of shift-token argmaxes
on an unseen test track.

Usage: python scripts/probe_conformer_anchor.py [steps]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

from yourmt3_tpu.cli.train import main  # noqa: E402

main([
    "conformer_anchor", "-d", "synth_big", "-m", "conformer_small",
    "-b", "16", "-s", str(steps), "-lr", "3e-4", "--warmup-steps", "500",
    "--ckpt-every", str(steps), "--log-every", "50", "--seed", "0",
    "--ckpt-dir", "runs/conformer_anchor",
])

# ---- +0.5 s audio-shift sensitivity (protocol of probe_time_sensitivity)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from yourmt3_tpu.api import load_checkpoint  # noqa: E402
from yourmt3_tpu.data.audio_io import (load_audio_file,  # noqa: E402
                                       slice_padded_array)
from yourmt3_tpu.data.indexes import load_notes  # noqa: E402
from yourmt3_tpu.models.ymt3 import shift_right  # noqa: E402

bundle = load_checkpoint("runs/conformer_anchor/last")
tm = bundle.task_manager
fe = jax.jit(bundle.frontend)
fwd = jax.jit(lambda f, ids: bundle.model.apply(bundle.params, f, ids))
idx = json.load(open("/root/ymt3_data/yourmt3_indexes/"
                     "synthbig_test_file_list.json"))
tr = idx["tracks"][0]
audio, sr = load_audio_file(tr["audio_file"], bundle.audio_cfg.sample_rate)
ref = load_notes(tr["notes_file"])
segs, starts = slice_padded_array(audio, bundle.audio_cfg.input_frames)
labels = tm.tokenize_song(ref, (starts / sr).tolist())[1:2]  # (1,C,L)
seg = jnp.asarray(segs[1:2])
lg_a = np.asarray(fwd(fe(seg), shift_right(jnp.asarray(labels))))
half = sr // 2
seg_shift = jnp.asarray(np.concatenate(
    [np.zeros((1, half), np.float32), segs[1:2][:, :-half]], axis=1))
lg_b = np.asarray(fwd(fe(seg_shift), shift_right(jnp.asarray(labels))))
codec = tm.codec
lab = labels[0]
moved = tot = 0
for c in range(lab.shape[0]):
    for l in range(lab.shape[1]):
        t = int(lab[c, l])
        if t == 0:
            continue
        try:
            ev = codec.decode_event_id(t)
        except Exception:
            continue
        if ev.type != "shift":
            continue
        pa = int(np.argmax(lg_a[0, c, l]))
        pb = int(np.argmax(lg_b[0, c, l]))
        tot += 1
        if pa != pb:
            moved += 1
result = {"steps": steps, "shift_argmax_moved": moved, "shift_tokens": tot,
          "mean_abs_logit_delta": float(np.mean(np.abs(lg_a - lg_b)))}
print("ANCHOR PROBE", json.dumps(result), flush=True)
import os  # noqa: E402

os.makedirs("artifacts/conformer_anchor", exist_ok=True)
json.dump(result, open("artifacts/conformer_anchor/probe.json", "w"),
          indent=1)
