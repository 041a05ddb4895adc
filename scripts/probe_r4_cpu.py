# CPU-side quality probes of the mc13_r4 19k checkpoint, run during the
# round-3 axon outage so the round carries a committed quality signal
# even if the chip never returns: (1) +0.5 s audio-shift sensitivity of
# shift-token argmaxes (the time-blindness causal probe — the broken
# control moved 0/9, trained t5_mini 10/10); (2) per-event-type
# teacher-forced accuracy over test tracks (the diagnostic that isolated
# shift=0.000 on mc13_r3). Writes artifacts/probe_r4_cpu.json.
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

t0 = time.time()
from yourmt3_tpu.api import load_checkpoint
from yourmt3_tpu.data.audio_io import load_audio_file, slice_padded_array
from yourmt3_tpu.data.indexes import load_notes
from yourmt3_tpu.models.ymt3 import YMT3, shift_right
import jax, jax.numpy as jnp

bundle = load_checkpoint("/root/repo/runs/mc13_r4/last")
tm = bundle.task_manager
codec = tm.codec
print("loaded", f"{time.time()-t0:.0f}s", flush=True)
idx = json.load(open("/root/ymt3_data/yourmt3_indexes/synthmc_test_file_list.json"))

fe = jax.jit(bundle.frontend)
fwd = jax.jit(lambda f, ids: bundle.model.apply(bundle.params, f, ids))

out = {"checkpoint_step": 19000}

# --- probe 1: audio-shift sensitivity (one segment) ---
tr = idx["tracks"][0]
audio, sr = load_audio_file(tr["audio_file"], bundle.audio_cfg.sample_rate)
ref = load_notes(tr["notes_file"])
segs, starts = slice_padded_array(audio, bundle.audio_cfg.input_frames)
labels = tm.tokenize_song(ref, (starts / sr).tolist())[1:2]
seg = jnp.asarray(segs[1:2])
lg_a = np.asarray(fwd(fe(seg), shift_right(jnp.asarray(labels))))
half = sr // 2
seg_shift = jnp.asarray(np.concatenate(
    [np.zeros((1, half), np.float32), segs[1:2][:, :-half]], axis=1))
lg_b = np.asarray(fwd(fe(seg_shift), shift_right(jnp.asarray(labels))))
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
        tot += 1
        if int(np.argmax(lg_a[0, c, l])) != int(np.argmax(lg_b[0, c, l])):
            moved += 1
out["shift_sensitivity"] = {"moved": moved, "total": tot}
print(f"shift argmaxes moved by +0.5s audio: {moved}/{tot} "
      f"({time.time()-t0:.0f}s)", flush=True)

# --- probe 2: per-event-type teacher-forced accuracy over 4 tracks ---
counts = {}
hits = {}
for tr in idx["tracks"][:4]:
    audio, sr = load_audio_file(tr["audio_file"], bundle.audio_cfg.sample_rate)
    ref = load_notes(tr["notes_file"])
    segs, starts = slice_padded_array(audio, bundle.audio_cfg.input_frames)
    labels = tm.tokenize_song(ref, (starts / sr).tolist())
    lg = np.asarray(fwd(fe(jnp.asarray(segs)),
                        shift_right(jnp.asarray(labels))))
    pred = np.argmax(lg, axis=-1)
    lab = np.asarray(labels)
    for s in range(lab.shape[0]):
        for c in range(lab.shape[1]):
            for l in range(lab.shape[2]):
                t = int(lab[s, c, l])
                if t == 0:
                    continue
                if t == 1:
                    ty = "eos"
                else:
                    try:
                        ty = codec.decode_event_id(t).type
                    except Exception:
                        continue
                counts[ty] = counts.get(ty, 0) + 1
                hits[ty] = hits.get(ty, 0) + int(pred[s, c, l] == t)
    print("track done", f"{time.time()-t0:.0f}s", flush=True)

out["teacher_forced_acc_by_type"] = {
    ty: {"acc": round(hits[ty] / counts[ty], 4), "n": counts[ty]}
    for ty in sorted(counts)}
print(json.dumps(out["teacher_forced_acc_by_type"], indent=1), flush=True)
with open("artifacts/probe_r4_cpu.json", "w") as f:
    json.dump(out, f, indent=1)
print("written artifacts/probe_r4_cpu.json", flush=True)
