# Round-3 debug trail: causal probe that diagnosed the flagship F1 0.095
# as decoder time-blindness. Loads the 30 k-step mc13_r3 checkpoint and
# measures whether a +0.5 s audio shift moves the predicted shift-token
# argmaxes (it moved 2/9 — the encoder output carried almost no absolute
# time signal). See EVIDENCE.md round-3 headline section.
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
t0=time.time()
from yourmt3_tpu.api import load_checkpoint
from yourmt3_tpu.data.audio_io import load_audio_file, slice_padded_array
from yourmt3_tpu.data.indexes import load_notes
from yourmt3_tpu.models.ymt3 import YMT3, shift_right
import jax, jax.numpy as jnp

bundle = load_checkpoint("/root/repo/runs/mc13_r3/last")
tm = bundle.task_manager
print("loaded", f"{time.time()-t0:.0f}s", flush=True)
idx = json.load(open("/root/ymt3_data/yourmt3_indexes/synthmc_test_file_list.json"))
tr = idx["tracks"][0]
audio, sr = load_audio_file(tr["audio_file"], bundle.audio_cfg.sample_rate)
ref = load_notes(tr["notes_file"])
segs, starts = slice_padded_array(audio, bundle.audio_cfg.input_frames)
fe = jax.jit(bundle.frontend)
enc = jax.jit(lambda f: bundle.model.apply(bundle.params, f, method=YMT3.encode))

seg = jnp.asarray(segs[1:2])
M1 = np.asarray(enc(fe(seg)), np.float32)  # (1, C, T, D)
print("memory", M1.shape, f"{time.time()-t0:.0f}s", flush=True)
# temporal variation: std over T vs overall magnitude
std_T = float(np.mean(np.std(M1, axis=2)))
mag = float(np.mean(np.abs(M1)))
print(f"std over T = {std_T:.4f}, mean|M| = {mag:.4f}, ratio {std_T/mag:.3f}", flush=True)
# cosine similarity between distant time positions (channel 4 = bass)
def cos(a,b): return float(np.dot(a,b)/(np.linalg.norm(a)*np.linalg.norm(b)+1e-9))
for c in (0,4,12):
    cs = [cos(M1[0,c,t], M1[0,c,t+100]) for t in (10, 60, 120)]
    print(f"ch{c} cos(t,t+100):", [f"{v:.3f}" for v in cs], flush=True)

# audio-shift sensitivity of shift-token logits:
labels = tm.tokenize_song(ref, (starts/sr).tolist())[1:2]  # (1,C,L)
fwd = jax.jit(lambda f, ids: bundle.model.apply(bundle.params, f, ids))
lg_a = np.asarray(fwd(fe(seg), shift_right(jnp.asarray(labels))))
half = sr // 2
seg_shift = jnp.asarray(np.concatenate([np.zeros((1,half),np.float32), segs[1:2][:, :-half]], axis=1))
lg_b = np.asarray(fwd(fe(seg_shift), shift_right(jnp.asarray(labels))))
codec = tm.codec
lab = labels[0]
moved = tot = 0
for c in range(lab.shape[0]):
    for l in range(lab.shape[1]):
        t = int(lab[c,l])
        if t == 0: continue
        try: ev = codec.decode_event_id(t)
        except Exception: continue
        if ev.type != "shift": continue
        pa = int(np.argmax(lg_a[0,c,l])); pb = int(np.argmax(lg_b[0,c,l]))
        tot += 1
        if pa != pb: moved += 1
print(f"shift-position argmax changed by +0.5s audio shift: {moved}/{tot}", flush=True)
# also: overall logit sensitivity
print("mean |lg_a-lg_b| =", float(np.mean(np.abs(lg_a-lg_b))), flush=True)
