# Round-3 debug trail: the A/B that validated the flagship time-blindness
# fix BEFORE committing to a 5 h retrain. Two 2 k-step tiny-flagship runs
# differing only in encoder_abs_pos; metric = teacher-forced shift-token
# accuracy + audio-shift sensitivity of shift logits.
# Measured (2026-08-17, v5e-1): none -> shift-acc 0.000, 0/9 argmaxes moved
# by +0.5 s audio shift; sinusoidal -> 0.014 and 5/9 (trained t5_mini
# reference: 10/10). Full numbers in EVIDENCE.md.
"""A/B: does sinusoidal abs-pos on the PTF temporal axis unlock shift
learning? Tiny flagship, short training, metric = TF shift-token acc."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

variant = sys.argv[1]  # "none" | "sinusoidal"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

from yourmt3_tpu.api import init_model
from yourmt3_tpu.config.data_presets import get_data_preset
from yourmt3_tpu.data.dataset_train import TrainDataset
from yourmt3_tpu.train.trainer import train
from yourmt3_tpu.models.ymt3 import YMT3, shift_right
from yourmt3_tpu.data.audio_io import load_audio_file, slice_padded_array
from yourmt3_tpu.data.indexes import load_notes
import jax, jax.numpy as jnp

bundle = init_model(
    "perceiver_tf_mc13", "mc13_full_plus_256", seed=0,
    d_model=256, d_kv=32, num_heads=8, d_ff=512,
    num_encoder_layers=2, num_decoder_layers=4,
    ptf_num_latents=26, ptf_d_latent=64, ptf_num_blocks=2,
    encoder_abs_pos=variant)
preset = get_data_preset("synth_mc")
ds = TrainDataset(preset.index_files("train"), bundle.task_manager,
                  bundle.audio_cfg, weights=preset.weights(), seed=0)
t0 = time.time()
bundle = train(bundle, ds.batches(8, num_workers=1), total_steps=steps,
               log_every=200, ckpt_every=10**9,
               ckpt_dir=f"/tmp/ab_{variant}", base_lr=3e-4,
               warmup_steps=300)
print(f"trained {steps} in {time.time()-t0:.0f}s", flush=True)
import jax.numpy as _jnp
bundle.params = jax.tree_util.tree_map(_jnp.asarray, bundle.params)

# TF shift acc on 2 test tracks
tm = bundle.task_manager
codec = tm.codec
fe = jax.jit(bundle.frontend)
fwd = jax.jit(lambda f, ids: bundle.model.apply(bundle.params, f, ids))
idx = json.load(open("/root/ymt3_data/yourmt3_indexes/synthmc_test_file_list.json"))
hits = {}; tot = {}
for tr in idx["tracks"][:2]:
    audio, sr = load_audio_file(tr["audio_file"], bundle.audio_cfg.sample_rate)
    ref = load_notes(tr["notes_file"])
    segs, starts = slice_padded_array(audio, bundle.audio_cfg.input_frames)
    labels = tm.tokenize_song(ref, (starts/sr).tolist())
    pred = np.asarray(jnp.argmax(fwd(fe(jnp.asarray(segs)),
                                     shift_right(jnp.asarray(labels))), -1))
    lab = np.asarray(labels)
    it = np.nditer(lab, flags=["multi_index"])
    for t in it:
        t = int(t)
        if t == 0: continue
        try: ty = codec.decode_event_id(t).type
        except Exception: continue
        tot[ty] = tot.get(ty, 0) + 1
        if pred[it.multi_index] == t: hits[ty] = hits.get(ty, 0) + 1
out = {ty: round(hits.get(ty, 0)/tot[ty], 3) for ty in sorted(tot)}
print(f"AB[{variant}] steps={steps} TF-acc:", json.dumps(out), flush=True)
