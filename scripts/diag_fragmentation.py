"""Fragmentation probe: is the flagship's precision collapse + early-offset
skew one defect — long ref notes split into [matched-early fragment] +
[spurious re-onset fragments]?

Evidence so far (artifacts/mc13_r6/offset_boundary_diag.json): early
offsets average −0.44 s but only ~20% sit at segment boundaries, so the
tie/boundary story is secondary; meanwhile piano emits 4.8× the ref note
count. If one ref note maps to a CHAIN of same-pitch est notes separated
by small gaps, both defects are fragmentation.

Decodes N test tracks (CPU), caches est/ref notes to a pickle (so later
analyses don't re-decode), then reports:
  - chain stats: est notes whose same-pitch predecessor ended < gap_s
    before their onset (per class);
  - eval F1 as-is vs after merging chains (diagnostic upper bound for a
    fragmentation fix — NOT a product default; reference semantics do no
    gap merging).

Usage: python scripts/diag_fragmentation.py [ckpt] [n_tracks]
"""
import json
import pickle
import sys

sys.path.insert(0, "/root/repo")

ckpt = sys.argv[1] if len(sys.argv) > 1 else "runs/mc13_r6/last"
n_tracks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
GAP_S = 0.1

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

CACHE = f"artifacts/mc13_r6/diag_notes_{n_tracks}.pkl"

if os.path.exists(CACHE):
    tracks = pickle.load(open(CACHE, "rb"))
else:
    import jax.numpy as jnp
    from yourmt3_tpu.api import (_cross_kv_batch, _decode_batch,
                                 _encode_batch, load_checkpoint)
    from yourmt3_tpu.data.dataset_eval import AudioFileDataset

    bundle = load_checkpoint(ckpt)
    tm = bundle.task_manager
    ac = bundle.audio_cfg
    L = tm.max_token_length
    ds = AudioFileDataset("/root/ymt3_data/yourmt3_indexes/"
                          "synthmc_test_file_list.json", ac,
                          max_tracks=n_tracks)
    tracks = []
    for track_id, segments, start_times, ref in ds:
        S = segments.shape[0]
        ids_all = []
        B = 8
        for i in range(0, S, B):
            chunk = segments[i: i + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, ac.input_frames), np.float32)])
            mem = _encode_batch(bundle.model, bundle.params, bundle.frontend,
                                jnp.asarray(chunk))
            ck = _cross_kv_batch(bundle.model, bundle.params, mem)
            ids = _decode_batch(bundle.model, bundle.params, mem, ck, L,
                                None, phases=1, repetition_guard=0)
            ids_all.append(np.asarray(ids)[: B - pad if pad else B])
        seg_ids = np.concatenate(ids_all, axis=0)
        est, err = tm.detokenize_song(seg_ids, list(start_times))
        tracks.append({"track_id": track_id,
                       "est": est, "ref": tm.remap_notes(ref),
                       "err": err})
        print(f"{track_id}: est={len(est)} ref={len(ref)}", flush=True)
    pickle.dump(tracks, open(CACHE, "wb"))

# ---- analysis ---------------------------------------------------------------
from yourmt3_tpu.eval.metrics import AMTMetrics  # noqa: E402
from yourmt3_tpu.tokens.dataclasses import Note  # noqa: E402


def merge_chains(notes, gap_s=GAP_S):
    """Merge same-(pitch,program,is_drum) notes separated by < gap_s."""
    out = []
    by_key = {}
    for n in sorted(notes, key=lambda n: n.onset):
        k = (n.pitch, n.program, n.is_drum)
        by_key.setdefault(k, []).append(n)
    n_merged = 0
    for k, chain in by_key.items():
        cur = chain[0]
        for n in chain[1:]:
            if not k[2] and n.onset - cur.offset < gap_s:
                cur = Note(is_drum=cur.is_drum, program=cur.program,
                           onset=cur.onset,
                           offset=max(cur.offset, n.offset),
                           pitch=cur.pitch, velocity=cur.velocity)
                n_merged += 1
            else:
                out.append(cur)
                cur = n
        out.append(cur)
    return out, n_merged


m_plain = AMTMetrics()
m_merged = AMTMetrics()
chain_frac = []
tot_est = tot_merged = 0
for t in tracks:
    est, ref = t["est"], t["ref"]
    merged, n_m = merge_chains(est)
    tot_est += len(est)
    tot_merged += n_m
    chain_frac.append(n_m / max(len(est), 1))
    m_plain.update(ref, est)
    m_merged.update(ref, merged)

plain = m_plain.compute()
merged = m_merged.compute()
res = {
    "tracks": len(tracks), "gap_s": GAP_S,
    "est_notes": tot_est, "fragment_joins": tot_merged,
    "fragment_frac": tot_merged / max(tot_est, 1),
    "plain": {k: plain[k] for k in
              ("onset_f1", "offset_f1", "onset_precision", "onset_recall")
              if k in plain},
    "chain_merged": {k: merged[k] for k in
                     ("onset_f1", "offset_f1", "onset_precision",
                      "onset_recall") if k in merged},
}
print("FRAGMENTATION DIAG", json.dumps(res, indent=1), flush=True)
json.dump(res, open("artifacts/mc13_r6/fragmentation_diag.json", "w"),
          indent=1)
