"""Root-cause probe for the flagship's EARLY offset skew (VERDICT item 8).

mc13_r6 eval reads offset_diagnostic mean −98 ms vs median −22 ms with
p_early 0.33 — a heavy left tail. Hypothesis from the round-4 session:
tie-carry failures at 2.048 s segment boundaries — when the model fails
to re-declare a held note in the next segment's tie section, the merge
closes it AT the boundary, producing an early offset of up to one full
segment.

This probe decodes N test tracks greedily on CPU and measures:
  1. DecodeErrors per-field breakdown (what the 406 actually are);
  2. for onset-matched pairs with offset error < −50 ms, the distance of
     the PREDICTED offset to the nearest segment boundary — boundary
     clustering confirms the tie hypothesis;
  3. per boundary: ref notes crossing it vs tie declarations the model
     emitted in the next segment (count of pitch events before the
     tie-section end marker).

Usage: JAX_PLATFORMS=cpu python scripts/diag_offset_boundary.py [ckpt] [n_tracks]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

ckpt = sys.argv[1] if len(sys.argv) > 1 else "runs/mc13_r6/last"
n_tracks = int(sys.argv[2]) if len(sys.argv) > 2 else 4

# This host exports JAX_PLATFORMS=axon and the plugin wins over a plain
# env override (see tests/conftest.py) — force CPU post-import so the
# diagnostic never contends with a TPU training run.
import os  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from yourmt3_tpu.api import (_cross_kv_batch, _decode_batch,  # noqa: E402
                             _encode_batch, load_checkpoint)
from yourmt3_tpu.data.dataset_eval import AudioFileDataset  # noqa: E402
from yourmt3_tpu.tokens.event2note import DecodeErrors  # noqa: E402

import jax.numpy as jnp  # noqa: E402

bundle = load_checkpoint(ckpt)
tm = bundle.task_manager
ac = bundle.audio_cfg
codec = tm.codec
SEG_S = ac.input_frames / ac.sample_rate
L = tm.max_token_length
ds = AudioFileDataset("/root/ymt3_data/yourmt3_indexes/"
                      "synthmc_test_file_list.json", ac,
                      max_tracks=n_tracks)

total_err = DecodeErrors()
early_rows = []   # (err_s, dist_est_offset_to_boundary)
tie_rows = []     # (boundary_t, n_ref_crossing, n_ties_declared)
all_pairs = 0

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
        ids = _decode_batch(bundle.model, bundle.params, mem, ck, L, None,
                            phases=1, repetition_guard=0)
        ids_all.append(np.asarray(ids)[: B - pad if pad else B])
    seg_ids = np.concatenate(ids_all, axis=0)  # (S, C, L)

    est, err = tm.detokenize_song(seg_ids, list(start_times))
    total_err.add(err)
    ref = tm.remap_notes(ref)

    # ---- matched-pair early-offset boundary distances ------------------
    ref_p = [n for n in ref if not n.is_drum]
    est_p = [n for n in est if not n.is_drum]
    used = set()
    by_pitch = {}
    for j, e in enumerate(est_p):
        by_pitch.setdefault(e.pitch, []).append((j, e))
    for r in ref_p:
        cands = [(abs(r.onset - e.onset), j, e)
                 for j, e in by_pitch.get(r.pitch, ())
                 if j not in used and abs(r.onset - e.onset) <= 0.05]
        if not cands:
            continue
        _, j, e = min(cands, key=lambda c: c[0])
        used.add(j)
        all_pairs += 1
        d = e.offset - r.offset
        if d < -0.05:
            k = round(e.offset / SEG_S)
            early_rows.append((d, abs(e.offset - k * SEG_S)))

    # ---- tie declarations vs ref notes crossing each boundary ----------
    for s in range(1, S):
        t = float(start_times[s])
        n_cross = sum(1 for n in ref_p if n.onset < t - 1e-6
                      and n.offset > t + 1e-6)
        n_tie = 0
        for c in range(seg_ids.shape[1]):
            for tok in seg_ids[s, c]:
                tok = int(tok)
                try:
                    ev = codec.decode_event_id(tok)
                except Exception:
                    break
                if ev.type == "tie":
                    break
                if ev.type == "pitch":
                    n_tie += 1
                elif ev.type not in ("program", "pad"):
                    break  # malformed tie section; stop counting
        tie_rows.append((t, n_cross, n_tie))
    print(f"{track_id}: est={len(est)} ref={len(ref)} "
          f"err={err.total()}", flush=True)

import dataclasses  # noqa: E402

err_breakdown = {f.name: getattr(total_err, f.name)
                 for f in dataclasses.fields(total_err)}
early = np.array([r[0] for r in early_rows])
dist = np.array([r[1] for r in early_rows])
n_cross_tot = sum(r[1] for r in tie_rows)
n_tie_tot = sum(r[2] for r in tie_rows)
res = {
    "tracks": n_tracks,
    "decode_error_breakdown": err_breakdown,
    "n_matched_pairs": all_pairs,
    "n_early_pairs": int(len(early_rows)),
    "early_err_mean_s": float(early.mean()) if len(early) else None,
    # boundary clustering: early offsets whose predicted offset sits
    # within 30 ms of a k*2.048 s boundary
    "frac_early_at_boundary_30ms": (
        float((dist < 0.03).mean()) if len(dist) else None),
    "frac_early_at_boundary_100ms": (
        float((dist < 0.10).mean()) if len(dist) else None),
    "ref_notes_crossing_boundaries": n_cross_tot,
    "tie_decls_emitted": n_tie_tot,
    "tie_recall_proxy": (n_tie_tot / n_cross_tot) if n_cross_tot else None,
}
print("OFFSET BOUNDARY DIAG", json.dumps(res, indent=1), flush=True)
import os  # noqa: E402

os.makedirs("artifacts/mc13_r6", exist_ok=True)
json.dump(res, open("artifacts/mc13_r6/offset_boundary_diag.json", "w"),
          indent=1)
