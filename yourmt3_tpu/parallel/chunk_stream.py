"""Chunk-parallel full-song streaming over a device mesh.

SURVEY.md §5.7: the reference handles long audio by segment chunking on
one GPU; the TPU-idiomatic analogue is sharding the SEGMENT axis of a
song across the mesh's `data` axis — all chunks of a song (or several
songs) decode concurrently, one jitted program, XLA collectives over ICI.
BASELINE config 5 ("v5e-8 data-parallel batch eval sweep") runs on this.

The host-side tie-merge (tokens/event2note.py) is sequential over
segments but trivial (< 1 ms/song) compared to decode.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..api import ModelBundle
from ..models.decoding import greedy_decode
from ..models.ymt3 import YMT3
from ..data.audio_io import slice_padded_array
from ..tokens.dataclasses import Note
from ..tokens.event2note import DecodeErrors
from .mesh import batch_sharding, make_mesh, replicate


def transcribe_song_chunk_parallel(
    bundle: ModelBundle,
    audio: np.ndarray,  # full song, mono float32 @ bundle sample rate
    mesh=None,
    subtask: Optional[str] = None,
    segments_per_device: int = 8,
    max_length: Optional[int] = None,
) -> Tuple[List[Note], DecodeErrors]:
    """Shard a song's segments over the mesh `data` axis and decode them
    all in one program. → (merged notes, decode errors).

    max_length caps the decode length (default: the task's full token
    budget); the multichip dryrun uses a small cap to keep the virtual-mesh
    compile cheap."""
    mesh = mesh or make_mesh()
    ac = bundle.audio_cfg
    tm = bundle.task_manager
    n_data = mesh.shape["data"]

    segments, starts = slice_padded_array(audio, ac.input_frames)
    S = segments.shape[0]
    # pad segment count to a full device tile so the compiled shape is
    # reused across songs of any length
    tile = n_data * segments_per_device
    S_pad = -(-S // tile) * tile
    if S_pad != S:
        segments = np.concatenate(
            [segments, np.zeros((S_pad - S, ac.input_frames), np.float32)])

    prefix = tm.subtask_prefix_ids(subtask)
    prefix_arr = jnp.asarray(prefix, jnp.int32) if prefix else None
    L = tm.max_token_length if max_length is None else min(
        max_length, tm.max_token_length)

    @jax.jit
    def run(audio_batch):
        feats = bundle.frontend(audio_batch)
        memory = bundle.model.apply(bundle.params, feats, method=YMT3.encode)
        return greedy_decode(bundle.model, bundle.params, memory, L,
                             prefix_arr)

    with mesh:
        params_r = replicate(mesh, bundle.params)
        bundle_params, bundle.params = bundle.params, params_r
        try:
            out_ids = []
            for i in range(0, S_pad, tile):
                chunk = jax.device_put(jnp.asarray(segments[i:i + tile]),
                                       batch_sharding(mesh))
                out_ids.append(np.asarray(run(chunk)))
        finally:
            bundle.params = bundle_params
    ids = np.concatenate(out_ids, axis=0)[:S]  # (S, C, L)
    return tm.detokenize_song(ids, (starts / ac.sample_rate).tolist())
