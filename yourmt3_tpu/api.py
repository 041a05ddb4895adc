"""Public inference API: load_checkpoint(...) + transcribe(audio) → MIDI.

Capability parity target: reference HF-Space `model_helper.py` / `app.py`
(SURVEY.md C31, §3.3): `load_model_checkpoint(args)` and
`transcribe(model, audio_info)`: load → resample 16 kHz mono →
slice_padded_array → batch segments → greedy decode → detokenize+merge →
note_event2midi → .mid path.

TPU-first: segments are batched to a fixed batch size (padded) so one
compiled program serves every song length; frontend+encoder+decode run as
a single jitted program per batch (no per-step host sync).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config.audio import AudioConfig, DEFAULT_AUDIO
from .config.model import ModelConfig, get_model_config
from .data.audio_io import load_audio_file, slice_padded_array
from .models.decoding import greedy_decode
from .models.ymt3 import YMT3
from .ops.frontend import SpectrogramFrontend
from .tokens.dataclasses import Note
from .tokens.event2note import DecodeErrors
from .tokens.midi_io import note_event2midi
from .tokens.task_manager import TaskManager


@dataclasses.dataclass
class ModelBundle:
    """Everything needed to transcribe: model + params + frontend + task."""

    model: YMT3
    params: dict
    frontend: SpectrogramFrontend
    task_manager: TaskManager
    audio_cfg: AudioConfig

    @property
    def cfg(self) -> ModelConfig:
        return self.model.cfg

    def with_decode_overrides(self, **overrides) -> "ModelBundle":
        """Rebuild only the model object with decode-path config overrides
        (kv_quant / use_pallas_decode / weight_quant / …). These change HOW
        the decode reads its caches and weights, never the param tree, so
        the restored params are reused as-is — the single home for an
        invariant previously re-stated at four call sites. Also syncs the
        derived `qweights` collection (ops/weight_quant.py) with the
        current weight_quant mode. Mutates and returns self."""
        self.model = YMT3(self.cfg.replace(**overrides))
        mode = self.model.cfg.weight_quant
        params = dict(self.params)
        if mode != "none":
            from .ops.weight_quant import quantize_decoder_weights
            params["qweights"] = quantize_decoder_weights(params, mode)
        else:
            params.pop("qweights", None)
        self.params = params
        return self


def fast_decode_overrides(num_channels: int, max_len: int) -> dict:
    """Fastest measured decode path per shape (v5e-1, EVIDENCE.md):
    multi-channel short decodes → int8 dense KV; single-channel long
    decodes → int8 paged kernel (reads ∝ pos at half the bytes). int8
    costs ≤0.7 onset-F1 points measured; use kv_quant="none" paths for
    exact parity."""
    if num_channels > 1 or max_len < 512:
        return {"kv_quant": "int8"}
    return {"kv_quant": "int8", "use_pallas_decode": True}


def init_model(model_preset: str = "t5_small", task: str = "mt3_full_plus",
               audio_cfg: AudioConfig = DEFAULT_AUDIO, seed: int = 0,
               model_cfg: Optional[ModelConfig] = None,
               **cfg_overrides) -> ModelBundle:
    """Build a randomly-initialized bundle (training / smoke tests).

    model_cfg: a complete ModelConfig (e.g. deserialized from checkpoint
    metadata) used instead of the named preset — dim overrides applied at
    training time survive restore this way."""
    tm = TaskManager(task, audio_cfg)
    cfg = (model_cfg or get_model_config(model_preset)).replace(
        vocab_size=tm.vocab_size,
        num_channels=tm.num_decoding_channels,
        max_target_length=tm.max_token_length,
        **cfg_overrides)
    model = YMT3(cfg)
    fe = SpectrogramFrontend.from_config(audio_cfg)
    feats = jnp.zeros((1, audio_cfg.num_frames, audio_cfg.num_feature_bins))
    ids = jnp.zeros((1, cfg.num_channels, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), feats, ids)
    bundle = ModelBundle(model, params, fe, tm, audio_cfg)
    if cfg.weight_quant != "none":
        bundle.with_decode_overrides()  # attach the qweights collection
    return bundle


def load_checkpoint(path: str, model_preset: Optional[str] = None,
                    task: Optional[str] = None,
                    audio_cfg: Optional[AudioConfig] = None,
                    **cfg_overrides) -> ModelBundle:
    """Restore a bundle from an Orbax checkpoint directory written by
    yourmt3_tpu.train.checkpoint (metadata carries preset/task names and
    the FULL audio config; explicit args override the metadata).
    cfg_overrides pass inference-time ModelConfig fields through, e.g.
    use_pallas_decode=True or kv_quant="int8" decode paths."""
    from .train.checkpoint import restore_bundle
    return restore_bundle(path, model_preset=model_preset, task=task,
                          audio_cfg=audio_cfg, **cfg_overrides)


# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model",))
def _encode_batch(model: YMT3, params, frontend: SpectrogramFrontend,
                  audio: jnp.ndarray) -> jnp.ndarray:
    """The ONE canonical frontend+encode program for every decode path.

    Module-level jit: one compile per (model, shapes) — NOT per call (an
    earlier version built fresh jax.jit wrappers inside the per-batch
    loop, retracing frontend+encoder every batch; ADVICE r2).

    Every decode variant (plain / early-exit / beam) MUST consume memory
    from this same compiled program: fusing the encoder into a combined
    encode+decode program changes XLA fusion boundaries and therefore
    float rounding of the memory, and int8 KV quantization amplifies that
    epsilon into argmax flips that cascade through autoregressive decode
    (measured: plain-fused vs early-exit decodes of the SAME audio
    diverged, while the decoders on the SAME memory are token-identical)."""
    feats = frontend(audio)
    return model.apply(params, feats, method=YMT3.encode)


@functools.partial(jax.jit, static_argnames=("model",))
def _cross_kv_batch(model: YMT3, params, memory: jnp.ndarray):
    """The ONE canonical cross-KV projection program (same reasoning as
    _encode_batch: plain and early-exit decodes must consume bit-identical
    cross K/V, so the projection cannot be re-fused into either decode
    program)."""
    return model.apply(params, memory, method=YMT3.init_cross_kv)


@functools.partial(jax.jit,
                   static_argnames=("model", "max_length", "phases",
                                    "repetition_guard"))
def _decode_batch(model: YMT3, params, memory: jnp.ndarray, cross_kvs,
                  max_length: int, prefix_ids: Optional[jnp.ndarray],
                  phases: int = 1, repetition_guard: int = 0) -> jnp.ndarray:
    return greedy_decode(model, params, memory, max_length, prefix_ids,
                         phases=phases, cross_kvs=cross_kvs,
                         repetition_guard=repetition_guard)


@functools.partial(jax.jit,
                   static_argnames=("model", "max_length", "beam_size"))
def _decode_batch_beam(model: YMT3, params, memory: jnp.ndarray,
                       max_length: int, prefix_ids: Optional[jnp.ndarray],
                       beam_size: int) -> jnp.ndarray:
    from .models.decoding import beam_decode
    return beam_decode(model, params, memory, max_length,
                       beam_size=beam_size, prefix_ids=prefix_ids)


def transcribe_segments_array(
    bundle: ModelBundle, segments: np.ndarray, start_times: Sequence[float],
    batch_size: int = 8, subtask: Optional[str] = None,
    early_exit: bool = False, decode_phases: int = 1, beam_size: int = 1,
    repetition_guard: int = 0, repair_beam: int = 0,
) -> Tuple[List[Note], DecodeErrors]:
    """Pre-sliced (S, input_frames) segments + their start times → merged
    notes. The segments-level entry point: callers with their own slicing
    (eval datasets, overlapping-window experiments) use this directly
    instead of flattening back to a 1-D song (which silently assumed
    contiguous non-overlapping slices). beam_size>1 decodes each segment
    with batched beam search (models/decoding.beam_decode) instead of
    greedy; mutually exclusive with early_exit.

    repair_beam>1 runs validate-and-repair decode: after the fast greedy
    pass, the detokenizer's merge walk attributes errors to (channel,
    segment) (tokens/event2note.per_segment_error_counts), and ONLY the
    implicated segments are re-decoded with beam search of that width —
    greedy locally commits to spurious note-ons that a 2-hypothesis
    lookahead rejects (measured: beam2 halves flagship decode errors,
    EVIDENCE r4 §6b), but running beam everywhere costs ~2× decode time;
    repairing the flagged tail keeps the greedy fast path for the ~95% of
    segments that decode cleanly. The repaired ids are kept only if they
    strictly reduce total detok errors. Token-identical to plain greedy on
    every segment the detokenizer accepts."""
    if beam_size > 1 and early_exit:
        raise ValueError("beam_size>1 and early_exit are mutually exclusive")
    if repetition_guard > 0 and (beam_size > 1 or early_exit):
        # the guard is only threaded through the plain greedy loop; fail
        # loudly rather than silently ignoring the flag (ADVICE r4)
        raise ValueError(
            "repetition_guard>0 is only supported on the plain greedy path "
            "(not beam_size>1 or early_exit) — drop one of the flags")
    ac = bundle.audio_cfg
    S = segments.shape[0]
    tm = bundle.task_manager
    prefix = tm.subtask_prefix_ids(subtask)
    prefix_arr = jnp.asarray(prefix, jnp.int32) if prefix else None
    L = tm.max_token_length

    all_ids = []
    for i in range(0, S, batch_size):
        chunk = segments[i: i + batch_size]
        pad_n = batch_size - chunk.shape[0]
        if pad_n:  # fixed batch shape ⇒ one compiled program
            chunk = np.concatenate(
                [chunk, np.zeros((pad_n, ac.input_frames), np.float32)])
        memory = _encode_batch(bundle.model, bundle.params,
                               bundle.frontend, jnp.asarray(chunk))
        if beam_size > 1:
            ids = _decode_batch_beam(bundle.model, bundle.params, memory,
                                     L, prefix_arr, beam_size)
        else:
            cross_kvs = _cross_kv_batch(bundle.model, bundle.params, memory)
            if early_exit:
                from .models.decoding import greedy_decode_early_exit
                ids = greedy_decode_early_exit(bundle.model, bundle.params,
                                               memory, L,
                                               prefix_ids=prefix_arr,
                                               cross_kvs=cross_kvs)
            else:
                ids = _decode_batch(bundle.model, bundle.params, memory,
                                    cross_kvs, L, prefix_arr,
                                    phases=decode_phases,
                                    repetition_guard=repetition_guard)
        all_ids.append(np.asarray(ids)[: batch_size - pad_n if pad_n else batch_size])
    seg_ids = np.concatenate(all_ids, axis=0)  # (S, C, L)
    notes, errors = tm.detokenize_song(seg_ids, list(start_times))
    if repair_beam > 1 and beam_size == 1 and errors.total() > 0:
        repaired = _repair_error_segments(
            bundle, segments, seg_ids, list(start_times), prefix_arr, L,
            batch_size, repair_beam)
        if repaired is not None:
            notes2, errors2 = tm.detokenize_song(repaired, list(start_times))
            if errors2.total() < errors.total():
                notes, errors = notes2, errors2
    return notes, errors


def _repair_error_segments(
    bundle: ModelBundle, segments: np.ndarray, seg_ids: np.ndarray,
    start_times: List[float], prefix_arr, L: int, batch_size: int,
    beam: int) -> Optional[np.ndarray]:
    """Beam-re-decode only the segments the detok merge walk flags.

    A `tie_without_active_note` at segment s usually means segment s-1's
    stream LOST the onset (degenerate greedy collapse), so tie errors
    implicate the merge-order predecessor as well as s itself."""
    from .tokens.event2note import per_segment_error_counts
    S, C = seg_ids.shape[0], seg_ids.shape[1]
    chan_ids = [[seg_ids[s, c] for s in range(S)] for c in range(C)]
    totals, ties = per_segment_error_counts(
        chan_ids, start_times, bundle.task_manager.codec,
        default_programs=bundle.task_manager.channel_default_programs)
    suspects = set(np.nonzero(totals.sum(axis=0))[0].tolist())
    order = sorted(range(S), key=lambda s: start_times[s])
    pos_in_order = {s: i for i, s in enumerate(order)}
    for s in np.nonzero(ties.sum(axis=0))[0].tolist():
        i = pos_in_order[s]
        if i > 0:
            suspects.add(order[i - 1])
    if not suspects:
        return None
    idx = sorted(suspects)
    ac = bundle.audio_cfg
    rows = []
    for i in range(0, len(idx), batch_size):
        block = idx[i: i + batch_size]
        chunk = segments[block]
        pad_n = batch_size - chunk.shape[0]
        if pad_n:
            chunk = np.concatenate(
                [chunk, np.zeros((pad_n, ac.input_frames), np.float32)])
        memory = _encode_batch(bundle.model, bundle.params,
                               bundle.frontend, jnp.asarray(chunk))
        ids = _decode_batch_beam(bundle.model, bundle.params, memory,
                                 L, prefix_arr, beam)
        rows.append(np.asarray(ids)[: len(block)])
    repaired = seg_ids.copy()
    repaired[idx] = np.concatenate(rows, axis=0)
    return repaired


def transcribe_audio_array(
    bundle: ModelBundle, audio: np.ndarray, sample_rate: Optional[int] = None,
    batch_size: int = 8, subtask: Optional[str] = None,
    early_exit: bool = False, decode_phases: int = 1, beam_size: int = 1,
    repetition_guard: int = 0, repair_beam: int = 0,
) -> Tuple[List[Note], DecodeErrors]:
    """Full-song mono float32 audio → merged notes.
    repetition_guard>0 force-EOSes any stream emitting the same token that
    many times consecutively (degenerate-decode cutoff; no valid MT3 stream
    repeats a token — see models/decoding.greedy_decode).

    early_exit=True decodes each batch with per-stream retirement
    (models/decoding.greedy_decode_early_exit) — identical tokens;
    measured 1.42× faster when decode lengths are long AND variable
    (mixed sparse/dense segments) and slower on uniformly-short
    realistic decodes, so it stays opt-in. decode_phases>1 chunks the
    dense decode into growing static read horizons (token-identical, less
    HBM traffic; see models/decoding.greedy_decode). beam_size>1 switches
    to batched beam search."""
    ac = bundle.audio_cfg
    if sample_rate is not None and sample_rate != ac.sample_rate:
        from .data.audio_io import resample
        audio = resample(audio, sample_rate, ac.sample_rate)
    segments, starts = slice_padded_array(audio, ac.input_frames)
    return transcribe_segments_array(
        bundle, segments, (starts / ac.sample_rate).tolist(),
        batch_size=batch_size, subtask=subtask, early_exit=early_exit,
        decode_phases=decode_phases, beam_size=beam_size,
        repetition_guard=repetition_guard, repair_beam=repair_beam)


def transcribe(bundle: ModelBundle, audio_path: str,
               output_path: Optional[str] = None, batch_size: int = 8,
               subtask: Optional[str] = None, beam_size: int = 1,
               repetition_guard: int = 0, repair_beam: int = 2) -> str:
    """Audio file → MIDI file path (the reference's public API, C31).

    repair_beam=2 (default): segments the detokenizer rejects are
    re-decoded with beam-2 and kept only if total errors drop — clean MIDI
    out by default (the reference demo's contract) at greedy-path speed;
    pass repair_beam=0 for the raw greedy stream."""
    audio, sr = load_audio_file(audio_path, bundle.audio_cfg.sample_rate)
    notes, errors = transcribe_audio_array(bundle, audio, sr, batch_size,
                                           subtask, beam_size=beam_size,
                                           repetition_guard=repetition_guard,
                                           repair_beam=repair_beam)
    if output_path is None:
        output_path = os.path.splitext(audio_path)[0] + ".mid"
    note_event2midi(notes, output_path)
    return output_path
