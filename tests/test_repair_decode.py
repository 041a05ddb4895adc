"""Validate-and-repair decode (api._repair_error_segments + the
repair_beam seam in transcribe_segments_array).

Round-4 finding (EVIDENCE §6b): greedy locally commits to spurious
note-ons / loses onsets in degenerate segments; beam-2 halves flagship
decode errors but costs ~2× decode everywhere. The repair pass re-decodes
ONLY the segments the detokenizer's merge walk flags, implicating the
merge-order predecessor for tie_without_active_note (a tie error at s
usually means s-1 lost the onset).
"""

import numpy as np
import pytest

import yourmt3_tpu.api as api
from yourmt3_tpu.api import init_model, transcribe_segments_array
from yourmt3_tpu.tokens.dataclasses import Note
from yourmt3_tpu.tokens.event2note import per_segment_error_counts


@pytest.fixture(scope="module")
def bundle():
    return init_model("t5_tiny", task="mt3_full_plus",
                      num_encoder_layers=1, num_decoder_layers=1)


def _song_fixture(bundle):
    """A note spanning the segment 0→1 boundary; clean and corrupt ids.

    Corrupt = segment 0 replaced with an EMPTY stream, so segment 1's tie
    declaration references a note that was never opened →
    tie_without_active_note charged to segment 1.
    """
    tm = bundle.task_manager
    seg_s = bundle.audio_cfg.segment_seconds
    notes = [Note(False, 0, 0.5, seg_s + 1.0, 60, 100)]
    starts = [0.0, seg_s]
    clean = tm.tokenize_song(notes, starts)  # (S, C, L)
    corrupt = clean.copy()
    corrupt[0] = tm.tokenize_segment([], 0.0)
    return notes, starts, clean, corrupt


def test_per_segment_error_attribution(bundle):
    tm = bundle.task_manager
    _, starts, clean, corrupt = _song_fixture(bundle)
    S, C = clean.shape[0], clean.shape[1]
    chan = lambda ids: [[ids[s, c] for s in range(S)] for c in range(C)]
    tot, tie = per_segment_error_counts(chan(clean), starts, tm.codec)
    assert tot.sum() == 0 and tie.sum() == 0
    tot, tie = per_segment_error_counts(chan(corrupt), starts, tm.codec)
    # the tie error surfaces at segment 1 (where the orphan tie is read)
    assert tie.sum(axis=0)[1] >= 1
    assert tot.sum(axis=0)[0] == 0  # the empty segment itself is valid


def _patch_fake_model(monkeypatch, bundle, greedy_ids, beam_ids):
    """Bypass the real model: 'memory' is the raw audio chunk; greedy/beam
    decodes look up pre-built ids by the segment index smuggled in
    sample 0 of each segment's audio."""
    def fake_encode(model, params, frontend, audio):
        return np.asarray(audio)

    def fake_cross_kv(model, params, memory):
        return None

    def by_index(memory, table):
        idx = np.asarray(memory)[:, 0].astype(int)
        return np.stack([table[i] for i in idx], axis=0)

    monkeypatch.setattr(api, "_encode_batch", fake_encode)
    monkeypatch.setattr(api, "_cross_kv_batch", fake_cross_kv)
    monkeypatch.setattr(
        api, "_decode_batch",
        lambda model, params, memory, cross_kvs, L, prefix, phases=1,
        repetition_guard=0: by_index(memory, greedy_ids))
    monkeypatch.setattr(
        api, "_decode_batch_beam",
        lambda model, params, memory, L, prefix, beam: by_index(
            memory, beam_ids))


def test_repair_fixes_flagged_segments_only(bundle, monkeypatch):
    tm = bundle.task_manager
    notes, starts, clean, corrupt = _song_fixture(bundle)
    S = clean.shape[0]
    segments = np.zeros((S, bundle.audio_cfg.input_frames), np.float32)
    segments[:, 0] = np.arange(S)  # index channel for the fake decoders
    _patch_fake_model(monkeypatch, bundle, corrupt, clean)

    # repair off: the corrupt greedy stream's tie error survives
    got_off, err_off = transcribe_segments_array(
        bundle, segments, starts, batch_size=2, repair_beam=0)
    assert err_off.tie_without_active_note >= 1

    # repair on: beam re-decode of the implicated segments (1 and its
    # predecessor 0) restores the clean stream → zero errors, true notes
    got_on, err_on = transcribe_segments_array(
        bundle, segments, starts, batch_size=2, repair_beam=2)
    assert err_on.total() == 0
    ref_notes, ref_err = tm.detokenize_song(clean, starts)
    assert ref_err.total() == 0
    assert [(n.pitch, round(n.onset, 3), round(n.offset, 3))
            for n in got_on] == [
        (n.pitch, round(n.onset, 3), round(n.offset, 3)) for n in ref_notes]


def test_repair_keeps_original_when_beam_is_worse(bundle, monkeypatch):
    """The repaired ids are kept only if total errors strictly drop."""
    _, starts, clean, corrupt = _song_fixture(bundle)
    S = clean.shape[0]
    segments = np.zeros((S, bundle.audio_cfg.input_frames), np.float32)
    segments[:, 0] = np.arange(S)
    # beam decode returns the SAME corrupt streams → no improvement
    _patch_fake_model(monkeypatch, bundle, corrupt, corrupt)
    got, err = transcribe_segments_array(
        bundle, segments, starts, batch_size=2, repair_beam=2)
    ref, ref_err = bundle.task_manager.detokenize_song(corrupt, starts)
    assert err.total() == ref_err.total()
    assert len(got) == len(ref)


def test_repair_noop_on_clean_streams(bundle, monkeypatch):
    """Zero detok errors → the beam decoder must never be invoked."""
    _, starts, clean, _ = _song_fixture(bundle)
    S = clean.shape[0]
    segments = np.zeros((S, bundle.audio_cfg.input_frames), np.float32)
    segments[:, 0] = np.arange(S)
    calls = []

    def exploding_beam(*a, **k):
        calls.append(1)
        raise AssertionError("beam decode must not run on clean streams")

    _patch_fake_model(monkeypatch, bundle, clean, clean)
    monkeypatch.setattr(api, "_decode_batch_beam", exploding_beam)
    _, err = transcribe_segments_array(
        bundle, segments, starts, batch_size=2, repair_beam=2)
    assert err.total() == 0 and not calls


def test_guard_and_beam_flags_conflict(bundle):
    segments = np.zeros((1, bundle.audio_cfg.input_frames), np.float32)
    with pytest.raises(ValueError, match="repetition_guard"):
        transcribe_segments_array(bundle, segments, [0.0],
                                  repetition_guard=8, beam_size=2)
    with pytest.raises(ValueError, match="repetition_guard"):
        transcribe_segments_array(bundle, segments, [0.0],
                                  repetition_guard=8, early_exit=True)


def test_model_config_validates_per_block_abs_pos():
    from yourmt3_tpu.config.model import ModelConfig
    with pytest.raises(ValueError, match="sinusoidal_per_block"):
        ModelConfig(encoder_type="t5",
                    encoder_abs_pos="sinusoidal_per_block")
    with pytest.raises(ValueError, match="sinusoidal_per_block"):
        ModelConfig(encoder_type="perceiver-tf",
                    encoder_abs_pos="sinusoidal_per_block")
    ModelConfig(encoder_type="conformer",
                encoder_abs_pos="sinusoidal_per_block")  # valid


def test_offset_error_stats_carries_raw_errors():
    from yourmt3_tpu.eval.metrics import offset_error_stats
    ref = [Note(False, 0, 0.0, 1.0, 60, 100), Note(False, 0, 2.0, 3.0, 62, 100)]
    est = [Note(False, 0, 0.01, 1.2, 60, 100), Note(False, 0, 2.01, 2.5, 62, 100)]
    s = offset_error_stats(ref, est)
    assert s["n_pairs"] == 2.0
    raw = np.asarray(s["raw_errors_s"])
    assert np.allclose(sorted(raw), [-0.5, 0.2])
    # pooled stats computed from raw match the in-dict aggregates
    assert np.isclose(np.median(raw), s["median_signed_s"])
    assert np.isclose(raw.std(), s["std_s"])


def test_channel_default_program_keeps_degenerate_streams_in_class():
    """A multi-channel stream that DROPPED its program token must default
    to its channel's canonical program, not GM 0 (piano spill — VERDICT
    r4: flagship piano precision 0.102 from exactly this)."""
    from yourmt3_tpu.tokens.dataclasses import Event
    from yourmt3_tpu.tokens.task_manager import TaskManager

    tm = TaskManager("mc13_full_plus_256")
    C = tm.num_decoding_channels
    defaults = tm.channel_default_programs
    assert len(defaults) == C and defaults[0] == 0  # piano channel
    # guitar class canonical program is 24, strings 40 (GM_INSTR_CLASS_MC12)
    assert 24 in defaults and 40 in defaults
    guitar_ch = defaults.index(24)

    codec = tm.codec
    enc = lambda t, v: codec.encode_event(Event(t, v))
    # stream WITHOUT a program token: tie-end, shift, velocity-on, pitch
    from yourmt3_tpu.tokens.codec import EOS_ID
    stream = [enc("tie", 0), enc("shift", 10), enc("velocity", 1),
              enc("pitch", 60), enc("shift", 50), enc("velocity", 0),
              enc("pitch", 60), EOS_ID]
    L = tm.max_token_length
    ids = np.zeros((1, C, L), np.int64)
    ids[0, guitar_ch, : len(stream)] = stream

    for fast in (True, False):
        notes, err = tm.detokenize_song(ids, [0.0], fast=fast)
        assert len(notes) == 1, (fast, notes)
        assert notes[0].program == 24, (fast, notes[0])
        assert err.total() == 0
