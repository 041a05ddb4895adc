"""Round-trip property tests for the token domain (SURVEY.md §4.1).

notes → events → ids → events → notes must be lossless modulo 10 ms
quantization, including tie-note carry across segment boundaries.
"""

import numpy as np
import pytest

from yourmt3_tpu.tokens import (EventCodec, Note, TaskManager,
                                NoteEventTokenizer, ids_to_events,
                                merge_segment_token_ids_to_notes,
                                note_event2event, slice_notes_to_segment)
from yourmt3_tpu.tokens.dataclasses import Event
from yourmt3_tpu.config.audio import DEFAULT_AUDIO

SEG = DEFAULT_AUDIO.segment_seconds  # ≈2.048 s
QUANT = 0.011  # one 10 ms tick + fp slop


def random_notes(rng, n=40, t_max=10.0, programs=(0, 24, 40), with_drums=True):
    notes = []
    for _ in range(n):
        onset = float(rng.uniform(0, t_max))
        dur = float(rng.uniform(0.05, 3.0))
        if with_drums and rng.random() < 0.25:
            notes.append(Note(True, 128, onset, onset + 0.01,
                              int(rng.choice([36, 38, 42])), 100))
        else:
            notes.append(Note(False, int(rng.choice(programs)), onset,
                              min(onset + dur, t_max + 2), int(rng.integers(40, 90)), 100))
    notes.sort(key=lambda x: (x.onset, x.is_drum, x.program, x.pitch))
    return notes


def assert_notes_close(ref, est, tol=QUANT, check_offsets=True):
    assert len(ref) == len(est), f"{len(ref)} vs {len(est)} notes"
    key = lambda n: (n.is_drum, n.program, n.pitch, round(n.onset, 2))
    for r, e in zip(sorted(ref, key=key), sorted(est, key=key)):
        assert r.is_drum == e.is_drum and r.program == e.program and r.pitch == e.pitch
        assert abs(r.onset - e.onset) <= tol, (r, e)
        if check_offsets and not r.is_drum:
            assert abs(r.offset - e.offset) <= tol, (r, e)


class TestCodec:
    def test_vocab_bijection(self):
        codec = EventCodec()
        for idx in range(codec.vocab_size):
            e = codec.decode_event_id(idx)
            assert codec.encode_event(e) == idx

    def test_extra_tokens(self):
        codec = EventCodec(extra_tokens=("transcribe_all", "transcribe_drum"))
        i = codec.encode_event(Event("transcribe_all", 0))
        assert codec.decode_event_id(i).type == "transcribe_all"
        assert codec.vocab_size == EventCodec().vocab_size + 2

    def test_classify_ids_vectorized(self):
        codec = EventCodec()
        ids = np.arange(codec.vocab_size)
        types, values = codec.classify_ids(ids)
        assert types[0] == codec.type_index["pad"]
        shift_off = codec.offset_of("shift")
        assert types[shift_off + 5] == codec.type_index["shift"]
        assert values[shift_off + 5] == 5
        # out of vocab → unk
        t2, _ = codec.classify_ids(np.array([codec.vocab_size + 7]))
        assert t2[0] == codec.type_index["unk"]


class TestSingleSegment:
    def test_simple_roundtrip(self):
        notes = [Note(False, 0, 0.10, 0.50, 60, 100),
                 Note(False, 0, 0.30, 1.00, 64, 100),
                 Note(True, 128, 0.20, 0.21, 36, 100)]
        tok = NoteEventTokenizer(EventCodec(), max_length=1024)
        ids = tok.encode_notes_segment(notes, 0.0)
        dec, err = tok.decode_segment(ids, 0.0)
        assert err.total() == 0
        assert_notes_close(notes, dec, check_offsets=False)
        pitched = [n for n in dec if not n.is_drum]
        assert abs(pitched[0].offset - 0.5) <= QUANT

    def test_tie_declaration(self):
        # note straddles the boundary at t=SEG
        notes = [Note(False, 24, 0.5, 3.0, 55, 100)]
        ties, evs = slice_notes_to_segment(notes, SEG, 2 * SEG)
        assert len(ties) == 1 and ties[0].pitch == 55
        events = note_event2event(evs, ties, SEG)
        assert events[0] == Event("program", 24)
        assert events[1] == Event("pitch", 55)
        assert events[2] == Event("tie", 0)

    def test_state_compression(self):
        # same program/velocity back-to-back → program emitted once
        notes = [Note(False, 5, 0.1, 0.2, 60, 100),
                 Note(False, 5, 0.1, 0.2, 64, 100)]
        _, evs = slice_notes_to_segment(notes, 0.0, SEG)
        events = note_event2event(evs, (), 0.0)
        progs = [e for e in events if e.type == "program"]
        assert len(progs) == 1


class TestFullSong:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_multisegment_merge(self, seed):
        rng = np.random.default_rng(seed)
        # overlapping same-pitch notes are unrepresentable in the MT3 event
        # stream (re-articulation closes the active note); datasets trim
        # them at preprocessing via mix_notes — mirror that here.
        from yourmt3_tpu.tokens import mix_notes
        notes = mix_notes([random_notes(rng)])
        tok = NoteEventTokenizer(EventCodec(), max_length=2048)
        n_seg = int(np.ceil(12.5 / SEG))
        starts = [i * SEG for i in range(n_seg)]
        seg_ids = [tok.encode_notes_segment(notes, t) for t in starts]
        dec, err = merge_segment_token_ids_to_notes(seg_ids, starts, tok.codec)
        assert err.total() == 0, err
        assert_notes_close(notes, dec)

    def test_long_note_spanning_many_segments(self):
        notes = [Note(False, 40, 0.2, 9.7, 69, 100)]
        tok = NoteEventTokenizer(EventCodec(), max_length=64)
        starts = [i * SEG for i in range(5)]
        seg_ids = [tok.encode_notes_segment(notes, t) for t in starts]
        dec, err = merge_segment_token_ids_to_notes(seg_ids, starts, tok.codec)
        assert err.total() == 0
        assert len(dec) == 1
        assert abs(dec[0].onset - 0.2) <= QUANT and abs(dec[0].offset - 9.7) <= QUANT


class TestTaskManager:
    def test_single_channel_task(self):
        from yourmt3_tpu.tokens import mix_notes
        tm = TaskManager("mt3_full_plus")
        rng = np.random.default_rng(7)
        notes = mix_notes([tm.remap_notes(random_notes(rng, n=25, t_max=6.0))])
        starts = [i * SEG for i in range(4)]
        labels = tm.tokenize_song(notes, starts)
        assert labels.shape == (4, 1, tm.max_token_length)
        dec, err = tm.detokenize_song(labels[:, 0, :], starts)
        assert err.total() == 0
        ref = tm.remap_notes(notes)
        assert_notes_close(ref, dec)

    def test_multi_channel_task(self):
        from yourmt3_tpu.tokens import mix_notes
        tm = TaskManager("mc13_full_plus_256")
        assert tm.num_decoding_channels == 13
        rng = np.random.default_rng(11)
        notes = mix_notes([tm.remap_notes(
            random_notes(rng, n=30, t_max=6.0, programs=(0, 25, 33, 41, 57)))])
        starts = [i * SEG for i in range(4)]
        labels = tm.tokenize_song(notes, starts)
        assert labels.shape == (4, 13, 256)
        dec, err = tm.detokenize_song(labels, starts)
        assert err.total() == 0
        ref = tm.remap_notes(notes)
        assert_notes_close(ref, dec)

    def test_subtask_prefix(self):
        tm = TaskManager("mt3_full_plus")
        ids = tm.tokenize_segment([], 0.0)
        evs = ids_to_events(ids[0], tm.codec)
        assert evs[0].type == "transcribe_all"
        assert evs[1].type == "tie"

    def test_program_remap_drops_unmapped(self):
        tm = TaskManager("mt3_full_plus")  # MT3_FULL has no sound-effects programs
        notes = [Note(False, 122, 0.1, 0.5, 60, 100),  # seashore → dropped
                 Note(False, 1, 0.1, 0.5, 62, 100)]  # piano → canonical 0
        out = tm.remap_notes(notes)
        assert len(out) == 1 and out[0].program == 0


class TestTruncation:
    def test_overflow_still_terminates(self):
        rng = np.random.default_rng(3)
        notes = random_notes(rng, n=500, t_max=2.0, with_drums=False)
        tok = NoteEventTokenizer(EventCodec(), max_length=64)
        ids = tok.encode_notes_segment(notes, 0.0)
        assert ids.shape == (64,)
        from yourmt3_tpu.tokens.codec import EOS_ID
        assert (ids == EOS_ID).sum() == 1
        dec, err = tok.decode_segment(ids, 0.0)  # must not raise
        assert len(dec) <= len(notes)
