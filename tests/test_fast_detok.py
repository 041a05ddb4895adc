"""FastDetokenizer (device front half) ≡ reference Python state machine."""

import numpy as np
import pytest

from yourmt3_tpu.tokens import EventCodec, Note, NoteEventTokenizer, mix_notes
from yourmt3_tpu.tokens.event2note import merge_segment_token_ids_to_notes
from yourmt3_tpu.tokens.fast_detok import FastDetokenizer

SEG = 32767 / 16000


def random_notes(rng, n=40, t_max=10.0):
    notes = []
    for _ in range(n):
        onset = float(rng.uniform(0, t_max))
        if rng.random() < 0.25:
            notes.append(Note(True, 128, onset, onset + 0.01,
                              int(rng.choice([36, 38, 42])), 100))
        else:
            notes.append(Note(False, int(rng.choice([0, 24, 40])), onset,
                              onset + float(rng.uniform(0.05, 3.0)),
                              int(rng.integers(40, 90)), 100))
    return mix_notes([notes])


def keyset(notes):
    return sorted((n.is_drum, n.program, n.pitch, round(n.onset, 4),
                   round(n.offset, 4)) for n in notes)


class TestFastDetok:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_state_machine(self, seed):
        rng = np.random.default_rng(seed)
        notes = random_notes(rng)
        tok = NoteEventTokenizer(EventCodec(), max_length=1024)
        starts = [i * SEG for i in range(6)]
        ids = np.stack([tok.encode_segment(
            *_seg(notes, t), t) for t in starts])
        ref, ref_err = merge_segment_token_ids_to_notes(
            [ids[i] for i in range(len(starts))], starts, tok.codec)
        fd = FastDetokenizer(tok.codec)
        got, got_err = fd.detokenize_song(ids, starts)
        assert keyset(ref) == keyset(got)
        assert ref_err.total() == got_err.total()

    def test_garbage_is_safe(self):
        rng = np.random.default_rng(9)
        fd = FastDetokenizer()
        ids = rng.integers(0, fd.codec.vocab_size + 50, (3, 2, 128))
        notes, err = fd.detokenize_song(ids, [0.0, SEG, 2 * SEG])
        assert isinstance(notes, list)

    def test_multi_channel_layout(self):
        rng = np.random.default_rng(4)
        notes = random_notes(rng, n=20, t_max=4.0)
        tok = NoteEventTokenizer(EventCodec(), max_length=512)
        starts = [0.0, SEG]
        # put pitched in channel 0, drums in channel 1
        p = [n for n in notes if not n.is_drum]
        d = [n for n in notes if n.is_drum]
        ids = np.stack([
            np.stack([tok.encode_segment(*_seg(p, t), t),
                      tok.encode_segment(*_seg(d, t), t)])
            for t in starts])  # (S, 2, L)
        fd = FastDetokenizer(tok.codec)
        got, err = fd.detokenize_song(ids, starts)
        want = [n for n in notes if n.onset < 2 * SEG]
        # offsets clipped at song end for notes running past the last segment
        for n in want:
            n2 = Note(n.is_drum, n.program, n.onset, min(n.offset, 2 * SEG),
                      n.pitch, n.velocity)
        assert err.total() == 0
        assert len(got) == len(want)


def _seg(notes, start):
    from yourmt3_tpu.tokens import slice_notes_to_segment
    ties, evs = slice_notes_to_segment(notes, start, start + SEG)
    return evs, ties
