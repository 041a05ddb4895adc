"""MIDI I/O round-trip and metric sanity tests (SURVEY.md C10, C27)."""

import numpy as np

from yourmt3_tpu.config.vocabulary import (GM_INSTR_CLASS, GM_INSTR_CLASS_MC12,
                                            GM_DRUM_8CLASS)
from yourmt3_tpu.eval.metrics import AMTMetrics, evaluate_track
from yourmt3_tpu.tokens import Note, midi2note, note_event2midi


def make_notes():
    return [
        Note(False, 0, 0.50, 1.00, 60, 90),
        Note(False, 0, 0.75, 1.25, 64, 80),
        Note(False, 40, 1.00, 2.50, 69, 70),
        Note(True, 128, 0.25, 0.26, 36, 100),
        Note(True, 128, 1.25, 1.26, 38, 100),
    ]


class TestMidiIO:
    def test_write_read_roundtrip(self, tmp_path):
        notes = make_notes()
        p = str(tmp_path / "out.mid")
        note_event2midi(notes, p)
        back = midi2note(p)
        assert len(back) == len(notes)
        key = lambda n: (n.is_drum, n.program, n.pitch, n.onset)
        for r, e in zip(sorted(notes, key=key), sorted(back, key=key)):
            assert r.is_drum == e.is_drum and r.pitch == e.pitch
            assert abs(r.onset - e.onset) < 0.01
            if not r.is_drum:
                assert r.program == e.program
                assert abs(r.offset - e.offset) < 0.01
                assert abs(r.velocity - e.velocity) <= 1

    def test_many_programs_channel_sharing(self, tmp_path):
        """ADVICE r1: with >15 melodic programs two tracks share a channel;
        the program change must be re-emitted before each note-on on shared
        channels so merged-stream players hear the right instrument."""
        notes = [Note(False, p, 0.1 * i, 0.1 * i + 0.5, 60 + (i % 12), 90)
                 for i, p in enumerate(range(0, 40, 2))]  # 20 programs
        p = str(tmp_path / "many.mid")
        note_event2midi(notes, p)
        back = midi2note(p)
        assert sorted(n.program for n in back) == sorted(n.program for n in notes)
        # simulate a merged single-stream player: walk ALL events in tick
        # order, track global per-channel program state, check each note-on
        # sounds with its intended program
        from yourmt3_tpu.tokens.midi_io import parse_midi_file, _TickClock, _tempo_map
        division, tracks = parse_midi_file(p)
        merged = sorted((e for tr in tracks for e in tr),
                        key=lambda e: e.tick)
        intended = {(round(n.onset, 6), n.pitch): n.program for n in notes}
        prog_state = {}
        clock = _TickClock(division, _tempo_map(tracks))
        for e in merged:
            if e.status == 0xFF:
                continue
            kind, ch = e.status & 0xF0, e.status & 0x0F
            if kind == 0xC0:
                prog_state[ch] = e.data[0]
            elif kind == 0x90 and e.data[1] > 0:
                t = round(clock.seconds(e.tick), 6)
                want = intended.get((t, e.data[0]))
                if want is not None:
                    assert prog_state.get(ch) == want, (t, e.data[0])

    def test_sustain_pedal_extension(self, tmp_path):
        # hand-build a track: CC64 down, note on/off, CC64 up later
        import struct
        from yourmt3_tpu.tokens.midi_io import _write_varint
        tpqn, tempo = 480, 500000

        def ev(delta, *msg):
            return _write_varint(delta) + bytes(msg)

        body = b""
        body += ev(0, 0xFF, 0x51, 0x03) + struct.pack(">I", tempo)[1:]
        body += ev(0, 0xB0, 64, 100)       # pedal down
        body += ev(0, 0x90, 60, 80)        # note on @0
        body += ev(480, 0x80, 60, 0)       # note off @1 beat (0.5 s) — deferred
        body += ev(480, 0xB0, 64, 0)       # pedal up @2 beats (1.0 s)
        body += ev(0, 0xFF, 0x2F, 0x00)
        blob = (b"MThd" + struct.pack(">IHHH", 6, 1, 1, tpqn)
                + b"MTrk" + struct.pack(">I", len(body)) + body)
        p = tmp_path / "sus.mid"
        p.write_bytes(blob)
        notes = midi2note(str(p), apply_sustain_pedal=True)
        assert len(notes) == 1
        assert abs(notes[0].offset - 1.0) < 0.01  # extended to pedal release
        notes2 = midi2note(str(p), apply_sustain_pedal=False)
        assert abs(notes2[0].offset - 0.5) < 0.01


class TestMetrics:
    def test_perfect_match(self):
        notes = make_notes()
        s = evaluate_track(notes, notes, GM_INSTR_CLASS, GM_DRUM_8CLASS)
        assert s.onset_f1 == 1.0 and s.offset_f1 == 1.0
        assert s.multi_f1 == 1.0 and s.drum_f1 == 1.0

    def test_onset_tolerance(self):
        ref = [Note(False, 0, 1.0, 2.0, 60, 90)]
        est_ok = [Note(False, 0, 1.04, 2.0, 60, 90)]
        est_bad = [Note(False, 0, 1.06, 2.0, 60, 90)]
        assert evaluate_track(ref, est_ok).onset_f1 == 1.0
        assert evaluate_track(ref, est_bad).onset_f1 == 0.0

    def test_offset_ratio(self):
        ref = [Note(False, 0, 0.0, 10.0, 60, 90)]  # tol = 2.0 s
        est = [Note(False, 0, 0.0, 8.5, 60, 90)]
        s = evaluate_track(ref, est)
        assert s.onset_f1 == 1.0 and s.offset_f1 == 1.0
        est2 = [Note(False, 0, 0.0, 7.0, 60, 90)]
        assert evaluate_track(ref, est2).offset_f1 == 0.0

    def test_multi_instrument_grouping(self):
        # est puts the note in a different program of the SAME class → multi ok
        ref = [Note(False, 0, 1.0, 2.0, 60, 90)]
        est = [Note(False, 3, 1.0, 2.0, 60, 90)]  # still Piano class
        s = evaluate_track(ref, est, GM_INSTR_CLASS)
        assert s.multi_f1 == 1.0
        est2 = [Note(False, 25, 1.0, 2.0, 60, 90)]  # Guitar class
        assert evaluate_track(ref, est2, GM_INSTR_CLASS).multi_f1 == 0.0

    def test_one_to_one_matching(self):
        # two est notes can't both match one ref note
        ref = [Note(False, 0, 1.0, 2.0, 60, 90)]
        est = [Note(False, 0, 1.0, 2.0, 60, 90), Note(False, 0, 1.01, 2.0, 60, 90)]
        s = evaluate_track(ref, est)
        assert s.onset_precision == 0.5 and s.onset_recall == 1.0

    def test_macro_average(self):
        m = AMTMetrics(GM_INSTR_CLASS, GM_DRUM_8CLASS)
        notes = make_notes()
        m.update(notes, notes)
        m.update(notes, [])  # empty prediction
        out = m.compute()
        assert out["onset_f1"] == 0.5
        assert m.num_tracks == 2

    def test_macro_average_skips_undefined_tracks(self):
        """ADVICE r1: a metric undefined on a track (no drums anywhere, or
        no pitched notes anywhere) must not deflate the macro average."""
        m = AMTMetrics(GM_INSTR_CLASS, GM_DRUM_8CLASS)
        piano = [Note(False, 0, 0.5, 1.0, 60, 90)]
        drums = [Note(True, 128, 0.25, 0.26, 36, 100)]
        s1 = m.update(piano, piano)   # no drums: drum_f1 undefined
        s2 = m.update(drums, drums)   # no pitched: onset/offset undefined
        assert s1.drum_f1 is None and s1.onset_f1 == 1.0
        assert s2.onset_f1 is None and s2.drum_f1 == 1.0
        out = m.compute()
        assert out["onset_f1"] == 1.0   # averaged over 1 track, not 2
        assert out["drum_f1"] == 1.0
        # metric defined on zero tracks is omitted entirely
        m2 = AMTMetrics(None, None)
        m2.update(piano, piano)
        assert "multi_f1" not in m2.compute()


class TestDatasetEvalVocabs:
    """URMP / MusicNet per-instrument eval groupings (SURVEY C27)."""

    def test_urmp_vocab_groups_programs(self):
        from yourmt3_tpu.config.vocabulary import PROGRAM_VOCABULARIES
        v = PROGRAM_VOCABULARIES["urmp_instr"]
        arr = v.program_to_class_array()
        assert arr[40] != arr[41] != arr[42]  # strings are separate classes
        assert arr[73] == arr[72]  # flutes group
        assert v.num_classes == 13 and not v.has_drums

    def test_urmp_multi_f1_per_instrument(self):
        """Same pitch on violin vs viola must NOT match under urmp_instr
        multi-instrument F1 (it would under a coarse strings class)."""
        from yourmt3_tpu.config.vocabulary import PROGRAM_VOCABULARIES
        from yourmt3_tpu.eval.metrics import evaluate_track
        from yourmt3_tpu.tokens.dataclasses import Note
        ref = [Note(False, 40, 0.5, 1.0, 60, 80)]   # violin
        est = [Note(False, 41, 0.5, 1.0, 60, 80)]   # viola
        v = PROGRAM_VOCABULARIES["urmp_instr"]
        res = evaluate_track(ref, est, eval_program_vocab=v)
        assert res.multi_f1 == 0.0
        est_ok = [Note(False, 40, 0.5, 1.0, 60, 80)]
        res2 = evaluate_track(ref, est_ok, eval_program_vocab=v)
        assert res2.multi_f1 == 1.0

    def test_musicnet_vocab_registered(self):
        from yourmt3_tpu.config.vocabulary import PROGRAM_VOCABULARIES
        v = PROGRAM_VOCABULARIES["musicnet_instr"]
        arr = v.program_to_class_array()
        assert arr[0] == arr[6]   # piano incl. harpsichord
        assert arr[40] != arr[42]  # violin vs cello separate


class TestPerClassBreakdown:
    def test_per_class_counts_and_micro_aggregation(self):
        # Piano note matched, Guitar note missed, one spurious Guitar est
        ref = [Note(False, 0, 1.0, 2.0, 60, 90),
               Note(False, 25, 3.0, 4.0, 64, 90)]
        est = [Note(False, 0, 1.0, 2.0, 60, 90),
               Note(False, 25, 5.0, 6.0, 64, 90)]
        m = AMTMetrics(GM_INSTR_CLASS)
        m.update(ref, est)
        m.update(ref, est)  # second identical track: counts double
        pc = m.compute_per_class()
        assert pc["Piano"]["f1"] == 1.0 and pc["Piano"]["n_ref"] == 2
        assert pc["Guitar"]["f1"] == 0.0
        assert pc["Guitar"]["n_ref"] == 2 and pc["Guitar"]["n_est"] == 2
        # classes absent from ref AND est never appear
        assert "Strings" not in pc
        # scalar compute() is unaffected by the dict field
        scal = m.compute()
        assert all(isinstance(v, float) for v in scal.values())

    def test_per_class_drums_bucket(self):
        ref = [Note(True, 128, 1.0, 1.01, 36, 100)]
        m = AMTMetrics(GM_INSTR_CLASS_MC12)
        m.update(ref, ref)
        pc = m.compute_per_class()
        assert pc["Drums"]["f1"] == 1.0

    def test_per_class_empty_without_vocab(self):
        m = AMTMetrics()
        m.update(make_notes(), make_notes())
        assert m.compute_per_class() == {}


class TestOffsetDiagnostic:
    def test_detects_systematic_early_offsets(self):
        from yourmt3_tpu.eval.metrics import offset_error_stats
        from yourmt3_tpu.tokens.dataclasses import Note
        ref = [Note(False, 0, float(i), float(i) + 1.0, 60 + i % 4, 90)
               for i in range(10)]
        est = [Note(False, 0, n.onset + 0.01, n.offset - 0.2, n.pitch, 90)
               for n in ref]
        s = offset_error_stats(ref, est)
        assert s["n_pairs"] == 10
        assert s["p_early"] == 1.0 and s["p_late"] == 0.0
        assert abs(s["mean_signed_s"] + 0.2) < 1e-6

    def test_drums_and_unmatched_are_excluded(self):
        from yourmt3_tpu.eval.metrics import offset_error_stats
        from yourmt3_tpu.tokens.dataclasses import Note
        ref = [Note(True, 128, 1.0, 1.01, 36, 100),   # drum: excluded
               Note(False, 0, 2.0, 3.0, 60, 90)]      # unmatched (est far)
        est = [Note(False, 0, 5.0, 6.0, 60, 90)]
        assert offset_error_stats(ref, est) == {"n_pairs": 0.0}
