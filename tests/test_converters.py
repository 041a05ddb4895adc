"""Dataset-converter tests over synthetic fixture trees (SURVEY.md C16).

Each test fabricates a miniature copy of the dataset's native layout
(metadata files, annotations, audio), runs the converter, and checks the
produced index + notes round-trip through the data pipeline.
"""

import json
import os
import struct

import numpy as np
import pytest

from yourmt3_tpu.data.audio_io import write_wav
from yourmt3_tpu.data.indexes import load_file_list, load_notes
from yourmt3_tpu.data.preprocess import converters as cv
from yourmt3_tpu.tokens import Note, note_event2midi


def _wav(path, seconds=1.0, sr=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_wav(path, np.zeros(int(sr * seconds), np.float32), sr)


def _midi(path, notes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    note_event2midi(notes, path)


PIANO_NOTES = [Note(False, 0, 0.25, 0.75, 60, 90),
               Note(False, 0, 0.50, 1.00, 64, 80)]


class TestMaestro:
    def test_convert(self, tmp_path):
        src = tmp_path / "maestro"
        home = str(tmp_path / "home")
        meta = {
            "split": {"0": "train", "1": "test"},
            "midi_filename": {"0": "2020/a.midi", "1": "2020/b.midi"},
            "audio_filename": {"0": "2020/a.wav", "1": "2020/b.wav"},
        }
        os.makedirs(src / "2020")
        with open(src / "maestro-v3.0.0.json", "w") as f:
            json.dump(meta, f)
        for n in ("a", "b"):
            _midi(str(src / "2020" / f"{n}.midi"), PIANO_NOTES)
            _wav(str(src / "2020" / f"{n}.wav"))
        out = cv.preprocess_maestro(str(src), home)
        assert set(out) == {"train", "test"}
        ds = load_file_list(out["train"])
        assert len(ds["tracks"]) == 1
        notes = load_notes(ds["tracks"][0]["notes_file"])
        assert len(notes) == 2 and notes[0].pitch == 60


class TestEnstDrums:
    def test_convert(self, tmp_path):
        src = tmp_path / "enst"
        home = str(tmp_path / "home")
        for drummer, split in (("drummer_1", "train"), ("drummer_3", "test")):
            ann = src / drummer / "annotation" / "001_hits.txt"
            os.makedirs(ann.parent)
            ann.write_text("0.50 bd\n0.75 sd\n1.00 chh\n")
            _wav(str(src / drummer / "audio" / "wet_mix" / "001_hits.wav"))
        out = cv.preprocess_enstdrums(str(src), home, "dtm")
        ds = load_file_list(out["test"])
        notes = load_notes(ds["tracks"][0]["notes_file"])
        assert [n.pitch for n in notes] == [36, 38, 42]
        assert all(n.is_drum for n in notes)


class TestURMP:
    def test_convert(self, tmp_path):
        src = tmp_path / "urmp" / "01_Jupiter_vn_vc"
        home = str(tmp_path / "home")
        os.makedirs(src)
        _wav(str(src / "AuMix_01_Jupiter_vn_vc.wav"))
        (src / "Notes_1_vn_01.txt").write_text("0.5 440.0 0.4\n1.0 523.25 0.3\n")
        (src / "Notes_2_vc_01.txt").write_text("0.5 220.0 0.5\n")
        out = cv.preprocess_urmp(str(tmp_path / "urmp"), home)
        ds = load_file_list(out["test"])
        notes = load_notes(ds["tracks"][0]["notes_file"])
        pitches = sorted(n.pitch for n in notes)
        assert pitches == [57, 69, 72]  # A3(220), A4(440), C5(523.25)
        progs = sorted({n.program for n in notes})
        assert progs == [40, 42]  # violin, cello


class TestEgmd:
    def test_convert(self, tmp_path):
        src = tmp_path / "egmd"
        home = str(tmp_path / "home")
        os.makedirs(src)
        drum_notes = [Note(True, 128, 0.2, 0.21, 36, 100),
                      Note(True, 128, 0.4, 0.41, 38, 100)]
        _midi(str(src / "d1.mid"), drum_notes)
        _wav(str(src / "d1.wav"))
        with open(src / "e-gmd.csv", "w") as f:
            f.write("midi_filename,audio_filename,split\n")
            f.write("d1.mid,d1.wav,train\n")
        out = cv.preprocess_egmd(str(src), home)
        ds = load_file_list(out["train"])
        notes = load_notes(ds["tracks"][0]["notes_file"])
        assert all(n.is_drum for n in notes) and len(notes) == 2


class TestSlakhYaml:
    def test_metadata_parser(self, tmp_path):
        y = tmp_path / "metadata.yaml"
        y.write_text(
            "audio_dir: audio\nstems:\n"
            "  S00:\n    inst_class: Piano\n    is_drum: false\n"
            "    program_num: 0\n"
            "  S01:\n    inst_class: Drums\n    is_drum: true\n"
            "    program_num: 118\n")
        stems = cv._parse_slakh_metadata(str(y))
        assert stems["S00"]["program_num"] == 0
        assert stems["S01"]["is_drum"] is True

    def test_convert_track(self, tmp_path):
        src = tmp_path / "slakh"
        home = str(tmp_path / "home")
        t = src / "train" / "Track00001"
        os.makedirs(t / "MIDI")
        os.makedirs(t / "stems")
        (t / "metadata.yaml").write_text(
            "stems:\n  S00:\n    is_drum: false\n    program_num: 0\n")
        _midi(str(t / "MIDI" / "S00.mid"), PIANO_NOTES)
        _wav(str(t / "mix.wav"))
        _wav(str(t / "stems" / "S00.wav"))
        out = cv.preprocess_slakh(str(src), home)
        ds = load_file_list(out["train"])
        tr = ds["tracks"][0]
        assert "S00" in tr["stem_files"]
        notes = load_notes(tr["notes_file"])
        assert len(notes) == 2


class TestGuitarSet:
    def test_convert(self, tmp_path):
        src = tmp_path / "gset"
        home = str(tmp_path / "home")
        os.makedirs(src / "annotation")
        os.makedirs(src / "audio_mono-mic")
        jams = {"annotations": [
            {"namespace": "note_midi",
             "data": [{"time": 0.5, "duration": 0.4, "value": 55.02},
                      {"time": 1.0, "duration": 0.2, "value": 59.9}]}]}
        with open(src / "annotation" / "00_BN1-129-Eb_solo.jams", "w") as f:
            json.dump(jams, f)
        _wav(str(src / "audio_mono-mic" / "00_BN1-129-Eb_solo_mic.wav"))
        out = cv.preprocess_guitarset(str(src), home)
        ds = load_file_list(out["train"])
        notes = load_notes(ds["tracks"][0]["notes_file"])
        assert [n.pitch for n in notes] == [55, 60]


class TestSingingJsonConverters:
    """mir_st500 / cmedia / mir1k share the singing-JSON contract
    (per-track {base}.json note triplets + {base}.wav; program 100 =
    singing voice per the YourMT3 convention, config/vocabulary.py)."""

    def _tree(self, tmp_path, n=2):
        src = tmp_path / "src"
        os.makedirs(src)
        for i in range(n):
            with open(src / f"song{i}.json", "w") as f:
                json.dump([[0.5, 1.0, 62.2], [1.2, 1.5, 67.0],
                           [2.0, 2.2, 200.0]], f)  # 200 = out-of-range
            _wav(str(src / f"song{i}.wav"))
        # an annotation with no audio must be skipped, not crash
        with open(src / "orphan.json", "w") as f:
            json.dump([[0.0, 0.5, 60]], f)
        return str(src)

    @pytest.mark.parametrize("ds", ["mir_st500", "cmedia", "mir1k"])
    def test_convert(self, ds, tmp_path):
        src = self._tree(tmp_path)
        home = str(tmp_path / "home")
        out = cv.CONVERTERS[ds](src, home)
        assert "train" in out
        tracks = load_file_list(out["train"])["tracks"]
        assert len(tracks) == 2  # orphan.json skipped
        notes = load_notes(tracks[0]["notes_file"])
        # out-of-range pitch filtered; pitch rounded; program 100 (singing)
        assert len(notes) == 2
        assert all(n.program == 100 and not n.is_drum for n in notes)
        assert notes[0].pitch == 62

    def test_split_map_and_notes_dict_shape(self, tmp_path):
        src = tmp_path / "src2"
        os.makedirs(src)
        with open(src / "a.json", "w") as f:
            json.dump({"notes": [[0.1, 0.4, 60]]}, f)  # dict-shaped variant
        _wav(str(src / "a.wav"))
        out = cv.preprocess_singing_json(str(src), str(tmp_path / "home"),
                                         "mir_st500", split_map={"a": "test"})
        assert set(out) == {"test"}
        tracks = load_file_list(out["test"])["tracks"]
        assert len(load_notes(tracks[0]["notes_file"])) == 1


class TestMidiPairedConverters:
    """rwc_pop / idmt_smt_bass: directories of {name.wav, name.mid}
    pairs (SURVEY.md C16 tail)."""

    def _tree(self, tmp_path):
        src = tmp_path / "src"
        os.makedirs(src / "disc1")
        _midi(str(src / "disc1" / "t1.mid"), PIANO_NOTES)
        _wav(str(src / "disc1" / "t1.wav"))
        # orphan midi without audio must be skipped
        _midi(str(src / "disc1" / "orphan.mid"), PIANO_NOTES)
        return str(src)

    def test_rwc_pop_lands_in_test_split(self, tmp_path):
        out = cv.CONVERTERS["rwc_pop"](self._tree(tmp_path),
                                       str(tmp_path / "home"))
        assert set(out) == {"test"}  # RWC is an eval-only dataset
        tracks = load_file_list(out["test"])["tracks"]
        assert len(tracks) == 1
        notes = load_notes(tracks[0]["notes_file"])
        assert len(notes) == 2 and notes[0].pitch == 60

    def test_idmt_smt_bass_train_split(self, tmp_path):
        out = cv.CONVERTERS["idmt_smt_bass"](self._tree(tmp_path),
                                             str(tmp_path / "home"))
        assert set(out) == {"train"}
        tracks = load_file_list(out["train"])["tracks"]
        assert len(tracks) == 1

    def test_every_registered_dataset_has_a_converter_test(self):
        """Tripwire: a new CONVERTERS entry must come with coverage —
        extend this list (and the suite) when registering one."""
        covered = {"maestro", "slakh", "guitarset", "enstdrums_dtp",
                   "enstdrums_dtm", "egmd", "urmp", "mir_st500", "cmedia",
                   "mir1k", "rwc_pop", "idmt_smt_bass"}
        assert set(cv.CONVERTERS) == covered
