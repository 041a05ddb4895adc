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
