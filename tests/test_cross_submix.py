"""Cross-track stem submix wiring (SURVEY C13, the key YourMT3+ Slakh
trick): TrainDataset pools stems from a SECOND sampled track (possibly
from another dataset in the mixture) and the produced labels must
round-trip to the merged note set of every stem kept."""

import os

import numpy as np
import pytest

from yourmt3_tpu.config.audio import AudioConfig
from yourmt3_tpu.data.audio_io import write_wav
from yourmt3_tpu.data.dataset_train import TrainDataset
from yourmt3_tpu.data.indexes import save_notes, write_file_list
from yourmt3_tpu.tokens.dataclasses import Note
from yourmt3_tpu.tokens.note2event import mix_notes
from yourmt3_tpu.tokens.task_manager import TaskManager

SR = 16000


def _make_stem_track(root, dataset, tid, stem_specs, duration=1.5):
    """stem_specs: {stem_name: [Note, ...]}. Returns index track dict."""
    adir = os.path.join(root, dataset)
    os.makedirs(adir, exist_ok=True)
    stem_files, stem_notes = {}, {}
    n = int(SR * duration)
    mix = np.zeros(n, np.float32)
    all_notes = []
    for name, notes in stem_specs.items():
        rng = np.random.default_rng(hash(name) % 2**31)
        audio = (rng.standard_normal(n) * 0.05).astype(np.float32)
        wav = os.path.join(adir, f"{tid}_{name}.wav")
        npz = os.path.join(adir, f"{tid}_{name}.npz")
        write_wav(wav, audio, SR)
        save_notes(npz, notes)
        stem_files[name], stem_notes[name] = wav, npz
        mix += audio
        all_notes.extend(notes)
    wav_mix = os.path.join(adir, f"{tid}_mix.wav")
    npz_mix = os.path.join(adir, f"{tid}_mix.npz")
    write_wav(wav_mix, mix, SR)
    save_notes(npz_mix, mix_notes([all_notes]))
    return {
        "track_id": tid, "audio_file": wav_mix, "notes_file": npz_mix,
        "program_list": sorted({nt.program for nt in all_notes
                                if not nt.is_drum}),
        "is_drum": any(nt.is_drum for nt in all_notes),
        "duration": duration,
        "stem_files": stem_files, "stem_notes": stem_notes,
    }


@pytest.fixture
def two_stem_datasets(tmp_path):
    root = str(tmp_path)
    a_notes = {
        "piano": [Note(False, 0, 0.10, 0.60, 60, 90)],
        "bass": [Note(False, 32, 0.20, 0.90, 40, 80)],
    }
    b_notes = {
        "guitar": [Note(False, 24, 0.15, 0.70, 55, 85)],
        "drums": [Note(True, 128, 0.30, 0.31, 38, 100)],
    }
    tr_a = _make_stem_track(root, "dsA", "a0", a_notes)
    tr_b = _make_stem_track(root, "dsB", "b0", b_notes)
    idx_a = os.path.join(root, "yourmt3_indexes", "dsA_train_file_list.json")
    idx_b = os.path.join(root, "yourmt3_indexes", "dsB_train_file_list.json")
    write_file_list(idx_a, [tr_a], "dsA", "train")
    write_file_list(idx_b, [tr_b], "dsB", "train")
    merged = mix_notes([sum(a_notes.values(), []), sum(b_notes.values(), [])])
    return idx_a, idx_b, merged


def test_cross_track_submix_labels_match_merged_notes(two_stem_datasets):
    idx_a, idx_b, merged = two_stem_datasets
    tm = TaskManager("mt3_full_plus")
    ds = TrainDataset([idx_a, idx_b], tm,
                      cross_submix_prob=1.0,  # always cross-mix
                      submix_p_include=1.0,  # keep every stem → labels
                      seed=3)  # must encode the FULL merged note set
    audio, labels, _ = ds.sample_segment()
    # tracks are shorter than a segment → crop starts at t0=0
    want = tm.tokenize_segment(merged, 0.0)
    assert labels.shape == want.shape
    assert np.array_equal(labels, want), "cross-mixed labels != merged notes"
    # and the audio actually contains both tracks' stems (4 stems summed)
    assert audio.shape == (tm.audio_cfg.input_frames,)
    assert float(np.abs(audio).max()) > 0


def test_cross_submix_disabled_keeps_single_track(two_stem_datasets):
    idx_a, _, _ = two_stem_datasets
    tm = TaskManager("mt3_full_plus")
    ds = TrainDataset([idx_a], tm, cross_submix_prob=0.0,
                      submix_p_include=1.0, seed=0)
    _, labels, _ = ds.sample_segment()
    a_only = mix_notes([[Note(False, 0, 0.10, 0.60, 60, 90),
                         Note(False, 32, 0.20, 0.90, 40, 80)]])
    want = tm.tokenize_segment(a_only, 0.0)
    assert np.array_equal(labels, want)
