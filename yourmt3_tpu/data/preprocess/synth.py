"""Synthetic dataset generator: additive-synth audio + ground-truth notes.

Not in the reference — this replaces its ad-hoc `extras/` sanity scripts
(SURVEY.md §4) with a deterministic, installable fixture dataset: random
note charts rendered as decaying harmonics (+ noise-burst drums), so the
full train→eval→F1 loop runs hermetically in CI and smoke benches.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ...tokens.dataclasses import Note
from ..audio_io import write_wav
from ..indexes import save_notes, write_file_list


# Per-GM-program timbre recipes. Multi-instrument F1 is only learnable if
# programs are acoustically DISTINCT — an earlier renderer gave every
# pitched program the identical (1, .5, .25) harmonic stack, so class
# identity was unobservable and the multi-channel decoder could not
# attribute notes to channels. Each recipe: harmonic amplitude profile,
# attack time, sustain decay rate, and vibrato (rate Hz, depth semitones).
# Registers (pitch ranges) also differ per program — see PROGRAM_RANGES.
PROGRAM_TIMBRES = {
    # program: (harmonic amps, attack_s, decay_per_s, vibrato)
    0:  ((1.0, 0.6, 0.35, 0.2, 0.1), 0.005, 1.2, None),        # piano: rich, percussive decay
    24: ((1.0, 0.45, 0.2, 0.08), 0.003, 2.5, None),            # guitar: pluck, fast decay
    32: ((1.0, 0.25, 0.06), 0.008, 0.9, None),                 # bass: fundamental-heavy
    40: ((1.0, 0.7, 0.55, 0.4, 0.3, 0.2), 0.08, 0.1, (5.5, 0.25)),  # strings: slow bow, vibrato
    56: ((0.7, 1.0, 0.9, 0.7, 0.5, 0.3), 0.04, 0.1, None),     # brass: mid-harmonic formant
    64: ((1.0, 0.15, 0.6, 0.1, 0.4), 0.05, 0.15, (5.0, 0.12)), # reed: odd harmonics, vibrato
}
DEFAULT_TIMBRE = ((1.0, 0.5, 0.25), 0.005, 0.35, None)

PROGRAM_RANGES = {  # MIDI pitch register per program
    0: (40, 88), 24: (45, 78), 32: (28, 52), 40: (55, 93),
    56: (52, 80), 64: (49, 78),
}
DEFAULT_RANGE = (45, 84)


def render_notes(notes: Sequence[Note], sr: int, duration: float,
                 seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(sr * duration)
    out = np.zeros(n, np.float64)
    t_all = np.arange(n) / sr
    for note in notes:
        i0 = int(note.onset * sr)
        i1 = min(int(note.offset * sr), n)
        if note.is_drum:
            dur = int(0.08 * sr)
            i1 = min(i0 + dur, n)
            if i1 <= i0:
                continue
            env = np.exp(-np.arange(i1 - i0) / (0.01 * sr))
            burst = rng.standard_normal(i1 - i0) * env
            if note.pitch in (35, 36):  # kick: low sine thump
                burst = 0.7 * np.sin(2 * np.pi * 60 * t_all[: i1 - i0]) * env
            out[i0:i1] += 0.4 * burst
        else:
            if i1 <= i0:
                continue
            f0 = 440.0 * 2 ** ((note.pitch - 69) / 12)
            seg_t = t_all[: i1 - i0]
            harm, attack, decay, vib = PROGRAM_TIMBRES.get(
                note.program, DEFAULT_TIMBRE)
            # Envelope design: offsets must be OBSERVABLE in the audio for
            # offset-F1 to be learnable. An earlier exp(-1.5·t) decay left
            # long notes near-silent well before their labeled offset
            # (offset-F1 cliff: 0.109 vs onset 0.392 zero-shot, round 1);
            # now: attack ramp → per-program sustain decay → sharp 30 ms
            # release ending exactly at the offset.
            env = np.minimum(1.0, seg_t / max(attack, 1e-4)) * np.exp(-seg_t * decay)
            rel = min(int(0.03 * sr), i1 - i0)
            if rel > 0:
                env[-rel:] = env[-rel:] * np.linspace(1.0, 0.0, rel)
            phase = 2 * np.pi * f0 * seg_t
            if vib is not None:
                rate, depth_semi = vib
                depth = f0 * (2 ** (depth_semi / 12) - 1.0)
                phase = phase + (depth / rate) * np.sin(2 * np.pi * rate * seg_t)
            wave = np.zeros_like(seg_t)
            for h, amp in enumerate(harm, start=1):
                if f0 * h < sr / 2:
                    wave += amp * np.sin(phase * h)
            out[i0:i1] += (note.velocity / 127.0) * 0.2 * env * wave
    peak = np.abs(out).max()
    if peak > 1.0:
        out /= peak
    return out.astype(np.float32)


def random_chart(rng: np.random.Generator, duration: float,
                 programs: Sequence[int] = (0, 24, 32),
                 with_drums: bool = True, density: float = 3.0) -> List[Note]:
    notes: List[Note] = []
    n = max(2, int(duration * density))
    for _ in range(n):
        onset = float(rng.uniform(0.05, duration - 0.3))
        if with_drums and rng.random() < 0.3:
            notes.append(Note(True, 128, onset, onset + 0.01,
                              int(rng.choice([36, 38, 42])), 100))
        else:
            prog = int(rng.choice(programs))
            lo, hi = PROGRAM_RANGES.get(prog, DEFAULT_RANGE)
            notes.append(Note(False, prog, onset,
                              onset + float(rng.uniform(0.15, 1.2)),
                              int(rng.integers(lo, hi)), int(rng.integers(60, 110))))
    from ...tokens.note2event import mix_notes
    return mix_notes([notes])


def build_synth_dataset(
    root: str, n_tracks: int = 4, duration: float = 6.0, sr: int = 16000,
    splits: Tuple[str, ...] = ("train", "validation", "test"),
    programs: Sequence[int] = (0, 24, 32), with_drums: bool = True,
    seed: int = 0, dataset_name: str = "synth",
) -> dict:
    """Render tracks + notes and write index files; → {split: index_path}."""
    rng = np.random.default_rng(seed)
    out = {}
    for split in splits:
        tracks = []
        for i in range(n_tracks):
            tid = f"{dataset_name}_{split}_{i:03d}"
            chart = random_chart(rng, duration, programs, with_drums)
            audio = render_notes(chart, sr, duration, seed=seed + i)
            adir = os.path.join(root, dataset_name, split)
            os.makedirs(adir, exist_ok=True)
            wav = os.path.join(adir, f"{tid}.wav")
            npz = os.path.join(adir, f"{tid}.npz")
            write_wav(wav, audio, sr)
            save_notes(npz, chart)
            tracks.append({
                "track_id": tid, "audio_file": wav, "notes_file": npz,
                "program_list": sorted({n.program for n in chart if not n.is_drum}),
                "is_drum": any(n.is_drum for n in chart),
                "duration": duration,
            })
        idx = os.path.join(root, "yourmt3_indexes",
                           f"{dataset_name}_{split}_file_list.json")
        write_file_list(idx, tracks, dataset_name, split)
        out[split] = idx
    return out
