"""Instrument vocabularies: program → class maps.

Capability parity target: reference `config/vocabulary.py` (SURVEY.md C3).
These drive (a) how program numbers are remapped before tokenization,
(b) how the multi-channel decoder groups instruments into channels, and
(c) how evaluation groups predictions for multi-instrument F1.

A vocabulary is an ordered list of named classes; each class owns a set of
General-MIDI program numbers. Program 128 is reserved internally for the
drum "program" and 100 is the YourMT3 convention for singing voice.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

NUM_PROGRAMS = 128
DRUM_PROGRAM = 128  # internal pseudo-program for drums
SINGING_PROGRAM = 100  # YourMT3 convention: vocals ride GM program 100


@dataclasses.dataclass(frozen=True)
class InstrumentClass:
    name: str
    programs: Tuple[int, ...]  # GM programs owned by this class

    @property
    def canonical_program(self) -> int:
        return self.programs[0]


@dataclasses.dataclass(frozen=True)
class InstrumentVocabulary:
    """Ordered instrument-class grouping over GM programs."""

    name: str
    classes: Tuple[InstrumentClass, ...]
    has_drums: bool = True

    def program_to_class_array(self) -> np.ndarray:
        """(129,) int array: program (incl. DRUM_PROGRAM) → class index, -1 if unmapped."""
        arr = np.full(NUM_PROGRAMS + 1, -1, dtype=np.int32)
        for idx, cls in enumerate(self.classes):
            for p in cls.programs:
                arr[p] = idx
        if self.has_drums:
            arr[DRUM_PROGRAM] = len(self.classes)
        return arr

    def program_to_canonical_array(self) -> np.ndarray:
        """(129,) int array: program → canonical program of its class (-1 unmapped)."""
        arr = np.full(NUM_PROGRAMS + 1, -1, dtype=np.int32)
        for cls in self.classes:
            for p in cls.programs:
                arr[p] = cls.canonical_program
        if self.has_drums:
            arr[DRUM_PROGRAM] = DRUM_PROGRAM
        return arr

    @property
    def num_classes(self) -> int:
        """Instrument classes + 1 drum class if present."""
        return len(self.classes) + (1 if self.has_drums else 0)

    def class_names(self) -> List[str]:
        names = [c.name for c in self.classes]
        if self.has_drums:
            names.append("Drums")
        return names


def _rng(a: int, b: int) -> Tuple[int, ...]:
    """Inclusive program range."""
    return tuple(range(a, b + 1))


# --- Full GM: every program is its own class (128 classes + drums) ---------
GM_FULL = InstrumentVocabulary(
    name="gm_full",
    classes=tuple(InstrumentClass(f"program_{p}", (p,)) for p in range(NUM_PROGRAMS)),
)

# --- MT3-style full grouping: Slakh redux classes ---------------------------
# 34 classes mirroring the MT3/Slakh "program-level" grouping the reference's
# MT3_FULL vocabulary uses: fine-grained within common bands, coarse in the
# synth/effect tail.
MT3_FULL = InstrumentVocabulary(
    name="mt3_full",
    classes=(
        InstrumentClass("Acoustic Piano", _rng(0, 3)),
        InstrumentClass("Electric Piano", _rng(4, 5)),
        InstrumentClass("Harpsichord", (6,)),
        InstrumentClass("Clavinet", (7,)),
        InstrumentClass("Celesta", _rng(8, 15)),
        InstrumentClass("Organ", _rng(16, 23)),
        InstrumentClass("Acoustic Guitar", _rng(24, 25)),
        InstrumentClass("Clean Electric Guitar", _rng(26, 28)),
        InstrumentClass("Distorted Electric Guitar", _rng(29, 31)),
        InstrumentClass("Acoustic Bass", _rng(32, 33)),
        InstrumentClass("Electric Bass", _rng(34, 39)),
        InstrumentClass("Violin", (40,)),
        InstrumentClass("Viola", (41,)),
        InstrumentClass("Cello", (42,)),
        InstrumentClass("Contrabass", (43,)),
        InstrumentClass("Orchestral Harp", (46,)),
        InstrumentClass("Timpani", (47,)),
        InstrumentClass("String Ensemble", (48, 49, 44, 45)),
        InstrumentClass("Synth Strings", (50, 51)),
        InstrumentClass("Choir and Voice", (52, 53, 54)),
        InstrumentClass("Orchestra Hit", (55,)),
        InstrumentClass("Trumpet", (56, 59)),
        InstrumentClass("Trombone", (57,)),
        InstrumentClass("Tuba", (58,)),
        InstrumentClass("French Horn", (60,)),
        InstrumentClass("Brass Section", (61, 62, 63)),
        InstrumentClass("Soprano/Alto Sax", (64, 65)),
        InstrumentClass("Tenor Sax", (66,)),
        InstrumentClass("Baritone Sax", (67,)),
        InstrumentClass("Oboe", (68,)),
        InstrumentClass("English Horn", (69,)),
        InstrumentClass("Bassoon", (70,)),
        InstrumentClass("Clarinet", (71,)),
        InstrumentClass("Pipe", _rng(72, 79)),
        InstrumentClass("Synth Lead", _rng(80, 87)),
        InstrumentClass("Synth Pad", _rng(88, 95)),
    ),
)

# --- Coarse GM instrument classes (the multi-channel decoder grouping) -----
# 12 pitched classes + singing + drums ⇒ matches the YourMT3+ multi-channel
# decoder's ~13 channel setup (SURVEY.md §3.5).
GM_INSTR_CLASS = InstrumentVocabulary(
    name="gm_instr_class",
    classes=(
        InstrumentClass("Piano", _rng(0, 7)),
        InstrumentClass("Chromatic Percussion", _rng(8, 15)),
        InstrumentClass("Organ", _rng(16, 23)),
        InstrumentClass("Guitar", _rng(24, 31)),
        InstrumentClass("Bass", _rng(32, 39)),
        InstrumentClass("Strings", _rng(40, 55)),
        InstrumentClass("Brass", _rng(56, 63)),
        InstrumentClass("Reed", _rng(64, 71)),
        InstrumentClass("Pipe", _rng(72, 79)),
        InstrumentClass("Synth Lead", _rng(80, 87)),
        InstrumentClass("Synth Pad", _rng(88, 95)),
        InstrumentClass("Other", tuple(range(96, 100)) + tuple(range(101, 128))),
        InstrumentClass("Singing Voice", (SINGING_PROGRAM,)),
    ),
)

# Extended variant with singing split into lead/chorus style groups — mirrors
# the reference's *_PLUS vocabularies used by `mt3_full_plus` tasks.
GM_INSTR_CLASS_PLUS = GM_INSTR_CLASS

# --- 13-channel grouping for the multi-channel decoder ----------------------
# 12 pitched classes (synth/effect tail folded into Synth Pad) + drums = 13
# decoding channels, matching the YourMT3+ multi-channel decoder setup
# (SURVEY.md §3.5: "≈13 channels for mt3_full_plus").
GM_INSTR_CLASS_MC12 = InstrumentVocabulary(
    name="gm_instr_class_mc12",
    classes=(
        InstrumentClass("Piano", _rng(0, 7)),
        InstrumentClass("Chromatic Percussion", _rng(8, 15)),
        InstrumentClass("Organ", _rng(16, 23)),
        InstrumentClass("Guitar", _rng(24, 31)),
        InstrumentClass("Bass", _rng(32, 39)),
        InstrumentClass("Strings", _rng(40, 55)),
        InstrumentClass("Brass", _rng(56, 63)),
        InstrumentClass("Reed", _rng(64, 71)),
        InstrumentClass("Pipe", _rng(72, 79)),
        InstrumentClass("Synth Lead", _rng(80, 87)),
        InstrumentClass("Synth Pad",
                        tuple(range(88, 100)) + tuple(range(101, 128))),
        InstrumentClass("Singing Voice", (SINGING_PROGRAM,)),
    ),
)

# --- Solo presets -----------------------------------------------------------
PIANO_SOLO = InstrumentVocabulary(
    name="piano_solo",
    classes=(InstrumentClass("Piano", _rng(0, 127)),),
    has_drums=False,
)

GUITAR_SOLO = InstrumentVocabulary(
    name="guitar_solo",
    classes=(InstrumentClass("Guitar", _rng(0, 127)),),
    has_drums=False,
)

SINGING_SOLO = InstrumentVocabulary(
    name="singing_solo",
    classes=(InstrumentClass("Singing Voice", _rng(0, 127)),),
    has_drums=False,
)

BASS_SOLO = InstrumentVocabulary(
    name="bass_solo",
    classes=(InstrumentClass("Bass", _rng(0, 127)),),
    has_drums=False,
)

DRUMS_ONLY = InstrumentVocabulary(
    name="drums_only",
    classes=(),
    has_drums=True,
)

# --- Dataset-specific eval groupings (SURVEY.md C27) ------------------------
# URMP: 13 classical instruments, each its own eval class — the
# multi-instrument-transcription leaderboard the reference tracks
# (`/root/reference/README.md:1` badge) scores per-instrument F1.
URMP_INSTR = InstrumentVocabulary(
    name="urmp_instr",
    classes=(
        InstrumentClass("Violin", (40,)),
        InstrumentClass("Viola", (41,)),
        InstrumentClass("Cello", (42,)),
        InstrumentClass("Double Bass", (43,)),
        InstrumentClass("Flute", (72, 73, 74, 75)),
        InstrumentClass("Oboe", (68, 69)),
        InstrumentClass("Clarinet", (71,)),
        InstrumentClass("Bassoon", (70,)),
        InstrumentClass("Saxophone", (64, 65, 66, 67)),
        InstrumentClass("Trumpet", (56, 59)),
        InstrumentClass("Horn", (60,)),
        InstrumentClass("Trombone", (57,)),
        InstrumentClass("Tuba", (58,)),
    ),
    has_drums=False,
)

# MusicNet: chamber-music instruments (piano + strings + winds); per-
# instrument classes reconstructed from the dataset's GM annotation
# ([recon] — reference `config/vocabulary.py` MUSICNET grouping).
MUSICNET_INSTR = InstrumentVocabulary(
    name="musicnet_instr",
    classes=(
        InstrumentClass("Piano", _rng(0, 7)),  # incl. harpsichord (6)
        InstrumentClass("Violin", (40,)),
        InstrumentClass("Viola", (41,)),
        InstrumentClass("Cello", (42,)),
        InstrumentClass("Contrabass", (43,)),
        InstrumentClass("Horn", (60,)),
        InstrumentClass("Oboe", (68, 69)),
        InstrumentClass("Bassoon", (70,)),
        InstrumentClass("Clarinet", (71,)),
        InstrumentClass("Flute", (72, 73, 74, 75)),
    ),
    has_drums=False,
)

PROGRAM_VOCABULARIES: Dict[str, InstrumentVocabulary] = {
    v.name: v
    for v in (
        GM_FULL,
        MT3_FULL,
        GM_INSTR_CLASS,
        GM_INSTR_CLASS_MC12,
        PIANO_SOLO,
        GUITAR_SOLO,
        SINGING_SOLO,
        BASS_SOLO,
        DRUMS_ONLY,
        URMP_INSTR,
        MUSICNET_INSTR,
    )
}


# --- Drum-note vocabularies -------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DrumVocabulary:
    """GM drum-note → drum-class map (for DTM decoding/eval)."""

    name: str
    classes: Tuple[Tuple[str, Tuple[int, ...]], ...]

    def note_to_class_array(self) -> np.ndarray:
        arr = np.full(NUM_PROGRAMS, -1, dtype=np.int32)
        for idx, (_, notes) in enumerate(self.classes):
            for n in notes:
                arr[n] = idx
        return arr

    def note_to_canonical_array(self) -> np.ndarray:
        arr = np.full(NUM_PROGRAMS, -1, dtype=np.int32)
        for _, notes in self.classes:
            for n in notes:
                arr[n] = notes[0]
        return arr

    @property
    def num_classes(self) -> int:
        return len(self.classes)


# Full GM percussion map (identity).
GM_DRUM_FULL = DrumVocabulary(
    name="gm_drum_full",
    classes=tuple((f"drum_{n}", (n,)) for n in range(35, 82)),
)

# ENST-Drums-style 3-class vocabulary (kick / snare / hi-hat) used for the
# reference's `enstdrums_dtp` tasks.
KICK_SNARE_HIHAT = DrumVocabulary(
    name="ksh",
    classes=(
        ("Kick", (35, 36)),
        ("Snare", (38, 40, 37)),
        ("Hi-Hat", (42, 44, 46)),
    ),
)

# 8-class general drum vocabulary (e-GMD style) for full-kit DTM.
GM_DRUM_8CLASS = DrumVocabulary(
    name="gm_drum_8class",
    classes=(
        ("Kick", (36, 35)),
        ("Snare", (38, 40, 37)),
        ("Hi-Hat", (42, 44, 46, 22, 26)),
        ("Tom", (41, 43, 45, 47, 48, 50, 58)),
        ("Crash", (49, 52, 55, 57)),
        ("Ride", (51, 53, 59)),
        ("Cowbell/Clave", (54, 56, 75, 76, 77)),
        ("Other Percussion", tuple(range(60, 75)) + tuple(range(78, 82)) + (39,)),
    ),
)

DRUM_VOCABULARIES: Dict[str, DrumVocabulary] = {
    v.name: v for v in (GM_DRUM_FULL, KICK_SNARE_HIHAT, GM_DRUM_8CLASS)
}
