"""Task registry: token space + decoding-channel layout per task.

Capability parity target: reference `config/task.py` (SURVEY.md C2).
A task binds: the training program/drum vocabularies (which remap GM
programs before tokenization), the eval vocabularies (which group
predictions for multi-instrument F1), optional task-conditioning tokens
(decoder prefix), and the decoding-channel layout (1 for single-stream
MT3, N for the multi-channel decoder).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from . import vocabulary as voc


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    name: str
    program_vocab: voc.InstrumentVocabulary
    drum_vocab: voc.DrumVocabulary
    eval_program_vocab: Optional[voc.InstrumentVocabulary] = None
    eval_drum_vocab: Optional[voc.DrumVocabulary] = None
    # decoder-prefix conditioning tokens; () ⇒ unconditioned
    subtask_tokens: Tuple[str, ...] = ()
    # which subtask token eval uses by default
    default_subtask: Optional[str] = None
    num_decoding_channels: int = 1
    max_token_length: int = 1024  # single-channel stream length
    max_token_length_per_channel: int = 256  # used when channels > 1
    # remap programs to the class-canonical program before tokenization
    canonicalize_programs: bool = True
    binarize_velocity: bool = True

    @property
    def num_velocity_bins(self) -> int:
        return 1 if self.binarize_velocity else 127

    @property
    def effective_max_length(self) -> int:
        return (self.max_token_length if self.num_decoding_channels == 1
                else self.max_token_length_per_channel)


TASKS: Dict[str, TaskConfig] = {}


def _register(t: TaskConfig) -> TaskConfig:
    TASKS[t.name] = t
    return t


# Single-stream MT3 over full GM programs (reference `mt3_midi`).
MT3_MIDI = _register(TaskConfig(
    name="mt3_midi",
    program_vocab=voc.GM_FULL,
    drum_vocab=voc.GM_DRUM_FULL,
    canonicalize_programs=False,
))

# Single-stream MT3 with MT3_FULL grouping + singing + task tokens
# (reference `mt3_full_plus`).
MT3_FULL_PLUS = _register(TaskConfig(
    name="mt3_full_plus",
    program_vocab=voc.MT3_FULL,
    drum_vocab=voc.GM_DRUM_8CLASS,
    subtask_tokens=("transcribe_all", "transcribe_drum"),
    default_subtask="transcribe_all",
))

# Multi-channel flagship (reference `mc13_full_plus_256`): 13 decoding
# channels = 12 pitched classes + drums, 256 tokens per channel.
MC13_FULL_PLUS_256 = _register(TaskConfig(
    name="mc13_full_plus_256",
    program_vocab=voc.GM_INSTR_CLASS_MC12,
    drum_vocab=voc.GM_DRUM_8CLASS,
    num_decoding_channels=voc.GM_INSTR_CLASS_MC12.num_classes,  # 13
    max_token_length_per_channel=256,
))

# Piano-solo task (MAESTRO).
PIANO_SOLO_TASK = _register(TaskConfig(
    name="piano_solo",
    program_vocab=voc.PIANO_SOLO,
    drum_vocab=voc.GM_DRUM_FULL,
))

# Drum transcription (ENST-Drums DTP/DTM, e-GMD).
DRUM_TASK = _register(TaskConfig(
    name="drums_only",
    program_vocab=voc.DRUMS_ONLY,
    drum_vocab=voc.GM_DRUM_8CLASS,
))

# Short-sequence variant of mt3_full_plus: 256-token labels. Right-sized
# for sparse material (and ~4× faster teacher-forcing/compile); the
# reference's 1024 cap exists for dense pro piano, not the common case.
MT3_FULL_PLUS_256 = _register(TaskConfig(
    name="mt3_full_plus_256",
    program_vocab=voc.MT3_FULL,
    drum_vocab=voc.GM_DRUM_8CLASS,
    subtask_tokens=("transcribe_all", "transcribe_drum"),
    default_subtask="transcribe_all",
    max_token_length=256,
))

# Singing-voice transcription (MIR-ST500 / CMedia style, reference exc_v2
# lineage: separate subtask tokens for melody vs accompaniment).
SINGING_V1 = _register(TaskConfig(
    name="singing_v1",
    program_vocab=voc.GM_INSTR_CLASS,
    drum_vocab=voc.GM_DRUM_8CLASS,
    subtask_tokens=("transcribe_all", "transcribe_singing"),
    default_subtask="transcribe_all",
))


def get_task(name: str) -> TaskConfig:
    try:
        return TASKS[name]
    except KeyError:
        raise KeyError(f"unknown task {name!r}; known: {sorted(TASKS)}") from None
