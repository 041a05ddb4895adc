"""Event/NoteEvent tokenizers: Event streams → fixed-length id arrays.

Capability parity target: reference `utils/tokenizer.py` (SURVEY.md C9):
`EventTokenizer`, `NoteEventTokenizer` (note_events → padded id arrays,
max_length 1024 single-channel / 256 per channel multi-channel).

Layout of an encoded segment stream:
    [subtask prefix?] [tie-section events] tie [stream events] EOS PAD*
Truncation keeps the stream a valid prefix (never splits a note event
group mid-way is NOT guaranteed by the reference either; we truncate at a
whole-Event boundary and always terminate with EOS).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .codec import EOS_ID, PAD_ID, EventCodec
from .dataclasses import Event, Note, NoteEvent
from .event2note import DecodeErrors, event2note_event, ids_to_events
from .note2event import note_event2event, slice_notes_to_segment


class EventTokenizer:
    """Stateless Event ↔ id mapping over a codec."""

    def __init__(self, codec: EventCodec):
        self.codec = codec

    def encode(self, events: Sequence[Event]) -> np.ndarray:
        return self.codec.encode_events(events)

    def decode(self, ids: np.ndarray) -> List[Event]:
        return ids_to_events(np.asarray(ids), self.codec)


class NoteEventTokenizer(EventTokenizer):
    """Segment note events → padded token ids (and back to notes)."""

    def __init__(self, codec: EventCodec, max_length: int = 1024):
        super().__init__(codec)
        self.max_length = max_length

    def encode_segment(
        self,
        note_events: Sequence[NoteEvent],
        tie_notes: Sequence[Note] = (),
        start_time: float = 0.0,
        prefix_ids: Sequence[int] = (),
    ) -> np.ndarray:
        events = note_event2event(note_events, tie_notes, start_time, self.codec)
        ids = list(prefix_ids) + self.codec.encode_events(events).tolist()
        ids = ids[: self.max_length - 1] + [EOS_ID]
        ids += [PAD_ID] * (self.max_length - len(ids))
        return np.asarray(ids, dtype=np.int32)

    def encode_notes_segment(
        self,
        notes: Sequence[Note],
        start_time: float,
        segment_seconds: Optional[float] = None,
        prefix_ids: Sequence[int] = (),
    ) -> np.ndarray:
        dur = segment_seconds if segment_seconds is not None else self.codec.segment_seconds
        ties, evs = slice_notes_to_segment(notes, start_time, start_time + dur)
        return self.encode_segment(evs, ties, start_time, prefix_ids)

    def decode_segment(self, ids: np.ndarray, start_time: float = 0.0
                       ) -> Tuple[List[Note], DecodeErrors]:
        return event2note_event(self.decode(ids), start_time, self.codec)
