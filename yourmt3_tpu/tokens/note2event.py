"""Notes → MT3 event stream serialization, with tie handling.

Capability parity target: reference `utils/note2event.py` (SURVEY.md C6):
`note2note_event`, `note_event2event`, segment slicing with tie-note state
carried across 2.048 s boundaries, `mix_notes`.

Serialization convention (MT3 family):
- time is quantized to codec ticks (10 ms); a ``shift`` token carries the
  ABSOLUTE tick position within the segment and is emitted once per
  occupied tick, monotonically increasing;
- ``program`` and ``velocity`` are *state* events, emitted only on change;
- a pitched onset is ``[program?][velocity?][pitch]``; a pitched offset is
  the same with velocity 0; a drum hit is ``[velocity?][drum]`` (drums have
  no program and no offsets);
- each segment starts with a tie section declaring every pitched note still
  sounding from before the segment: ``[program?][pitch]*`` then ``tie``;
- intra-tick ordering: offsets before onsets, then program asc, pitched
  before drums, then pitch asc (Note.position_key).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .codec import EventCodec
from .dataclasses import Event, Note, NoteEvent


def note2note_event(notes: Sequence[Note], sort: bool = True) -> List[NoteEvent]:
    """Explode notes into onset/offset point events (drums: onset only)."""
    events: List[NoteEvent] = []
    for n in notes:
        events.append(NoteEvent(is_drum=n.is_drum, program=n.program, time=n.onset,
                                velocity=max(1, n.velocity), pitch=n.pitch))
        if not n.is_drum:
            events.append(NoteEvent(is_drum=False, program=n.program, time=n.offset,
                                    velocity=0, pitch=n.pitch))
    if sort:
        events.sort(key=lambda e: (e.time, *e.position_key()))
    return events


def mix_notes(note_lists: Sequence[Sequence[Note]], sort: bool = True,
              trim_overlap: bool = True) -> List[Note]:
    """Merge stem note lists into one mixture (reference `mix_notes`).

    With ``trim_overlap``, same-(program,pitch) overlapping notes are merged
    so the mixture is a valid monophonic-per-pitch stream per instrument.
    """
    merged: List[Note] = [Note(n.is_drum, n.program, n.onset, n.offset, n.pitch,
                               n.velocity) for lst in note_lists for n in lst]
    merged.sort(key=lambda n: (n.is_drum, n.program, n.pitch, n.onset, n.offset))
    if trim_overlap:
        out: List[Note] = []
        for n in merged:
            if out:
                p = out[-1]
                if (p.is_drum == n.is_drum and p.program == n.program
                        and p.pitch == n.pitch and n.onset < p.offset and not n.is_drum):
                    p.offset = max(p.offset, n.offset)
                    continue
            out.append(n)
        merged = out
    if sort:
        merged.sort(key=lambda n: (n.onset, n.is_drum, n.program, n.pitch))
    return merged


def slice_notes_to_segment(
    notes: Sequence[Note], start: float, end: float
) -> Tuple[List[Note], List[NoteEvent]]:
    """One segment's (tie_notes, point events), times still absolute.

    - tie notes: pitched notes with onset < start and offset > start;
    - events: onsets in [start, end) and offsets in [start, end) of notes
      that began at or before the offset (offsets exactly at ``end`` or
      later belong to a later segment — the note appears in its tie
      section instead).
    """
    ties: List[Note] = []
    events: List[NoteEvent] = []
    for n in notes:
        if n.onset >= end:
            continue
        if not n.is_drum and n.onset < start < n.offset:
            ties.append(n)
        if start <= n.onset < end:
            events.append(NoteEvent(n.is_drum, n.program, n.onset,
                                    max(1, n.velocity), n.pitch))
        if not n.is_drum and start <= n.offset < end and n.onset < n.offset:
            events.append(NoteEvent(False, n.program, n.offset, 0, n.pitch))
        elif not n.is_drum and n.onset == n.offset and start <= n.onset < end:
            # zero-length note: still emit the offset so it closes
            events.append(NoteEvent(False, n.program, n.offset, 0, n.pitch))
    events.sort(key=lambda e: (e.time, *e.position_key()))
    ties.sort(key=lambda n: (n.program, n.pitch))
    return ties, events


def slice_multiple_note_events_and_ties_to_bundle(
    notes: Sequence[Note], start_times: Sequence[float], duration: float
) -> List[Tuple[List[Note], List[NoteEvent]]]:
    """Per-segment (ties, events) for a batch of segment start times."""
    return [slice_notes_to_segment(notes, s, s + duration) for s in start_times]


def note_event2event(
    note_events: Sequence[NoteEvent],
    tie_note_events: Sequence[Note] = (),
    start_time: float = 0.0,
    codec: Optional[EventCodec] = None,
) -> List[Event]:
    """Serialize one segment: tie section + run-length-encoded event stream.

    ``note_events`` carry absolute times; ``start_time`` is the segment
    origin. No EOS is appended (the tokenizer does that).
    """
    codec = codec or EventCodec()
    out: List[Event] = []

    # --- tie section ---
    cur_program: Optional[int] = None
    for tn in sorted(tie_note_events, key=lambda n: (n.program, n.pitch)):
        if tn.program != cur_program:
            out.append(Event("program", tn.program))
            cur_program = tn.program
        out.append(Event("pitch", tn.pitch))
    out.append(Event("tie", 0))

    # --- event stream ---
    cur_program = None
    cur_velocity: Optional[int] = None
    cur_step = -1
    evs = sorted(
        note_events,
        key=lambda e: (codec.time_to_step(e.time - start_time), *e.position_key()),
    )
    for e in evs:
        step = codec.time_to_step(e.time - start_time)
        step = min(max(step, 0), codec.max_shift_steps)
        if step > cur_step:
            out.append(Event("shift", step))
            cur_step = step
        vbin = codec.velocity_to_bin(e.velocity)
        if e.is_drum:
            if vbin != cur_velocity:
                out.append(Event("velocity", vbin))
                cur_velocity = vbin
            out.append(Event("drum", e.pitch))
        else:
            if e.program != cur_program:
                out.append(Event("program", e.program))
                cur_program = e.program
            if vbin != cur_velocity:
                out.append(Event("velocity", vbin))
                cur_velocity = vbin
            out.append(Event("pitch", e.pitch))
    return out


def notes_to_segment_events(
    notes: Sequence[Note], start: float, duration: float,
    codec: Optional[EventCodec] = None,
) -> List[Event]:
    """Convenience: slice + serialize one segment from full-song notes."""
    ties, evs = slice_notes_to_segment(notes, start, start + duration)
    return note_event2event(evs, ties, start, codec)


def validate_notes(notes: Sequence[Note], fix: bool = True) -> List[Note]:
    """Clamp pitch/velocity/time ranges; drop irreparable notes."""
    out: List[Note] = []
    for n in notes:
        if not (0 <= n.pitch <= 127):
            if not fix:
                raise ValueError(f"pitch {n.pitch} out of range")
            continue
        v = min(max(int(n.velocity), 1), 127)
        onset = max(0.0, float(n.onset))
        offset = max(onset, float(n.offset))
        out.append(Note(n.is_drum, int(n.program) & 0xFF, onset, offset, n.pitch, v))
    return out
