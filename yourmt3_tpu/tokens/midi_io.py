"""Standard MIDI File I/O, first-party (no mido/pretty_midi in this stack).

Capability parity target: reference `utils/midi.py` (SURVEY.md C10):
`midi2note` (tempo map, per-track program inference, drum channel 10,
optional sustain-pedal extension) and `note_event2midi` (multi-track SMF
writer). Pure Python + struct; MIDI parsing is host-side and cold-path.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

from .dataclasses import Note
from .note2event import validate_notes

DRUM_CHANNEL = 9  # 0-indexed channel 10
DRUM_PROGRAM = 128
DEFAULT_TEMPO = 500000  # µs per quarter (120 BPM)


# ---------------------------------------------------------------------------
# Low-level SMF parsing
# ---------------------------------------------------------------------------

def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    value = 0
    while True:
        b = data[pos]
        pos += 1
        value = (value << 7) | (b & 0x7F)
        if not b & 0x80:
            return value, pos


def _write_varint(value: int) -> bytes:
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(out))


class MidiEvent:
    __slots__ = ("tick", "status", "data", "meta_type")

    def __init__(self, tick: int, status: int, data: bytes, meta_type: int = -1):
        self.tick = tick
        self.status = status
        self.data = data
        self.meta_type = meta_type


def _parse_track(data: bytes) -> List[MidiEvent]:
    events: List[MidiEvent] = []
    pos, tick, running = 0, 0, 0
    while pos < len(data):
        delta, pos = _read_varint(data, pos)
        tick += delta
        status = data[pos]
        if status & 0x80:
            pos += 1
            if status < 0xF0:
                running = status
        else:
            status = running  # running status
        if status == 0xFF:  # meta
            meta_type = data[pos]
            pos += 1
            length, pos = _read_varint(data, pos)
            events.append(MidiEvent(tick, status, data[pos:pos + length], meta_type))
            pos += length
            if meta_type == 0x2F:
                break
        elif status in (0xF0, 0xF7):  # sysex
            length, pos = _read_varint(data, pos)
            pos += length
        else:
            kind = status & 0xF0
            nbytes = 1 if kind in (0xC0, 0xD0) else 2
            events.append(MidiEvent(tick, status, data[pos:pos + nbytes]))
            pos += nbytes
    return events


def parse_midi_file(path: str) -> Tuple[int, List[List[MidiEvent]]]:
    """→ (division, tracks). Raises on malformed header."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:4] != b"MThd":
        raise ValueError(f"{path}: not a standard MIDI file")
    hlen = struct.unpack(">I", blob[4:8])[0]
    _fmt, ntrks, division = struct.unpack(">HHH", blob[8:14])
    pos = 8 + hlen
    tracks: List[List[MidiEvent]] = []
    for _ in range(ntrks):
        if blob[pos:pos + 4] != b"MTrk":
            # skip unknown chunk
            clen = struct.unpack(">I", blob[pos + 4:pos + 8])[0]
            pos += 8 + clen
            continue
        clen = struct.unpack(">I", blob[pos + 4:pos + 8])[0]
        tracks.append(_parse_track(blob[pos + 8:pos + 8 + clen]))
        pos += 8 + clen
    return division, tracks


def _tempo_map(tracks: List[List[MidiEvent]]) -> List[Tuple[int, int]]:
    """Sorted (tick, µs/quarter) changes, always starting at tick 0."""
    changes = [(0, DEFAULT_TEMPO)]
    for tr in tracks:
        for e in tr:
            if e.status == 0xFF and e.meta_type == 0x51 and len(e.data) == 3:
                us = (e.data[0] << 16) | (e.data[1] << 8) | e.data[2]
                changes.append((e.tick, us))
    changes.sort()
    return changes


class _TickClock:
    """tick → seconds under a tempo map."""

    def __init__(self, division: int, tempo_changes: List[Tuple[int, int]]):
        if division & 0x8000:  # SMPTE
            fps = 256 - (division >> 8)
            tpf = division & 0xFF
            self._smpte_sec_per_tick = 1.0 / (fps * tpf)
            self._segments = None
        else:
            self._smpte_sec_per_tick = None
            segs: List[Tuple[int, float, float]] = []  # (tick, sec_at_tick, sec_per_tick)
            t_sec = 0.0
            prev_tick, prev_us = 0, DEFAULT_TEMPO
            for tick, us in tempo_changes:
                t_sec += (tick - prev_tick) * prev_us / (1e6 * division)
                segs.append((tick, t_sec, us / (1e6 * division)))
                prev_tick, prev_us = tick, us
            if not segs or segs[0][0] != 0:
                segs.insert(0, (0, 0.0, DEFAULT_TEMPO / (1e6 * division)))
            self._segments = segs

    def seconds(self, tick: int) -> float:
        if self._smpte_sec_per_tick is not None:
            return tick * self._smpte_sec_per_tick
        lo, hi = 0, len(self._segments) - 1
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if self._segments[mid][0] <= tick:
                lo = mid
            else:
                hi = mid - 1
        t0, s0, spt = self._segments[lo]
        return s0 + (tick - t0) * spt


# ---------------------------------------------------------------------------
# midi2note
# ---------------------------------------------------------------------------

def midi2note(
    path: str,
    apply_sustain_pedal: bool = True,
    default_program: int = 0,
    force_program: Optional[int] = None,
    force_all_drums: bool = False,
    binarize_velocity: bool = False,
) -> List[Note]:
    """Parse an SMF into a flat Note list (times in seconds).

    Mirrors the reference's semantics: channel 10 → drums; per-channel
    program state from program_change; sustain pedal (CC64) extends note
    offsets while held; note_on velocity 0 ≡ note_off.
    """
    division, tracks = parse_midi_file(path)
    clock = _TickClock(division, _tempo_map(tracks))
    notes: List[Note] = []
    for tr in tracks:
        program: Dict[int, int] = {}
        active: Dict[Tuple[int, int], List[Tuple[float, int]]] = {}
        sustain: Dict[int, bool] = {}
        pending: Dict[int, List[Tuple[float, int, int, int]]] = {}  # ch → [(onset,pitch,vel,prog)]

        def close(ch: int, pitch: int, t: float) -> None:
            stack = active.get((ch, pitch))
            if not stack:
                return
            onset, vel = stack.pop(0)
            prog = program.get(ch, default_program)
            if force_program is not None:
                prog = force_program
            is_drum = force_all_drums or ch == DRUM_CHANNEL
            v = 100 if binarize_velocity else vel
            notes.append(Note(is_drum, DRUM_PROGRAM if is_drum else prog,
                              onset, t, pitch, v))

        for e in sorted(tr, key=lambda e: e.tick):
            if e.status == 0xFF:
                continue
            kind, ch = e.status & 0xF0, e.status & 0x0F
            t = clock.seconds(e.tick)
            if kind == 0xC0:
                program[ch] = e.data[0]
            elif kind == 0xB0 and e.data[0] == 64 and apply_sustain_pedal:
                down = e.data[1] >= 64
                if sustain.get(ch) and not down:
                    for onset_pitch in pending.pop(ch, []):
                        _onset, pitch, _vel, _prog = onset_pitch
                        close(ch, pitch, t)
                sustain[ch] = down
            elif kind == 0x90 and e.data[1] > 0:
                pitch = e.data[0]
                # re-onset of a sustained-pending pitch closes it first
                if ch in pending:
                    keep = []
                    for item in pending[ch]:
                        if item[1] == pitch:
                            close(ch, pitch, t)
                        else:
                            keep.append(item)
                    pending[ch] = keep
                active.setdefault((ch, pitch), []).append((t, e.data[1]))
            elif kind == 0x80 or (kind == 0x90 and e.data[1] == 0):
                pitch = e.data[0]
                if ch == DRUM_CHANNEL and not force_all_drums:
                    continue  # drum offsets are meaningless
                if apply_sustain_pedal and sustain.get(ch):
                    pending.setdefault(ch, []).append((t, pitch, 0, 0))
                else:
                    close(ch, pitch, t)
        # EOT: close leftovers at their last event time
        end_t = clock.seconds(max((e.tick for e in tr), default=0))
        for ch in list(pending.keys()):
            for _onset, pitch, _v, _p in pending.pop(ch):
                close(ch, pitch, end_t)
        for (ch, pitch), stack in list(active.items()):
            while stack:
                close(ch, pitch, end_t)

    # drums: point events with fixed tiny duration
    for n in notes:
        if n.is_drum:
            n.offset = n.onset + 0.01
    notes.sort(key=lambda n: (n.onset, n.is_drum, n.program, n.pitch))
    return notes


# ---------------------------------------------------------------------------
# note_event2midi (writer)
# ---------------------------------------------------------------------------

def note_event2midi(notes: Sequence[Note], path: str, tpqn: int = 480,
                    tempo: int = DEFAULT_TEMPO) -> None:
    """Write notes as a format-1 SMF: one track per (program | drums)."""
    notes = validate_notes(notes)
    sec_per_tick = tempo / (1e6 * tpqn)

    def to_tick(t: float) -> int:
        return max(0, int(round(t / sec_per_tick)))

    groups: Dict[int, List[Note]] = {}
    for n in notes:
        groups.setdefault(DRUM_PROGRAM if n.is_drum else n.program, []).append(n)

    chunks: List[bytes] = []
    # tempo track
    t0 = b"\x00" + bytes([0xFF, 0x51, 0x03]) + struct.pack(">I", tempo)[1:]
    t0 += b"\x00" + bytes([0xFF, 0x2F, 0x00])
    chunks.append(b"MTrk" + struct.pack(">I", len(t0)) + t0)

    melodic_channels = [c for c in range(16) if c != DRUM_CHANNEL]
    # channel assignment: with > 15 melodic programs two programs share a
    # channel; channel state is GLOBAL across format-1 tracks, so a single
    # tick-0 program change per track would make shared channels play the
    # last-written program. On shared channels, re-emit the program change
    # before every note-on instead (ADVICE r1; MT3_FULL yields up to 37
    # canonical programs).
    melodic_progs = [p for p in sorted(groups) if p != DRUM_PROGRAM]
    chan_of = {p: melodic_channels[i % len(melodic_channels)]
               for i, p in enumerate(melodic_progs)}
    chan_users: Dict[int, int] = {}
    for p, c in chan_of.items():
        chan_users[c] = chan_users.get(c, 0) + 1

    for prog in sorted(groups):
        if prog == DRUM_PROGRAM:
            ch = DRUM_CHANNEL
            shared = False
        else:
            ch = chan_of[prog]
            shared = chan_users[ch] > 1
        evs: List[Tuple[int, int, bytes]] = []  # (tick, order, msg)
        if prog != DRUM_PROGRAM and not shared:
            evs.append((0, 0, bytes([0xC0 | ch, prog & 0x7F])))
        for n in groups[prog]:
            on, off = to_tick(n.onset), to_tick(n.offset)
            if off <= on:
                off = on + 1
            vel = min(max(int(n.velocity), 1), 127)
            if shared:  # restore this program right before the note-on
                evs.append((on, 2, bytes([0xC0 | ch, prog & 0x7F])))
            evs.append((on, 3, bytes([0x90 | ch, n.pitch & 0x7F, vel])))
            evs.append((off, 1, bytes([0x80 | ch, n.pitch & 0x7F, 0])))
        evs.sort(key=lambda x: (x[0], x[1]))
        body = b""
        last = 0
        for tick, _o, msg in evs:
            body += _write_varint(tick - last) + msg
            last = tick
        body += b"\x00" + bytes([0xFF, 0x2F, 0x00])
        chunks.append(b"MTrk" + struct.pack(">I", len(body)) + body)

    header = b"MThd" + struct.pack(">IHHH", 6, 1, len(chunks), tpqn)
    with open(path, "wb") as f:
        f.write(header + b"".join(chunks))
