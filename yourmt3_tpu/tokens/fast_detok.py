"""Vectorized / on-device detokenization front half.

North-star (BASELINE.json): "MT3 event-token→MIDI detokenization run
on-device". The stateful parts of MT3 detokenization factor cleanly:

1. id → (type, value): table gather                      [device]
2. time state: running max of shift values               [device, cummax]
3. program/velocity state: forward-fill of state events  [device, cummax
   over last-set-position + gather]
4. tie-section split: positions before the first `tie`   [device]
5. onset/offset pairing + cross-segment merge            [host, numpy —
   touches ~10× fewer items than tokens]

`extract_segment_events` runs 1-4 in one jittable function over a whole
(S, C, L) batch; `notes_from_extracted` does 5 with numpy and the same
semantics as tokens/event2note.py (property-tested equal). For big eval
sweeps this replaces the per-token Python walk.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .codec import EventCodec
from .dataclasses import Note
from .event2note import DRUM_OFFSET_TIME, DecodeErrors


def _forward_fill(is_set: jnp.ndarray, values: jnp.ndarray,
                  init) -> jnp.ndarray:
    """Per row: y[i] = values[j] for the last j ≤ i with is_set[j], else
    init (scalar, or (N, 1) array for per-row defaults). Implemented as
    cumulative max over set-positions + gather."""
    L = is_set.shape[-1]
    pos = jnp.where(is_set, jnp.arange(L)[None, :], -1)
    last = jax.lax.cummax(pos, axis=pos.ndim - 1)
    safe = jnp.maximum(last, 0)
    filled = jnp.take_along_axis(values, safe, axis=-1)
    return jnp.where(last >= 0, filled, init)


@functools.partial(jax.jit, static_argnames=("type_ids",))
def _extract(ids: jnp.ndarray, id_to_type: jnp.ndarray,
             id_to_value: jnp.ndarray, type_ids: tuple,
             init_prog: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    (T_PAD, T_EOS, T_SHIFT, T_PITCH, T_VEL, T_TIE, T_PROG, T_DRUM) = type_ids
    V = id_to_type.shape[0]
    flat = ids.reshape(-1, ids.shape[-1])  # (N, L)
    ok = (flat >= 0) & (flat < V)
    safe = jnp.where(ok, flat, 0)
    t = jnp.where(ok, id_to_type[safe], -1)
    v = jnp.where(ok, id_to_value[safe], 0)
    L = flat.shape[-1]
    idx = jnp.arange(L)[None, :]

    # stream ends at first EOS
    is_eos = t == T_EOS
    eos_pos = jnp.min(jnp.where(is_eos, idx, L), axis=-1, keepdims=True)
    live = idx < eos_pos

    # tie section: strictly before the first tie token
    is_tie = (t == T_TIE) & live
    tie_pos = jnp.min(jnp.where(is_tie, idx, L), axis=-1, keepdims=True)
    in_tie = (idx < tie_pos) & live
    in_stream = (idx > tie_pos) & live  # after the tie marker

    # time: running max of shift values within the stream
    is_shift = (t == T_SHIFT) & in_stream
    shift_val = jnp.where(is_shift, v, -1)
    tick = jax.lax.cummax(shift_val, axis=shift_val.ndim - 1)  # -1 until first shift
    # a shift strictly below the running max is nonmonotonic (the slow path
    # counts and skips it; cummax already gives the skip semantics)
    prev_tick = jnp.concatenate(
        [jnp.full_like(tick[:, :1], -1), tick[:, :-1]], axis=-1)
    nonmono = is_shift & (v < prev_tick)

    # init_prog: (N, 1) per-row program default — a multi-channel task's
    # channel-canonical program (see event2note.NoteDecodingState)
    program = _forward_fill((t == T_PROG) & in_stream, v, init_prog)
    vel = _forward_fill((t == T_VEL) & in_stream, v, 1)

    is_pitch = (t == T_PITCH) & in_stream
    is_drum = (t == T_DRUM) & in_stream
    tie_prog = _forward_fill((t == T_PROG) & in_tie, v, init_prog)
    is_tie_pitch = (t == T_PITCH) & in_tie

    return {
        "tick": tick, "program": program, "velocity": vel,
        "is_pitch": is_pitch, "is_drum_hit": is_drum, "value": v,
        "tie_program": tie_prog, "is_tie_pitch": is_tie_pitch,
        "nonmono": nonmono,
        "raw_type": t,
    }


class FastDetokenizer:
    """Batched (S, C, L) ids → merged notes, device front half."""

    def __init__(self, codec: Optional[EventCodec] = None):
        self.codec = codec or EventCodec()
        tbl = self.codec.decode_tables()
        self._id_to_type = jnp.asarray(tbl["id_to_type"])
        self._id_to_value = jnp.asarray(tbl["id_to_value"])
        ti = self.codec.type_index
        self._type_ids = (ti["pad"], ti["eos"], ti["shift"], ti["pitch"],
                          ti["velocity"], ti["tie"], ti["program"], ti["drum"])

    def extract(self, ids: np.ndarray,
                row_default_programs: Optional[np.ndarray] = None
                ) -> Dict[str, np.ndarray]:
        # Rows (streams) are independent, so pad the flat row count up to a
        # power-of-two bucket: _extract's jit cache then hits across songs
        # of any segment count (compiles are log-bounded per L). Without
        # this, EVERY new song length recompiled the extract program
        # (~3 s — more than the flagship's device decode of a 2-min song).
        ids = np.asarray(ids)
        L = ids.shape[-1]
        flat = ids.reshape(-1, L)  # rows stay (s*C + c) flat, as before
        n = flat.shape[0]
        padded = 64
        while padded < n:
            padded *= 2
        if padded != n:
            flat = np.concatenate(
                [flat, np.zeros((padded - n, L), flat.dtype)])
        if row_default_programs is None:
            init = np.zeros((padded, 1), np.int32)
        else:
            init = np.zeros((padded,), np.int32)
            init[:n] = np.asarray(row_default_programs, np.int32)
            init = init[:, None]
        out = _extract(jnp.asarray(flat), self._id_to_type,
                       self._id_to_value, self._type_ids, jnp.asarray(init))
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    # ------------------------------------------------------------------
    def detokenize_song(self, segment_ids: np.ndarray,
                        start_times: Sequence[float],
                        default_programs: Optional[Sequence[int]] = None
                        ) -> Tuple[List[Note], DecodeErrors]:
        """(S, C, L) → notes; same semantics as TaskManager.detokenize_song.

        Channels are independent streams; each channel's segments merge
        through one NoteDecodingState fed with PRE-EXTRACTED arrays (no
        per-token Python objects). ``default_programs[c]`` seeds channel
        c's program state (see event2note.NoteDecodingState).
        """
        segment_ids = np.asarray(segment_ids)
        if segment_ids.ndim == 2:
            segment_ids = segment_ids[:, None, :]
        S, C, L = segment_ids.shape
        row_defaults = None
        if default_programs is not None:
            row_defaults = np.tile(
                np.asarray(default_programs, np.int32), S)  # rows = s*C + c
        ex = self.extract(segment_ids, row_defaults)  # rows are (s*C + c)
        codec = self.codec
        sps = codec.steps_per_second
        all_notes: List[Note] = []
        errors = DecodeErrors()
        order = np.argsort(np.asarray(start_times))
        for c in range(C):
            state = _FastMergeState(codec)
            for s in order:
                r = s * C + c
                t0 = float(start_times[s])
                ties = [(int(p), int(v)) for p, v in zip(
                    ex["tie_program"][r][ex["is_tie_pitch"][r]],
                    ex["value"][r][ex["is_tie_pitch"][r]])]
                events, n_dropped = _segment_event_rows(ex, r, t0, sps)
                errors.dropped_events += n_dropped
                errors.nonmonotonic_shifts += int(ex["nonmono"][r].sum())
                state.process(ties, events, t0)
            notes, err = state.finish()
            all_notes.extend(notes)
            errors.add(err)
        all_notes.sort(key=lambda n: (n.onset, n.is_drum, n.program, n.pitch))
        return all_notes, errors


def _segment_event_rows(ex, r: int, t0: float, steps_per_second: int):
    """→ (rows, n_dropped_drums): structured rows (time, kind, program,
    pitch, velocity) for the pitch/drum events of row r. kind: 0 offset,
    1 onset, 2 drum. Drum tokens seen while the forward-filled velocity
    state is 0 are DROPPED (and counted), matching the slow state machine
    (event2note.py drum branch, ADVICE r1)."""
    sel = ex["is_pitch"][r] | ex["is_drum_hit"][r]
    vel_all = ex["velocity"][r]
    dead_drum = ex["is_drum_hit"][r] & (vel_all <= 0)
    n_dropped = int(dead_drum.sum())
    sel = sel & ~dead_drum
    if not sel.any():
        return [], n_dropped
    tick = ex["tick"][r][sel]
    prog = ex["program"][r][sel]
    vel = vel_all[sel]
    val = ex["value"][r][sel]
    drum = ex["is_drum_hit"][r][sel]
    time = t0 + np.maximum(tick, 0) / steps_per_second
    kind = np.where(drum, 2, (vel > 0).astype(np.int64))
    return list(zip(time.tolist(), kind.tolist(), prog.tolist(),
                    val.tolist(), vel.tolist())), n_dropped


class _FastMergeState:
    """Note pairing + tie merge over extracted rows (mirrors
    NoteDecodingState semantics at the note level)."""

    def __init__(self, codec: EventCodec):
        self.codec = codec
        self.active: Dict[Tuple[int, int], Tuple[float, int]] = {}
        self.notes: List[Note] = []
        self.err = DecodeErrors()
        self.last_time = 0.0

    def process(self, ties, events, t0: float) -> None:
        declared = set(ties)
        for key in list(self.active):
            if key not in declared:
                self._close(key, t0)
        for key in declared:
            if key not in self.active:
                self.err.tie_without_active_note += 1
                self.active[key] = (t0, 100)
        for time, kind, prog, pitch, vel in events:
            if kind == 2:  # drum (vel > 0 guaranteed: dead drums dropped)
                self.notes.append(Note(True, 128, time,
                                       time + DRUM_OFFSET_TIME, pitch,
                                       self.codec.bin_to_velocity(vel)))
            elif kind == 1:  # onset
                key = (prog, pitch)
                if key in self.active:
                    self._close(key, time)
                self.active[key] = (time, self.codec.bin_to_velocity(vel))
            else:  # offset
                key = (prog, pitch)
                if key in self.active:
                    self._close(key, time)
                else:
                    self.err.unmatched_offsets += 1
        self.last_time = max(self.last_time, t0 + self.codec.segment_seconds)

    def _close(self, key, time: float) -> None:
        onset, vel = self.active.pop(key)
        self.notes.append(Note(False, key[0], onset, max(time, onset),
                               key[1], vel))

    def finish(self):
        for key in list(self.active):
            self._close(key, self.last_time)
        self.notes.sort(key=lambda n: (n.onset, n.is_drum, n.program, n.pitch))
        return self.notes, self.err
