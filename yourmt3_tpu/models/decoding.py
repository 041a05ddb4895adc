"""Autoregressive greedy/sampled decode, fully on-device.

Capability parity target: reference `model/t5mod_helper.py`
`task_cond_dec_generate` (SURVEY.md C21): greedy decode with task-token
prefix conditioning, KV cache, max-length stop, per-channel batching.

TPU-first: the whole token loop is a jitted `lax.while_loop` with
functional dense KV caches (bf16) updated by dynamic_update_slice —
no host sync per step, early exit when every stream has emitted EOS.
Channels are pre-folded into the batch axis by the caller, so one loop
serves both single- and multi-channel decoders (reference runs this loop
in Python per step; here a whole segment decodes in one device program).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..tokens.codec import EOS_ID, PAD_ID
from .ymt3 import YMT3


class DecodeState(NamedTuple):
    pos: jnp.ndarray  # scalar int32: current step
    buf: jnp.ndarray  # (B*, L+1) decoder inputs; buf[:, 0] = start token
    done: jnp.ndarray  # (B*,) bool
    self_kvs: Any  # list of per-layer (k, v) caches
    rep: jnp.ndarray  # (B*,) int32: consecutive-identical-token run length
    rep2: jnp.ndarray  # (B*,) int32: period-2 cycle run length (A B A B …)


def greedy_decode(
    model: YMT3,
    params,
    memory: jnp.ndarray,  # (B, C, T, D) from model.encode
    max_length: int,
    prefix_ids: Optional[jnp.ndarray] = None,  # (P,) forced prefix (task tokens)
    eos_id: int = EOS_ID,
    ban_eos: bool = False,  # benchmarking: force worst-case full-length decode
    unroll: int = 1,  # token steps per while-loop iteration (must divide
    # max_length); >1 amortizes per-iteration loop overhead. Tokens are
    # IDENTICAL to unroll=1 — the all-done early exit is just checked every
    # `unroll` steps (finished streams emit PAD, so extra sub-steps are
    # no-ops on the output).
    phases: int = 1,  # phase-chunked dense reads: phase p's while-loop
    # reads only cache[:, :, :(p+1)·(max_length/phases)] in the dense
    # self-attention (STATIC slice; pos < that horizon throughout the
    # phase). Worst-case self-attn HBM traffic drops to (phases+1)/(2·
    # phases) of full-L reads — the pure-XLA analogue of paged ∝pos reads,
    # at XLA's full fused bandwidth. Tokens IDENTICAL (masked positions
    # were never read). Short EOS-early decodes also win: only phase 0's
    # small horizon is ever touched.
    cross_kvs=None,  # precomputed YMT3.init_cross_kv output. Callers that
    # compare decode variants MUST pass the same tensors to each: computing
    # the projection inside different jit programs changes fusion-order
    # rounding, and int8 KV quantization amplifies that epsilon into argmax
    # flips (see api._encode_batch).
    repetition_guard: int = 0,  # >0: replace the Nth consecutive identical
    # token emission with a forced EOS (visible runs cap at N-1). No valid MT3 stream
    # repeats a token (shifts are monotonic, chord pitches ascend, state
    # tokens only change), but a degenerate greedy decode can loop on one —
    # measured: test_014 collapsed to onset F1 0.16 emitting a 129-token
    # repeat stream where every other track read ~0.6 (EVIDENCE.md mc13_r5).
    # The guard ALSO cuts period-2 cycles (A B A B …) after 2·N steps in
    # cycle: equally invalid (two alternating tokens without an advancing
    # shift cannot encode notes) and observed in collapsed tracks the
    # period-1 guard missed (fragmentation diag, round 4).
    # 0 = off (token-identical to the plain loop). Guard is inactive while
    # the forced task prefix is being written.
) -> jnp.ndarray:
    """→ (B, C, max_length) int32 token ids (PAD-filled after EOS)."""
    B, C = memory.shape[0], memory.shape[1]
    BS = B * C
    cfg = model.cfg
    start = cfg.decoder_start_token_id
    assert max_length % unroll == 0, (max_length, unroll)
    assert max_length % phases == 0, (max_length, phases)
    # guard=1 is degenerate: the run counter starts at 1 for ANY token, so
    # rep >= 1 trips on the first post-prefix emission and every stream
    # force-EOSes immediately (empty transcription). ADVICE r4.
    assert repetition_guard == 0 or repetition_guard >= 2, (
        f"repetition_guard must be 0 (off) or >= 2, got {repetition_guard}")
    # Each phase's while-loop must also step in whole unroll groups: if the
    # phase span is not a multiple of unroll, the unrolled body crosses the
    # phase boundary and runs steps against the PREVIOUS phase's stale
    # kv_len horizon — excluding freshly written K/V rows from
    # self-attention and silently producing wrong tokens (found by review:
    # phases=3, unroll=6, max_length=48 diverges from the baseline).
    assert (max_length // phases) % unroll == 0, (max_length, phases, unroll)

    if cross_kvs is None:
        cross_kvs = model.apply(params, memory, method=YMT3.init_cross_kv)
    self_kvs = model.empty_self_kvs(BS, max_length)

    P = 0 if prefix_ids is None else int(prefix_ids.shape[0])

    def step_once(st: DecodeState, kv_len: int) -> DecodeState:
        tok = jax.lax.dynamic_slice(st.buf, (0, st.pos), (BS, 1))
        logits, new_kvs = model.apply(params, tok, st.pos, st.self_kvs,
                                      cross_kvs, kv_len=kv_len,
                                      method=YMT3.decode_step)
        if ban_eos:
            logits = logits.at[:, eos_id].set(-1e9)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if P > 0:  # force task-token prefix positions
            forced = prefix_ids[jnp.minimum(st.pos, P - 1)].astype(jnp.int32)
            nxt = jnp.where(st.pos < P, forced, nxt)
        rep, rep2 = st.rep, st.rep2
        if repetition_guard > 0:
            run = jnp.where(jnp.logical_and(~st.done, nxt == tok[:, 0]),
                            st.rep + 1, 1)
            rep = jnp.where(st.pos < P, 0, run)
            # period-2: nxt equals the token emitted two steps back
            # (buf[pos-1]; tok = buf[pos] is one back). A A A … also
            # satisfies this, harmlessly (period-1 trips first).
            tok2 = jax.lax.dynamic_slice(
                st.buf, (0, jnp.maximum(st.pos - 1, 0)), (BS, 1))[:, 0]
            in_cycle = jnp.logical_and(
                jnp.logical_and(~st.done, nxt == tok2), st.pos >= 1)
            run2 = jnp.where(in_cycle, st.rep2 + 1, 1)
            rep2 = jnp.where(st.pos < P, 0, run2)
            trip = jnp.logical_or(rep >= repetition_guard,
                                  rep2 >= 2 * repetition_guard)
            nxt = jnp.where(jnp.logical_and(trip, ~st.done), eos_id, nxt)
        nxt = jnp.where(st.done, PAD_ID, nxt)
        done = jnp.logical_or(st.done, nxt == eos_id)
        buf = jax.lax.dynamic_update_slice(st.buf, nxt[:, None], (0, st.pos + 1))
        return DecodeState(st.pos + 1, buf, done, new_kvs, rep, rep2)

    buf0 = jnp.full((BS, max_length + 1), PAD_ID, jnp.int32).at[:, 0].set(start)
    st = DecodeState(jnp.asarray(0, jnp.int32), buf0,
                     jnp.zeros((BS,), bool), self_kvs,
                     jnp.zeros((BS,), jnp.int32), jnp.zeros((BS,), jnp.int32))
    span = max_length // phases
    for p in range(phases):
        limit = (p + 1) * span
        kv_len = 0 if limit == max_length else limit

        def cond(st: DecodeState, _limit=limit):
            return jnp.logical_and(st.pos < _limit, ~jnp.all(st.done))

        def body(st: DecodeState, _kv_len=kv_len):
            for _ in range(unroll):
                st = step_once(st, _kv_len)
            return st

        st = jax.lax.while_loop(cond, body, st)
    return st.buf[:, 1:].reshape(B, C, max_length)


@functools.partial(jax.jit, static_argnames=("model", "max_length"))
def jit_greedy_decode(model: YMT3, params, memory: jnp.ndarray,
                      max_length: int,
                      prefix_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return greedy_decode(model, params, memory, max_length, prefix_ids)


# ---------------------------------------------------------------------------
# Early-exit decode with stream compaction (VERDICT round-1 item 6)
# ---------------------------------------------------------------------------

class ChunkState(NamedTuple):
    pos: jnp.ndarray
    buf: jnp.ndarray
    done: jnp.ndarray
    self_kvs: Any


@functools.partial(jax.jit,
                   static_argnames=("model", "chunk", "eos_id", "has_prefix"))
def _decode_chunk(model: YMT3, params, self_kvs, buf, done, pos, cross_kvs,
                  prefix_ids, chunk: int, eos_id: int, has_prefix: bool):
    """Run up to `chunk` decode steps (stops early when every stream is
    done). Same per-step body as greedy_decode."""
    S = buf.shape[0]
    max_length = buf.shape[1] - 1
    limit = jnp.minimum(pos + chunk, max_length)
    P = 0 if not has_prefix else int(prefix_ids.shape[0])

    def cond(st: ChunkState):
        return jnp.logical_and(st.pos < limit, ~jnp.all(st.done))

    def body(st: ChunkState):
        tok = jax.lax.dynamic_slice(st.buf, (0, st.pos), (S, 1))
        logits, new_kvs = model.apply(params, tok, st.pos, st.self_kvs,
                                      cross_kvs, method=YMT3.decode_step)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if P > 0:
            forced = prefix_ids[jnp.minimum(st.pos, P - 1)].astype(jnp.int32)
            nxt = jnp.where(st.pos < P, forced, nxt)
        nxt = jnp.where(st.done, PAD_ID, nxt)
        done = jnp.logical_or(st.done, nxt == eos_id)
        b = jax.lax.dynamic_update_slice(st.buf, nxt[:, None],
                                         (0, st.pos + 1))
        return ChunkState(st.pos + 1, b, done, new_kvs)

    st = jax.lax.while_loop(cond, body, ChunkState(pos, buf, done, self_kvs))
    return st.self_kvs, st.buf, st.done, st.pos


def _gather_streams(tree, idx: jnp.ndarray):
    """Take rows of every cache tensor along its stream axis (paged
    caches carry streams on axis 1, everything else on axis 0)."""

    def take(x):
        axis = 1 if x.ndim == 5 else 0
        return jnp.take(x, idx, axis=axis)

    return jax.tree_util.tree_map(take, tree)


def greedy_decode_early_exit(
    model: YMT3,
    params,
    memory: jnp.ndarray,  # (B, C, T, D)
    max_length: int,
    prefix_ids: Optional[jnp.ndarray] = None,
    eos_id: int = EOS_ID,
    chunk: int = 64,
    compact_threshold: float = 0.5,
    cross_kvs=None,  # precomputed YMT3.init_cross_kv output (see
    # greedy_decode: identical-token comparisons require the SAME tensors)
) -> jnp.ndarray:
    """Greedy decode that RETIRES finished streams: decodes in `chunk`-step
    device programs and, between chunks, compacts still-active streams
    into a smaller (multiple-of-8-padded) batch — caches, cross-KV and
    buffers are gathered on device. Token output is IDENTICAL to
    greedy_decode (locked by tests); wall-clock drops when stream lengths
    vary, because short streams stop paying for long ones.

    The plain greedy_decode already stops when ALL streams finish; this
    adds the per-stream dimension the reference never had (its decode is
    a Python loop, SURVEY.md C21)."""
    B, C = memory.shape[0], memory.shape[1]
    S = B * C
    start = model.cfg.decoder_start_token_id

    if cross_kvs is None:
        cross_kvs = model.apply(params, memory, method=YMT3.init_cross_kv)
    self_kvs = model.empty_self_kvs(S, max_length)
    buf = jnp.full((S, max_length + 1), PAD_ID, jnp.int32).at[:, 0].set(start)
    done = jnp.zeros((S,), bool)
    pos = jnp.asarray(0, jnp.int32)
    has_prefix = prefix_ids is not None
    pfx = prefix_ids if has_prefix else jnp.zeros((0,), jnp.int32)

    out = np.full((S, max_length + 1), PAD_ID, np.int32)
    order = np.arange(S)  # current row → original stream row

    while True:
        self_kvs, buf, done, pos = _decode_chunk(
            model, params, self_kvs, buf, done, pos, cross_kvs, pfx,
            chunk, eos_id, has_prefix)
        done_h = np.asarray(done)[: len(order)]
        pos_h = int(pos)
        if pos_h >= max_length or done_h.all():
            break
        n_active = int((~done_h).sum())
        # power-of-two×8 buckets bound recompiles to log2(S) programs
        padded = 8
        while padded < n_active:
            padded *= 2
        if padded <= compact_threshold * len(done_h):
            # retire finished rows to the host-side output...
            fin = np.where(done_h)[0]
            out[order[fin]] = np.asarray(buf)[fin]
            # ...and compact the active ones (pad by repeating row 0 with
            # done=True so dummies stay frozen)
            act = np.where(~done_h)[0]
            idx = np.concatenate([act, np.zeros(padded - n_active, np.int64)])
            idx_j = jnp.asarray(idx, jnp.int32)
            buf = jnp.take(buf, idx_j, axis=0)
            done = jnp.asarray(
                np.concatenate([np.zeros(n_active, bool),
                                np.ones(padded - n_active, bool)]))
            self_kvs = _gather_streams(self_kvs, idx_j)
            cross_kvs = _gather_streams(cross_kvs, idx_j)
            order = order[act]

    buf_h = np.asarray(buf)
    out[order] = buf_h[: len(order)]
    return jnp.asarray(out[:, 1:]).reshape(B, C, max_length)


class BeamState(NamedTuple):
    pos: jnp.ndarray  # scalar int32
    buf: jnp.ndarray  # (S, K, L+1) decoder inputs
    scores: jnp.ndarray  # (S, K) cumulative log-probs
    done: jnp.ndarray  # (S, K)
    self_kvs: Any  # caches with S·K streams


def _reorder_cache_streams(kvs, parent: jnp.ndarray):
    """Gather beam-parent streams in every cache tensor. `parent` is a
    flat (S·K,) index into the stream axis. Works for dense (S*,H,L,dk)
    and paged (NB, S*, H, dk, blk) layouts."""

    def gather(x):
        axis = 1 if x.ndim == 5 else 0
        return jnp.take(x, parent, axis=axis)

    return jax.tree_util.tree_map(gather, kvs)


def beam_decode(
    model: YMT3,
    params,
    memory: jnp.ndarray,  # (B, C, T, D)
    max_length: int,
    beam_size: int = 4,
    prefix_ids: Optional[jnp.ndarray] = None,
    eos_id: int = EOS_ID,
    length_penalty: float = 0.6,
) -> jnp.ndarray:
    """Batched beam search (reference exposes greedy only; the north-star
    asks for greedy/beam). Beams fold into the stream axis (S·K) so the
    same decode_step/caches serve; per-step beam reorder is a stream-axis
    gather. → (B, C, max_length) best-beam tokens."""
    B, C = memory.shape[0], memory.shape[1]
    S = B * C
    K = beam_size
    cfg = model.cfg
    start = cfg.decoder_start_token_id
    V = cfg.vocab_size
    P = 0 if prefix_ids is None else int(prefix_ids.shape[0])

    # expand memory per beam BEFORE cross-KV projection: (B, C, T, D) →
    # stream-major (S·K) ordering must match cache folding (B·C major, K minor)
    mem_flat = memory.reshape(S, *memory.shape[2:])
    mem_beam = jnp.repeat(mem_flat, K, axis=0)  # (S·K, T, D)
    # (S·K, 1, T, D) folds to S·K decoder streams for either decoder type
    cross_kvs = model.apply(params, mem_beam[:, None],
                            method=YMT3.init_cross_kv)
    self_kvs = model.empty_self_kvs(S * K, max_length)

    NEG = jnp.asarray(-1e9, jnp.float32)

    def cond(st: BeamState):
        return jnp.logical_and(st.pos < max_length, ~jnp.all(st.done))

    def body(st: BeamState):
        tok = jax.lax.dynamic_slice(st.buf, (0, 0, st.pos),
                                    (S, K, 1)).reshape(S * K, 1)
        logits, new_kvs = model.apply(params, tok, st.pos, st.self_kvs,
                                      cross_kvs, method=YMT3.decode_step)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        logp = logp.reshape(S, K, V)
        if P > 0:
            forced = prefix_ids[jnp.minimum(st.pos, P - 1)].astype(jnp.int32)
            onehot = jax.nn.one_hot(forced, V, dtype=jnp.float32)
            logp = jnp.where(st.pos < P,
                             jnp.where(onehot[None, None] > 0, 0.0, NEG), logp)
        # finished beams: only PAD continues, score frozen
        pad_only = jnp.full((V,), NEG).at[PAD_ID].set(0.0)
        logp = jnp.where(st.done[:, :, None], pad_only[None, None], logp)
        # first step: only beam 0 is alive (identical beams would tie)
        first_mask = (jnp.arange(K) > 0)[None, :, None] * NEG
        logp = jnp.where(st.pos == 0, logp + first_mask, logp)

        cand = st.scores[:, :, None] + logp  # (S, K, V)
        top_v, top_i = jax.lax.top_k(cand.reshape(S, K * V), K)
        parent = top_i // V  # (S, K)
        token = (top_i % V).astype(jnp.int32)

        flat_parent = (jnp.arange(S)[:, None] * K + parent).reshape(-1)
        kvs = _reorder_cache_streams(new_kvs, flat_parent)
        buf = jnp.take_along_axis(st.buf, parent[:, :, None], axis=1)
        buf = jax.lax.dynamic_update_slice(buf, token[:, :, None],
                                           (0, 0, st.pos + 1))
        done = jnp.take_along_axis(st.done, parent, axis=1) | (token == eos_id)
        return BeamState(st.pos + 1, buf, top_v, done, kvs)

    buf0 = jnp.full((S, K, max_length + 1), PAD_ID, jnp.int32).at[:, :, 0].set(start)
    st = BeamState(jnp.asarray(0, jnp.int32), buf0,
                   jnp.zeros((S, K), jnp.float32), jnp.zeros((S, K), bool),
                   self_kvs)
    st = jax.lax.while_loop(cond, body, st)

    # pick best beam with GNMT length penalty
    lengths = jnp.sum(st.buf[:, :, 1:] != PAD_ID, axis=-1).astype(jnp.float32)
    denom = ((5.0 + jnp.maximum(lengths, 1.0)) / 6.0) ** length_penalty
    best = jnp.argmax(st.scores / denom, axis=1)  # (S,)
    out = jnp.take_along_axis(st.buf, best[:, None, None], axis=1)[:, 0, 1:]
    return out.reshape(B, C, max_length)


def transcribe_segments(
    model: YMT3,
    params,
    frontend,
    audio_segments: jnp.ndarray,  # (S, input_frames) float32
    max_length: int,
    prefix_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Segments → (S, C, L) token ids. One jitted program: frontend →
    encoder → projection → while-loop decode."""

    @functools.partial(jax.jit, static_argnames=())
    def run(audio):
        feats = frontend(audio)
        memory = model.apply(params, feats, method=YMT3.encode)
        return greedy_decode(model, params, memory, max_length, prefix_ids)

    return run(audio_segments)
