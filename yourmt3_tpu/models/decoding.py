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
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.model import ModelConfig
from ..tokens.codec import EOS_ID, PAD_ID
from .ymt3 import YMT3


class DecodeState(NamedTuple):
    pos: jnp.ndarray  # scalar int32: current step
    buf: jnp.ndarray  # (B*, L+1) decoder inputs; buf[:, 0] = start token
    done: jnp.ndarray  # (B*,) bool
    self_kvs: Any  # list of per-layer (k, v) caches


def greedy_decode(
    model: YMT3,
    params,
    memory: jnp.ndarray,  # (B, C, T, D) from model.encode
    max_length: int,
    prefix_ids: Optional[jnp.ndarray] = None,  # (P,) forced prefix (task tokens)
    eos_id: int = EOS_ID,
    ban_eos: bool = False,  # benchmarking: force worst-case full-length decode
) -> jnp.ndarray:
    """→ (B, C, max_length) int32 token ids (PAD-filled after EOS)."""
    B, C = memory.shape[0], memory.shape[1]
    BS = B * C
    cfg = model.cfg
    start = cfg.decoder_start_token_id

    cross_kvs = model.apply(params, memory, method=YMT3.init_cross_kv)
    self_kvs = model.empty_self_kvs(BS, max_length)

    P = 0 if prefix_ids is None else int(prefix_ids.shape[0])

    def cond(st: DecodeState):
        return jnp.logical_and(st.pos < max_length, ~jnp.all(st.done))

    def body(st: DecodeState):
        tok = jax.lax.dynamic_slice(st.buf, (0, st.pos), (BS, 1))
        logits, new_kvs = model.apply(params, tok, st.pos, st.self_kvs,
                                      cross_kvs, method=YMT3.decode_step)
        if ban_eos:
            logits = logits.at[:, eos_id].set(-1e9)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if P > 0:  # force task-token prefix positions
            forced = prefix_ids[jnp.minimum(st.pos, P - 1)].astype(jnp.int32)
            nxt = jnp.where(st.pos < P, forced, nxt)
        nxt = jnp.where(st.done, PAD_ID, nxt)
        done = jnp.logical_or(st.done, nxt == eos_id)
        buf = jax.lax.dynamic_update_slice(st.buf, nxt[:, None], (0, st.pos + 1))
        return DecodeState(st.pos + 1, buf, done, new_kvs)

    buf0 = jnp.full((BS, max_length + 1), PAD_ID, jnp.int32).at[:, 0].set(start)
    st = DecodeState(jnp.asarray(0, jnp.int32), buf0,
                     jnp.zeros((BS,), bool), self_kvs)
    st = jax.lax.while_loop(cond, body, st)
    return st.buf[:, 1:].reshape(B, C, max_length)


@functools.partial(jax.jit, static_argnames=("model", "max_length"))
def jit_greedy_decode(model: YMT3, params, memory: jnp.ndarray,
                      max_length: int,
                      prefix_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return greedy_decode(model, params, memory, max_length, prefix_ids)


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
