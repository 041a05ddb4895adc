"""YMT3: full model assembly (encoder + projection + decoder).

Capability parity target: reference `model/ymt3.py` `YourMT3`
(SURVEY.md C25) minus the Lightning runtime (training loop lives in
yourmt3_tpu/train/, decode loop in models/decoding.py — both pure JAX).

The audio frontend (ops/frontend.py) is composed OUTSIDE this module at
the train/inference-step level so spec-augment can sit between frontend
and encoder on device; this module consumes (B, T, F) features.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.model import ModelConfig
from ..tokens.codec import PAD_ID
from .conformer import ConformerEncoder
from .perceiver_tf import PerceiverTFEncoder
from .projection import EncoderProjection
from .t5 import KV, MultiChannelT5Decoder, T5Decoder, T5Encoder


class YMT3(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if c.encoder_type == "t5":
            self.encoder = T5Encoder(c, name="encoder")
        elif c.encoder_type == "perceiver-tf":
            self.encoder = PerceiverTFEncoder(c, name="encoder")
        elif c.encoder_type == "conformer":
            self.encoder = ConformerEncoder(c, name="encoder")
        else:
            raise ValueError(f"unknown encoder_type {c.encoder_type}")
        self.projection = EncoderProjection(c, name="projection")
        if c.decoder_type == "multi-t5" or c.num_channels > 1:
            self.decoder = MultiChannelT5Decoder(c, name="decoder")
            self._multi = True
        else:
            self.decoder = T5Decoder(c, name="decoder")
            self._multi = False

    # ---- encoding ------------------------------------------------------
    def encode(self, feats: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, F) → decoder memory (B, C, T', D)."""
        enc = self.encoder(feats, deterministic=deterministic)
        return self.projection(enc)

    # ---- training forward ---------------------------------------------
    def __call__(self, feats: jnp.ndarray, decoder_input_ids: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """feats (B,T,F), ids (B,C,L) → logits (B,C,L,V)."""
        memory = self.encode(feats, deterministic)
        if self._multi:
            return self.decoder(decoder_input_ids, memory, deterministic)
        logits = self.decoder(decoder_input_ids[:, 0], memory[:, 0], deterministic)
        return logits[:, None]

    # ---- decode-time methods (explicit-cache, used under jit) ----------
    def init_cross_kv(self, memory: jnp.ndarray) -> List[KV]:
        """memory (B, C, T, D) → per-layer cross KV, channel-folded."""
        if self._multi:
            return self.decoder.init_cross_kv(memory)
        return self.decoder.init_cross_kv(memory[:, 0])

    def decode_step(self, token_ids: jnp.ndarray, pos: jnp.ndarray,
                    self_kvs: List[KV], cross_kvs: List[KV],
                    kv_len: int = 0) -> Tuple[jnp.ndarray, List[KV]]:
        return self.decoder.decode_step(token_ids, pos, self_kvs, cross_kvs,
                                        kv_len=kv_len)

    # ---- cache scaffolding ---------------------------------------------
    def empty_self_kvs(self, batch_streams: int, max_len: int) -> List[KV]:
        c = self.cfg
        # GQA/MQA decoders cache only the shared K/V heads
        kvh = c.decoder_kv_heads or c.num_heads
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        if c.kv_quant == "int4":
            # nibble-packed int4 self cache: (values uint8 (S,H,L,dk//2),
            # per-position fp32 scales); zero scales zero out unwritten
            # positions exactly as in the int8 cache
            vals = (batch_streams, kvh, max_len, c.d_kv // 2)
            scls = (batch_streams, kvh, max_len)
            return [((jnp.zeros(vals, jnp.uint8), jnp.zeros(scls, jnp.float32)),
                     (jnp.zeros(vals, jnp.uint8), jnp.zeros(scls, jnp.float32)))
                    for _ in range(c.num_decoder_layers)]
        if c.kv_quant in ("int8", "int8c4", "int8c4p") and c.use_pallas_decode:
            # int8 PAGED caches: ((values pages int8, scale pages fp32), …)
            # — ∝pos kernel reads at half the bytes
            from ..ops.pallas.decode_attention import (empty_paged_cache,
                                                       empty_paged_scales)
            block = 64 if max_len <= 256 else 128
            padded = -(-max_len // block) * block
            def pair():
                return (empty_paged_cache(batch_streams, kvh, c.d_kv,
                                          padded, block, jnp.int8),
                        empty_paged_scales(batch_streams, kvh,
                                           padded, block))
            return [(pair(), pair()) for _ in range(c.num_decoder_layers)]
        if c.kv_quant in ("int8", "int8c4", "int8c4p"):
            # (values int8, per-position fp32 scales); zero scales make
            # unwritten positions contribute 0 logits (masked anyway)
            vals = (batch_streams, kvh, max_len, c.d_kv)
            scls = (batch_streams, kvh, max_len)
            return [((jnp.zeros(vals, jnp.int8), jnp.zeros(scls, jnp.float32)),
                     (jnp.zeros(vals, jnp.int8), jnp.zeros(scls, jnp.float32)))
                    for _ in range(c.num_decoder_layers)]
        if c.use_pallas_decode:
            # paged layout (NB, S, H, dk, block): contiguous per-page DMA,
            # see ops/pallas/decode_attention.py. Larger pages amortize
            # per-program overhead when the decode is short (mc13: L=256
            # fits one page).
            from ..ops.pallas.decode_attention import empty_paged_cache
            # 64-pages for short multi-channel decodes (finest dead-page
            # skip: avg live fraction 0.625 at L=256), 128 for long decodes
            block = 64 if max_len <= 256 else 128
            padded = -(-max_len // block) * block
            return [(empty_paged_cache(batch_streams, kvh, c.d_kv,
                                       padded, block, dt),
                     empty_paged_cache(batch_streams, kvh, c.d_kv,
                                       padded, block, dt))
                    for _ in range(c.num_decoder_layers)]
        shape = (batch_streams, kvh, max_len, c.d_kv)
        return [(jnp.zeros(shape, dt), jnp.zeros(shape, dt))
                for _ in range(c.num_decoder_layers)]


def shift_right(labels: jnp.ndarray, start_id: int = 0) -> jnp.ndarray:
    """(…, L) labels → decoder inputs: [start, y₀, …, y_{L-2}]."""
    return jnp.concatenate(
        [jnp.full((*labels.shape[:-1], 1), start_id, labels.dtype),
         labels[..., :-1]], axis=-1)


def ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
            label_smoothing: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad-masked token cross entropy.

    logits (B,C,L,V) fp32, labels (B,C,L) int32 → (scalar loss, accuracy).
    """
    V = logits.shape[-1]
    mask = (labels != PAD_ID).astype(jnp.float32)
    logz = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logz, labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = jnp.mean(logz, axis=-1)
        ll = (1.0 - label_smoothing) * ll + label_smoothing * smooth
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = -(ll * mask).sum() / denom
    acc = ((jnp.argmax(logits, -1) == labels) * mask).sum() / denom
    return loss, acc
