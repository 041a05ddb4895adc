"""T5 encoder / decoder / multi-channel decoder (flax.linen).

Capability parity target: reference `model/t5mod.py` (SURVEY.md C20):
`T5EncoderYMT3`, `T5DecoderYMT3`, `MultiChannelT5Decoder` — T5.1.1
semantics (RMSNorm pre-norm, gated-gelu FF, bucketed relative position
bias on layer-shared tables, untied LM head, no attention scaling).

TPU-first: the decoder exposes explicit-KV single-step methods
(`init_cross_kv`, `decode_step`) so autoregressive decoding runs inside a
jitted lax.while_loop with functional cache updates
(models/decoding.py) — no Python-side step loop, no cache mutation.
The multi-channel decoder folds channels into the batch axis (B·C), which
keeps every matmul large and MXU-shaped (SURVEY.md §3.5 note).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.model import ModelConfig
from .layers import (NEG_INF, FeedForward, MoEFeedForward, MultiHeadAttention,
                     QuantDense, RMSNorm, RelativePositionBias,
                     dot_product_attention, relative_position_bucket)

Dtype = Any
KV = Tuple[jnp.ndarray, jnp.ndarray]


def _dtype(cfg: ModelConfig) -> Any:
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _make_ff(cfg: ModelConfig, dtype, name: str):
    if cfg.ff_act == "moe":
        return MoEFeedForward(num_experts=8, d_ff=cfg.d_ff, d_model=cfg.d_model,
                              dtype=dtype, name=name)
    return FeedForward(d_ff=cfg.d_ff, d_model=cfg.d_model, act=cfg.ff_act,
                       dropout_rate=cfg.dropout_rate, dtype=dtype, name=name)


class T5EncoderLayer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c, dt = self.cfg, _dtype(self.cfg)
        self.norm_attn = RMSNorm(dtype=dt, name="norm_attn")
        self.attn = MultiHeadAttention(c.num_heads, c.d_kv, c.d_model, dt,
                                       name="attn")
        self.norm_ff = RMSNorm(dtype=dt, name="norm_ff")
        self.ff = _make_ff(c, dt, "ff")
        self.drop = nn.Dropout(c.dropout_rate)

    def __call__(self, x, bias, deterministic=True):
        h = self.norm_attn(x)
        x = x + self.drop(self.attn(h, h, bias), deterministic=deterministic)
        h = self.norm_ff(x)
        x = x + self.drop(self.ff(h, deterministic=deterministic),
                          deterministic=deterministic)
        return x


class T5Encoder(nn.Module):
    """Continuous-input T5 encoder: (B, T, F) features → (B, T, D)."""

    cfg: ModelConfig

    def setup(self):
        c, dt = self.cfg, _dtype(self.cfg)
        self.input_proj = nn.Dense(c.d_model, use_bias=False, dtype=dt,
                                   name="input_proj")
        self.rel_bias = RelativePositionBias(
            c.num_heads, c.rel_attn_num_buckets, c.rel_attn_max_distance,
            bidirectional=True, dtype=dt, name="rel_bias")
        self.layers = [T5EncoderLayer(c, name=f"layer_{i}")
                       for i in range(c.num_encoder_layers)]
        self.final_norm = RMSNorm(dtype=dt, name="final_norm")
        self.drop = nn.Dropout(c.dropout_rate)
        if c.encoder_abs_pos == "learned":
            self.pos_embed = self.param("pos_embed",
                                        nn.initializers.normal(0.02),
                                        (2048, c.d_model), jnp.float32)

    def __call__(self, feats: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        x = self.input_proj(feats.astype(_dtype(c)))
        T = x.shape[1]
        if c.encoder_abs_pos == "sinusoidal":
            from .layers import sinusoidal_positions
            pos = jnp.asarray(sinusoidal_positions(T, c.d_model), x.dtype)
            x = x + pos[None]
        elif c.encoder_abs_pos == "learned":
            x = x + self.pos_embed[:T].astype(x.dtype)[None]
        x = self.drop(x, deterministic=deterministic)
        bias = self.rel_bias(T, T)
        for lyr in self.layers:
            x = lyr(x, bias, deterministic)
        return self.final_norm(x)


class T5DecoderLayer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c, dt = self.cfg, _dtype(self.cfg)
        self.norm_self = RMSNorm(dtype=dt, name="norm_self")
        self.self_attn = MultiHeadAttention(c.num_heads, c.d_kv, c.d_model, dt,
                                            num_kv_heads=c.decoder_kv_heads,
                                            name="self_attn")
        self.norm_cross = RMSNorm(dtype=dt, name="norm_cross")
        self.cross_attn = MultiHeadAttention(c.num_heads, c.d_kv, c.d_model, dt,
                                             num_kv_heads=c.decoder_kv_heads,
                                             name="cross_attn")
        self.norm_ff = RMSNorm(dtype=dt, name="norm_ff")
        self.ff = _make_ff(c, dt, "ff")
        self.drop = nn.Dropout(c.dropout_rate)

    def __call__(self, y, enc_out, self_bias, deterministic=True):
        h = self.norm_self(y)
        y = y + self.drop(self.self_attn(h, h, self_bias),
                          deterministic=deterministic)
        h = self.norm_cross(y)
        y = y + self.drop(self.cross_attn(h, enc_out, None),
                          deterministic=deterministic)
        h = self.norm_ff(y)
        y = y + self.drop(self.ff(h, deterministic=deterministic),
                          deterministic=deterministic)
        return y

    # ---- single-step decode with external caches ----------------------
    def decode_step(self, y, self_kv: KV, pos: jnp.ndarray, cross_kv: KV,
                    step_bias, kv_len: int = 0) -> Tuple[jnp.ndarray, KV]:
        """y: (B, 1, D). self_kv: (B, H, L, dk) ring caches. pos: scalar.
        step_bias: (1, H, 1, L) rel-bias row + causal mask (dense path), or
        ("table", (buckets, H) array) for in-kernel reconstruction.
        kv_len: STATIC read horizon for the dense self-attention paths —
        reads only cache[:, :, :kv_len] (pos < kv_len guaranteed by the
        caller's phase schedule); 0 = full L. The pure-XLA analogue of the
        paged kernel's ∝pos reads: phase-chunked decoding shrinks the
        dominant HBM traffic without paying the kernel's lower sustained
        bandwidth. Writes always land in the full-size cache."""
        h = self.norm_self(y)
        q = self.self_attn._split(self.self_attn.q(h))
        k_step = self.self_attn._split_kv(self.self_attn.k(h))
        v_step = self.self_attn._split_kv(self.self_attn.v(h))
        G = self.self_attn.num_heads // self.self_attn.kv_heads
        if G > 1:
            # GQA/MQA: fold the query-head group axis into the (length-1)
            # query-time axis — the dense attention paths below see
            # (S, Hkv, G, dk) queries against (S, Hkv, L, dk) caches and
            # are generic in that axis (config forbids the Pallas paths).
            q = self.self_attn.group_queries(q)
            if not isinstance(step_bias, tuple):
                step_bias = self.self_attn.group_bias(step_bias, 1)
        ck, cv = self_kv
        if (self.cfg.kv_quant in ("int8", "int8c4", "int8c4p")
                and self.cfg.use_pallas_decode):
            # int8 PAGED self-attention: combines the paged kernel's
            # ∝pos reads with int8's halved bytes. Cache entries are
            # ((values (NB,S,H,block,dk) int8, scales (S,NB,H,block)),…)
            from ..ops.kv_quant import quantize_kv
            from ..ops.pallas.decode_attention import (
                paged_cache_update, paged_decode_attention,
                paged_scale_update, pick_streams_per_tile)
            (kq, ksc), (vq, vsc) = ck, cv
            kq_s, ks_s = quantize_kv(k_step)
            vq_s, vs_s = quantize_kv(v_step)
            kq = paged_cache_update(kq, kq_s, pos)
            ksc = paged_scale_update(ksc, ks_s, pos)  # (S, H, 1) scales
            vq = paged_cache_update(vq, vq_s, pos)
            vsc = paged_scale_update(vsc, vs_s, pos)
            S, H, _, dk = q.shape
            block = kq.shape[3]
            sp = pick_streams_per_tile(S, H, dk, block)
            att = paged_decode_attention(
                q, kq, vq, pos, rel_table=step_bias[1],
                rel_max_distance=self.cfg.rel_attn_max_distance,
                block=block, streams_per_tile=sp,
                k_scale=ksc, v_scale=vsc)
            ck, cv = (kq, ksc), (vq, vsc)
        elif self.cfg.kv_quant == "int4":
            # int4 cache: ck = (k packed uint8 (S,H,L,dk//2), f32 (S,H,L)).
            # Same in-place row write as int8 at half the bytes; the
            # attention never materializes an interleaved dequant
            # (ops/kv_quant.int4_decode_attention).
            from ..ops.kv_quant import int4_decode_attention, quantize_kv4
            kq_s, ks_s = quantize_kv4(k_step)
            vq_s, vs_s = quantize_kv4(v_step)
            ck = (jax.lax.dynamic_update_slice(ck[0], kq_s, (0, 0, pos, 0)),
                  jax.lax.dynamic_update_slice(ck[1], ks_s, (0, 0, pos)))
            cv = (jax.lax.dynamic_update_slice(cv[0], vq_s, (0, 0, pos, 0)),
                  jax.lax.dynamic_update_slice(cv[1], vs_s, (0, 0, pos)))
            if kv_len:
                att = int4_decode_attention(
                    q, ck[0][:, :, :kv_len], ck[1][:, :, :kv_len],
                    cv[0][:, :, :kv_len], cv[1][:, :, :kv_len], step_bias)
            else:
                att = int4_decode_attention(q, ck[0], ck[1], cv[0], cv[1],
                                            step_bias)
        elif self.cfg.kv_quant in ("int8", "int8c4", "int8c4p"):
            # int8 cache: ck = (k int8 (S,H,L,dk), scales f32 (S,H,L)).
            # Quantize this step's row, write value+scale in place, attend
            # with dequant fused into the einsums (ops/kv_quant.py).
            from ..ops.kv_quant import int8_decode_attention, quantize_kv
            kq_s, ks_s = quantize_kv(k_step)
            vq_s, vs_s = quantize_kv(v_step)
            ck = (jax.lax.dynamic_update_slice(ck[0], kq_s, (0, 0, pos, 0)),
                  jax.lax.dynamic_update_slice(ck[1], ks_s, (0, 0, pos)))
            cv = (jax.lax.dynamic_update_slice(cv[0], vq_s, (0, 0, pos, 0)),
                  jax.lax.dynamic_update_slice(cv[1], vs_s, (0, 0, pos)))
            if kv_len:
                att = int8_decode_attention(
                    q, ck[0][:, :, :kv_len], ck[1][:, :, :kv_len],
                    cv[0][:, :, :kv_len], cv[1][:, :, :kv_len], step_bias)
            else:
                att = int8_decode_attention(q, ck[0], ck[1], cv[0], cv[1],
                                            step_bias)
        elif self.cfg.use_pallas_decode:
            # paged-KV kernel path: caches are (NB, B, H, dk, block) pages —
            # large contiguous DMA chunks; HBM reads ∝ pos+1, not L. The
            # rel bias is reconstructed in-kernel from the bucket table.
            from ..ops.pallas.decode_attention import (
                paged_cache_update, paged_decode_attention,
                pick_streams_per_tile)
            ck = paged_cache_update(ck, k_step, pos)
            cv = paged_cache_update(cv, v_step, pos)
            S, H, _, dk = q.shape
            sp = pick_streams_per_tile(S, H, dk, ck.shape[3])
            att = paged_decode_attention(
                q, ck, cv, pos, rel_table=step_bias[1],
                rel_max_distance=self.cfg.rel_attn_max_distance,
                block=ck.shape[3], streams_per_tile=sp)
        else:
            ck = jax.lax.dynamic_update_slice(ck, k_step, (0, 0, pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_step, (0, 0, pos, 0))
            if kv_len:
                att = dot_product_attention(q, ck[:, :, :kv_len],
                                            cv[:, :, :kv_len], step_bias)
            else:
                att = dot_product_attention(q, ck, cv, step_bias)
        if G > 1:
            att = self.self_attn.ungroup_heads(att, 1)
        y = y + self.self_attn.o(self.self_attn._merge(att))

        h = self.norm_cross(y)
        qc = self.cross_attn._split(self.cross_attn.q(h))
        if G > 1:
            qc = self.cross_attn.group_queries(qc)
        if isinstance(cross_kv[0], tuple):
            # quantized static cross KV (quantized once at init); uint8
            # values ⇒ nibble-packed int4, int8 otherwise. Cross reads are
            # step-invariant full-T traffic — the flagship's dominant
            # decode bytes — so int4 here halves what phase-chunking
            # cannot touch.
            (ckq, cks), (cvq, cvs) = cross_kv
            if self.cfg.kv_quant == "int8c4p":
                # Pallas int4 cross: in-kernel nibble unpack reads the
                # packed bytes once (split-half dk-major layout)
                from ..ops.pallas.decode_attention import \
                    int4_cross_attention
                attc = int4_cross_attention(qc[:, :, 0, :], ckq, cks,
                                            cvq, cvs)[:, :, None, :]
            elif ckq.dtype == jnp.uint8:
                from ..ops.kv_quant import int4_decode_attention
                attc = int4_decode_attention(qc, ckq, cks, cvq, cvs, None)
            else:
                from ..ops.kv_quant import int8_decode_attention
                attc = int8_decode_attention(qc, ckq, cks, cvq, cvs, None)
        elif cross_kv[0].ndim == 5:
            # paged cross path: one fused kernel pass reads the static
            # encoder KV once (vs XLA's separate q·K and w·V passes with
            # VMEM staging copies — measured ~1.7× the isolated cost
            # inside the decode while-loop)
            from ..ops.pallas.decode_attention import paged_cross_attention
            T = cross_kv[0].shape[0] * cross_kv[0].shape[3]
            attc = paged_cross_attention(qc[:, :, 0, :], cross_kv[0],
                                         cross_kv[1], T)[:, :, None, :]
        else:
            attc = dot_product_attention(qc, cross_kv[0], cross_kv[1], None)
        if G > 1:
            attc = self.cross_attn.ungroup_heads(attc, 1)
        y = y + self.cross_attn.o(self.cross_attn._merge(attc))

        h = self.norm_ff(y)
        y = y + self.ff(h, deterministic=True)
        return y, (ck, cv)


class T5Decoder(nn.Module):
    """Token decoder with teacher-forced and step-decode paths."""

    cfg: ModelConfig

    def setup(self):
        c, dt = self.cfg, _dtype(self.cfg)
        self.embed = nn.Embed(c.vocab_size, c.d_model,
                              embedding_init=nn.initializers.normal(1.0),
                              dtype=dt, name="embed")
        self.rel_bias = RelativePositionBias(
            c.num_heads, c.rel_attn_num_buckets, c.rel_attn_max_distance,
            bidirectional=False, dtype=jnp.float32, name="rel_bias")
        self.layers = [T5DecoderLayer(c, name=f"layer_{i}")
                       for i in range(c.num_decoder_layers)]
        self.final_norm = RMSNorm(dtype=dt, name="final_norm")
        self.lm_head = QuantDense(c.vocab_size, dtype=dt, name="lm_head")
        self.drop = nn.Dropout(c.dropout_rate)

    def _causal_bias(self, L: int) -> jnp.ndarray:
        rel = self.rel_bias(L, L)  # (1,H,L,L) fp32
        i = jnp.arange(L)[:, None]
        j = jnp.arange(L)[None, :]
        return rel + jnp.where(j > i, NEG_INF, 0.0)[None, None]

    def __call__(self, decoder_input_ids: jnp.ndarray, enc_out: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """(B, L) ids + (B, T, D) encoder output → (B, L, vocab) logits."""
        y = self.embed(decoder_input_ids)
        y = self.drop(y, deterministic=deterministic)
        bias = self._causal_bias(decoder_input_ids.shape[1])
        for lyr in self.layers:
            y = lyr(y, enc_out, bias, deterministic)
        y = self.final_norm(y)
        return self.lm_head(y).astype(jnp.float32)

    # ---- decode-time helpers (used under jit by models/decoding.py) ----
    def init_cross_kv(self, enc_out: jnp.ndarray) -> List[KV]:
        kvs = [lyr.cross_attn.project_kv(enc_out) for lyr in self.layers]
        if self.cfg.kv_quant == "int8c4p":
            # int8 SELF + Pallas int4 CROSS: split-half dk-major packing
            # read by ops/pallas/decode_attention.int4_cross_attention —
            # the packed bytes are read exactly once per step (XLA's
            # int4 path must either materialize the unpack or read the
            # packed array twice; both measured losses, int4_ablation_r3)
            from ..ops.kv_quant import quantize_kv4_crosspack
            return [(quantize_kv4_crosspack(k), quantize_kv4_crosspack(v))
                    for k, v in kvs]
        if self.cfg.kv_quant in ("int4", "int8c4"):
            # int8c4 = int8 SELF + int4 CROSS: cross reads dominate short
            # multi-channel decodes and are re-read every step, so they
            # take the cheaper format while the self cache keeps int8.
            from ..ops.kv_quant import quantize_kv4
            return [(quantize_kv4(k), quantize_kv4(v)) for k, v in kvs]
        if self.cfg.kv_quant == "int8":
            from ..ops.kv_quant import quantize_kv
            return [(quantize_kv(k), quantize_kv(v)) for k, v in kvs]
        if self.cfg.use_pallas_decode:
            # paged layout for the fused cross-attention kernel; block must
            # divide T exactly (no padded columns → no masking needed)
            T = enc_out.shape[-2]
            block = next((b for b in (128, 64, 32, 16, 8) if T % b == 0),
                         None)
            if block is not None:
                from ..ops.pallas.decode_attention import dense_to_paged
                kvs = [(dense_to_paged(k, block), dense_to_paged(v, block))
                       for k, v in kvs]
        return kvs

    def step_bias(self, pos: jnp.ndarray, L: int) -> jnp.ndarray:
        """(1, H, 1, L) bias for query position `pos` (traced scalar)."""
        table = self.rel_bias.variables["params"]["rel_embedding"]
        j = jnp.arange(L)
        buckets = relative_position_bucket(
            j[None, :] - pos, bidirectional=False,
            num_buckets=self.cfg.rel_attn_num_buckets,
            max_distance=self.cfg.rel_attn_max_distance)
        bias = table[buckets[0]]  # (L, H)
        bias = bias.T[None, :, None, :]  # (1,H,1,L)
        return bias + jnp.where(j > pos, NEG_INF, 0.0)[None, None, None, :]

    def decode_step(self, token_ids: jnp.ndarray, pos: jnp.ndarray,
                    self_kvs: List[KV], cross_kvs: List[KV],
                    kv_len: int = 0) -> Tuple[jnp.ndarray, List[KV]]:
        """token_ids: (B, 1) current tokens; pos: scalar position.
        kv_len: static dense-read horizon (see T5DecoderLayer.decode_step).
        → ((B, vocab) logits, updated self KV caches)."""
        y = self.embed(token_ids)
        skv = self_kvs[0][0]
        if isinstance(skv, tuple):  # int8 cache: (values, scales)
            skv = skv[0]
        if self.cfg.use_pallas_decode:
            # hand the raw bucket table to the kernel (in-kernel bias)
            bias = ("table",
                    self.rel_bias.variables["params"]["rel_embedding"])
        else:
            L = (skv.shape[0] * skv.shape[3]) if skv.ndim == 5 else skv.shape[2]
            bias = self.step_bias(pos, kv_len or L)
        new_kvs: List[KV] = []
        for lyr, skv, ckv in zip(self.layers, self_kvs, cross_kvs):
            y, nkv = lyr.decode_step(y, skv, pos, ckv, bias, kv_len=kv_len)
            new_kvs.append(nkv)
        y = self.final_norm(y)
        logits = self.lm_head(y).astype(jnp.float32)
        return logits[:, 0, :], new_kvs


class MultiChannelT5Decoder(nn.Module):
    """C parallel decoder streams with SHARED weights; channel c
    cross-attends only its own (B, T, D) encoder-latent slice.

    Implementation: fold channels into batch — (B, C, ...) → (B·C, ...) —
    and run the ordinary T5Decoder. Shared weights fall out for free and
    every GEMM keeps its full MXU tiling (reference `MultiChannelT5Decoder`,
    SURVEY.md C20/§3.5).
    """

    cfg: ModelConfig

    def setup(self):
        self.decoder = T5Decoder(self.cfg, name="decoder")

    def __call__(self, decoder_input_ids: jnp.ndarray, enc_out: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """ids: (B, C, L); enc_out: (B, C, T, D) → (B, C, L, vocab)."""
        B, C, L = decoder_input_ids.shape
        T, D = enc_out.shape[2], enc_out.shape[3]
        logits = self.decoder(decoder_input_ids.reshape(B * C, L),
                              enc_out.reshape(B * C, T, D), deterministic)
        return logits.reshape(B, C, L, -1)

    def init_cross_kv(self, enc_out: jnp.ndarray) -> List[KV]:
        B, C, T, D = enc_out.shape
        return self.decoder.init_cross_kv(enc_out.reshape(B * C, T, D))

    def decode_step(self, token_ids: jnp.ndarray, pos: jnp.ndarray,
                    self_kvs: List[KV], cross_kvs: List[KV],
                    kv_len: int = 0) -> Tuple[jnp.ndarray, List[KV]]:
        """token_ids: (B·C, 1) — channel-folded, same as the caches."""
        return self.decoder.decode_step(token_ids, pos, self_kvs, cross_kvs,
                                        kv_len=kv_len)
