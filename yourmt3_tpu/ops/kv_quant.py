"""Per-position int8 KV-cache quantization for autoregressive decode.

Decode attention is HBM-bandwidth-bound on KV cache reads (flagship
perceiver_tf_mc13: 16 attention reads × ~41 MB of bf16 KV per step ≈ 75%
of the measured step time). Quantizing K and V to int8 with one fp32
scale per (stream, head, position) row halves that traffic; the dequant
multiply fuses into the attention einsum on the VPU.

Error analysis: for a row with max |x| = m, the quantization step is
m/127, so per-element error ≤ m/254 (~0.4% of row max). A q·k dot over
dk=64 dims accumulates ~0.7% relative logit noise — far below softmax
temperature at T5 logit scales; greedy token flips occur only on
near-exact ties. (Parity-critical runs can set kv_quant="none".)

Reference note: the PyTorch reference (SURVEY.md C20/C21) keeps fp16/bf16
KV caches; this is a TPU-native optimization, config-gated off by default.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

QKV = Tuple[jnp.ndarray, jnp.ndarray]  # (int8 values, fp32 row scales)


def quantize_kv(x: jnp.ndarray) -> QKV:
    """(..., dk) float → ((..., dk) int8, (...,) fp32 scales)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0  # (..., )
    safe = jnp.maximum(scale, 1e-30)
    q = jnp.round(xf / safe[..., None]).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale[..., None]


def quantize_kv4(x: jnp.ndarray) -> QKV:
    """(..., dk) float → ((..., dk//2) uint8 nibble-packed, (...,) fp32).

    4-bit symmetric per-row quantization: values in [-7, 7], stored
    biased (+8) so a zero-initialized cache byte decodes to -8 — harmless
    because empty positions carry ZERO scales (their logit/value
    contribution is exactly 0, same trick as the int8 caches). Element
    2i is the LOW nibble of byte i, element 2i+1 the HIGH nibble."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 7.0
    safe = jnp.maximum(scale, 1e-30)
    q = jnp.clip(jnp.round(xf / safe[..., None]), -7, 7).astype(jnp.int32)
    lo = (q[..., 0::2] + 8).astype(jnp.uint8)
    hi = (q[..., 1::2] + 8).astype(jnp.uint8)
    return lo | (hi << 4), scale


def unpack_kv4(p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """packed (..., dk//2) uint8 → (lo, hi) bf16 value planes in [-7, 7]
    (interleaved original = stack([lo, hi], -1).reshape(..., dk))."""
    lo = ((p & 0xF).astype(jnp.int8) - 8).astype(jnp.bfloat16)
    hi = ((p >> 4).astype(jnp.int8) - 8).astype(jnp.bfloat16)
    return lo, hi


def int4_decode_attention(q: jnp.ndarray,  # (S, H, 1, dk) float
                          k_p: jnp.ndarray,  # (S, H, L, dk//2) uint8 packed
                          k_s: jnp.ndarray,  # (S, H, L) fp32
                          v_p: jnp.ndarray,  # (S, H, L, dk//2) uint8 packed
                          v_s: jnp.ndarray,  # (S, H, L) fp32
                          bias  # (1, H, 1, L) additive or None
                          ) -> jnp.ndarray:
    """softmax(q·K^T + bias)·V with nibble-packed int4 K/V: HBM reads are
    the packed uint8 (half of int8). The dot never materializes an
    interleaved dequant: q·k = q_even·k_lo + q_odd·k_hi (element 2i pairs
    with the low nibble), and the V output plane-splits the same way —
    the unpack stays elementwise producers feeding the two half-width
    dots. int4 values are exact in bf16; both dots accumulate fp32."""
    dn = (((3,), (3,)), ((0, 1), (0, 1)))
    k_lo, k_hi = unpack_kv4(k_p)
    qb = q.astype(jnp.bfloat16)
    logits = (jax.lax.dot_general(qb[..., 0::2], k_lo, dn,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(qb[..., 1::2], k_hi, dn,
                                    preferred_element_type=jnp.float32))
    logits = logits * k_s[:, :, None, :]
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    w = (w * v_s[:, :, None, :]).astype(jnp.bfloat16)
    v_lo, v_hi = unpack_kv4(v_p)
    dnv = (((3,), (2,)), ((0, 1), (0, 1)))
    out_lo = jax.lax.dot_general(w, v_lo, dnv,
                                 preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot_general(w, v_hi, dnv,
                                 preferred_element_type=jnp.float32)
    out = jnp.stack([out_lo, out_hi], axis=-1)
    out = out.reshape(*out_lo.shape[:-1], out_lo.shape[-1] * 2)
    return out.astype(q.dtype)


def int8_decode_attention(q: jnp.ndarray,  # (S, H, 1, dk) float
                          k_q: jnp.ndarray,  # (S, H, L, dk) int8
                          k_s: jnp.ndarray,  # (S, H, L) fp32
                          v_q: jnp.ndarray,  # (S, H, L, dk) int8
                          v_s: jnp.ndarray,  # (S, H, L) fp32
                          bias  # (1, H, 1, L) additive (incl. mask) or None
                          ) -> jnp.ndarray:
    """softmax(q·K^T + bias)·V with int8 K/V dequantized inside the
    einsum fusions: logits scale by k_s per column; the V row scales fold
    into the softmax weights (exact algebra, no approximation beyond the
    int8 rounding itself).

    Staging dtype: the int8 operands are cast to BF16, not fp32 — int8
    values (≤127) are exactly representable in bf16 (8 mantissa bits), so
    staging K/V costs no precision at HALF the VMEM bytes (the measured
    flagship decode overhead is staging, not FLOPs); both dots accumulate
    fp32 via preferred_element_type. Two inputs ARE rounded to bf16 and
    were not in the earlier fp32-einsum version: q (a no-op on bf16
    compute configs, a real rounding on fp32 ones) and the softmax
    weights × v_s product (~0.4% relative). That noise is the same order
    as the int8 rounding this path accepts by construction; parity-
    critical decodes use kv_quant="none". Quality re-measured on the
    trained flagship: int8 within 0.5 onset-F1 pts of exact."""
    logits = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k_q.astype(jnp.bfloat16),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)  # (S, H, 1, L)
    logits = logits * k_s[:, :, None, :]
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    w = w * v_s[:, :, None, :]
    out = jax.lax.dot_general(
        w.astype(jnp.bfloat16), v_q.astype(jnp.bfloat16),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)  # (S, H, 1, dk)
    return out.astype(q.dtype)


def quantize_kv4_crosspack(x: jnp.ndarray) -> QKV:
    """(S, H, T, dk) float → ((S, H, dk//2, T) uint8, (S, H, T) fp32).

    Split-half int4 packing for the Pallas cross kernel
    (ops/pallas/decode_attention.int4_cross_attention): byte (d, t) holds
    element d in the low nibble and element d+dk/2 in the high nibble,
    both biased +8 (range [1, 15] for values in [-7, 7]); the layout is
    dk-MAJOR so the kernel's uint8 tile is (dk/2, T) — T lanes, zero tile
    padding. Per-(s,h,t)-row symmetric scales, same convention as
    quantize_kv4."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 7.0  # (S, H, T)
    safe = jnp.maximum(scale, 1e-30)
    q = jnp.clip(jnp.round(xf / safe[..., None]), -7, 7).astype(jnp.int32)
    dk2 = q.shape[-1] // 2
    lo = (q[..., :dk2] + 8).astype(jnp.uint8)
    hi = (q[..., dk2:] + 8).astype(jnp.uint8)
    packed = lo | (hi << 4)  # (S, H, T, dk2)
    return packed.transpose(0, 1, 3, 2), scale


def dequantize_kv4_crosspack(packed: jnp.ndarray,
                             scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quantize_kv4_crosspack (tests/reference paths)."""
    p = packed.transpose(0, 1, 3, 2).astype(jnp.int32)  # (S, H, T, dk2)
    lo = ((p & 15) - 8).astype(jnp.float32)
    hi = ((p >> 4) - 8).astype(jnp.float32)
    return jnp.concatenate([lo, hi], axis=-1) * scale[..., None]
