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
    the K dot is bit-equivalent to the fp32 cast at HALF the VMEM staging
    bytes (the measured flagship decode overhead is staging, not FLOPs);
    both dots still accumulate in fp32 via preferred_element_type."""
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
