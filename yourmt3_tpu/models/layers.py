"""Shared transformer building blocks (flax.linen).

Capability parity targets: reference `model/t5mod.py` internals (RMSNorm,
relative position bias — SURVEY.md C20), `model/ff_layer.py` (gated/MoE
FF variants — C24), `model/positional_encoding.py` (C24).

TPU-first conventions used throughout the model stack:
- params fp32, activations bfloat16, softmax/normalization accumulate fp32;
- every matmul declares preferred_element_type=float32 so the MXU
  accumulates in fp32;
- no data-dependent shapes anywhere; masks are additive -inf biases.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any
NEG_INF = -1e9


class RMSNorm(nn.Module):
    """T5-style RMSNorm: no bias, no mean subtraction, fp32 accumulation."""

    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype)


def relative_position_bucket(relative_position: jnp.ndarray,
                             bidirectional: bool,
                             num_buckets: int,
                             max_distance: int) -> jnp.ndarray:
    """T5 relative-position bucketing (symbolic; used at trace time only)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """Bucketed relative attention bias (one table per stack, layer 0)."""

    num_heads: int
    num_buckets: int = 32
    max_distance: int = 128
    bidirectional: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q_len: int, k_len: int) -> jnp.ndarray:
        """→ (1, H, q_len, k_len) additive bias."""
        table = self.param("rel_embedding", nn.initializers.normal(0.02),
                           (self.num_buckets, self.num_heads), jnp.float32)
        ctx = jnp.arange(q_len)[:, None]
        mem = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(mem - ctx, self.bidirectional,
                                           self.num_buckets, self.max_distance)
        bias = table[buckets]  # (q, k, H)
        return jnp.transpose(bias, (2, 0, 1))[None].astype(self.dtype)


class QuantDense(nn.Module):
    """Bias-free Dense that prefers a quantized side-car kernel.

    Without a `qweights` collection in scope this is bit-identical to
    `nn.Dense(features, use_bias=False, dtype=dtype)` — same param name
    ("kernel"), same fp32 param dtype, same promote-then-dot numerics —
    so training, checkpoints, and the weight importer are unaffected.

    When the caller applies the model with
    `{"params": p, "qweights": quantize_decoder_weights(p, mode)}`
    (ops/weight_quant.py), the module reads its int8/bf16 `kernel_q`
    instead: HBM weight reads drop to 1–2 bytes/element inside the
    decode while-loop, and the per-output-channel dequant scale fuses
    into the matmul output. The fp32 master kernel goes unread, so XLA
    dead-code-eliminates its loads."""

    features: int
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        contract = ((x.ndim - 1,), (0,)), ((), ())
        if self.has_variable("qweights", "kernel_q"):
            wq = self.get_variable("qweights", "kernel_q")
            y = jax.lax.dot_general(x.astype(self.dtype),
                                    wq.astype(self.dtype), contract)
            if self.has_variable("qweights", "kernel_scale"):
                sc = self.get_variable("qweights", "kernel_scale")
                y = (y.astype(jnp.float32) * sc).astype(self.dtype)
            return y
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        from flax.linen.dtypes import promote_dtype
        x, kernel = promote_dtype(x, kernel, dtype=self.dtype)
        return jax.lax.dot_general(x, kernel, contract)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B,H,Tq,D),(B,H,Tk,D),(B,H,Tk,Dv)[,(·,H,Tq,Tk)] → (B,H,Tq,Dv).

    T5 convention: no 1/sqrt(d) scaling (folded into init). Softmax in fp32.
    """
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class MultiHeadAttention(nn.Module):
    """T5-style MHA. Projections are head-folded dense layers so the
    parameters are plain (d_model, H*dk) matrices — importer-friendly and
    MXU-shaped.

    num_kv_heads < num_heads ⇒ grouped-query attention (GQA; 1 = MQA):
    K/V project to num_kv_heads heads and each is shared by
    G = num_heads/num_kv_heads query heads (query head h attends KV head
    h // G). Attention stays ONE dot_general pair by folding the group
    axis into the query-time axis: q (B,H,T,dk) → (B,Hkv,G·T,dk) against
    K/V (B,Hkv,Tk,dk) — no KV materialized broadcast, so the decode-time
    cache reads (the HBM-bound term) really do shrink H/Hkv×."""

    num_heads: int
    d_kv: int
    d_model: int
    dtype: Dtype = jnp.bfloat16
    use_rope: bool = False  # rotary q/k over the sequence axis
    num_kv_heads: Optional[int] = None  # None ⇒ num_heads (plain MHA)

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    def setup(self):
        d_inner = self.num_heads * self.d_kv
        d_kv_inner = self.kv_heads * self.d_kv
        kinit = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
        # T5 omits the 1/sqrt(d_kv) attention scaling and folds it into the
        # QUERY init instead: q std = (d_model*d_kv)^-0.5, an extra d_kv^-0.5
        # vs fan-in (mesh-tf / HF T5Attention; reference model/t5mod.py
        # inherits it — SURVEY.md C20). Without it, init attention logits
        # have std ~ sqrt(d_kv) ≈ 8: a near-saturated softmax whose damage
        # compounds with depth — measured as the t5_base (12+12 layer)
        # lr-instability/stall in runs/t5base_r3 while the 4-layer presets
        # trained through it.
        qinit = nn.initializers.variance_scaling(1.0 / self.d_kv, "fan_in",
                                                 "normal")
        self.q = QuantDense(d_inner, dtype=self.dtype,
                            kernel_init=qinit, name="q")
        self.k = QuantDense(d_kv_inner, dtype=self.dtype,
                            kernel_init=kinit, name="k")
        self.v = QuantDense(d_kv_inner, dtype=self.dtype,
                            kernel_init=kinit, name="v")
        self.o = QuantDense(self.d_model, dtype=self.dtype,
                            kernel_init=kinit, name="o")

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.d_kv).transpose(0, 2, 1, 3)

    def _split_kv(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.kv_heads, self.d_kv).transpose(0, 2, 1, 3)

    def _merge(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, t, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)

    def group_queries(self, q: jnp.ndarray) -> jnp.ndarray:
        """(B, H, T, dk) → (B, Hkv, G·T, dk): query head h = hkv·G + g maps
        to row g·T+t of KV head hkv (plain reshape — (h,t) and (hkv,g,t)
        share memory order)."""
        b, h, t, d = q.shape
        return q.reshape(b, self.kv_heads, (h // self.kv_heads) * t, d)

    def ungroup_heads(self, x: jnp.ndarray, t: int) -> jnp.ndarray:
        """(B, Hkv, G·T, dk) → (B, H, T, dk) (inverse of group_queries)."""
        b = x.shape[0]
        return x.reshape(b, self.num_heads, t, x.shape[-1])

    def group_bias(self, bias: Optional[jnp.ndarray],
                   t: int) -> Optional[jnp.ndarray]:
        """(·, H or 1, T, Tk) → (·, Hkv, G·T, Tk) matching group_queries."""
        if bias is None:
            return None
        if bias.shape[1] == 1:  # head-free mask: broadcast over heads first
            bias = jnp.broadcast_to(
                bias, bias.shape[:1] + (self.num_heads,) + bias.shape[2:])
        g = self.num_heads // self.kv_heads
        return bias.reshape(bias.shape[0], self.kv_heads, g * t,
                            bias.shape[-1])

    def __call__(self, x_q: jnp.ndarray, x_kv: jnp.ndarray,
                 bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        q = self._split(self.q(x_q))
        k = self._split_kv(self.k(x_kv))
        v = self._split_kv(self.v(x_kv))
        if self.use_rope:
            q, k = rope_rotate(q), rope_rotate(k)
        if self.kv_heads != self.num_heads:
            t = q.shape[2]
            out = dot_product_attention(self.group_queries(q), k, v,
                                        self.group_bias(bias, t))
            out = self.ungroup_heads(out, t)
        else:
            out = dot_product_attention(q, k, v, bias)
        return self.o(self._merge(out))

    # --- explicit-KV paths for autoregressive decoding -----------------
    def project_kv(self, x_kv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._split_kv(self.k(x_kv)), self._split_kv(self.v(x_kv))

    def attend_step(self, x_q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x_q: (B, 1, d_model) against externally-managed K/V
        (B, Hkv, L, dk)."""
        q = self._split(self.q(x_q))
        if self.kv_heads != self.num_heads:
            t = q.shape[2]
            out = dot_product_attention(self.group_queries(q), k, v,
                                        self.group_bias(bias, t))
            out = self.ungroup_heads(out, t)
        else:
            out = dot_product_attention(q, k, v, bias)
        return self.o(self._merge(out))


def rope_rotate(x: jnp.ndarray, base: float = 10000.0) -> jnp.ndarray:
    """Rotary position embedding over the sequence axis.

    x: (B, H, T, dk) with dk even → same shape, each head-dim pair
    rotated by position-dependent angles (reference `positional_
    encoding.py` RoPE option, SURVEY.md C24)."""
    B, H, T, dk = x.shape
    half = dk // 2
    freqs = 1.0 / (base ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = jnp.arange(T, dtype=jnp.float32)[:, None] * freqs[None]  # (T, half)
    cos = jnp.cos(ang)[None, None]
    sin = jnp.sin(ang)[None, None]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)
    return out.astype(x.dtype)


def alibi_slopes(num_heads: int) -> np.ndarray:
    """ALiBi per-head slopes: geometric sequence starting at 2^(-8/H)."""
    start = 2.0 ** (-8.0 / num_heads)
    return start ** np.arange(1, num_heads + 1)


def alibi_bias(num_heads: int, q_len: int, k_len: int) -> jnp.ndarray:
    """(1, H, q_len, k_len) additive bias: -slope·|i-j| (bidirectional
    variant — the encoder attends both ways)."""
    slopes = jnp.asarray(alibi_slopes(num_heads), jnp.float32)
    dist = jnp.abs(jnp.arange(k_len)[None, :] - jnp.arange(q_len)[:, None])
    return (-slopes[:, None, None] * dist[None].astype(jnp.float32))[None]


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
}


class FeedForward(nn.Module):
    """T5.1.1 gated FF (wi_0 ⊙ act(wi_1) → wo) or plain act FF."""

    d_ff: int
    d_model: int
    act: str = "gated-gelu"
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        kinit = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
        if self.act.startswith("gated-"):
            a = ACTIVATIONS[self.act.split("-")[1]]
            g = QuantDense(self.d_ff, dtype=self.dtype,
                           kernel_init=kinit, name="wi_0")(x)
            h = QuantDense(self.d_ff, dtype=self.dtype,
                           kernel_init=kinit, name="wi_1")(x)
            y = a(g) * h
        else:
            y = ACTIVATIONS[self.act](
                QuantDense(self.d_ff, dtype=self.dtype,
                           kernel_init=kinit, name="wi")(x))
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return QuantDense(self.d_model, dtype=self.dtype,
                          kernel_init=kinit, name="wo")(y)


class MoEFeedForward(nn.Module):
    """Token-choice top-k Mixture-of-Experts FF (reference `ff_layer.py` MoE
    option, SURVEY.md C24). Dense-per-device: experts are a batched einsum —
    no all-to-all needed at this expert count (SURVEY.md §2.3 EP row).

    TPU note: implemented as dense compute over all experts with a top-k
    mask, trading FLOPs for uniform shapes — at 4–8 experts and d_ff ≤ 2k
    this is faster on the MXU than scatter/gather routing.
    """

    num_experts: int
    d_ff: int
    d_model: int
    top_k: int = 2
    act: str = "gelu"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, t, d = x.shape
        router = nn.Dense(self.num_experts, use_bias=False,
                          dtype=jnp.float32, name="router")(x.astype(jnp.float32))
        probs = jax.nn.softmax(router, axis=-1)  # (b, t, E)
        top_p, top_i = jax.lax.top_k(probs, self.top_k)
        # sparse gate: scatter the top-k probs back over experts
        gate = jnp.zeros_like(probs)
        for j in range(self.top_k):
            gate = gate + jax.nn.one_hot(top_i[..., j], self.num_experts,
                                         dtype=probs.dtype) * top_p[..., j:j + 1]
        gate = gate / (jnp.sum(gate, axis=-1, keepdims=True) + 1e-9)

        wi = self.param("wi", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                        (self.num_experts, d, self.d_ff), jnp.float32)
        wo = self.param("wo", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                        (self.num_experts, self.d_ff, d), jnp.float32)
        a = ACTIVATIONS[self.act]
        # fp32 expert compute: CPU XLA lacks mixed bf16→f32 dot thunks for
        # the backward of batched einsums, and at ≤8 experts the fp32 cost
        # is negligible next to the attention stacks.
        x32 = x.astype(jnp.float32)
        h = a(jnp.einsum("btd,edf->btef", x32, wi))
        y = jnp.einsum("btef,efd->bted", h, wo)
        return jnp.einsum("bted,bte->btd", y, gate).astype(self.dtype)


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    i = np.arange(dim // 2)[None, :]
    angle = pos / np.power(10000.0, 2 * i / dim)
    out = np.zeros((length, dim), np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    return out


def causal_bias(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, L, L) additive causal mask."""
    mask = np.triu(np.full((length, length), NEG_INF, np.float32), k=1)
    return jnp.asarray(mask, dtype)[None, None]
