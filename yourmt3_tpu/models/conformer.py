"""Conformer encoder (ablation-alternative encoder).

Capability parity target: reference `model/conformer_mod.py` /
`conformer_helper.py` `ConformerYMT3Encoder` (SURVEY.md C23): conformer
blocks — half-FFN sandwich, self-attention with relative position bias,
depthwise-conv module — over the 256-frame feature sequence.

TPU notes: depthwise conv uses feature_group_count (XLA lowers to an
efficient TPU conv); norms are RMS and accumulate fp32; attention reuses
the shared T5-style MHA so the MXU shapes match the rest of the stack.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config.model import ModelConfig
from .layers import MultiHeadAttention, RelativePositionBias, RMSNorm


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class ConformerConvModule(nn.Module):
    d_model: int
    kernel_size: int = 15
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = RMSNorm(dtype=self.dtype)(x)
        h = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype,
                     name="pointwise_in")(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                    feature_group_count=self.d_model, use_bias=False,
                    dtype=self.dtype, name="depthwise")(h)
        h = RMSNorm(dtype=self.dtype, name="conv_norm")(h)
        h = nn.silu(h)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        name="pointwise_out")(h)


class ConformerFFN(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = RMSNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype, name="wi")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        name="wo")(h)


class ConformerBlock(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c, dt = self.cfg, _dtype(self.cfg)
        x = x + 0.5 * ConformerFFN(c.d_model, c.d_ff, c.dropout_rate, dt,
                                   name="ffn1")(x, deterministic)
        h = RMSNorm(dtype=dt, name="attn_norm")(x)
        x = x + MultiHeadAttention(c.num_heads, c.d_kv, c.d_model, dt,
                                   name="attn")(h, h, bias)
        x = x + ConformerConvModule(c.d_model, dtype=dt, name="conv")(x)
        x = x + 0.5 * ConformerFFN(c.d_model, c.d_ff, c.dropout_rate, dt,
                                   name="ffn2")(x, deterministic)
        return RMSNorm(dtype=dt, name="final_norm")(x)


class ConformerEncoder(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """(B, T, F) → (B, T, d_model)."""
        c, dt = self.cfg, _dtype(self.cfg)
        x = nn.Dense(c.d_model, use_bias=False, dtype=dt,
                     name="input_proj")(feats.astype(dt))
        pos = None
        if c.encoder_abs_pos in ("sinusoidal", "sinusoidal_per_block"):
            # absolute time anchor for MT3 shift tokens (see config.model)
            from .layers import sinusoidal_positions
            pos = jnp.asarray(sinusoidal_positions(x.shape[1], c.d_model),
                              dt)[None]
            x = x + pos
        bias = RelativePositionBias(
            c.num_heads, c.rel_attn_num_buckets, c.rel_attn_max_distance,
            bidirectional=True, dtype=dt, name="rel_bias")(x.shape[1], x.shape[1])
        for i in range(c.num_encoder_layers):
            if c.encoder_abs_pos == "sinusoidal_per_block" and i > 0:
                # Re-anchor absolute time at EVERY block input. Input-only
                # injection measurably washes out: the 6 k-step conformer
                # moved 1/11 shift argmaxes under a +0.5 s audio shift
                # (EVIDENCE.md round 3) — the bidirectional rel-bias
                # attention + conv modules erase the one-shot sinusoid,
                # while the Perceiver's latent-axis injection survives.
                # Parameter-free but NOT numerics-compatible with the
                # input-only forward, so it is a DISTINCT config value that
                # checkpoint meta records: plain "sinusoidal" checkpoints
                # restore with input-only injection (their training
                # forward), "sinusoidal_per_block" with this one.
                x = x + pos
            x = ConformerBlock(c, name=f"block_{i}")(x, bias, deterministic)
        return x
