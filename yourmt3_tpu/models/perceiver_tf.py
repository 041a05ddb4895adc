"""Perceiver-TF encoder: spectral cross-attention onto latents +
alternating temporal/spectral self-attention.

Capability parity target: reference `model/perceiver_mod.py` /
`model/perceiver_helper.py` `PerceiverTFEncoder` (SURVEY.md C22, §3.5):
per-frame spectral cross-attention (SCA) onto K latents, then
`ptf_num_blocks` × [temporal SA across the 256 frames (per latent) +
spectral SA across the K latents (per frame)], optional MoE FF, trainable
temporal position encoding. Output (B, T, K, D).

TPU-first: both SA factorizations fold the orthogonal axis into batch —
temporal SA runs at (B·K, T, D), spectral SA at (B·T, K, D) — so every
attention matmul stays large and MXU-tiled; no gather/scatter, no masks.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config.model import ModelConfig
from .conv_block import ConvPreEncoder
from .layers import (FeedForward, MoEFeedForward, MultiHeadAttention,
                     RMSNorm)

Dtype = Any


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class PTFBlockAttention(nn.Module):
    """Pre-norm self-attention + FF over the last-two axes (L, D)."""

    cfg: ModelConfig
    name_prefix: str = ""

    def setup(self):
        c, dt = self.cfg, _dtype(self.cfg)
        d = c.ptf_d_latent
        heads = max(1, d // 32)
        self.norm_attn = RMSNorm(dtype=dt, name="norm_attn")
        self.attn = MultiHeadAttention(heads, d // heads, d, dt, name="attn")
        self.norm_ff = RMSNorm(dtype=dt, name="norm_ff")
        if c.ptf_num_moe_experts > 0:
            self.ff = MoEFeedForward(c.ptf_num_moe_experts, d * 4, d,
                                     top_k=c.ptf_moe_topk, act=c.ptf_ff_act,
                                     dtype=dt, name="ff")
        else:
            self.ff = FeedForward(d * 4, d, act=c.ptf_ff_act,
                                  dropout_rate=c.dropout_rate, dtype=dt,
                                  name="ff")
        self.drop = nn.Dropout(c.dropout_rate)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = self.norm_attn(x)
        x = x + self.drop(self.attn(h, h, None), deterministic=deterministic)
        h = self.norm_ff(x)
        x = x + self.drop(self.ff(h, deterministic=deterministic),
                          deterministic=deterministic)
        return x


class PerceiverTFEncoder(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c, dt = self.cfg, _dtype(self.cfg)
        d = c.ptf_d_latent
        if c.use_conv_pre_encoder:
            self.pre = ConvPreEncoder(channels=c.conv_channels, dtype=dt,
                                      name="conv_pre")
        self.spectral_proj = nn.Dense(d, use_bias=False, dtype=dt,
                                      name="spectral_proj")
        self.latents = self.param("latents", nn.initializers.normal(0.02),
                                  (c.ptf_num_latents, d), jnp.float32)
        heads = max(1, d // 32)
        self.sca_norm_q = RMSNorm(dtype=dt, name="sca_norm_q")
        self.sca_norm_kv = RMSNorm(dtype=dt, name="sca_norm_kv")
        self.sca = MultiHeadAttention(heads, d // heads, d, dt, name="sca")
        self.sca_ff_norm = RMSNorm(dtype=dt, name="sca_ff_norm")
        self.sca_ff = FeedForward(d * 4, d, act=c.ptf_ff_act,
                                  dropout_rate=c.dropout_rate, dtype=dt,
                                  name="sca_ff")
        self.temporal_blocks = [PTFBlockAttention(c, name=f"temporal_{i}")
                                for i in range(c.ptf_num_blocks)]
        self.spectral_blocks = [PTFBlockAttention(c, name=f"spectral_{i}")
                                for i in range(c.ptf_num_blocks)]
        # trainable temporal position embedding (reference ptf_pos_enc)
        self.time_pos = self.param("time_pos", nn.initializers.normal(0.02),
                                   (1024, d), jnp.float32)
        self.final_norm = RMSNorm(dtype=dt, name="final_norm")
        self.drop = nn.Dropout(c.dropout_rate)

    def __call__(self, feats: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """(B, T, F) → (B, T, K, D) latent grid."""
        c, dt = self.cfg, _dtype(self.cfg)
        B, T, F = feats.shape
        x = feats.astype(dt)
        if c.use_conv_pre_encoder:
            tok = self.pre(x)  # (B, T, F', ch)
        else:
            tok = x[..., None]  # (B, T, F, 1)
        tok = self.spectral_proj(tok)  # (B, T, F', D)
        Fp = tok.shape[2]
        K, D = c.ptf_num_latents, c.ptf_d_latent

        # --- spectral cross-attention per frame: fold T into batch ------
        tok = tok.reshape(B * T, Fp, D)
        q = jnp.broadcast_to(self.latents.astype(dt)[None], (B * T, K, D))
        h = self.sca(self.sca_norm_q(q), self.sca_norm_kv(tok), None)
        z = q + h if c.ptf_sca_use_query_residual else h
        z = z + self.sca_ff(self.sca_ff_norm(z), deterministic=deterministic)
        z = z.reshape(B, T, K, D)

        # --- temporal position encoding ---------------------------------
        z = z + self.time_pos[:T].astype(dt)[None, :, None, :]

        # --- alternating temporal / spectral self-attention --------------
        for tb, sb in zip(self.temporal_blocks, self.spectral_blocks):
            zt = z.transpose(0, 2, 1, 3).reshape(B * K, T, D)
            zt = tb(zt, deterministic)
            z = zt.reshape(B, K, T, D).transpose(0, 2, 1, 3)
            zs = z.reshape(B * T, K, D)
            zs = sb(zs, deterministic)
            z = zs.reshape(B, T, K, D)
        return self.final_norm(z)
