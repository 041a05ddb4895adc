"""Convolutional pre-encoder: spectrogram → downsampled spectral tokens.

Capability parity target: reference `model/conv_block.py`
`PreEncoderBlockRes3B` (SURVEY.md C19): hFT-transformer-style residual
conv stack that downsamples the frequency axis before Perceiver-TF.

TPU note: NHWC conv layout ((B, T, F, C) with C minor) is the
MXU-friendly layout for XLA:TPU convolutions.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class ResConvBlock(nn.Module):
    channels: int
    freq_stride: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, F, C) → (B, T, F//stride, channels)."""
        h = nn.Conv(self.channels, (3, 3), strides=(1, self.freq_stride),
                    padding="SAME", dtype=self.dtype, name="conv_down")(x)
        h = nn.gelu(h)
        r = h
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_a")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_b")(h)
        h = nn.gelu(h + r)
        return h


class ConvPreEncoder(nn.Module):
    """3 residual blocks, each halving F: (B, T, F) → (B, T, F//8, C)."""

    channels: int = 128
    num_blocks: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = feats[..., None].astype(self.dtype)  # (B, T, F, 1)
        ch = self.channels
        for i in range(self.num_blocks):
            x = ResConvBlock(ch, freq_stride=2, dtype=self.dtype,
                             name=f"block_{i}")(x)
        return x  # (B, T, F // 2**num_blocks, channels)
