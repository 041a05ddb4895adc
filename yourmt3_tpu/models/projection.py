"""Encoder→decoder projection / channel-grouping adapters.

Capability parity target: reference `model/projection_layer.py` +
`model/lm_head.py` (SURVEY.md C24): linear/MLP dim adapters and the
grouped per-channel projection that maps Perceiver-TF latents onto
multi-channel decoder memory.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config.model import ModelConfig


class EncoderProjection(nn.Module):
    """Adapts encoder output to decoder memory of shape (B, C, T, D).

    - t5 encoder (B, T, D_enc), C == 1 → linear/identity to (B, 1, T, D).
    - perceiver-tf encoder (B, T, K, D_lat), C ≥ 1 → group K latents into C
      groups of K//C, flatten each group, project to D ("group-linear").
    """

    cfg: ModelConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, enc_out: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        if enc_out.ndim == 3:  # (B, T, D_enc) from t5/conformer
            B, T, D = enc_out.shape
            if c.proj_type == "mlp":
                h = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                             name="proj_in")(enc_out)
                h = nn.gelu(h)
                h = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                             name="proj_out")(h)
            elif c.proj_type == "depthwise-conv":
                # depthwise temporal conv + pointwise dim adapter
                # (reference projection_layer.py conv variant, SURVEY C24)
                h = nn.Conv(D, kernel_size=(3,), feature_group_count=D,
                            use_bias=False, dtype=self.dtype,
                            name="dw_conv")(enc_out)
                h = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                             name="pw_proj")(h)
            elif D != c.d_model or c.proj_type == "linear-forced":
                h = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                             name="proj")(enc_out)
            else:
                h = enc_out
            if c.num_channels == 1:
                return h[:, None]
            # replicate memory across channels (task-token conditioning case)
            return jnp.repeat(h[:, None], c.num_channels, axis=1)

        # (B, T, K, D_lat) from perceiver-tf
        B, T, K, D = enc_out.shape
        C = c.num_channels
        if K % C != 0:
            raise ValueError(f"num_latents {K} not divisible by channels {C}")
        g = K // C
        h = enc_out.reshape(B, T, C, g * D).transpose(0, 2, 1, 3)  # (B,C,T,gD)
        if c.proj_type == "group-conv":
            # depthwise temporal conv per channel group before the linear
            # adapter (conv variant of the grouped projection, SURVEY C24)
            gd = g * D
            h = h.reshape(B * C, T, gd)
            h = nn.Conv(gd, kernel_size=(3,), feature_group_count=gd,
                        use_bias=False, dtype=self.dtype,
                        name="group_dw_conv")(h)
            h = h.reshape(B, C, T, gd)
        h = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                     name="group_proj")(h)
        return h  # (B, C, T, d_model)
