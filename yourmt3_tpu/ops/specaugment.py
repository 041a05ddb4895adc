"""SpecAugment on device: time/freq masking over (B, T, F) features.

BASELINE config 4 requires "spec-augment/pitch-aug preproc fused
on-device". Pure jnp — XLA fuses the mask generation and application into
the surrounding frontend/encoder program; no host RNG, no dynamic shapes
(masks are built with broadcasted_iota comparisons).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    num_time_masks: int = 2
    time_mask_width: int = 32  # frames (of 256)
    num_freq_masks: int = 2
    freq_mask_width: int = 48  # bins
    mask_value: str = "mean"  # "mean" | "zero" | "min"


def _axis_mask(key: jax.Array, length: int, max_width: int, batch: int,
               n_masks: int) -> jnp.ndarray:
    """(B, length) bool: True where masked."""
    k1, k2 = jax.random.split(key)
    widths = jax.random.randint(k1, (batch, n_masks, 1), 0, max_width + 1)
    starts = jax.random.randint(k2, (batch, n_masks, 1), 0,
                                jnp.maximum(length - widths[..., 0], 1)[..., None])
    pos = jax.lax.broadcasted_iota(jnp.int32, (batch, n_masks, length), 2)
    m = (pos >= starts) & (pos < starts + widths)
    return jnp.any(m, axis=1)


def spec_augment(key: jax.Array, feats: jnp.ndarray,
                 cfg: SpecAugmentConfig = SpecAugmentConfig()) -> jnp.ndarray:
    """(B, T, F) → masked (B, T, F). Apply only in training."""
    B, T, F = feats.shape
    kt, kf = jax.random.split(key)
    tmask = _axis_mask(kt, T, cfg.time_mask_width, B, cfg.num_time_masks)
    fmask = _axis_mask(kf, F, cfg.freq_mask_width, B, cfg.num_freq_masks)
    mask = tmask[:, :, None] | fmask[:, None, :]
    if cfg.mask_value == "zero":
        fill = jnp.zeros((B, 1, 1), feats.dtype)
    elif cfg.mask_value == "min":
        fill = feats.min(axis=(1, 2), keepdims=True)
    else:
        fill = feats.mean(axis=(1, 2), keepdims=True)
    return jnp.where(mask, fill, feats)


def make_augment_fn(cfg: Optional[SpecAugmentConfig] = None):
    cfg = cfg or SpecAugmentConfig()
    return functools.partial(spec_augment, cfg=cfg)
