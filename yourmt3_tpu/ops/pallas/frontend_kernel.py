"""Fused log-mel frontend as a Pallas TPU kernel.

North-star requirement (BASELINE.json): "audio frontend ... becomes fused
Pallas/XLA kernels feeding directly into the model". The XLA einsum path
(ops/frontend.py) materializes (B,T,2048) frames and (B,T,1025) re/im
spectra in HBM; this kernel keeps everything in VMEM:

    grid = (B, T/Tt, F/Ft)   [F iterated innermost]
    per program:
      frames(Tt,2048)  built in-VMEM from the padded audio row
                       (16 shifted slices of the hop-blocked row — no gather)
      re,im            = frames @ windowed-DFT basis block (MXU, fp32 acc)
      mag              = sqrt(re²+im²)
      acc(Tt,M)       += mag @ mel block  (MXU)        [revisited output]
      last F step      → out = log(max(acc, eps))

HBM traffic: audio row + basis/mel blocks + (T,M) output only — the
(B,T,2048)/(B,T,1025) intermediates never exist.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config.audio import AudioConfig


def _kernel(audio_ref, cos_ref, sin_ref, mel_ref, out_ref, acc_ref, *,
            frames_per_tile: int, hop: int, n_fft: int, log_offset: float,
            power: float):
    f_idx = pl.program_id(2)
    n_f = pl.num_programs(2)
    t_idx = pl.program_id(1)

    @pl.when(f_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Build (Tt, n_fft) frames from the hop-blocked audio row.
    # audio_ref: (n_blocks, hop) where frame t = blocks[t : t+n_fft/hop].
    blocks_per_frame = n_fft // hop
    t0 = t_idx * frames_per_tile
    parts = []
    for k in range(blocks_per_frame):
        part = audio_ref[0, pl.ds(t0 + k, frames_per_tile), :]  # (Tt, hop)
        parts.append(part)
    frames = jnp.concatenate(parts, axis=1)  # (Tt, n_fft)

    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    if power == 2.0:
        mag = mag * mag
    acc_ref[:] += jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)

    @pl.when(f_idx == n_f - 1)
    def _():
        out_ref[0, :, :] = jnp.log(jnp.maximum(acc_ref[:], log_offset))


def fused_logmel(audio: jnp.ndarray, basis_cos: jnp.ndarray,
                 basis_sin: jnp.ndarray, mel_fb: jnp.ndarray,
                 cfg: AudioConfig, frames_per_tile: int = 64,
                 freq_tile: int = 256, interpret: bool = False) -> jnp.ndarray:
    """(B, input_frames) f32 → (B, T, n_mels) f32.

    basis_* are the window-folded DFT bases from SpectrogramFrontend
    ((n_fft, n_bins)); mel_fb (n_bins, n_mels). The freq axis is padded to
    a multiple of freq_tile with zero basis columns (zero mel rows ⇒ no
    contribution).
    """
    B = audio.shape[0]
    T, n_fft, hop = cfg.num_frames, cfg.n_fft, cfg.hop_length
    n_bins = basis_cos.shape[1]
    n_mels = mel_fb.shape[1]

    # pad freq axis to tile multiple
    f_pad = (-n_bins) % freq_tile
    if f_pad:
        basis_cos = jnp.pad(basis_cos, ((0, 0), (0, f_pad)))
        basis_sin = jnp.pad(basis_sin, ((0, 0), (0, f_pad)))
        mel_fb = jnp.pad(mel_fb, ((0, f_pad), (0, 0)))
    n_bins_p = n_bins + f_pad

    # host-style reflect pad + block to (B, n_blocks, hop) in XLA (cheap)
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    total = x.shape[1]
    n_blocks = -(-total // hop)
    x = jnp.pad(x, ((0, 0), (0, n_blocks * hop - total)))
    blocks = x.reshape(B, n_blocks, hop)

    t_tiles = -(-T // frames_per_tile)
    f_tiles = n_bins_p // freq_tile
    # pad T to tile multiple (extra frames read zero-padded blocks)
    t_pad_frames = t_tiles * frames_per_tile - T
    if t_pad_frames:
        need_blocks = t_tiles * frames_per_tile + n_fft // hop
        blocks = jnp.pad(blocks, ((0, 0), (0, max(0, need_blocks - n_blocks)),
                                  (0, 0)))

    grid = (B, t_tiles, f_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, frames_per_tile=frames_per_tile, hop=hop,
                          n_fft=n_fft, log_offset=cfg.log_offset,
                          power=cfg.power),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blocks.shape[1], hop), lambda b, t, f: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # full audio row (~140 KB)
            pl.BlockSpec((n_fft, freq_tile), lambda b, t, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, freq_tile), lambda b, t, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((freq_tile, n_mels), lambda b, t, f: (f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, frames_per_tile, n_mels),
                               lambda b, t, f: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_tiles * frames_per_tile, n_mels),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((frames_per_tile, n_mels), jnp.float32)],
        interpret=interpret,
    )(blocks, basis_cos, basis_sin, mel_fb)
    return out[:, :T, :]
