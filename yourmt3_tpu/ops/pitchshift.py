"""On-device pitch-shift augmentation (train-time).

Capability parity target: reference `model/pitchshift_layer.py`
(SURVEY.md C18): on-the-fly ±2 semitone pitch shift of raw audio batches
(a GPU op in the reference; a jitted phase-vocoder here).

Algorithm (classic PV): STFT → time-stretch by r = 2^(s/12) with phase
accumulation → ISTFT (overlap-add) → linear resample back to the original
length (pitch moves by s, duration preserved).

TPU-first: the candidate semitone set is STATIC; every branch has static
shapes and the per-example choice is a select over the stacked candidates
(at ≤5 candidates the dense compute is cheaper than dynamic shapes, which
XLA cannot compile at all). Label pitches must be shifted on the host at
tokenization time with the same per-example semitone (see
data/dataset_train.py pitch_shift plumbing).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .frontend import hann_window

DEFAULT_SEMITONES: Tuple[int, ...] = (-2, -1, 0, 1, 2)


def _stft(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, L) → complex (B, T, n_fft//2+1), center-padded."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    T = 1 + (xp.shape[1] - n_fft) // hop
    idx = np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[:, idx]  # (B, T, n_fft)
    win = jnp.asarray(hann_window(n_fft), jnp.float32)
    return jnp.fft.rfft(frames * win, axis=-1)


def _istft(spec: jnp.ndarray, n_fft: int, hop: int, length: int) -> jnp.ndarray:
    """complex (B, T, F) → (B, length) via windowed overlap-add."""
    B, T, _ = spec.shape
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    win = jnp.asarray(hann_window(n_fft), jnp.float32)
    frames = frames * win
    out_len = (T - 1) * hop + n_fft
    # overlap-add via segment_sum-style scatter: static index add
    idx = (np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((B, out_len), jnp.float32)
    out = out.at[:, idx].add(frames.reshape(B, -1))
    wsum = jnp.zeros((out_len,), jnp.float32).at[idx].add(
        jnp.tile(win * win, (T,)))
    out = out / jnp.maximum(wsum, 1e-8)[None]
    pad = n_fft // 2
    out = out[:, pad:pad + length]
    if out.shape[1] < length:
        out = jnp.pad(out, ((0, 0), (0, length - out.shape[1])))
    return out


def _phase_vocoder(spec: jnp.ndarray, rate: float, hop: int, n_fft: int
                   ) -> jnp.ndarray:
    """Stretch complex STFT in time by `rate` (static output length)."""
    B, T, F = spec.shape
    T_out = max(2, int(np.floor(T / rate)))
    omega = jnp.asarray(2.0 * np.pi * hop * np.arange(F) / n_fft, jnp.float32)

    steps = jnp.asarray(np.arange(T_out) * rate, jnp.float32)
    lo = jnp.clip(jnp.floor(steps).astype(jnp.int32), 0, T - 2)
    frac = steps - lo.astype(jnp.float32)

    s0 = spec[:, lo, :]
    s1 = spec[:, lo + 1, :]
    mag = (1 - frac)[None, :, None] * jnp.abs(s0) + frac[None, :, None] * jnp.abs(s1)

    # phase advance per synthesis step
    dphi = jnp.angle(s1) - jnp.angle(s0) - omega[None, None, :]
    dphi = dphi - 2 * np.pi * jnp.round(dphi / (2 * np.pi))
    dphi = dphi + omega[None, None, :]
    phase0 = jnp.angle(s0[:, 0, :])
    phase = phase0[:, None, :] + jnp.concatenate(
        [jnp.zeros((B, 1, F)), jnp.cumsum(dphi[:, :-1, :], axis=1)], axis=1)
    return mag * jnp.exp(1j * phase)


def _linear_resample(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(B, L) → (B, out_len) linear interpolation over the full span."""
    B, L = x.shape
    pos = jnp.asarray(np.linspace(0, L - 1, out_len), jnp.float32)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, L - 2)
    frac = pos - lo.astype(jnp.float32)
    return x[:, lo] * (1 - frac)[None] + x[:, lo + 1] * frac[None]


def pitch_shift_fixed(audio: jnp.ndarray, semitones: int,
                      n_fft: int = 1024, hop: int = 256) -> jnp.ndarray:
    """(B, L) → (B, L), pitch moved by `semitones` (static int)."""
    if semitones == 0:
        return audio
    L = audio.shape[1]
    rate = float(2.0 ** (-semitones / 12.0))  # stretch factor in PV domain
    spec = _stft(audio, n_fft, hop)
    stretched = _phase_vocoder(spec, rate, hop, n_fft)
    T_out = stretched.shape[1]
    y_len = (T_out - 1) * hop + n_fft
    y = _istft(stretched, n_fft, hop, y_len - n_fft)
    return _linear_resample(y, L)


def batched_pitch_shift(audio: jnp.ndarray, shift_idx: jnp.ndarray,
                        semitones: Sequence[int] = DEFAULT_SEMITONES,
                        n_fft: int = 1024, hop: int = 256) -> jnp.ndarray:
    """Per-example shift: audio (B, L), shift_idx (B,) int32 into
    `semitones`. Computes every static candidate and selects — uniform
    shapes beat dynamic control flow on TPU at ≤5 candidates."""
    cands = jnp.stack([pitch_shift_fixed(audio, s, n_fft, hop)
                       for s in semitones], axis=0)  # (S, B, L)
    return jnp.take_along_axis(cands, shift_idx[None, :, None], axis=0)[0]
