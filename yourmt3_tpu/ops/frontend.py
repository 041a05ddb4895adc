"""Audio frontend: segment framing → STFT → (mel) → log, TPU-first.

Capability parity target: reference `model/spectrogram.py` (SURVEY.md C17):
torchaudio MelSpectrogram/Spectrogram + log compression, fp32, inside the
model forward. Semantics matched: center=True reflect padding, periodic
Hann window, HTK mel scale, magnitude (power=1.0) spectrogram.

TPU-first design: the STFT is computed as a GEMM against precomputed
rFFT basis matrices (cos/sin), not an FFT — on TPU the MXU makes the
O(N·F) matmul faster end-to-end than a VPU FFT for n_fft=2048, and it
lets XLA fuse framing→window→DFT→magnitude→mel→log into one pipelined
loop over frames. Framing is a cheap block-gather (hop divides n_fft),
never a 524k-element elementwise gather. A fused Pallas variant lives in
ops/pallas/frontend_kernel.py; this XLA path is the reference
implementation and the fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.audio import AudioConfig


# ---------------------------------------------------------------------------
# Host-side constant builders (numpy, run once at model build)
# ---------------------------------------------------------------------------

def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    m = n if periodic else n - 1
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / m)


def rfft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_fft, n_bins) cos and -sin DFT bases: X[f] = Σ_t x[t]·e^{-2πi tf/N}."""
    t = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * t * f / n_fft
    return np.cos(ang), -np.sin(ang)


def hz_to_mel(f: np.ndarray, htk: bool = True) -> np.ndarray:
    if htk:
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    # slaney
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0), mel)
    return mel


def mel_to_hz(m: np.ndarray, htk: bool = True) -> np.ndarray:
    if htk:
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((m - 15.0) * (np.log(6.4) / 27.0)), f)
    return f


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float, f_max: float, htk: bool = True,
                   norm: Optional[str] = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank (torchaudio semantics)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(np.array(f_min), htk),
                        hz_to_mel(np.array(f_max), htk), n_mels + 2)
    f_pts = mel_to_hz(m_pts, htk)
    f_diff = np.diff(f_pts)  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb


# ---------------------------------------------------------------------------
# Device-side frontend
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(eq=False)  # identity hash: jit(frontend) works
class SpectrogramFrontend:
    """Precomputed-constant log-mel/log-spec frontend.

    Call with (B, input_frames) float32 audio → (B, T, F) float32 features.
    Cite: reference get_spectrogram_layer_from_audio_cfg (SURVEY.md C17).
    """

    cfg: AudioConfig
    window: jnp.ndarray  # (n_fft,)
    basis_cos: jnp.ndarray  # (n_fft, n_bins)
    basis_sin: jnp.ndarray  # (n_fft, n_bins)
    mel_fb: Optional[jnp.ndarray]  # (n_bins, n_mels) or None for "spec"
    use_pallas: bool = False  # fused TPU kernel (ops/pallas/frontend_kernel)

    # -- pytree plumbing so the frontend can ride through jit boundaries --
    def tree_flatten(self):
        return ((self.window, self.basis_cos, self.basis_sin, self.mel_fb),
                (self.cfg, self.use_pallas))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        cfg, use_pallas = aux
        return cls(cfg, *leaves, use_pallas=use_pallas)

    @classmethod
    def from_config(cls, cfg: AudioConfig, dtype=jnp.float32,
                    use_pallas: bool = False) -> "SpectrogramFrontend":
        n_bins = cfg.n_fft // 2 + 1
        cos_b, sin_b = rfft_basis(cfg.n_fft)
        win = hann_window(cfg.n_fft)
        # fold the window into the DFT bases: one less elementwise pass
        cos_b = cos_b * win[:, None]
        sin_b = sin_b * win[:, None]
        mel = None
        if cfg.codec == "melspec":
            mel = mel_filterbank(n_bins, cfg.n_mels, cfg.sample_rate,
                                 cfg.f_min, cfg.f_max, cfg.mel_htk, cfg.mel_norm)
        return cls(
            cfg=cfg,
            window=jnp.asarray(win, dtype),
            basis_cos=jnp.asarray(cos_b, dtype),
            basis_sin=jnp.asarray(sin_b, dtype),
            mel_fb=None if mel is None else jnp.asarray(mel, dtype),
            use_pallas=use_pallas,
        )

    # ------------------------------------------------------------------
    def frame(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, input_frames) → (B, T, n_fft) via reflect-pad + block gather."""
        cfg = self.cfg
        pad = cfg.n_fft // 2
        x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        hop = cfg.hop_length
        blocks_per_frame = cfg.n_fft // hop  # requires hop | n_fft
        total = x.shape[1]
        n_blocks = -(-total // hop)
        x = jnp.pad(x, ((0, 0), (0, n_blocks * hop - total)))
        blocks = x.reshape(x.shape[0], n_blocks, hop)
        idx = (np.arange(cfg.num_frames)[:, None]
               + np.arange(blocks_per_frame)[None, :])  # (T, bpf) static
        frames = jnp.take(blocks, jnp.asarray(idx), axis=1)  # (B,T,bpf,hop)
        return frames.reshape(audio.shape[0], cfg.num_frames, cfg.n_fft)

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, input_frames) or (B, 1, input_frames) → (B, T, F) float32."""
        if audio.ndim == 3:
            audio = audio[:, 0, :]
        audio = audio.astype(jnp.float32)
        if self.use_pallas and self.mel_fb is not None:
            from .pallas.frontend_kernel import fused_logmel
            return fused_logmel(audio, self.basis_cos, self.basis_sin,
                                self.mel_fb, self.cfg)
        frames = self.frame(audio)  # (B, T, n_fft); window folded into bases
        re = jnp.einsum("btn,nf->btf", frames, self.basis_cos,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("btn,nf->btf", frames, self.basis_sin,
                        preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im + 1e-12)
        if self.cfg.power == 2.0:
            mag = mag * mag
        if self.mel_fb is not None:
            mag = jnp.einsum("btf,fm->btm", mag, self.mel_fb,
                             preferred_element_type=jnp.float32)
        return jnp.log(jnp.maximum(mag, self.cfg.log_offset))


def reference_stft_features(audio: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Slow numpy reference (np.fft) for fixture tests — same semantics."""
    pad = cfg.n_fft // 2
    x = np.pad(np.asarray(audio, np.float64), ((0, 0), (pad, pad)), mode="reflect")
    win = hann_window(cfg.n_fft)
    T = cfg.num_frames
    frames = np.stack([x[:, t * cfg.hop_length: t * cfg.hop_length + cfg.n_fft]
                       for t in range(T)], axis=1)
    spec = np.abs(np.fft.rfft(frames * win, axis=-1))
    if cfg.power == 2.0:
        spec = spec ** 2
    if cfg.codec == "melspec":
        fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate,
                            cfg.f_min, cfg.f_max, cfg.mel_htk, cfg.mel_norm)
        spec = spec @ fb
    return np.log(np.maximum(spec, cfg.log_offset))
