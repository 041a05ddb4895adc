"""Audio frontend configuration.

Capability parity target: reference `config/config.py` `audio_cfg`
(SURVEY.md C1) — 16 kHz mono, 2.048 s segments of 32767 samples,
hop 128 → 256 frames/segment, n_fft 2048, log-mel (512 mels) or
log-magnitude spectrogram codecs.

TPU-first notes: every field here is a *static* compile-time constant —
segment framing, STFT and mel projection are jitted with fixed shapes so
XLA can tile the mel matmul onto the MXU (see yourmt3_tpu/ops/frontend.py
and yourmt3_tpu/ops/pallas/frontend_kernel.py).
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Static audio frontend parameters.

    ``input_frames`` is deliberately 32767 (not 32768): with ``hop_length``
    128 and center-padding, an STFT over 32767 samples yields exactly 256
    frames (ceil(32767/128) = 256), a power-of-two time axis that tiles
    cleanly on TPU.
    """

    codec: str = "melspec"  # "melspec" | "spec"
    sample_rate: int = 16000
    input_frames: int = 32767  # samples per segment (~2.048 s)
    n_fft: int = 2048
    hop_length: int = 128
    n_mels: int = 512
    f_min: float = 50.0
    f_max: float = 8000.0
    log_offset: float = 1e-5  # floor inside log compression
    power: float = 1.0  # magnitude (1.0) vs power (2.0) spectrogram
    mel_htk: bool = True  # HTK mel scale (torchaudio default)
    mel_norm: str | None = None  # None | "slaney"

    @property
    def segment_seconds(self) -> float:
        return self.input_frames / self.sample_rate

    @property
    def num_frames(self) -> int:
        """STFT frames per segment with center padding."""
        return int(math.ceil(self.input_frames / self.hop_length))

    @property
    def num_feature_bins(self) -> int:
        return self.n_mels if self.codec == "melspec" else self.n_fft // 2 + 1

    @property
    def frame_seconds(self) -> float:
        return self.hop_length / self.sample_rate


DEFAULT_AUDIO = AudioConfig()

# Log-magnitude spectrogram variant (reference `audio_cfg["codec"]="spec"`).
SPEC_AUDIO = AudioConfig(codec="spec", n_mels=0)
