"""Fused Pallas frontend vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.config.audio import AudioConfig
from yourmt3_tpu.ops.frontend import SpectrogramFrontend
from yourmt3_tpu.ops.pallas.frontend_kernel import fused_logmel


class TestFusedFrontend:
    def test_matches_xla_path_interpret(self):
        # small cfg keeps interpret-mode runtime sane on the 1-core host
        cfg = AudioConfig(input_frames=4095, n_fft=512, hop_length=128,
                          n_mels=128)
        fe = SpectrogramFrontend.from_config(cfg)
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, cfg.input_frames)),
                            jnp.float32) * 0.1
        want = np.asarray(fe(audio))
        got = np.asarray(fused_logmel(audio, fe.basis_cos, fe.basis_sin,
                                      fe.mel_fb, cfg, frames_per_tile=16,
                                      freq_tile=128, interpret=True))
        assert got.shape == want.shape == (2, cfg.num_frames, cfg.n_mels)
        assert np.max(np.abs(got - want)) < 1e-3, np.max(np.abs(got - want))

    def test_nondivisible_time_tiles(self):
        cfg = AudioConfig(input_frames=2047, n_fft=512, hop_length=128,
                          n_mels=128)  # T=16 frames, tile 10 → pad path
        fe = SpectrogramFrontend.from_config(cfg)
        audio = jnp.ones((1, cfg.input_frames), jnp.float32) * 0.05
        want = np.asarray(fe(audio))
        got = np.asarray(fused_logmel(audio, fe.basis_cos, fe.basis_sin,
                                      fe.mel_fb, cfg, frames_per_tile=10,
                                      freq_tile=128, interpret=True))
        assert np.max(np.abs(got - want)) < 1e-3
