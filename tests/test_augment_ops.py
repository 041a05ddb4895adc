"""On-device augmentation ops: spec-augment + phase-vocoder pitch shift."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.ops.pitchshift import batched_pitch_shift, pitch_shift_fixed
from yourmt3_tpu.ops.specaugment import SpecAugmentConfig, spec_augment


class TestSpecAugment:
    def test_masks_applied_and_shape(self):
        feats = jnp.ones((2, 32, 64))
        out = spec_augment(jax.random.PRNGKey(0), feats,
                           SpecAugmentConfig(num_time_masks=2,
                                             time_mask_width=8,
                                             num_freq_masks=2,
                                             freq_mask_width=16,
                                             mask_value="zero"))
        assert out.shape == feats.shape
        assert float(out.min()) == 0.0  # something was masked
        assert float(out.max()) == 1.0  # not everything

    def test_deterministic_given_key(self):
        feats = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 32)),
                            jnp.float32)
        a = spec_augment(jax.random.PRNGKey(7), feats)
        b = spec_augment(jax.random.PRNGKey(7), feats)
        assert np.array_equal(a, b)


def dominant_freq(x, sr):
    spec = np.abs(np.fft.rfft(np.asarray(x) * np.hanning(len(x))))
    return np.argmax(spec) * sr / len(x)


@pytest.mark.slow
class TestPitchShift:
    def test_shift_moves_frequency(self):
        sr, L = 16000, 8192
        t = np.arange(L) / sr
        audio = jnp.asarray(np.sin(2 * np.pi * 440 * t, dtype=np.float32))[None]
        for s, want in ((2, 440 * 2 ** (2 / 12)), (-2, 440 * 2 ** (-2 / 12))):
            out = pitch_shift_fixed(audio, s)
            assert out.shape == audio.shape
            f = dominant_freq(np.asarray(out)[0, 1000:-1000], sr)
            assert abs(f - want) < 12, (s, f, want)

    def test_zero_shift_identity(self):
        audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4096)),
                            jnp.float32)
        assert np.array_equal(pitch_shift_fixed(audio, 0), audio)

    def test_batched_select(self):
        sr, L = 16000, 8192
        t = np.arange(L) / sr
        a = np.sin(2 * np.pi * 440 * t, dtype=np.float32)
        audio = jnp.asarray(np.stack([a, a]))
        out = batched_pitch_shift(audio, jnp.asarray([2, 4]),  # idx→(0,+2)
                                  semitones=(-2, -1, 0, 1, 2))
        f0 = dominant_freq(np.asarray(out)[0, 1000:-1000], sr)
        f1 = dominant_freq(np.asarray(out)[1, 1000:-1000], sr)
        assert abs(f0 - 440) < 10  # idx 2 → 0 semitones
        assert abs(f1 - 440 * 2 ** (2 / 12)) < 12  # idx 4 → +2
