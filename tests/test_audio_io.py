"""Host audio I/O tests: WAV round-trip, resample, slicing, native path."""

import numpy as np
import pytest

from yourmt3_tpu.data.audio_io import (load_audio_file, read_wav, resample,
                                       slice_padded_array, write_wav,
                                       _load_native)


def sine(sr, seconds, freq, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestWav:
    def test_write_read_roundtrip(self, tmp_path):
        x = sine(16000, 0.5, 440)
        p = str(tmp_path / "a.wav")
        write_wav(p, x, 16000)
        y, sr = read_wav(p)
        assert sr == 16000 and y.shape[0] == 1
        assert np.max(np.abs(y[0] - x)) < 2e-4  # 16-bit quantization

    def test_load_resamples_to_16k(self, tmp_path):
        x = sine(44100, 0.5, 440)
        p = str(tmp_path / "b.wav")
        write_wav(p, x, 44100)
        y, sr = load_audio_file(p, 16000)
        assert sr == 16000
        assert abs(len(y) - 8000) < 50
        # frequency preserved: zero-crossing estimate
        zc = np.sum(np.diff(np.signbit(y[500:-500])))
        freq = 0.5 * zc / ((len(y) - 1000) / 16000)
        assert abs(freq - 440) < 6

    def test_extensible_float_wav(self, tmp_path):
        """ADVICE r1: WAVE_FORMAT_EXTENSIBLE carrying the IEEE-float
        SubFormat GUID must decode as float, not as int PCM garbage —
        in the Python parser AND the native fast path."""
        import struct
        x = sine(16000, 0.25, 440)
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000 * 4, 4, 32)
        # cbSize=22, validBits=32, channelMask=0, SubFormat GUID (float=3)
        guid = struct.pack("<H", 3) + bytes.fromhex(
            "0000000000001000800000aa00389b71")
        fmt += struct.pack("<HHI", 22, 32, 0) + guid
        data = x.astype("<f4").tobytes()
        body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        p = tmp_path / "ext.wav"
        p.write_bytes(blob)
        y, sr = read_wav(str(p))
        assert sr == 16000
        assert np.max(np.abs(y[0] - x)) < 1e-6
        lib = _load_native()
        if lib:
            y_nat, _ = load_audio_file(str(p), 16000)
            assert np.max(np.abs(y_nat - x)) < 1e-6

    def test_native_matches_python(self, tmp_path):
        lib = _load_native()
        if not lib:
            pytest.skip("native lib not built")
        x = sine(44100, 0.3, 220)
        p = str(tmp_path / "c.wav")
        write_wav(p, x, 44100)
        y_native, _ = load_audio_file(p, 16000)  # native path
        y_py = resample(x, 44100, 16000)
        n = min(len(y_native), len(y_py)) - 200
        # both are good resamplers; agree closely away from edges
        assert np.max(np.abs(y_native[100:n] - y_py[100:n])) < 5e-3


class TestSlicing:
    def test_slice_padded(self):
        x = np.arange(10, dtype=np.float32)
        segs, starts = slice_padded_array(x, 4)
        assert segs.shape == (3, 4)
        assert np.array_equal(starts, [0, 4, 8])
        assert np.array_equal(segs[2], [8, 9, 0, 0])

    def test_short_audio_single_segment(self):
        segs, starts = slice_padded_array(np.ones(5, np.float32), 8)
        assert segs.shape == (1, 8) and segs[0, 5] == 0
