"""First-party FLAC decode (data/flac.py + csrc/audio fast path): encoder
round-trips over every subframe/stereo mode, a hand-built LPC bitstream,
and the Slakh converter ingesting a FLAC stem tree (SURVEY C16; Slakh —
a headline eval dataset — ships FLAC)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from flac_encoder_util import BitWriter, _crc8, _crc16, write_flac  # noqa: E402

from yourmt3_tpu.data import audio_io  # noqa: E402
from yourmt3_tpu.data.flac import flac_info, read_flac  # noqa: E402


def _sine(sr, secs, f=440.0, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * secs)) / sr
    return (0.4 * np.sin(2 * np.pi * f * t)
            + noise * rng.standard_normal(len(t))).astype(np.float32)


def _quant16(x):
    return np.round(np.clip(x, -1, 1) * 32768).clip(-32768, 32767) / 32768.0


class TestPythonDecoder:
    @pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed0",
                                      "fixed1", "fixed2"])
    def test_mono_roundtrip(self, tmp_path, mode):
        sr = 16000
        audio = (np.full(5000, 0.25, np.float32) if mode == "constant"
                 else _sine(sr, 1.0))
        p = str(tmp_path / "a.flac")
        write_flac(p, audio, sr, mode=mode, blocksize=1000)
        out, got_sr = read_flac(p)
        assert got_sr == sr
        assert np.abs(out[0] - _quant16(audio).astype(np.float32)).max() < 1e-6

    @pytest.mark.parametrize("stereo_mode", ["independent", "mid-side"])
    def test_stereo_roundtrip(self, tmp_path, stereo_mode):
        sr = 16000
        st = np.stack([_sine(sr, 0.5, 440), _sine(sr, 0.5, 660, seed=1)])
        p = str(tmp_path / "s.flac")
        write_flac(p, st, sr, mode="fixed2", stereo_mode=stereo_mode)
        out, _ = read_flac(p)
        assert out.shape == (2, st.shape[1])
        assert np.abs(out - _quant16(st).astype(np.float32)).max() < 1e-6

    def test_flac_info(self, tmp_path):
        p = str(tmp_path / "i.flac")
        write_flac(p, _sine(22050, 0.3), 22050)
        assert flac_info(p) == (22050, 1, 16, 6615)

    def test_lpc_subframe_bitstream(self, tmp_path):
        """Hand-built LPC-order-2 frame: the encoder never emits LPC, so
        build the bitstream directly and check the decode recurrence."""
        sr, bps, n = 8000, 16, 64
        warm = [100, -200]
        coef = [3000, -1500]
        precision, shift = 14, 11
        resid = list(range(-10, n - 2 - 10))
        samples = list(warm)
        for r in resid:
            acc = coef[0] * samples[-1] + coef[1] * samples[-2]
            samples.append((acc >> shift) + r)

        out = bytearray(b"fLaC")
        si = BitWriter()
        si.write(n, 16); si.write(n, 16); si.write(0, 24); si.write(0, 24)
        si.write(sr, 20); si.write(0, 3); si.write(bps - 1, 5)
        si.write(n, 36)
        body = bytes(si.bytes) + b"\x00" * 16
        out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
        bw = BitWriter()
        bw.write(0b11111111111110, 14); bw.write(0, 2)
        bw.write(7, 4); bw.write(0, 4); bw.write(0, 4); bw.write(0, 3)
        bw.write(0, 1); bw.write(0, 8)  # utf8 frame 0
        bw.write(n - 1, 16)
        bw.write(_crc8(bytes(bw.bytes)), 8)
        # LPC subframe: type = 0b100000 | (order-1) = 33 for order 2
        bw.write(0, 1); bw.write(32 + (2 - 1), 6); bw.write(0, 1)
        for w in warm:
            bw.write(w & 0xFFFF, bps)
        bw.write(precision - 1, 4)
        bw.write(shift & 0x1F, 5)
        for c in coef:
            bw.write(c & ((1 << precision) - 1), precision)
        bw.write(0, 2)  # 4-bit rice
        bw.write(0, 4)  # partition order 0
        bw.write(6, 4)  # rice param
        for r in resid:
            u = (r << 1) if r >= 0 else (((-r) << 1) - 1)
            bw.write_unary(u >> 6)
            bw.write(u & 63, 6)
        bw.align()
        bw.write(_crc16(bytes(bw.bytes)), 16)
        out += bytes(bw.bytes)
        p = str(tmp_path / "lpc.flac")
        with open(p, "wb") as f:
            f.write(out)
        dec, got_sr = read_flac(p)
        assert got_sr == sr
        want = np.asarray(samples, np.float32) / 32768.0
        assert np.abs(dec[0] - want).max() < 1e-7


@pytest.mark.skipif(not audio_io._load_native(),
                    reason="csrc/audio not built")
class TestNativeDecoder:
    @pytest.mark.parametrize("mode,stereo", [
        ("verbatim", "independent"), ("fixed2", "independent"),
        ("fixed2", "mid-side"), ("fixed1", "independent")])
    def test_native_matches_python(self, tmp_path, mode, stereo):
        import ctypes
        sr = 22050
        st = np.stack([_sine(sr, 0.5, 440), _sine(sr, 0.5, 660, seed=2)])
        audio = st if stereo != "mono" else st[0]
        p = str(tmp_path / "n.flac")
        write_flac(p, audio, sr, mode=mode, stereo_mode=stereo)
        lib = audio_io._load_native()
        out = ctypes.POINTER(ctypes.c_float)()
        n = lib.ymt3_load_flac_resampled(p.encode(), sr, ctypes.byref(out))
        assert n > 0
        got = np.ctypeslib.as_array(out, shape=(n,)).copy()
        lib.ymt3_free(out)
        py, _ = read_flac(p)
        assert np.abs(got - py.mean(0)).max() < 1e-6

    def test_load_audio_file_dispatches_flac(self, tmp_path):
        sr = 22050
        p = str(tmp_path / "d.flac")
        write_flac(p, _sine(sr, 0.5), sr)
        a, got_sr = audio_io.load_audio_file(p, 16000)
        assert got_sr == 16000
        assert a.shape[0] == 8000
        assert float(np.abs(a).max()) > 0.1


class TestSlakhFlacTree:
    def test_converter_ingests_flac_stems(self, tmp_path):
        """Raw-download-shaped Slakh tree with FLAC mix + stems must
        convert (round 1 this required a manual ffmpeg pre-pass)."""
        from yourmt3_tpu.data.preprocess import converters as cv
        from yourmt3_tpu.data.indexes import load_file_list
        from yourmt3_tpu.tokens.midi_io import note_event2midi
        from yourmt3_tpu.tokens.dataclasses import Note

        src = tmp_path / "slakh" / "train" / "Track00001"
        (src / "MIDI").mkdir(parents=True)
        (src / "stems").mkdir()
        sr = 16000
        notes = [Note(False, 0, 0.1, 0.6, 60, 90)]
        note_event2midi(notes, str(src / "MIDI" / "S00.mid"))
        write_flac(str(src / "stems" / "S00.flac"), _sine(sr, 1.0), sr)
        write_flac(str(src / "mix.flac"), _sine(sr, 1.0), sr)
        with open(src / "metadata.yaml", "w") as f:
            f.write("stems:\n  S00:\n    program_num: 0\n    is_drum: false\n"
                    "    inst_class: Piano\n    midi_saved: true\n")
        home = str(tmp_path / "home")
        out = cv.preprocess_slakh(str(tmp_path / "slakh"), home)
        idx = load_file_list(out["train"])
        assert len(idx["tracks"]) == 1
        tr = idx["tracks"][0]
        assert tr["audio_file"].endswith("mix.flac")
        assert tr["stem_files"]["S00"].endswith("S00.flac")
        # and the FLAC mix is loadable through the standard audio path
        a, _ = audio_io.load_audio_file(tr["audio_file"], sr)
        assert a.shape[0] == sr
