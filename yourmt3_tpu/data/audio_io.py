"""Host-side audio I/O: WAV read/write, resample, segment slicing.

Capability parity target: reference `utils/audio.py` (SURVEY.md C12):
`load_audio_file`, `get_audio_file_info`, `slice_padded_array`; the
reference leans on libsndfile/ffmpeg — here WAV parsing is first-party
(PCM16/24/32/float) with a C++ fast path (csrc/audio, via ctypes) for
decode+resample when built, and a numpy/scipy fallback that is always
available.
"""

from __future__ import annotations

import ctypes
import os
import struct
import wave
from typing import Optional, Tuple

import numpy as np
from scipy.signal import resample_poly

_NATIVE = None


def _load_native():
    """csrc/audio fast path (C++ WAV decode + polyphase resample)."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    so = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "audio",
                      "libymt3audio.so")
    so = os.path.abspath(so)
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.ymt3_load_wav_resampled.restype = ctypes.c_longlong
            lib.ymt3_load_wav_resampled.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.ymt3_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            if hasattr(lib, "ymt3_load_flac_resampled"):
                lib.ymt3_load_flac_resampled.restype = ctypes.c_longlong
                lib.ymt3_load_flac_resampled.argtypes = \
                    lib.ymt3_load_wav_resampled.argtypes
            _NATIVE = lib
        except OSError:
            _NATIVE = False
    else:
        _NATIVE = False
    return _NATIVE


# ---------------------------------------------------------------------------

def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """→ (float32 (channels, samples) in [-1, 1], sample_rate).

    Handles PCM 8/16/24/32-bit and IEEE-float WAVs (RIFF parsing is
    first-party; `wave` chokes on float WAVs).
    """
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        size = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, n_ch, sr, _br, _ba, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # the real format code is the first 2 bytes of the SubFormat GUID
        # (fmt body offset 24); assuming PCM decodes float WAVs as garbage
        if len(fmt_body) >= 26:
            audio_format = struct.unpack("<H", fmt_body[24:26])[0]
        else:
            raise ValueError(f"{path}: extensible WAV with truncated fmt chunk")
    if n_ch == 0:
        raise ValueError(f"{path}: zero channels in fmt chunk")
    if audio_format == 3:  # IEEE float
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8")
        x = x.astype(np.float32)
    elif audio_format == 1:
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            val = (raw[:, 0].astype(np.int32) | (raw[:, 1].astype(np.int32) << 8)
                   | (raw[:, 2].astype(np.int32) << 16))
            val = np.where(val >= 1 << 23, val - (1 << 24), val)
            x = val.astype(np.float32) / float(1 << 23)
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch).T.copy(), sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """float32 (samples,) or (channels, samples) → PCM16 WAV."""
    a = np.asarray(audio)
    if a.ndim == 1:
        a = a[None]
    pcm = np.clip(a.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(a.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample along the last axis."""
    if sr_in == sr_out:
        return audio.astype(np.float32)
    from math import gcd
    g = gcd(sr_in, sr_out)
    return resample_poly(audio, sr_out // g, sr_in // g, axis=-1).astype(np.float32)


def load_audio_file(path: str, target_sr: int = 16000, mono: bool = True
                    ) -> Tuple[np.ndarray, int]:
    """→ (float32 (samples,) mono [or (ch, samples)], target_sr).

    Reference `load_audio_file` (SURVEY.md C12). Uses the C++ fast path
    when csrc/audio is built, numpy otherwise.
    """
    is_flac = _sniff_flac(path)
    lib = _load_native()
    if lib and mono:
        fn = None
        if is_flac:
            fn = getattr(lib, "ymt3_load_flac_resampled", None)
        else:
            fn = lib.ymt3_load_wav_resampled
        if fn is not None:
            out = ctypes.POINTER(ctypes.c_float)()
            n = fn(path.encode(), target_sr, ctypes.byref(out))
            if n > 0:
                arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
                lib.ymt3_free(out)
                return arr, target_sr
        # n <= 0: unsupported container for the native path — fall through
    if is_flac:
        from .flac import read_flac
        audio, sr = read_flac(path)
    else:
        audio, sr = read_wav(path)
    if mono:
        audio = audio.mean(axis=0)
    audio = resample(audio, sr, target_sr)
    return audio, target_sr


def _sniff_flac(path: str) -> bool:
    """Dispatch on content magic, not extension (Slakh ships .flac but
    converters may hand either)."""
    if path.lower().endswith(".flac"):
        return True
    if path.lower().endswith(".wav"):
        return False
    try:
        with open(path, "rb") as f:
            return f.read(4) == b"fLaC"
    except OSError:
        return False


def get_audio_file_info(path: str) -> Tuple[int, int, int]:
    """→ (sample_rate, n_samples, n_channels) without decoding everything."""
    if _sniff_flac(path):
        from .flac import flac_info
        sr, channels, _, total = flac_info(path)
        return sr, total, channels
    audio, sr = read_wav(path)
    return sr, audio.shape[1], audio.shape[0]


# ---------------------------------------------------------------------------

def slice_padded_array(audio: np.ndarray, segment_len: int = 32767,
                       hop: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """(samples,) → ((N, segment_len) zero-padded segments, (N,) start samples).

    Reference `slice_padded_array` (SURVEY.md C12): non-overlapping by
    default (hop == segment_len).
    """
    hop = hop or segment_len
    n = max(1, -(-max(len(audio) - segment_len, 0) // hop) + 1)
    starts = np.arange(n) * hop
    out = np.zeros((n, segment_len), np.float32)
    for i, s in enumerate(starts):
        chunk = audio[s: s + segment_len]
        out[i, : len(chunk)] = chunk
    return out, starts


def random_slice(audio: np.ndarray, segment_len: int,
                 rng: np.random.Generator) -> Tuple[np.ndarray, int]:
    """Training crop: random start, zero-pad if short."""
    if len(audio) <= segment_len:
        out = np.zeros(segment_len, np.float32)
        out[: len(audio)] = audio
        return out, 0
    start = int(rng.integers(0, len(audio) - segment_len))
    return audio[start: start + segment_len].astype(np.float32), start
