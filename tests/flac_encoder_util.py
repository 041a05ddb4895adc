"""Minimal FLAC *encoder* — test fixture generator only.

The runtime ships a first-party FLAC decoder (yourmt3_tpu/data/flac.py +
csrc/audio); this encoder exists so tests can produce real spec-valid
FLAC bitstreams without any external tool (no flac/ffmpeg/soundfile in
the environment). It writes STREAMINFO + frames using CONSTANT,
VERBATIM, FIXED-order(0-2)+Rice, and optional mid-side stereo — enough
to exercise every decoder path except LPC (covered by a hand-built
bitstream in the tests). Proper CRC-8/CRC-16 are emitted so the files
are valid for any compliant decoder.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1
        self._acc = (self._acc << n) | value
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            self.bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)


def _rice_encode(bw: BitWriter, residuals: Sequence[int], param: int) -> None:
    for r in residuals:
        u = (r << 1) if r >= 0 else (((-r) << 1) - 1)
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(residuals: Sequence[int]) -> int:
    best, best_bits = 0, None
    for p in range(15):
        bits = sum((((abs(r) << 1) >> p) + 1 + p) for r in residuals)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1]}


def _write_subframe(bw: BitWriter, samples: Sequence[int], bps: int,
                    mode: str) -> None:
    bw.write(0, 1)  # padding
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(samples[0], bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bps)
        coef = FIXED_COEFFS[order]
        resid = []
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
            resid.append(samples[i] - pred)
        bw.write(0, 2)  # 4-bit rice
        bw.write(0, 4)  # partition order 0
        param = min(_best_rice_param(resid) if resid else 0, 14)
        bw.write(param, 4)
        _rice_encode(bw, resid, param)
    else:
        raise ValueError(mode)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F),
                  0x80 | (n & 0x3F)])


def write_flac(path: str, audio: np.ndarray, sr: int, bps: int = 16,
               blocksize: int = 4096, mode: str = "fixed2",
               stereo_mode: str = "independent") -> str:
    """audio: (channels, samples) float in [-1, 1] or int array."""
    if audio.ndim == 1:
        audio = audio[None]
    if np.issubdtype(audio.dtype, np.floating):
        pcm = np.clip(np.round(audio * (1 << (bps - 1))),
                      -(1 << (bps - 1)), (1 << (bps - 1)) - 1).astype(np.int64)
    else:
        pcm = audio.astype(np.int64)
    channels, total = pcm.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sr, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total & ((1 << 36) - 1), 36)
    si_bytes = bytes(si.bytes) + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    frame_idx = 0
    for start in range(0, total, blocksize):
        block = pcm[:, start: start + blocksize]
        bs = block.shape[1]
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit field follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        use_ms = stereo_mode == "mid-side" and channels == 2
        bw.write(10 if use_ms else channels - 1, 4)
        bw.write(0, 3)  # sample size: from STREAMINFO
        bw.write(0, 1)  # reserved
        for b in _utf8_number(frame_idx):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        bw.write(_crc8(bytes(bw.bytes)), 8)
        if use_ms:
            left, right = block[0], block[1]
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(bw, list(mid), bps, mode)
            _write_subframe(bw, list(side), bps + 1, mode)
        else:
            for c in range(channels):
                _write_subframe(bw, list(block[c]), bps, mode)
        bw.align()
        bw.write(_crc16(bytes(bw.bytes)), 16)
        out += bytes(bw.bytes)
        frame_idx += 1

    with open(path, "wb") as f:
        f.write(out)
    return path
