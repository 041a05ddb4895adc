"""First-party FLAC decoder (pure-Python fallback; csrc/audio has the
C++ fast path with the same logic).

Why: Slakh2100 — one of the reference's three headline eval datasets
(`/root/reference/README.md:1` badge) — ships stems as FLAC; the
reference decodes it via libsndfile/ffmpeg (SURVEY.md C12/C16). This
environment has neither, so the capability is implemented from the FLAC
bitstream spec: STREAMINFO + frames with CONSTANT / VERBATIM / FIXED /
LPC subframes, 4- and 5-bit Rice-coded residual partitions, wasted bits,
and left-side / right-side / mid-side stereo decorrelation. CRCs and MD5
are parsed but not verified (decode is for trusted local datasets).

Subset: 8/12/16/20/24-bit, 1-2 channels (Slakh stems are 16-bit mono or
stereo). >2-channel streams decode as independent channels.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}

SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class BitReader:
    """MSB-first bit reader over a bytes object."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # bit position

    def read(self, n: int) -> int:
        v = 0
        pos, data = self.pos, self.data
        for _ in range(n):
            byte = data[pos >> 3]
            v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        pos, data = self.pos, self.data
        while not (data[pos >> 3] >> (7 - (pos & 7))) & 1:
            n += 1
            pos += 1
        self.pos = pos + 1  # consume the terminating 1
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def skip_utf8_number(self) -> None:
        first = self.read(8)
        n_extra = 0
        while (first << n_extra) & 0x80 and n_extra < 7:
            n_extra += 1
        # n_extra==0 → ASCII; else n_extra-1 continuation bytes... per
        # UTF-8: leading byte with k leading 1s → k-1 continuation bytes
        if n_extra:
            for _ in range(n_extra - 1):
                self.read(8)

    def at_end(self, slack_bits: int = 16) -> bool:
        return self.pos + slack_bits > len(self.data) * 8


def _decode_residual(br: BitReader, blocksize: int, pred_order: int
                     ) -> List[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 5 if method else 4
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out: List[int] = []
    for p in range(nparts):
        count = (blocksize >> porder) - (pred_order if p == 0 else 0)
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * count)
            else:
                for _ in range(count):
                    out.append(br.read_signed(raw))
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | (br.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: BitReader, blocksize: int, bps: int) -> List[int]:
    if br.read(1):
        raise ValueError("subframe sync bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        samples = [br.read_signed(bps)] * blocksize
    elif sf_type == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        samples = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        coef = FIXED_COEFFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coef))
            samples.append(pred + r)
    elif sf_type >= 32:  # LPC, order 1-32
        order = (sf_type & 31) + 1
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        coef = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coef))
            samples.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """→ (float32 (channels, samples) in [-1, 1], sample_rate)."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:4] != b"fLaC":
        raise ValueError(f"not a FLAC file: {path}")
    # ---- metadata blocks ------------------------------------------------
    off = 4
    sr = channels = bps = total = None
    while True:
        hdr = blob[off]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(blob[off + 1: off + 4], "big")
        body = blob[off + 4: off + 4 + blen]
        if btype == 0:  # STREAMINFO
            br = BitReader(body)
            br.read(16); br.read(16)  # min/max blocksize
            br.read(24); br.read(24)  # min/max framesize
            sr = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        off += 4 + blen
        if last:
            break
    if sr is None:
        raise ValueError("FLAC missing STREAMINFO")

    br = BitReader(blob, off)
    chans: List[List[int]] = [[] for _ in range(channels)]
    decoded = 0
    while (total == 0 or decoded < total) and not br.at_end():
        # ---- frame header ----------------------------------------------
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at bit {br.pos - 14}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_asgn = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        br.skip_utf8_number()
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        frame_bps = SAMPLE_SIZE_CODE.get(ss_code, bps)
        br.read(8)  # header CRC-8
        # ---- subframes -------------------------------------------------
        if chan_asgn <= 7:
            subs = [_decode_subframe(br, blocksize, frame_bps)
                    for _ in range(chan_asgn + 1)]
        elif chan_asgn == 8:  # left/side
            left = _decode_subframe(br, blocksize, frame_bps)
            side = _decode_subframe(br, blocksize, frame_bps + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif chan_asgn == 9:  # right/side
            side = _decode_subframe(br, blocksize, frame_bps + 1)
            right = _decode_subframe(br, blocksize, frame_bps)
            subs = [[r + s for r, s in zip(right, side)], right]
        elif chan_asgn == 10:  # mid/side
            mid = _decode_subframe(br, blocksize, frame_bps)
            side = _decode_subframe(br, blocksize, frame_bps + 1)
            subs = [[], []]
            for m, s in zip(mid, side):
                mm = (m << 1) | (s & 1)
                subs[0].append((mm + s) >> 1)
                subs[1].append((mm - s) >> 1)
        else:
            raise ValueError(f"reserved channel assignment {chan_asgn}")
        br.align()
        br.read(16)  # frame CRC-16
        for c, s in zip(chans, subs):
            c.extend(s)
        decoded += blocksize

    if total:
        chans = [c[:total] for c in chans]
    scale = float(1 << (bps - 1))
    out = np.asarray(chans, np.float32) / scale
    return out, sr


def flac_info(path: str) -> Tuple[int, int, int, int]:
    """→ (sample_rate, channels, bits_per_sample, total_samples)."""
    with open(path, "rb") as f:
        head = f.read(4 + 4 + 34)
    if head[:4] != b"fLaC":
        raise ValueError(f"not a FLAC file: {path}")
    br = BitReader(head[8:])
    br.read(16); br.read(16); br.read(24); br.read(24)
    sr = br.read(20)
    channels = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)
    return sr, channels, bps, total
