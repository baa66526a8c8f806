"""Pure-python/numpy FLAC decoder (the public xiph.org format spec).

FLAC is the archival audio format of speech/music corpora, and it is
losslessly decodable with no audio library: metadata block walk
(STREAMINFO for rate/channels/bits/total-samples), then per-frame:

- frame header: 14-bit sync, blocking strategy, block-size /
  sample-rate / channel-assignment / sample-size codes, UTF-8-coded
  frame number, the variable tail fields, and the header CRC-8
  (polynomial 0x07) — VERIFIED, not skipped;
- one subframe per channel: CONSTANT, VERBATIM, FIXED (orders 0-4)
  and LPC (orders 1-32, quantized coefficients + shift), each with
  the wasted-bits unary prefix;
- residuals: both rice methods (4- and 5-bit parameters), partition
  orders 0-15, escape partitions with raw n-bit samples, zigzag
  unfolding;
- stereo decorrelation: independent, left/side, right/side and
  mid/side (the parity bit of ``side`` restores the sum exactly);
- frame footer CRC-16 (polynomial 0x8005) — VERIFIED.

Returns ``(channels, sample_rate, samples)`` with samples an
``(n_frames, channels)`` float32 array normalized to [-1, 1) — the
same contract as ``multimodal.decode_wav`` so every downstream audio
kernel (pcm stats, dHash dedup, spectral features) works on FLAC
payloads unchanged.

Validated in ``tests/test_multimodal_decode.py`` against an
INDEPENDENT test-side FLAC encoder written from the same spec
(its own CRC tables, rice coder and fixed-predictor residuals):
decode(encode(pcm)) must equal the source EXACTLY across subframe
types, rice partition orders, escapes, wasted bits and all four
channel assignments.

The reference treats audio as opaque S3 objects; this decoder is
beyond-reference, in the same family as ``jpeg_lite``/``webp_lite``.
"""

from __future__ import annotations

import numpy as np

_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _BR:
    """MSB-first bit reader with byte-position access for CRC spans."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.d = data
        self.p = pos_bytes * 8

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i = self.p >> 3
            if byte_i >= len(self.d):
                raise ValueError("truncated FLAC stream")
            v = (v << 1) | ((self.d[byte_i] >> (7 - (self.p & 7))) & 1)
            self.p += 1
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.p = (self.p + 7) & ~7

    @property
    def byte(self) -> int:
        return self.p >> 3


def _utf8_number(br: _BR) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 7 bytes)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad UTF-8-coded FLAC frame number")
    v = first & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation in FLAC frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(br: _BR, n: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    partitions = 1 << porder
    if n % partitions:
        raise ValueError("block size not divisible by rice partitions")
    per = n >> porder
    out: list[int] = []
    for pi in range(partitions):
        count = per - order if pi == 0 else per
        if count < 0:
            raise ValueError("predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw:
                out.extend(br.signed(raw) for _ in range(count))
            else:
                out.extend(0 for _ in range(count))
        else:
            for _ in range(count):
                q = br.unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe(br: _BR, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    bps -= wasted
    if bps <= 0:
        raise ValueError("wasted bits consume the whole sample")
    if t == 0:  # CONSTANT
        v = br.signed(bps)
        out = [v] * n
    elif t == 1:  # VERBATIM
        out = [br.signed(bps) for _ in range(n)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [br.signed(bps) for _ in range(order)]
        res = _residual(br, n, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(res[i - order] + pred)
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        warm = [br.signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.signed(prec) for _ in range(order)]
        res = _residual(br, n, order)
        out = list(warm)
        for i in range(order, n):
            acc = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(res[i - order] + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """FLAC -> ``(channels, sample_rate, float32 (n, ch) samples)``."""
    if not b or len(b) < 42 or b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    sr = ch = bits = total = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise ValueError("short FLAC STREAMINFO")
            bits20 = int.from_bytes(body[10:18], "big")
            sr = bits20 >> 44
            ch = ((bits20 >> 41) & 0x7) + 1
            bits = ((bits20 >> 36) & 0x1F) + 1
            total = bits20 & ((1 << 36) - 1)
        if hdr & 0x80:  # last-metadata flag
            break
    if sr is None or not sr:
        raise ValueError("FLAC without STREAMINFO sample rate")

    channels_out: list[list[int]] = [[] for _ in range(ch)]
    decoded = 0
    while pos < len(b) and (total == 0 or decoded < total):
        br = _BR(b, pos)
        frame_start = pos
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        _utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block-size code 0")
        elif bs_code == 1:
            n = 192
        elif bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code 15")
        if ss_code == 0:
            bps = bits
        elif ss_code in _SS_TABLE:
            bps = _SS_TABLE[ss_code]
        else:
            raise ValueError(f"reserved FLAC sample-size code {ss_code}")
        crc8_pos = br.byte
        if _crc8(b[frame_start:crc8_pos]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            if ch_code + 1 != ch:
                raise ValueError("frame channel count disagrees with STREAMINFO")
            subs = [_subframe(br, n, bps) for _ in range(ch)]
        elif ch_code in (8, 9, 10):
            if ch != 2:
                raise ValueError("stereo decorrelation in a non-stereo stream")
            if ch_code == 8:  # left/side
                left = _subframe(br, n, bps)
                side = _subframe(br, n, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _subframe(br, n, bps + 1)
                right = _subframe(br, n, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _subframe(br, n, bps)
                side = _subframe(br, n, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    total2 = (m << 1) | (s & 1)
                    subs[0].append((total2 + s) >> 1)
                    subs[1].append((total2 - s) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")

        br.align()
        crc16_pos = br.byte
        if _crc16(b[frame_start:crc16_pos]) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.byte
        for ci in range(ch):
            channels_out[ci].extend(subs[ci])
        decoded += n

    if total and decoded > total:  # last frame may pad past total
        channels_out = [c[:total] for c in channels_out]
    arr = np.array(channels_out, np.float64).T  # (n, ch)
    scale = float(1 << (bits - 1))
    return ch, int(sr), (arr / scale).astype(np.float32)
