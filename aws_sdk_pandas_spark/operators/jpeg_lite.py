"""Pure-python/numpy BASELINE JPEG decoder (ITU-T T.81 / JFIF).

The container ships no image library, but baseline sequential JPEG is
mechanically decodable with nothing beyond numpy: segment walk -> DQT
quantization tables + DHT canonical Huffman tables -> SOF0 frame
geometry/sampling factors -> SOS entropy-coded scan (bit reader with
0xFF00 stuffing and restart-marker support) -> per-MCU block decode
(DC predictor + AC run/length, zigzag, dequant) -> separable IDCT via
one precomputed 8x8 basis matmul -> chroma upsampling -> BT.601 full
range YCbCr->RGB.

Honest limits, refused loudly rather than mis-decoded: progressive
(SOF2) and arithmetic-coded (SOF9+) scans, 12-bit precision, and
4-component (CMYK/Adobe) color.

Validated in ``tests/test_multimodal_decode.py`` against an INDEPENDENT
test-side encoder (forward DCT + the T.81 Annex K example tables,
written from the spec): solid blocks decode near-exactly (DC-only
path), gradients round-trip above 30 dB PSNR, 4:2:0 subsampling and
grayscale frames are exercised, and the same picture saved as PNG and
JPEG collides under perceptual dHash.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# separable IDCT basis: A[u, x] = c(u) cos((2x+1)u pi / 16)
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(length, code) -> symbol}."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(ln, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _Restart(Exception):
    pass


class _BitReader:
    """Entropy-coded-segment bit reader: 0xFF00 stuffing unstuffed,
    restart markers surfaced, EOI stops."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            byte = self.d[self.p]
            self.p += 1
            if byte == 0xFF:
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1
                elif 0xD0 <= nxt <= 0xD7:
                    raise _Restart()
                else:
                    # EOI or another marker: scans never read past it
                    raise ValueError(f"marker 0xff{nxt:02x} inside scan")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.n = 0
        while self.d[self.p] == 0xFF and 0xD0 <= self.d[self.p + 1] <= 0xD7:
            self.p += 2
            return
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes) -> tuple[int, int, bytes]:
    """Baseline JPEG -> ``(width, height, rgb_bytes)`` top-down RGB."""
    if not b or len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i : i + 128], ">u2").astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline ok
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only BASELINE sequential JPEG decodes here "
                f"(SOF marker 0xff{marker:02x} is progressive/arithmetic/"
                "lossless)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before SOF")
            w, h, comps = frame
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cs] = (tt >> 4, tt & 0x0F)
            scan = [dict(c, dc=sel[c["id"]][0], ac=sel[c["id"]][1]) for c in comps]
            data_pos = pos + seglen
            return _decode_scan(
                b, data_pos, w, h, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG has no scan")


def _decode_scan(b, pos, w, h, comps, qt, huff_dc, huff_ac, ri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    ]
    reader = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                reader.align_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            blk, preds[ci] = _decode_block(
                                reader, huff_dc[c["dc"]], huff_ac[c["ac"]],
                                q, preds[ci],
                            )
                        except _Restart as exc:  # pragma: no cover - defensive
                            raise ValueError("unexpected restart marker") from exc
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    # upsample to full resolution, crop, color-convert
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:h, :w])
    if len(full) == 1:
        ych = np.clip(full[0] + 128.0, 0, 255)
        rgb = np.repeat(ych[:, :, None], 3, axis=2)
    else:
        y = full[0] + 128.0
        cb = full[1]
        cr = full[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bl = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, bl], axis=2), 0, 255)
    return int(w), int(h), np.ascontiguousarray(
        (rgb + 0.5).astype(np.uint8)
    ).tobytes()


def _decode_block(reader, dc_lut, ac_lut, q, pred):
    coeffs = np.zeros(64, np.int32)
    t = reader.huff(dc_lut)
    diff = _extend(reader.bits(t), t) if t else 0
    pred += diff
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = reader.huff(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        coeffs[k] = _extend(reader.bits(s), s)
        k += 1
    dq = coeffs * q
    blk8 = np.zeros(64, np.float64)
    blk8[ZIGZAG] = dq
    f = blk8.reshape(8, 8)
    return _A.T @ f @ _A, pred
