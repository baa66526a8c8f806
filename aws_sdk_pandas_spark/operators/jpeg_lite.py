"""Pure-python/numpy JPEG decoder (ITU-T T.81 / JFIF): BASELINE and
PROGRESSIVE (Huffman) modes.

The container ships no image library, but Huffman-coded JPEG is
mechanically decodable with nothing beyond numpy.  The decoder is one
scan engine over per-component COEFFICIENT BUFFERS:

- segment walk -> DQT quantization tables + DHT canonical Huffman
  tables -> SOF0/1 (baseline) or SOF2 (progressive) frame geometry and
  sampling factors -> one or more SOS scans;
- every scan (interleaved MCU order when it carries several
  components, the component's own block grid when it carries one)
  decodes into int32 ``(block_row, block_col, 64)`` coefficient
  arrays: baseline scans write DC+AC in one pass, progressive scans
  apply spectral selection (``Ss..Se`` bands) and successive
  approximation (DC first/refine via the ``Al``-shifted predictor and
  per-block refinement bits; AC first scans with EOB-run symbols; AC
  refinement scans with the T.81 G.1.2.3 correction-bit walk);
- restart markers byte-align the entropy reader and reset DC
  predictors AND the EOB run in every mode;
- after the last scan: one BATCHED dequant + separable IDCT per
  component (a single ``(rows, cols, 8, 8)`` matmul against the
  precomputed basis — no per-block Python loop), chroma upsampling,
  crop, BT.601 full-range YCbCr->RGB.

A progressive stream truncated after any scan prefix still decodes
(coarser picture) — exactly the format's design — because missing
refinement scans simply leave low-order coefficient bits at zero.

Both 8- and 12-bit sample precision decode (12-bit: 2048 level
shift, 16-bit quantization tables, output scaled to 8-bit RGB), and
4-component color decodes as CMYK (bare files, stored direct) or
Adobe CMYK/YCCK (APP14 marker: Adobe-inverted storage; transform 2
YCC-codes the chroma) -> RGB via (255-C)(255-K)/255.  Honest limits,
refused loudly rather than mis-decoded: arithmetic coding (SOF9+)
and the hierarchical and lossless modes.

Validated in ``tests/test_multimodal_decode.py`` against INDEPENDENT
test-side encoders written from the spec (forward DCT + canonical
Huffman emission): the baseline paths round-trip solid blocks
near-exactly and gradients above 30 dB PSNR, and the progressive
paths must reproduce the baseline decode of the SAME quantized
coefficients BIT-EXACTLY — spectral-selection-only scripts,
successive-approximation scripts (DC+AC first/refine), restart
markers inside progressive scans, and truncated-prefix decodes are
all exercised.
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
    """Baseline or progressive (Huffman) JPEG -> ``(width, height,
    rgb_bytes)`` top-down RGB."""
    if not b or len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame: dict | None = None
    coeffs: list[np.ndarray] = []
    restart_interval = 0
    scanned = False
    adobe_transform: int | None = None
    while pos + 2 <= len(b):
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
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                (huff_dc if tc == 0 else huff_ac)[th] = build_huffman(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = seg[0]
            if prec not in (8, 12):
                raise ValueError(f"unsupported JPEG precision {prec}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            if w <= 0 or h <= 0 or w * h > 1 << 28:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            ncomp = seg[5]
            if ncomp not in (1, 3, 4):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coeffs = []
            for c in comps:
                # non-interleaved scans cover the component's OWN grid:
                # ceil(ceil(dim * sampling / max_sampling) / 8) blocks
                cw = -(-w * c["h"] // hmax)
                ch = -(-h * c["v"] // vmax)
                c["nbx"] = -(-cw // 8)
                c["nby"] = -(-ch // 8)
                coeffs.append(
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                )
            frame = {
                "w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mcux": mcux, "mcuy": mcuy, "progressive": marker == 0xC2,
                "prec": prec,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only Huffman baseline/progressive JPEG decodes here "
                f"(SOF marker 0xff{marker:02x} is arithmetic/lossless/"
                "hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11] if len(seg) >= 12 else 0
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before SOF")
            try:
                pos = _decode_scan(
                    b, pos + seglen, seg, frame, coeffs,
                    huff_dc, huff_ac, restart_interval,
                )
            except IndexError as exc:
                raise ValueError("truncated JPEG scan") from exc
            except _Restart as exc:
                raise ValueError("unexpected restart marker") from exc
            scanned = True
            continue
        pos += seglen
    if frame is None or not scanned:
        raise ValueError("JPEG has no scan")
    frame["adobe_transform"] = adobe_transform
    return _finish(frame, coeffs, qt)


def _decode_scan(b, data_pos, seg, frame, coeffs, huff_dc, huff_ac, ri):
    """Decode one entropy-coded scan into the coefficient buffers;
    returns the byte position of the next marker after the scan."""
    comps = frame["comps"]
    ns = seg[0]
    id2ix = {c["id"]: i for i, c in enumerate(comps)}
    scomp = []  # (component index, dc table, ac table)
    for si in range(ns):
        cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
        if cs not in id2ix:
            raise ValueError(f"scan references unknown component {cs}")
        scomp.append((id2ix[cs], tt >> 4, tt & 0x0F))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if frame["progressive"]:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scan must carry one component")
        if ss > 63 or se > 63 or se < ss:
            raise ValueError(f"bad spectral band {ss}..{se}")
    else:
        # baseline: the header carries Ss=0 Se=63 Ah=Al=0 by definition
        ss, se, ah, al = 0, 63, 0, 0

    reader = _BitReader(b, data_pos)
    state = {"eob": 0}
    preds = [0] * len(scomp)

    def unit(si, blk):
        _decode_unit(
            reader, blk, ss, se, ah, al,
            huff_dc.get(scomp[si][1]), huff_ac.get(scomp[si][2]),
            preds, si, state,
        )

    if ns == 1:
        # non-interleaved: the component's own block grid, 1 block = 1 MCU
        ci = scomp[0][0]
        c = comps[ci]
        buf = coeffs[ci]
        n = 0
        for byi in range(c["nby"]):
            for bxi in range(c["nbx"]):
                if ri and n and n % ri == 0:
                    reader.align_restart()
                    preds[:] = [0] * len(scomp)
                    state["eob"] = 0
                unit(0, buf[byi, bxi])
                n += 1
    else:
        mcun = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if ri and mcun and mcun % ri == 0:
                    reader.align_restart()
                    preds[:] = [0] * len(scomp)
                    state["eob"] = 0
                for si, (ci, _, _) in enumerate(scomp):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit(si, coeffs[ci][my * c["v"] + by, mx * c["h"] + bx])
                mcun += 1

    # skip entropy padding to the next marker (multi-scan streams)
    pos = reader.p
    while pos + 1 < len(b):
        if b[pos] == 0xFF and b[pos + 1] != 0x00 and not (
            0xD0 <= b[pos + 1] <= 0xD7
        ):
            break
        pos += 1
    return pos


def _decode_unit(reader, blk, ss, se, ah, al, dc_lut, ac_lut, preds, si, state):
    """Decode one block's contribution from the current scan."""
    if ss == 0:
        if ah == 0:  # DC first (or the DC half of a baseline scan)
            if dc_lut is None:
                raise ValueError("scan references a missing DC Huffman table")
            t = reader.huff(dc_lut)
            diff = _extend(reader.bits(t), t) if t else 0
            preds[si] += diff
            blk[0] = preds[si] << al
        else:  # DC refinement: one bit per block
            if reader.bit():
                blk[0] |= 1 << al
        if se == 0:
            return
        k = 1
    else:
        k = ss
    if ac_lut is None:
        raise ValueError("scan references a missing AC Huffman table")
    if ah == 0:
        _ac_first(reader, blk, k, se, al, ac_lut, state)
    else:
        _ac_refine(reader, blk, k, se, al, ac_lut, state)


def _ac_first(reader, blk, k, se, al, ac_lut, state):
    """AC coefficients at approximation level ``al`` (baseline AC is
    the al=0, band 1..63 case); EOB-run symbols span blocks."""
    if state["eob"] > 0:
        state["eob"] -= 1
        return
    while k <= se:
        rs = reader.huff(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            # EOBn: run of 2^r + extension blocks ending at this one
            state["eob"] = (1 << r) - 1
            if r:
                state["eob"] += reader.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1


def _ac_refine(reader, blk, k, se, al, ac_lut, state):
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    significant coefficients arrive as ±1<<al, every already-nonzero
    coefficient crossed on the way consumes one correction bit."""
    p1 = 1 << al
    m1 = -p1
    if state["eob"] == 0:
        while k <= se:
            rs = reader.huff(ac_lut)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    state["eob"] = (1 << r)
                    if r:
                        state["eob"] += reader.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement scan coefficient size != 1")
                val = p1 if reader.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state["eob"] > 0:
        while k <= se:
            if blk[k] != 0 and reader.bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        state["eob"] -= 1


def _finish(frame, coeffs, qt):
    """Batched dequant + IDCT of every component, upsample, crop,
    color-convert."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for c, buf in zip(comps, coeffs):
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        dq = buf * qt[c["tq"]][None, None, :]
        nby, nbx = buf.shape[0], buf.shape[1]
        f = np.zeros((nby, nbx, 64), np.float64)
        f[:, :, ZIGZAG] = dq
        f = f.reshape(nby, nbx, 8, 8)
        blocks = _A.T @ f @ _A  # broadcasts over (nby, nbx)
        plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(plane[:h, :w])
    level = 1 << (frame["prec"] - 1)  # 128 for 8-bit, 2048 for 12-bit
    maxv = (1 << frame["prec"]) - 1
    if len(full) == 4:
        # CMYK / YCCK: Adobe files (APP14 present) store INVERTED
        # values (255-C ...); transform 2 additionally YCC-codes the
        # first three channels.  RGB = (255-C)(255-K)/255 — with the
        # Adobe inversion that is stored_c * stored_k / 255 directly.
        t = frame["adobe_transform"]
        if t == 2:  # YCCK
            y = full[0] + float(level)
            cb = full[1]
            cr = full[2]
            cmy_inv = np.stack(
                [y + 1.402 * cr,
                 y - 0.344136 * cb - 0.714136 * cr,
                 y + 1.772 * cb], axis=2,
            )
        else:
            cmy_inv = np.stack(full[:3], axis=2) + float(level)
            if t is None:  # bare CMYK: stored uninverted
                cmy_inv = maxv - cmy_inv
        kk = np.clip(full[3] + float(level), 0, maxv)
        if t is None:
            kk = maxv - kk
        rgb = np.clip(cmy_inv, 0, maxv) * (kk / maxv)[:, :, None]
    elif len(full) == 1:
        ych = np.clip(full[0] + float(level), 0, maxv)
        rgb = np.repeat(ych[:, :, None], 3, axis=2)
    else:
        y = full[0] + float(level)
        cb = full[1]
        cr = full[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bl = y + 1.772 * cb
        rgb = np.clip(np.stack([r, g, bl], axis=2), 0, maxv)
    if frame["prec"] != 8:
        rgb = rgb * (255.0 / maxv)
    return int(w), int(h), np.ascontiguousarray(
        (rgb + 0.5).astype(np.uint8)
    ).tobytes()
