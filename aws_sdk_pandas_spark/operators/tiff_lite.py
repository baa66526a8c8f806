"""Pure-python/numpy TIFF decoder (TIFF 6.0 baseline + common
extensions) — the scanned-document / satellite-tile format of archival
corpora, decodable with nothing beyond stdlib ``zlib`` and numpy.

Supported, all losslessly verified against independent test-side
encoders in ``tests/test_multimodal_decode.py``:

- both byte orders (``II`` little / ``MM`` big endian);
- compressions: 1 (none), 5 (TIFF-variant LZW: MSB-first codes,
  9->12 bit widths with the spec's EARLY code-width change at table
  sizes 511/1023/2047, Clear/EOI codes), 8 and 32946 (zlib deflate),
  32773 (PackBits);
- horizontal-differencing predictor (tag 317 = 2) undone per row and
  channel with one cumsum;
- photometrics: 0 WhiteIsZero (inverted grayscale), 1 BlackIsZero,
  2 RGB (SamplesPerPixel 3, or 4 with the alpha/extra sample
  dropped), 3 palette via the 16-bit ColorMap;
- striped layout (any RowsPerStrip, short last strip, multi-strip).

Refused loudly rather than mis-decoded: tiled layout (tag 322),
planar configuration 2, bits-per-sample other than 8, float sample
formats, and JPEG/CCITT-in-TIFF compressions.

The reference treats images as opaque S3 objects (``s3/_copy.py``);
this decode kernel is beyond-reference, in the same family as
``jpeg_lite`` / the PNG/GIF/BMP decoders in ``multimodal.py``.
"""

from __future__ import annotations

import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _tiff_lzw_decode(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9-bit initial codes,
    Clear=256 / EOI=257, and the early code-width change (the width
    bumps when the table reaches 2^width - 1 entries, one code earlier
    than GIF's variant)."""
    out = bytearray()
    acc = 0
    nacc = 0
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    for byte in data:
        acc = (acc << 8) | byte
        nacc += 8
        while nacc >= width:
            code = (acc >> (nacc - width)) & ((1 << width) - 1)
            nacc -= width
            acc &= (1 << nacc) - 1
            if code == 256:
                reset()
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("LZW stream starts with a non-literal code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code beyond table")
            out += entry
            if max_out is not None and len(out) >= max_out:
                return bytes(out)  # decompression-bomb guard: strip full
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def _read_ifd(b: bytes, off: int, end: str) -> dict[int, tuple[int, int, bytes]]:
    """First-IFD walk -> {tag: (type, count, raw value bytes)}."""
    if off + 2 > len(b):
        raise ValueError("truncated TIFF IFD")
    n = int.from_bytes(b[off : off + 2], end)
    out: dict[int, tuple[int, int, bytes]] = {}
    for ei in range(n):
        e = off + 2 + 12 * ei
        if e + 12 > len(b):
            raise ValueError("truncated TIFF IFD entry")
        tag = int.from_bytes(b[e : e + 2], end)
        typ = int.from_bytes(b[e + 2 : e + 4], end)
        cnt = int.from_bytes(b[e + 4 : e + 8], end)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = b[e + 8 : e + 8 + size]
        else:
            voff = int.from_bytes(b[e + 8 : e + 12], end)
            if voff + size > len(b):
                raise ValueError("TIFF IFD value overruns file")
            raw = b[voff : voff + size]
        out[tag] = (typ, cnt, raw)
    return out


def _ints(entry: tuple[int, int, bytes], end: str) -> list[int]:
    typ, cnt, raw = entry
    size = _TYPE_SIZE.get(typ, 1)
    return [
        int.from_bytes(raw[i * size : (i + 1) * size], end) for i in range(cnt)
    ]


def tiff_dims(b: bytes | None) -> tuple[int | None, int | None]:
    """(width, height) from the first IFD without decoding pixels."""
    try:
        if not b or len(b) < 8 or b[:2] not in (b"II", b"MM"):
            return (None, None)
        end = "little" if b[:2] == b"II" else "big"
        if int.from_bytes(b[2:4], end) != 42:
            return (None, None)
        ifd = _read_ifd(b, int.from_bytes(b[4:8], end), end)
        if 256 not in ifd or 257 not in ifd:
            return (None, None)
        return (_ints(ifd[256], end)[0], _ints(ifd[257], end)[0])
    except ValueError:
        return (None, None)


def decode_tiff(b: bytes) -> tuple[int, int, bytes]:
    """Striped TIFF -> ``(width, height, rgb_bytes)`` top-down RGB."""
    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    end = "little" if b[:2] == b"II" else "big"
    if int.from_bytes(b[2:4], end) != 42:
        raise ValueError("bad TIFF version marker")
    ifd = _read_ifd(b, int.from_bytes(b[4:8], end), end)

    def one(tag, default=None):
        if tag not in ifd:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return _ints(ifd[tag], end)[0]

    if 322 in ifd or 323 in ifd:
        raise ValueError("tiled TIFF layout is not supported (striped only)")
    w = one(256)
    h = one(257)
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise ValueError(f"implausible TIFF dimensions {w}x{h}")
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    planar = one(284, 1)
    if planar != 1:
        raise ValueError("planar (non-chunky) TIFF is not supported")
    bits = _ints(ifd[258], end) if 258 in ifd else [8] * spp
    if any(x != 8 for x in bits):
        raise ValueError(f"only 8-bit TIFF samples decode here (got {bits})")
    if 339 in ifd and any(x not in (1,) for x in _ints(ifd[339], end)):
        raise ValueError("non-unsigned TIFF sample format is not supported")
    rows_per_strip = one(278, h)
    if 273 not in ifd or 279 not in ifd:
        raise ValueError("TIFF missing StripOffsets/StripByteCounts")
    offsets = _ints(ifd[273], end)
    counts = _ints(ifd[279], end)
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} is not supported")

    row_bytes = w * spp
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = b[off : off + cnt]
        if len(raw) < cnt:
            raise ValueError("TIFF strip overruns file")
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        budget = max(0, nrows) * row_bytes
        if compression == 1:
            data = raw
        elif compression == 5:
            data = _tiff_lzw_decode(raw, max_out=budget)
        elif compression in (8, 32946):
            try:
                data = zlib.decompressobj().decompress(raw, budget + 64)
            except zlib.error as exc:
                raise ValueError(f"corrupt TIFF deflate strip: {exc}") from exc
        elif compression == 32773:
            data = _packbits_decode(raw)
        else:
            raise ValueError(
                f"TIFF compression {compression} is not supported "
                "(none/LZW/deflate/PackBits decode here)"
            )
        if nrows <= 0 or len(data) < nrows * row_bytes:
            raise ValueError("TIFF strip decodes short")
        strip = np.frombuffer(
            data[: nrows * row_bytes], np.uint8
        ).reshape(nrows, w, spp)
        if predictor == 2:
            strip = np.cumsum(strip.astype(np.uint32), axis=1).astype(np.uint8)
        rows.append(strip)
    img = np.concatenate(rows, axis=0)
    if img.shape[0] != h:
        raise ValueError("TIFF strips do not cover the image height")

    if photometric in (0, 1):
        if spp != 1:
            img = img[:, :, :1]
        g = img.reshape(h, w)
        if photometric == 0:
            g = 255 - g
        rgb = np.repeat(g[:, :, None], 3, axis=2)
    elif photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples")
        rgb = img[:, :, :3]  # alpha / extra samples dropped
    elif photometric == 3:
        if spp != 1:
            raise ValueError("palette TIFF must have one sample per pixel")
        if 320 not in ifd:
            raise ValueError("palette TIFF missing ColorMap")
        cmap = _ints(ifd[320], end)
        n = len(cmap) // 3
        if n < 256:
            pad = [0] * (256 - n)
            r, g_, bl = cmap[:n] + pad, cmap[n : 2 * n] + pad, cmap[2 * n :] + pad
        else:
            r, g_, bl = cmap[:n], cmap[n : 2 * n], cmap[2 * n : 3 * n]
        lut = (
            np.stack(
                [np.array(r), np.array(g_), np.array(bl)], axis=1
            ).astype(np.uint32)
            >> 8
        ).astype(np.uint8)
        rgb = lut[img.reshape(h, w)]
    else:
        raise ValueError(f"TIFF photometric {photometric} is not supported")
    return int(w), int(h), np.ascontiguousarray(rgb).tobytes()
