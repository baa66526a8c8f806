"""Pure-python/numpy WebP LOSSLESS (VP8L) decoder.

Implements the public "WebP Lossless Bitstream Specification": RIFF
container walk (plain ``VP8L`` or extended ``VP8X`` files), LSB-first
bit reader, canonical prefix codes (DEFLATE-style, both the "simple"
1/2-symbol form and normal codes transmitted via the 19-symbol
code-length code with 16/17/18 run symbols and the optional
max-symbol cap), meta prefix images, color-cache hashing
(``0x1e35a7bd`` multiplier), LZ77 backward references with the
120-entry two-dimensional distance neighborhood map, and the four
inverse transforms applied in reverse bitstream order:

- PREDICTOR (14 spatial modes over a block-granular mode image, with
  the spec's flat-buffer edge semantics for the rightmost top-right
  pixel),
- COLOR (per-block ``ColorTransformElement`` deltas,
  ``(int8(t) * int8(c)) >> 5``),
- SUBTRACT GREEN,
- COLOR INDEXING (palette with component-wise delta coding and
  sub-byte pixel bundling for palettes of at most 16 entries).

Lossy VP8 and animated files refuse loudly — VP8 needs a full
keyframe codec, which no stdlib reimplementation can honestly claim.

Validated in ``tests/test_multimodal_decode.py`` against an
INDEPENDENT test-side VP8L encoder written from the same
specification (its own canonical-code builder, code-length RLE
emitter, cache and LZ77 emitters): decode(encode(img)) must equal the
source EXACTLY (the format is lossless), across transform/cache/LZ77
combinations, plus hand-derived golden vectors for the predictor
modes and the color-transform delta arithmetic.

The reference treats images as opaque S3 objects (``s3/_copy.py``);
this decoder is beyond-reference, in the same family as
``jpeg_lite``/``tiff_lite``.
"""

from __future__ import annotations

import numpy as np

# 2D distance neighborhood, transcribed from the specification's
# 120-entry (dx, dy) list: distance codes 1..120 map to small window
# offsets, codes >120 are plain distances minus 120.
DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                     11, 12, 13, 14, 15]


class _Bits:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.d
        for i in range(n):
            byte_i = (p + i) >> 3
            if byte_i >= len(d):
                raise ValueError("truncated VP8L stream")
            v |= ((d[byte_i] >> ((p + i) & 7)) & 1) << i
        self.pos += n
        return v


class _Prefix:
    """Canonical prefix code decoder (DEFLATE conventions: codes
    assigned in order of increasing length then symbol, code bits read
    MSB-of-code-first from the LSB-first stream)."""

    __slots__ = ("lut", "single")

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            self.lut = None
            return
        self.single = None
        # canonical assignment
        kraft = sum(1 << (15 - ln) for ln, _ in used)
        if kraft != 1 << 15:
            raise ValueError("prefix code lengths are not complete")
        lut: dict[tuple[int, int], int] = {}
        code = 0
        last_len = 0
        for ln, sym in sorted(used):
            code <<= ln - last_len
            last_len = ln
            lut[(ln, code)] = sym
            code += 1
        self.lut = lut

    @classmethod
    def trivial(cls, symbols: list[int]):
        obj = cls.__new__(cls)
        if len(symbols) == 1:
            obj.single = symbols[0]
            obj.lut = None
        else:
            obj.single = None
            obj.lut = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return obj

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            first = br.read(8)
        else:
            first = br.read(1)
        syms = [first]
        if num_symbols == 2:
            syms.append(br.read(8))
        if any(s >= alphabet_size for s in syms):
            raise ValueError("simple prefix symbol beyond alphabet")
        return _Prefix.trivial(syms)
    # normal: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # max_symbol cap present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("code-length repeat overflows alphabet")
                lengths[symbol] = prev
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    if symbol > alphabet_size:
        raise ValueError("code-length run overflows alphabet")
    return _Prefix(lengths)


def _lz77_value(br: _Bits, sym: int) -> int:
    """Length/distance prefix value: symbols 0..3 are 1..4, beyond
    that (2 + (sym & 1)) << extra extends with extra bits."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _read_code_group(br: _Bits, cache_size: int) -> list[_Prefix]:
    return [
        _read_prefix_code(br, 256 + 24 + cache_size),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 40),
    ]


def _decode_entropy_image(
    br: _Bits, w: int, h: int, *, level0: bool = False
) -> tuple[np.ndarray, int]:
    """Decode one entropy-coded ARGB image of w*h pixels; returns
    (uint32 flat array, color_cache_bits)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache size {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bs = 0
    groups: list[list[_Prefix]]
    if level0 and br.read(1):  # meta prefix image
        meta_bs = br.read(3) + 2
        mw = (w + (1 << meta_bs) - 1) >> meta_bs
        mh = (h + (1 << meta_bs) - 1) >> meta_bs
        meta_px, _ = _decode_entropy_image(br, mw, mh)
        meta = ((meta_px >> 8) & 0xFFFF).reshape(mh, mw)  # (red<<8)|green
        n_groups = int(meta.max()) + 1
    else:
        n_groups = 1
    groups = [_read_code_group(br, cache_size) for _ in range(n_groups)]

    cache = [0] * cache_size
    px = np.zeros(w * h, np.uint32)
    n = w * h
    i = 0
    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            g = groups[int(meta[y >> meta_bs, x >> meta_bs])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            val = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[i] = val
            if cache_size:
                cache[(0x1E35A7BD * val & 0xFFFFFFFF) >> (32 - cache_bits)] = val
            i += 1
        elif s < 256 + 24:
            length = _lz77_value(br, s - 256)
            dist_sym = g[4].read(br)
            dist_code = _lz77_value(br, dist_sym)
            if dist_code <= 120:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > i or i + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                val = int(px[i - dist])
                px[i] = val
                if cache_size:
                    cache[
                        (0x1E35A7BD * val & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = val
                i += 1
        else:
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("color-cache index beyond cache")
            px[i] = cache[idx]
            i += 1
    return px, cache_bits


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """One spatial prediction (modes 0..13) on packed ARGB ints."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    la, lr, lg, lb = _channels(left)
    ta, tr_r, tg, tb = _channels(top)
    ca, cr, cg, cb = _channels(tl)
    ra, rr, rg, rb = _channels(tr)
    if mode == 5:  # avg(avg(L, TR), T)
        return _pack(
            (((la + ra) >> 1) + ta) >> 1,
            (((lr + rr) >> 1) + tr_r) >> 1,
            (((lg + rg) >> 1) + tg) >> 1,
            (((lb + rb) >> 1) + tb) >> 1,
        )
    if mode == 6:  # avg(L, TL)
        return _pack((la + ca) >> 1, (lr + cr) >> 1, (lg + cg) >> 1, (lb + cb) >> 1)
    if mode == 7:  # avg(L, T)
        return _pack((la + ta) >> 1, (lr + tr_r) >> 1, (lg + tg) >> 1, (lb + tb) >> 1)
    if mode == 8:  # avg(TL, T)
        return _pack((ca + ta) >> 1, (cr + tr_r) >> 1, (cg + tg) >> 1, (cb + tb) >> 1)
    if mode == 9:  # avg(T, TR)
        return _pack((ta + ra) >> 1, (tr_r + rr) >> 1, (tg + rg) >> 1, (tb + rb) >> 1)
    if mode == 10:  # avg(avg(L, TL), avg(T, TR))
        return _pack(
            (((la + ca) >> 1) + ((ta + ra) >> 1)) >> 1,
            (((lr + cr) >> 1) + ((tr_r + rr) >> 1)) >> 1,
            (((lg + cg) >> 1) + ((tg + rg) >> 1)) >> 1,
            (((lb + cb) >> 1) + ((tb + rb) >> 1)) >> 1,
        )
    if mode == 11:  # Select: L if the T row better matches the gradient
        p_l = abs(ta - ca) + abs(tr_r - cr) + abs(tg - cg) + abs(tb - cb)
        p_t = abs(la - ca) + abs(lr - cr) + abs(lg - cg) + abs(lb - cb)
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull: clamp(L + T - TL)
        def cl(x):
            return 0 if x < 0 else (255 if x > 255 else x)

        return _pack(
            cl(la + ta - ca), cl(lr + tr_r - cr), cl(lg + tg - cg), cl(lb + tb - cb)
        )
    if mode == 13:  # ClampAddSubtractHalf: clamp(ave + (ave - TL)/2)
        def half(l, t, c):
            ave = (l + t) >> 1
            d = ave - c
            x = ave + (-((-d) >> 1) if d < 0 else d >> 1)  # C trunc-to-zero
            return 0 if x < 0 else (255 if x > 255 else x)

        return _pack(
            half(la, ta, ca), half(lr, tr_r, cr),
            half(lg, tg, cg), half(lb, tb, cb),
        )
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(px: np.ndarray, w: int, h: int, bs: int,
                   modes: np.ndarray) -> None:
    """Invert the predictor transform in place (flat uint32 array);
    ``modes`` is the block-granular mode image (green channel)."""
    mw = modes.shape[1]
    for i in range(w * h):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(px[i - 1])  # left
        elif x == 0:
            pred = int(px[i - w])  # top
        else:
            mode = int(modes[y >> bs, min(x >> bs, mw - 1)])
            # flat-buffer convention: TR of the rightmost pixel is the
            # first pixel of the current row (i - w + 1 wraps there)
            pred = _predict(
                mode, int(px[i - 1]), int(px[i - w]), int(px[i - w - 1]),
                int(px[i - w + 1]),
            )
        pa, pr, pg, pb = _channels(pred)
        v = int(px[i])
        px[i] = _pack(
            (((v >> 24) & 0xFF) + pa) & 0xFF,
            (((v >> 16) & 0xFF) + pr) & 0xFF,
            (((v >> 8) & 0xFF) + pg) & 0xFF,
            ((v & 0xFF) + pb) & 0xFF,
        )


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, arithmetic."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(px: np.ndarray, w: int, h: int, bs: int,
                         elems: np.ndarray) -> None:
    """Invert the color transform in place; ``elems`` holds the raw
    ARGB pixels of the transform image (green_to_red in blue,
    green_to_blue in green, red_to_blue in red)."""
    mw = elems.shape[1]
    for i in range(w * h):
        x, y = i % w, i // w
        e = int(elems[y >> bs, min(x >> bs, mw - 1)])
        g2r = e & 0xFF
        g2b = (e >> 8) & 0xFF
        r2b = (e >> 16) & 0xFF
        v = int(px[i])
        g = (v >> 8) & 0xFF
        r = ((v >> 16) & 0xFF) + _ct_delta(g2r, g)
        r &= 0xFF
        b = (v & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
        b &= 0xFF
        px[i] = (v & 0xFF00FF00) | (r << 16) | b


def decode_vp8l(data: bytes) -> tuple[int, int, bytes]:
    """VP8L chunk payload -> ``(width, height, rgb_bytes)``."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _Bits(data)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")

    transforms = []  # (type, payload...) in bitstream order
    seen = set()
    cur_w = w
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(t)
        if t in (0, 1):  # predictor / color transform
            bs = br.read(3) + 2
            tw = (cur_w + (1 << bs) - 1) >> bs
            th = (h + (1 << bs) - 1) >> bs
            sub, _ = _decode_entropy_image(br, tw, th)
            transforms.append((t, bs, sub.reshape(th, tw)))
        elif t == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            deltas, _ = _decode_entropy_image(br, n_colors, 1)
            palette = np.zeros(n_colors, np.uint32)
            prev = 0
            for ci in range(n_colors):
                d = int(deltas[ci])
                p = 0
                for shift in (0, 8, 16, 24):
                    p |= (
                        (((prev >> shift) & 0xFF) + ((d >> shift) & 0xFF)) & 0xFF
                    ) << shift
                palette[ci] = p
                prev = p
            if n_colors <= 2:
                wb = 3
            elif n_colors <= 4:
                wb = 2
            elif n_colors <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append((3, wb, palette, cur_w))
            cur_w = (cur_w + (1 << wb) - 1) >> wb

    px, _ = _decode_entropy_image(br, cur_w, h, level0=True)

    for tr in reversed(transforms):
        if tr[0] == 0:
            modes = (tr[2] >> 8) & 0xFF
            _inv_predictor(px, cur_w, h, tr[1], modes)
        elif tr[0] == 1:
            _inv_color_transform(px, cur_w, h, tr[1], tr[2])
        elif tr[0] == 2:
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) + g) & 0xFF
            b = ((px & 0xFF) + g) & 0xFF
            px = (px & 0xFF00FF00) | (r << 16) | b
        else:
            wb, palette, orig_w = tr[1], tr[2], tr[3]
            if wb:
                per = 1 << wb
                bits = 8 >> wb
                grid = np.zeros(orig_w * h, np.uint32)
                packed = px.reshape(h, cur_w)
                for y in range(h):
                    for x in range(orig_w):
                        p = int(packed[y, x >> wb])
                        idx = ((p >> 8) & 0xFF) >> ((x % per) * bits)
                        idx &= (1 << bits) - 1
                        if idx >= len(palette):
                            raise ValueError("palette index beyond table")
                        grid[y * orig_w + x] = palette[idx]
                px = grid
                cur_w = orig_w
            else:
                idx = (px >> 8) & 0xFF
                if int(idx.max(initial=0)) >= len(palette):
                    raise ValueError("palette index beyond table")
                px = palette[idx]

    arr = px.reshape(h, w)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=2
    ).astype(np.uint8)
    return int(w), int(h), np.ascontiguousarray(rgb).tobytes()


def decode_webp(b: bytes) -> tuple[int, int, bytes]:
    """RIFF/WEBP container -> ``(width, height, rgb_bytes)``; lossless
    (VP8L) only, found directly or inside an extended (VP8X) file."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    i = 12
    saw_lossy = False
    saw_anim = False
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"VP8L":
            return decode_vp8l(b[i + 8 : i + 8 + clen])
        if cid == b"VP8 ":
            saw_lossy = True
        if cid in (b"ANIM", b"ANMF"):
            saw_anim = True
        i += 8 + clen + (clen % 2)
    if saw_anim:
        raise ValueError(
            "animated WebP is not supported (frames live inside ANMF "
            "chunks; sample still frames upstream)"
        )
    if saw_lossy:
        raise ValueError(
            "lossy WebP (VP8) needs a full keyframe codec — only "
            "lossless (VP8L) decodes here"
        )
    raise ValueError("WebP container has no VP8L chunk")
