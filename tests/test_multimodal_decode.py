"""REAL media decode kernels (operators/multimodal.py decode_bmp /
decode_wav) — exact-value assertions, no media library involved:
uncompressed BMP (24/32-bit, 8-bit palette, row padding, bottom-up and
top-down) and PCM WAV (8/16/32-bit, stereo mixdown), plus the Spark-side
stats/feature operators built on them."""

from __future__ import annotations

import math
import struct

import pytest

from aws_sdk_pandas_spark.operators.multimodal import (
    audio_pcm_stats,
    decode_bmp,
    decode_image,
    decode_images,
    decode_wav,
    extract_features,
    image_pixel_stats,
    make_test_media,
)

RGB_2x2 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])


def test_bmp_24bit_roundtrip_exact():
    payload = make_test_media("bmp", 2, 2, pixels=RGB_2x2)
    w, h, rgb = decode_bmp(payload)
    assert (w, h) == (2, 2)
    assert rgb == RGB_2x2


def test_bmp_row_padding():
    # 3 px * 3 B = 9 B rows padded to 12: decode must strip the padding
    pixels = bytes(range(3 * 2 * 3))
    payload = make_test_media("bmp", 3, 2, pixels=pixels)
    w, h, rgb = decode_bmp(payload)
    assert (w, h) == (3, 2)
    assert rgb == pixels


def test_bmp_top_down_equals_bottom_up():
    up = make_test_media("bmp", 2, 2, pixels=RGB_2x2)
    down = make_test_media("bmp", 2, 2, pixels=RGB_2x2, top_down=True)
    assert up != down  # genuinely different files
    assert decode_bmp(up) == decode_bmp(down)


def _bmp32(width, height, rgba_rows):
    """Hand-built 32-bit BI_RGB bottom-up file (BGRA in-file order)."""
    data = b""
    for row in reversed(rgba_rows):
        for (r, g, b, a) in row:
            data += bytes((b, g, r, a))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 32, 0, len(data), 0, 0, 0, 0)
    return hdr + info + data


def test_bmp_32bit():
    payload = _bmp32(2, 1, [[(1, 2, 3, 255), (4, 5, 6, 0)]])
    w, h, rgb = decode_bmp(payload)
    assert (w, h) == (2, 1)
    assert rgb == bytes([1, 2, 3, 4, 5, 6])  # alpha dropped, BGR flipped


def _bmp8(width, height, idx_rows, palette):
    row_size = ((width * 8 + 31) // 32) * 4
    data = b""
    for row in reversed(idx_rows):
        data += bytes(row) + b"\x00" * (row_size - width)
    pal = b"".join(bytes((b, g, r, 0)) for (r, g, b) in palette)
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(data), 0, 0, len(palette), 0
    )
    return hdr + info + pal + data


def test_bmp_8bit_palette():
    payload = _bmp8(2, 2, [[0, 1], [2, 0]], [(10, 10, 10), (200, 0, 0), (0, 0, 99)])
    w, h, rgb = decode_bmp(payload)
    assert (w, h) == (2, 2)
    assert rgb == bytes([10, 10, 10, 200, 0, 0, 0, 0, 99, 10, 10, 10])


def test_bmp_errors():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"nope")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(make_test_media("bmp", 4, 4, pixels=bytes(48))[:-10])
    rle = bytearray(make_test_media("bmp", 2, 2, pixels=RGB_2x2))
    rle[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError, match="matching"):
        decode_bmp(bytes(rle))
    # PNG now decodes natively; a header-only stub (no IDAT) fails
    # HONESTLY as malformed, and unknown payloads name the contract
    with pytest.raises(ValueError):
        decode_image(make_test_media("png", 4, 4))
    with pytest.raises(NotImplementedError, match="BMP/PNG/GIF/JPEG"):
        decode_image(b"\x00\x01nothing")


def test_wav_16bit_exact():
    raw = struct.pack("<4h", 0, 16384, -32768, 32767)
    payload = make_test_media("wav", sample_rate=8000, channels=1, bits=16, data=raw)
    ch, sr, samples = decode_wav(payload)
    assert (ch, sr) == (1, 8000)
    assert samples[:, 0].tolist() == [0.0, 0.5, -1.0, 32767 / 32768]


def test_wav_stereo_mixdown_and_8bit():
    raw = struct.pack("<4h", 16384, -16384, 8192, 8192)  # L,R,L,R
    payload = make_test_media("wav", sample_rate=8000, channels=2, bits=16, data=raw)
    ch, _sr, samples = decode_wav(payload)
    assert ch == 2 and samples.shape == (2, 2)
    assert samples.mean(axis=1).tolist() == [0.0, 0.25]

    p8 = make_test_media("wav", sample_rate=8000, channels=1, bits=8, data=bytes([128, 255, 0]))
    _, _, s8 = decode_wav(p8)
    assert s8[:, 0].tolist() == [0.0, 127 / 128, -1.0]


def test_wav_errors():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFFxxxx????")
    bad = bytearray(make_test_media("wav", sample_rate=8000, n_frames=4))
    bad[20] = 3  # format tag = IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(bad))


def test_decode_images_real_path(spark):
    df = spark.createDataFrame(
        [
            ("a", bytearray(make_test_media("bmp", 2, 2, pixels=RGB_2x2))),
            ("b", bytearray(make_test_media("bmp", 1, 1, pixels=bytes([9, 8, 7])))),
        ],
        "media_id string, payload binary",
    )
    got = {r.media_id: r for r in decode_images(df).collect()}
    assert bytes(got["a"].pixels) == RGB_2x2 and got["a"].width == 2
    assert bytes(got["b"].pixels) == bytes([9, 8, 7])


def test_image_pixel_stats_exact(spark):
    df = spark.createDataFrame(
        [("a", bytearray(make_test_media("bmp", 2, 2, pixels=RGB_2x2)))],
        "media_id string, payload binary",
    )
    r = image_pixel_stats(df).first()
    vals = list(RGB_2x2)
    mean = sum(vals) / 12
    assert r.mean_pixel == pytest.approx(mean)
    assert r.std_pixel == pytest.approx(math.sqrt(sum((v - mean) ** 2 for v in vals) / 12))
    assert r.mean_r == pytest.approx((255 + 0 + 0 + 10) / 4)
    assert r.mean_g == pytest.approx((0 + 255 + 0 + 20) / 4)
    assert r.mean_b == pytest.approx((0 + 0 + 255 + 30) / 4)


def test_audio_pcm_stats_exact(spark):
    raw = struct.pack("<4h", 16384, -16384, 16384, -16384)
    df = spark.createDataFrame(
        [("a", bytearray(make_test_media("wav", sample_rate=8000, channels=1, bits=16, data=raw)))],
        "media_id string, payload binary",
    )
    r = audio_pcm_stats(df).first()
    assert (r.channels, r.sample_rate, r.n_frames) == (1, 8000, 4)
    assert r.rms == pytest.approx(0.5)
    assert r.peak == pytest.approx(0.5)
    assert r.zero_crossing_rate == pytest.approx(1.0)  # alternating signs


def test_extract_features_real_histograms(spark):
    bmp = make_test_media("bmp", 2, 2, pixels=bytes([0, 0, 0] * 4))  # all-black
    wav = make_test_media(
        "wav", sample_rate=8000, channels=1, bits=16, data=struct.pack("<2h", 0, 0)
    )
    df = spark.createDataFrame(
        [("img", bytearray(bmp)), ("aud", bytearray(wav))],
        "media_id string, payload binary",
    )
    got = {r.media_id: r.feature for r in extract_features(df, dim=16).collect()}
    # all-black image: every luminance value in bin 0
    assert got["img"][0] == pytest.approx(1.0)
    assert sum(got["img"]) == pytest.approx(1.0)
    # all-zero audio: amplitude 0 falls in the bin containing 0 (bin 8 of [-1,1))
    assert got["aud"][8] == pytest.approx(1.0)

    # a REAL (tiny, gray) PNG runs through the same histogram kernel now
    from tests.test_multimodal_decode import _png_encode  # self-import ok

    png_payload = _png_encode(bytes([0, 0, 0] * 4), 2, 2, color=2)
    png = spark.createDataFrame(
        [("p", bytearray(png_payload))], "media_id string, payload binary"
    )
    got_p = {r.media_id: r.feature for r in extract_features(png, dim=16).collect()}
    assert got_p["p"][0] == pytest.approx(1.0)


def test_null_payloads_yield_null_rows(spark):
    """Review finding: a NULL payload is data, not a job failure — the
    real-mode kernels emit NULL stats/features with the id preserved."""
    df = spark.createDataFrame(
        [("ok", bytearray(make_test_media("bmp", 1, 1, pixels=bytes([1, 2, 3])))),
         ("missing", None)],
        "media_id string, payload binary",
    )
    dec = {r.media_id: r for r in decode_images(df).collect()}
    assert dec["missing"].width is None and dec["missing"].pixels is None
    assert dec["ok"].width == 1

    stats = {r.media_id: r for r in image_pixel_stats(df).collect()}
    assert stats["missing"].mean_pixel is None
    feats = {r.media_id: r for r in extract_features(df).collect()}
    assert feats["missing"].feature is None and feats["missing"].n_bytes == 0
    assert feats["ok"].feature is not None

    wav = spark.createDataFrame(
        [("w", bytearray(make_test_media("wav", sample_rate=8000, n_frames=4))),
         ("nope", None)],
        "media_id string, payload binary",
    )
    astats = {r.media_id: r for r in audio_pcm_stats(wav).collect()}
    assert astats["nope"].rms is None and astats["w"].n_frames == 4


def test_image_dhash_properties(spark):
    """dHash over REAL BMP decode: identical images collide, a uniform
    brightness shift is invariant, box-downsampled copies match, and the
    banded pair join equals brute force."""
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import (
        dedup_images_dhash,
        image_dhash,
        make_test_media,
    )

    rng = np.random.default_rng(7)

    def bmp(arr):  # arr: (h, w) grayscale 0..255 -> 24-bit BMP bytes
        h, w = arr.shape
        rgb = np.repeat(arr.astype(np.uint8)[:, :, None], 3, axis=2)
        return make_test_media("bmp", w, h, pixels=rgb.tobytes())

    base = rng.integers(0, 200, size=(8, 9)).astype(np.int64)  # 8 rows, 9 cols
    shifted = np.clip(base + 30, 0, 255)          # uniform brightness shift
    big = np.kron(base, np.ones((4, 4), dtype=np.int64))  # 32x36 upscale
    noisy = base.copy()
    noisy[0, 0] = 255 - noisy[0, 0]               # flips at most a few bits
    other = rng.integers(0, 255, size=(8, 9)).astype(np.int64)

    rows = [
        (1, bmp(base)), (2, bmp(base)), (3, bmp(shifted)),
        (4, bmp(big)), (5, bmp(noisy)), (6, bmp(other)),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    hashes = {
        r.media_id: r.dhash
        for r in image_dhash(df, id_col="media_id").collect()
    }
    assert hashes[1] == hashes[2] == hashes[3] == hashes[4]
    pairs = dedup_images_dhash(df, id_col="media_id", max_distance=4).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]:
        assert got[(a, b)] == 0

    # banding == brute force over all 6 images
    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    brute = {
        (a, b): ham(hashes[a], hashes[b])
        for a in hashes
        for b in hashes
        if a < b and ham(hashes[a], hashes[b]) <= 4
    }
    assert got == brute

    # NULL payloads never pair, never crash
    df2 = spark.createDataFrame(
        [(1, bmp(base)), (2, None)], "media_id bigint, payload binary"
    )
    assert dedup_images_dhash(df2, id_col="media_id").count() == 0


def test_audio_dhash_properties(spark):
    """Energy-envelope audio hash: identical clips collide, a uniform
    gain change preserves the loudness contour (same hash), resampled
    copies match, different content does not."""
    import struct

    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import (
        audio_dhash,
        dedup_audio_dhash,
        make_test_media,
    )

    rng = np.random.default_rng(11)

    def wav(samples_i16, sr=16000):
        return make_test_media(
            "wav", sample_rate=sr, channels=1, bits=16,
            data=struct.pack(f"<{len(samples_i16)}h", *[int(x) for x in samples_i16]),
        )

    base = rng.integers(-20000, 20000, size=260)
    half_gain = base // 2                       # uniform gain: contour kept
    upsampled = np.repeat(base, 2)              # same contour, 2x frames
    other = rng.integers(-20000, 20000, size=260)

    df = spark.createDataFrame(
        [(1, wav(base)), (2, wav(base)), (3, wav(half_gain)),
         (4, wav(upsampled)), (5, wav(other)), (6, None)],
        "media_id bigint, payload binary",
    )
    h = {r.media_id: r.adhash for r in audio_dhash(df, id_col="media_id").collect()}
    assert h[1] == h[2] == h[3] == h[4]
    assert h[5] != h[1]
    assert h[6] is None
    pairs = {(r.id_a, r.id_b) for r in dedup_audio_dhash(df, id_col="media_id", max_distance=0).collect()}
    assert {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)} <= pairs


def test_mp4_metadata_parse(spark):
    """Real ISO-BMFF box-tree parsing: mvhd duration/timescale, per-track
    hdlr types, tkhd presentation size — video and audio tracks, v0
    boxes, non-BMFF rejection, corrupt-size safety."""
    from aws_sdk_pandas_spark.operators.multimodal import (
        make_test_media,
        parse_mp4_py,
        video_metadata,
    )

    vid = make_test_media("mp4", 1920, 1080, timescale=600, duration=3000)
    m = parse_mp4_py(vid)
    assert m["duration_seconds"] == 5.0 and m["timescale"] == 600
    assert m["track_types"] == ["vide"] and (m["width"], m["height"]) == (1920, 1080)
    assert m["major_brand"] == "isom"

    aud = make_test_media("mp4", 0, 0, handler=b"soun", duration=2500)
    ma = parse_mp4_py(aud)
    assert ma["track_types"] == ["soun"] and ma["duration_seconds"] == 2.5
    assert ma["width"] is None

    assert parse_mp4_py(b"notanmp4file....") is None
    assert parse_mp4_py(None) is None
    # corrupt inner size must stop the walk, not crash or mis-read
    broken = bytearray(vid)
    broken[0:4] = (2**31 - 1).to_bytes(4, "big")
    assert parse_mp4_py(bytes(broken)) is not None  # walk stops cleanly

    # the Arrow-batched kernel over a frame
    df = spark.createDataFrame(
        [(1, vid), (2, aud), (3, b"junkjunkjunkjunk"), (4, None)],
        "media_id bigint, payload binary",
    )
    got = {r.media_id: r for r in video_metadata(df).collect()}
    assert got[1].video_duration_seconds == 5.0
    assert got[1].video_track_types == ["vide"]
    assert got[1].video_width == 1920 and got[1].video_brand == "isom"
    assert got[2].video_track_types == ["soun"]
    assert got[3].video_duration_seconds is None
    assert got[4].video_n_tracks is None


# ------------------------------------------------------------------- png


def _png_encode(pixels, w, h, *, color=2, filters=None, palette=None):
    """Test-side PNG encoder (pure ints, independent of the numpy
    decoder): applies the spec's filter functions per row."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = w * ch
    assert len(pixels) == h * stride
    filters = filters or [0] * h
    raw = bytearray()
    prev = [0] * stride
    for r in range(h):
        row = list(pixels[r * stride:(r + 1) * stride])
        ft = filters[r]
        raw.append(ft)
        for i in range(stride):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                f = row[i]
            elif ft == 1:
                f = row[i] - a
            elif ft == 2:
                f = row[i] - b
            elif ft == 3:
                f = row[i] - (a + b) // 2
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                f = row[i] - pred
            raw.append(f & 0xFF)
        prev = row

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_decode_all_filters_and_color_types():
    import random

    from aws_sdk_pandas_spark.operators.multimodal import decode_png

    rng = random.Random(7)
    w, h = 9, 5
    # RGB with every filter type exercised
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    b = _png_encode(px, w, h, color=2, filters=[0, 1, 2, 3, 4])
    gw, gh, got = decode_png(b)
    assert (gw, gh) == (w, h) and got == px

    # RGBA: alpha dropped
    px4 = bytes(rng.randrange(256) for _ in range(w * h * 4))
    _, _, got4 = decode_png(_png_encode(px4, w, h, color=6, filters=[4, 3, 2, 1, 0]))
    want_rgb = bytes(
        v for i, v in enumerate(px4) if i % 4 != 3
    )
    assert got4 == want_rgb

    # grayscale replicated to RGB
    g = bytes(rng.randrange(256) for _ in range(w * h))
    _, _, gotg = decode_png(_png_encode(g, w, h, color=0, filters=[1] * h))
    assert gotg == bytes(v for v in g for _ in range(3))

    # palette lookup
    pal = bytes(rng.randrange(256) for _ in range(9))  # 3 colors
    idx = bytes(rng.randrange(3) for _ in range(w * h))
    _, _, gotp = decode_png(
        _png_encode(idx, w, h, color=3, filters=[2] * h, palette=pal)
    )
    assert gotp == bytes(pal[i * 3 + k] for i in idx for k in range(3))

    # refusals: an illegal depth/color combination, and a 16-bit header
    # over 8-bit data (scanline arithmetic catches the lie)
    import struct as _s
    import pytest as _pytest

    bad = bytearray(_png_encode(px, w, h, color=2))
    _s.pack_into(">B", bad, 8 + 8 + 8, 3)  # depth byte inside IHDR
    with _pytest.raises(ValueError, match="illegal PNG depth"):
        decode_png(bytes(bad))
    bad = bytearray(_png_encode(px, w, h, color=2))
    _s.pack_into(">B", bad, 8 + 8 + 8, 16)
    with _pytest.raises(ValueError, match="scanline"):
        decode_png(bytes(bad))


def test_png_through_decode_images_and_stats(spark):
    """The Arrow decode kernel now handles REAL PNGs end-to-end:
    pixel stats equal the hand-computed mean."""
    from aws_sdk_pandas_spark.operators.multimodal import (
        decode_images,
        image_pixel_stats,
    )

    px = bytes(range(48))  # 4x4 RGB
    b = _png_encode(px, 4, 4, color=2, filters=[0, 1, 2, 4])
    df = spark.createDataFrame([(1, b), (2, None)], "media_id bigint, payload binary")
    rows = {r.media_id: r for r in decode_images(df).collect()}
    assert (rows["1"].width, rows["1"].height) == (4, 4)
    assert bytes(rows["1"].pixels) == px
    assert rows["2"].width is None
    stats = {r.media_id: r for r in image_pixel_stats(df).collect()}
    assert abs(stats["1"].mean_pixel - sum(px) / 48) < 1e-9


# ------------------------------------------------------------------- gif


def _gif_lzw_encode(indexes, min_code):
    """Test-side GIF LZW encoder (real dictionary growth + width bumps),
    independent of the decoder implementation."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_codes = []
    width = min_code + 1
    bits = []

    def emit(code):
        for i in range(width):
            bits.append((code >> i) & 1)

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    cur = ()
    for k in indexes:
        nxt = cur + (k,)
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        cur = (k,)
    if cur:
        emit(table[cur])
        next_code += 1  # the decoder adds an entry for this code too
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(eoi)
    # LSB-first bit packing
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i:i + 8]):
            byte |= bit << j
        data.append(byte)
    return bytes(data), out_codes


def _gif_encode(indexes, w, h, palette, *, min_code=2, interlace=False):
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    n_colors = len(palette) // 3
    size_bits = max(1, (n_colors - 1).bit_length()) - 1
    out += bytes([0x80 | size_bits, 0, 0])
    out += bytes(palette) + b"\x00" * (3 * ((2 << size_bits) - n_colors))
    out += b"\x2c" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0])
    if interlace:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        indexes = [indexes[r * w + c] for r in order for c in range(w)]
    data, _ = _gif_lzw_encode(list(indexes), min_code)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_lzw_and_interlace():
    import random

    from aws_sdk_pandas_spark.operators.multimodal import decode_gif

    rng = random.Random(3)
    pal = bytes(rng.randrange(256) for _ in range(12))  # 4 colors
    w, h = 11, 9
    # runs + noise force dictionary growth and the KwKwK case
    idx = []
    while len(idx) < w * h:
        idx += [rng.randrange(4)] * rng.randrange(1, 6)
    idx = idx[: w * h]
    gw, gh, rgb = decode_gif(_gif_encode(idx, w, h, pal))
    assert (gw, gh) == (w, h)
    assert rgb == bytes(pal[i * 3 + k] for i in idx for k in range(3))
    # interlaced frame decodes to the same top-down pixels
    _, _, rgb_i = decode_gif(_gif_encode(idx, w, h, pal, interlace=True))
    assert rgb_i == rgb
    # a GIF with an extension block before the frame still decodes
    b = bytearray(_gif_encode(idx, w, h, pal))
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    insert_at = 6 + 7 + 12  # after header+lsd+gct
    b[insert_at:insert_at] = ext
    _, _, rgb_e = decode_gif(bytes(b))
    assert rgb_e == rgb


def test_gif_and_png_feed_dhash_dedup(spark):
    """Cross-format perceptual dedup: the SAME image saved as PNG and
    GIF must collide under dHash (decode_image now handles both)."""
    import random

    from aws_sdk_pandas_spark.operators.multimodal import image_dhash

    rng = random.Random(11)
    w, h = 16, 12
    pal = bytes(range(48))  # 16 colors
    idx = [rng.randrange(16) for _ in range(w * h)]
    rgb = bytes(pal[i * 3 + k] for i in idx for k in range(3))
    png = _png_encode(rgb, w, h, color=2, filters=[1] * h)
    gif = _gif_encode(idx, w, h, pal, min_code=4)
    df = spark.createDataFrame(
        [(1, png), (2, gif)], "media_id bigint, payload binary"
    )
    hashes = [r.dhash for r in image_dhash(df, id_col="media_id").collect()]
    assert hashes[0] is not None and hashes[0] == hashes[1]


# ------------------------------------------------------------------ jpeg


def _jpeg_encode(rgb, w, h, *, sub=(1, 1), gray=False, restart=0):
    """Test-side BASELINE JPEG encoder written from T.81 (forward DCT,
    flat quant, simple canonical Huffman tables declared via DHT) —
    independent of the decoder implementation."""
    import struct

    import numpy as np

    from aws_sdk_pandas_spark.operators.jpeg_lite import _A, ZIGZAG

    Q = np.full(64, 8, np.int64)  # flat table keeps loss predictable
    Q[0] = 4

    dc_syms = list(range(12))
    ac_syms = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
    dc_bits = [0, 0, 0, 12] + [0] * 12
    ac_bits = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
    dc_code = {sym: (4, i) for i, sym in enumerate(dc_syms)}
    ac_code = {sym: (8, i) for i, sym in enumerate(ac_syms)}

    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(np.float64)
    ycc = [
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2],
        -0.168736 * arr[:, :, 0] - 0.331264 * arr[:, :, 1] + 0.5 * arr[:, :, 2] + 128,
        0.5 * arr[:, :, 0] - 0.418688 * arr[:, :, 1] - 0.081312 * arr[:, :, 2] + 128,
    ]
    if gray:
        planes, factors = [ycc[0]], [(1, 1)]
    else:
        sh, sv = sub

        def pool(p):
            hh, ww = -(-h // sv) * sv, -(-w // sh) * sh
            pad = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
            return pad.reshape(hh // sv, sv, ww // sh, sh).mean(axis=(1, 3))

        planes = [ycc[0], pool(ycc[1]), pool(ycc[2])]
        factors = [(sh, sv), (1, 1), (1, 1)]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        th = -(-h // (8 * vmax)) * fv * 8
        tw = -(-w // (8 * hmax)) * fh * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        padded.append(pp - 128.0)

    bits = []

    def put(nbits, code):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def put_val(v, t):
        if t:
            put(t, v if v > 0 else v + (1 << t) - 1)

    def flush_to_bytes():
        while len(bits) % 8:
            bits.append(1)  # pad with 1s per spec
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i:i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        bits.clear()
        return bytes(out)

    scan = bytearray()
    preds = [0] * len(planes)
    mcux = padded[0].shape[1] // (8 * factors[0][0])
    mcuy = padded[0].shape[0] // (8 * factors[0][1])
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_n and mcu_n % restart == 0:
                scan += flush_to_bytes()
                scan += bytes([0xFF, 0xD0 + ((mcu_n // restart - 1) % 8)])
                preds = [0] * len(planes)
            for ci, (p, (fh, fv)) in enumerate(zip(padded, factors)):
                for by in range(fv):
                    for bx in range(fh):
                        y0, x0 = (my * fv + by) * 8, (mx * fh + bx) * 8
                        F = _A @ p[y0:y0 + 8, x0:x0 + 8] @ _A.T
                        zz = np.round(F.reshape(64)[ZIGZAG] / Q).astype(np.int64)
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        t = 0 if diff == 0 else int(abs(diff)).bit_length()
                        put(*dc_code[t])
                        put_val(diff, t)
                        k = 1
                        while k < 64:
                            run = 0
                            while k < 64 and zz[k] == 0:
                                run += 1
                                k += 1
                            if k == 64:
                                put(*ac_code[0x00])  # EOB
                                break
                            while run >= 16:
                                put(*ac_code[0xF0])
                                run -= 16
                            v = int(zz[k])
                            s_cat = int(abs(v)).bit_length()
                            put(*ac_code[(run << 4) | s_cat])
                            put_val(v, s_cat)
                            k += 1
            mcu_n += 1
    scan += flush_to_bytes()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in Q))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits[:16]) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits[:16]) + bytes(ac_syms))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan + b"\xff\xd9"
    return out


def test_jpeg_decode_baseline():
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import decode_image

    # solid color: DC-only blocks decode near-exactly
    w, h = 16, 16
    solid = bytes([120, 200, 64]) * (w * h)
    gw, gh, got = decode_image(_jpeg_encode(solid, w, h))
    assert (gw, gh) == (w, h)
    a = np.frombuffer(got, np.uint8).astype(int).reshape(h, w, 3)
    want = np.array([120, 200, 64])
    assert np.abs(a - want).max() <= 3

    # smooth gradient round-trips above 30 dB PSNR, 4:2:0 subsampling
    w2, h2 = 24, 16
    grad = bytearray()
    for r in range(h2):
        for c in range(w2):
            grad += bytes([(c * 10) % 256, (r * 12) % 256, ((r + c) * 5) % 256])
    for sub in ((1, 1), (2, 2), (2, 1)):
        _, _, got2 = decode_image(_jpeg_encode(bytes(grad), w2, h2, sub=sub))
        x = np.frombuffer(bytes(grad), np.uint8).astype(float)
        yhat = np.frombuffer(got2, np.uint8).astype(float)
        mse = float(np.mean((x - yhat) ** 2))
        psnr = 10 * np.log10(255 ** 2 / mse)
        assert psnr > (30 if sub == (1, 1) else 20), (sub, psnr)

    # grayscale frame
    _, _, gotg = decode_image(_jpeg_encode(solid, w, h, gray=True))
    g = np.frombuffer(gotg, np.uint8).reshape(h, w, 3)
    lum = 0.299 * 120 + 0.587 * 200 + 0.114 * 64
    assert abs(int(g[0, 0, 0]) - lum) <= 3 and (g[:, :, 0] == g[:, :, 1]).all()

    # restart markers reset DC predictors
    _, _, gotr = decode_image(_jpeg_encode(bytes(grad), w2, h2, restart=2))
    assert np.abs(
        np.frombuffer(gotr, np.uint8).astype(int)
        - np.frombuffer(bytes(grad), np.uint8).astype(int)
    ).mean() < 12

    # arithmetic-coded SOF9 refuses loudly (progressive SOF2 decodes
    # for real now — tests below)
    import pytest as _pytest

    b = bytearray(_jpeg_encode(solid, w, h))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC9
    with _pytest.raises(ValueError, match="arithmetic"):
        decode_image(bytes(b))


def _jpeg_encode_progressive(
    rgb, w, h, *, sub=(1, 1), gray=False, script="sa", restart=0,
    truncate_after=None,
):
    """Test-side PROGRESSIVE JPEG encoder written from T.81 G.1.2 —
    independent of the decoder implementation.  ``script="spectral"``
    emits spectral-selection-only scans (Ah=Al=0); ``script="sa"`` adds
    successive approximation: DC first at Al=1 + DC refinement, AC
    first scans at Al=1 + AC refinement scans with EOB-run
    accumulation and interleaved correction bits (G.1.2.3)."""
    import struct

    import numpy as np

    from aws_sdk_pandas_spark.operators.jpeg_lite import _A, ZIGZAG

    Q = np.full(64, 8, np.int64)
    Q[0] = 4

    dc_syms = list(range(12))
    ac_syms = (
        [0x00]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
        + [0xF0]
        + [r << 4 for r in range(1, 15)]  # EOBn run-length symbols
    )
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_code = {sym: (4, i) for i, sym in enumerate(dc_syms)}
    ac_code = {sym: (8, i) for i, sym in enumerate(ac_syms)}

    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(np.float64)
    ycc = [
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2],
        -0.168736 * arr[:, :, 0] - 0.331264 * arr[:, :, 1] + 0.5 * arr[:, :, 2] + 128,
        0.5 * arr[:, :, 0] - 0.418688 * arr[:, :, 1] - 0.081312 * arr[:, :, 2] + 128,
    ]
    if gray:
        planes, factors = [ycc[0]], [(1, 1)]
    else:
        sh_, sv_ = sub

        def pool(p):
            hh, ww = -(-h // sv_) * sv_, -(-w // sh_) * sh_
            pad = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
            return pad.reshape(hh // sv_, sv_, ww // sh_, sh_).mean(axis=(1, 3))

        planes = [ycc[0], pool(ycc[1]), pool(ycc[2])]
        factors = [(sh_, sv_), (1, 1), (1, 1)]
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    blocks = []  # per comp: (nby_padded, nbx_padded, 64) quantized zigzag
    own = []  # per comp: the component's OWN block grid (nby, nbx)
    for p, (fh, fv) in zip(planes, factors):
        th = -(-h // (8 * vmax)) * fv * 8
        tw = -(-w // (8 * hmax)) * fh * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge") - 128.0
        nby, nbx = th // 8, tw // 8
        zz = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                Fq = _A @ pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] @ _A.T
                zz[by, bx] = np.round(Fq.reshape(64)[ZIGZAG] / Q)
        blocks.append(zz)
        cw = -(-w * fh // hmax)
        ch = -(-h * fv // vmax)
        own.append((-(-ch // 8), -(-cw // 8)))

    bits = []

    def put(nbits, code):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def put_val(v, t):
        if t:
            put(t, v if v > 0 else v + (1 << t) - 1)

    def flush_to_bytes():
        while len(bits) % 8:
            bits.append(1)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        bits.clear()
        return bytes(out)

    def rst(n):
        return bytes([0xFF, 0xD0 + (n % 8)])

    def mcu_groups():
        """Interleaved MCU block order over ALL components (DC scans)."""
        mcuy_ = blocks[0].shape[0] // factors[0][1]
        mcux_ = blocks[0].shape[1] // factors[0][0]
        groups = []
        for my in range(mcuy_):
            for mx in range(mcux_):
                g = []
                for ci, (fh, fv) in enumerate(factors):
                    for by in range(fv):
                        for bx in range(fh):
                            g.append((ci, my * fv + by, mx * fh + bx))
                groups.append(g)
        return groups

    def dc_scan(al):
        out_ = bytearray()
        preds = [0] * ncomp
        for n, g in enumerate(mcu_groups()):
            if restart and n and n % restart == 0:
                out_ += flush_to_bytes()
                out_ += rst(n // restart - 1)
                preds = [0] * ncomp
            for ci, by, bx in g:
                v = int(blocks[ci][by, bx, 0]) >> al  # arithmetic shift
                diff = v - preds[ci]
                preds[ci] = v
                t = 0 if diff == 0 else abs(diff).bit_length()
                put(*dc_code[t])
                put_val(diff, t)
        out_ += flush_to_bytes()
        return bytes(out_)

    def dc_refine_scan(al):
        out_ = bytearray()
        for n, g in enumerate(mcu_groups()):
            if restart and n and n % restart == 0:
                out_ += flush_to_bytes()
                out_ += rst(n // restart - 1)
            for ci, by, bx in g:
                put(1, (int(blocks[ci][by, bx, 0]) >> al) & 1)
        out_ += flush_to_bytes()
        return bytes(out_)

    def ac_scan(ci, ss, se, al):
        out_ = bytearray()
        nby, nbx = own[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            while eobrun:
                r = min(14, eobrun.bit_length() - 1)
                take = min(eobrun, (1 << (r + 1)) - 1)
                put(*ac_code[r << 4 if r else 0x00])
                if r:
                    put(r, take - (1 << r))
                eobrun -= take

        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart and n and n % restart == 0:
                    flush_eob()
                    out_ += flush_to_bytes()
                    out_ += rst(n // restart - 1)
                n += 1
                vals = [int(v) for v in blocks[ci][by, bx, ss : se + 1]]
                tv = [(1 if v > 0 else -1) * (abs(v) >> al) for v in vals]
                if not any(tv):
                    eobrun += 1
                    continue
                flush_eob()
                last_nz = max(i for i, v in enumerate(tv) if v)
                run = 0
                for v in tv[: last_nz + 1]:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        put(*ac_code[0xF0])
                        run -= 16
                    s = abs(v).bit_length()
                    put(*ac_code[(run << 4) | s])
                    put_val(v, s)
                    run = 0
                if last_nz < len(tv) - 1:
                    eobrun += 1
        flush_eob()
        out_ += flush_to_bytes()
        return bytes(out_)

    def ac_refine_scan(ci, ss, se, al):
        out_ = bytearray()
        nby, nbx = own[ci]
        eobrun = 0
        pend = []  # correction bits buffered across the current EOB run

        def flush_eob():
            nonlocal eobrun, pend
            if not eobrun:
                assert not pend
                return
            r = min(14, eobrun.bit_length() - 1)
            assert eobrun < (1 << (r + 1)), "test encoder: EOB run too long"
            put(*ac_code[r << 4 if r else 0x00])
            if r:
                put(r, eobrun - (1 << r))
            for bbit in pend:
                put(1, bbit)
            pend = []
            eobrun = 0

        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart and n and n % restart == 0:
                    flush_eob()
                    out_ += flush_to_bytes()
                    out_ += rst(n // restart - 1)
                n += 1
                vals = [int(v) for v in blocks[ci][by, bx, ss : se + 1]]
                t = [abs(v) >> al for v in vals]
                eobk = -1
                for i, tvv in enumerate(t):
                    if tvv == 1:
                        eobk = i
                if eobk < 0:
                    # whole block joins the EOB run; its correction bits
                    # ride along in block order
                    eobrun += 1
                    pend += [
                        (abs(v) >> al) & 1 for v, tvv in zip(vals, t) if tvv > 1
                    ]
                    continue
                flush_eob()
                run = 0
                local = []
                for v, tvv in zip(vals, t):
                    if tvv == 0:
                        run += 1
                        continue
                    while run > 15:
                        put(*ac_code[0xF0])
                        for bbit in local:
                            put(1, bbit)
                        local = []
                        run -= 16
                    if tvv > 1:
                        local.append((abs(v) >> al) & 1)
                        continue
                    put(*ac_code[(run << 4) | 1])
                    put(1, 1 if v > 0 else 0)
                    for bbit in local:
                        put(1, bbit)
                    local = []
                    run = 0
                if run > 0 or local:
                    eobrun += 1
                    pend += local
        flush_eob()
        out_ += flush_to_bytes()
        return bytes(out_)

    if script == "spectral":
        plan = [("dc", 0, 0)]
        for ci in range(ncomp):
            plan += [("ac", ci, 1, 5, 0), ("ac", ci, 6, 63, 0)]
    elif script == "sa":
        plan = [("dc", 0, 1)]
        for ci in range(ncomp):
            plan += [("ac", ci, 1, 5, 1), ("ac", ci, 6, 63, 1)]
        plan += [("dcr", 1, 0)]
        for ci in range(ncomp):
            plan += [("acr", ci, 1, 63, 1, 0)]
    else:
        plan = script

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in Q))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits[:16]) + bytes(dc_syms))
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    scans = plan if truncate_after is None else plan[:truncate_after]
    for sc in scans:
        if sc[0] == "dc":
            _, ah, al = sc
            sos = bytes([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 0, (ah << 4) | al])
            out += seg(0xDA, sos) + dc_scan(al)
        elif sc[0] == "dcr":
            _, ah, al = sc
            sos = bytes([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 0, (ah << 4) | al])
            out += seg(0xDA, sos) + dc_refine_scan(al)
        elif sc[0] == "ac":
            _, ci, ss, se, al = sc
            sos = bytes([1, ci + 1, 0x00, ss, se, al])
            out += seg(0xDA, sos) + ac_scan(ci, ss, se, al)
        elif sc[0] == "acr":
            _, ci, ss, se, ah, al = sc
            sos = bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
            out += seg(0xDA, sos) + ac_refine_scan(ci, ss, se, al)
        else:  # pragma: no cover - script typo guard
            raise AssertionError(sc)
    return out + b"\xff\xd9"


def _prog_test_image(w, h):
    """Gradient left third, checkerboard middle (big AC magnitudes ->
    refinement correction bits), solid right third (all-zero AC blocks
    -> EOB-run accumulation)."""
    px = bytearray()
    for r in range(h):
        for c in range(w):
            if c < w // 3:
                px += bytes([(c * 10) % 256, (r * 12) % 256, ((r + c) * 5) % 256])
            elif c < 2 * w // 3:
                v = 230 if (r + c) % 2 == 0 else 25
                px += bytes([v, v, v])
            else:
                px += bytes([180, 90, 40])
    return bytes(px)


def test_jpeg_progressive_spectral_selection_matches_baseline():
    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    w, h = 48, 16
    img = _prog_test_image(w, h)
    for sub, gray in (((1, 1), False), ((2, 2), False), ((2, 1), False),
                      ((1, 1), True)):
        base = _jpeg_encode(img, w, h, sub=sub, gray=gray)
        prog = _jpeg_encode_progressive(
            img, w, h, sub=sub, gray=gray, script="spectral"
        )
        assert decode_jpeg(prog) == decode_jpeg(base), (sub, gray)


def test_jpeg_progressive_successive_approximation_matches_baseline():
    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    w, h = 48, 16
    img = _prog_test_image(w, h)
    for sub, gray in (((1, 1), False), ((2, 2), False), ((1, 1), True)):
        base = _jpeg_encode(img, w, h, sub=sub, gray=gray)
        prog = _jpeg_encode_progressive(img, w, h, sub=sub, gray=gray)
        assert decode_jpeg(prog) == decode_jpeg(base), (sub, gray)


def test_jpeg_progressive_restart_markers():
    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    w, h = 48, 16
    img = _prog_test_image(w, h)
    base = _jpeg_encode(img, w, h)
    for script in ("spectral", "sa"):
        prog = _jpeg_encode_progressive(img, w, h, script=script, restart=3)
        assert decode_jpeg(prog) == decode_jpeg(base), script


def test_jpeg_progressive_truncated_prefix_decodes():
    import numpy as np

    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    w, h = 16, 16
    solid = bytes([120, 200, 64]) * (w * h)
    full = np.frombuffer(
        decode_jpeg(_jpeg_encode_progressive(solid, w, h))[2], np.uint8
    ).astype(int)
    # DC-only prefix (Al=1): coarse but recognizably the same color
    for k in (1, 3, 5):
        ww, hh, got = decode_jpeg(
            _jpeg_encode_progressive(solid, w, h, truncate_after=k)
        )
        assert (ww, hh) == (w, h)
        a = np.frombuffer(got, np.uint8).astype(int)
        assert np.abs(a - full).max() <= 24, k


def test_jpeg_progressive_through_decode_image(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import decode_image

    w, h = 24, 16
    img = _prog_test_image(w, h)
    gw, gh, got = decode_image(_jpeg_encode_progressive(img, w, h))
    assert (gw, gh) == (w, h)
    x = np.frombuffer(img, np.uint8).astype(float)
    yhat = np.frombuffer(got, np.uint8).astype(float)
    mse = float(np.mean((x - yhat) ** 2))
    assert 10 * np.log10(255**2 / mse) > 20


def test_jpeg_progressive_malformed_scans_refuse():
    import pytest as _pytest

    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    w, h = 16, 16
    solid = bytes([120, 200, 64]) * (w * h)
    good = _jpeg_encode_progressive(solid, w, h)
    # a progressive DC scan whose header claims Se=63 is malformed
    b = bytearray(good)
    i = b.index(b"\xff\xda")
    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
    b[i + 2 + seglen - 2] = 63  # Se byte of the DC scan header
    with _pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(b))
    # truncated mid-scan entropy data reads as truncation, not garbage
    with _pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])


def test_jpeg_and_png_feed_dhash(spark):
    """The same picture saved lossless (PNG) and lossy (JPEG) collides
    under perceptual dHash — the cross-format near-dup case the decoder
    family exists for."""
    from aws_sdk_pandas_spark.operators.multimodal import image_dhash

    w, h = 32, 24
    rgb = bytearray()
    for r in range(h):
        for c in range(w):
            v = 255 if (c // 8 + r // 8) % 2 else 30  # checkerboard
            rgb += bytes([v, v, v])
    png = _png_encode(bytes(rgb), w, h, color=2, filters=[0] * h)
    jpg = _jpeg_encode(bytes(rgb), w, h)
    df = spark.createDataFrame(
        [(1, png), (2, jpg)], "media_id bigint, payload binary"
    )
    hs = [r.dhash for r in image_dhash(df, id_col="media_id").collect()]
    assert hs[0] is not None and hs[0] == hs[1]


def test_png_gif_roundtrip_property():
    """Hypothesis: random pixels, dimensions, and filter choices
    round-trip losslessly through both pure-python decoders."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_sdk_pandas_spark.operators.multimodal import decode_gif, decode_png

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 12), st.integers(1, 10),
        st.lists(st.integers(0, 4), min_size=10, max_size=10),
        st.randoms(use_true_random=False),
    )
    def run(w, h, filters, rng):
        px = bytes(rng.randrange(256) for _ in range(w * h * 3))
        b = _png_encode(px, w, h, color=2, filters=filters[:h] + [0] * max(0, h - len(filters)))
        gw, gh, got = decode_png(b)
        assert (gw, gh, got) == (w, h, px)
        pal = bytes(rng.randrange(256) for _ in range(24))  # 8 colors
        idx = [rng.randrange(8) for _ in range(w * h)]
        g = _gif_encode(idx, w, h, pal, min_code=3)
        gw2, gh2, got2 = decode_gif(g)
        assert (gw2, gh2) == (w, h)
        assert got2 == bytes(pal[i * 3 + k] for i in idx for k in range(3))

    run()


def test_jpeg_solid_blocks_property():
    """Hypothesis: random solid colors survive JPEG (DC-only blocks are
    near-exact for any color at any MCU-aligned size)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    @settings(max_examples=15, deadline=None)
    @given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255),
           st.sampled_from([(8, 8), (16, 8), (16, 16)]))
    def run(r, g, b, wh):
        w, h = wh
        rgb = bytes([r, g, b]) * (w * h)
        _, _, got = decode_jpeg(_jpeg_encode(rgb, w, h))
        arr = np.frombuffer(got, np.uint8).astype(int).reshape(h, w, 3)
        assert np.abs(arr - np.array([r, g, b])).max() <= 4

    run()


# ---------------------------------------------------------------------------
# audio_spectral_features: real FFT front end over the native WAV decode
# ---------------------------------------------------------------------------


def _sine_wav(freq_hz: float, sr: int = 8192, n: int = 8192, amp: float = 0.5) -> bytes:
    import numpy as np

    t = np.arange(n, dtype=np.float64)
    pcm = np.round(amp * 32767.0 * np.sin(2.0 * math.pi * freq_hz * t / sr)).astype(
        np.int16
    )
    return make_test_media(
        "wav", sample_rate=sr, channels=1, bits=16, data=pcm.tobytes()
    )


def test_spectral_sine_peak_exact_bin(spark):
    """A pure sine placed EXACTLY on an FFT bin (sr=8192, frame_len=1024
    -> 8 Hz bins; 440 is not a multiple of 8, 440.0->use 55*8=440... is):
    the Hann-windowed spectrum peaks at that bin, so dominant_freq_hz is
    the exact bin frequency; centroid lands within a bin width."""
    from aws_sdk_pandas_spark.operators.multimodal import audio_spectral_features

    freq = 55 * 8.0  # exactly bin 55 at 8 Hz resolution
    df = spark.createDataFrame(
        [("tone", bytearray(_sine_wav(freq)))], "media_id string, payload binary"
    )
    r = audio_spectral_features(df).first()
    assert r.sample_rate == 8192 and r.n_frames == 8192
    assert r.dominant_freq_hz == freq
    assert abs(r.spectral_centroid_hz - freq) < 8.0
    assert r.spectral_rolloff_hz == pytest.approx(freq, abs=8.0)
    assert r.spectral_flatness < 0.05  # a tone is maximally peaky
    assert len(r.mel_energies) == 16


def test_spectral_flatness_separates_noise_from_tone(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import audio_spectral_features

    rng = np.random.RandomState(7)
    noise = np.round(0.5 * 32767.0 * (2.0 * rng.rand(8192) - 1.0)).astype(np.int16)
    noise_wav = make_test_media(
        "wav", sample_rate=8192, channels=1, bits=16, data=noise.tobytes()
    )
    df = spark.createDataFrame(
        [("tone", bytearray(_sine_wav(440.0))), ("noise", bytearray(noise_wav))],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in audio_spectral_features(df).collect()}
    assert rows["noise"].spectral_flatness > 10 * rows["tone"].spectral_flatness
    assert rows["noise"].spectral_bandwidth_hz > rows["tone"].spectral_bandwidth_hz


def test_spectral_mel_peak_covers_tone(spark):
    """The argmax mel band's triangular filter must cover the tone's
    frequency — checked against an independent reconstruction of the
    HTK mel breakpoints."""
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import audio_spectral_features

    freq, sr, n_mels = 1000.0, 8192, 16
    df = spark.createDataFrame(
        [("t", bytearray(_sine_wav(freq)))], "media_id string, payload binary"
    )
    r = audio_spectral_features(df, n_mels=n_mels).first()
    band = int(np.argmax(r.mel_energies))
    mel_pts = np.linspace(0.0, 2595.0 * math.log10(1.0 + sr / 2.0 / 700.0), n_mels + 2)
    hz = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    assert hz[band] <= freq <= hz[band + 2]


def test_spectral_null_silent_and_short_clips(spark):
    from aws_sdk_pandas_spark.operators.multimodal import audio_spectral_features

    silent = make_test_media(
        "wav", sample_rate=8000, channels=1, bits=16, n_frames=2000
    )
    short = _sine_wav(400.0, sr=8000, n=100)  # < frame_len: zero-padded
    df = spark.createDataFrame(
        [("null", None), ("silent", bytearray(silent)), ("short", bytearray(short))],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in audio_spectral_features(df).collect()}
    assert rows["null"].dominant_freq_hz is None and rows["null"].sample_rate is None
    assert rows["silent"].dominant_freq_hz is None
    assert rows["silent"].n_frames == 2000  # row passes through
    assert rows["short"].dominant_freq_hz is not None
    assert abs(rows["short"].dominant_freq_hz - 400.0) < 90.0  # padded-frame smear


# ---------------------------------------------------------------------------
# audio_metadata: MP3 / FLAC / Ogg container headers (stdlib parsing)
# ---------------------------------------------------------------------------


def test_audio_metadata_mp3_cbr_and_id3(spark):
    from aws_sdk_pandas_spark.operators.multimodal import audio_metadata

    plain = make_test_media("mp3", sample_rate=44100, bitrate_kbps=128, mp3_frames=8)
    tagged = make_test_media(
        "mp3", sample_rate=32000, bitrate_kbps=64, channels=1,
        mp3_frames=8, id3_size=500,
    )
    df = spark.createDataFrame(
        [("plain", bytearray(plain)), ("tagged", bytearray(tagged))],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in audio_metadata(df).collect()}
    p = rows["plain"]
    assert (p.audio_codec, p.audio_channels, p.audio_sample_rate) == ("mp3", 2, 44100)
    assert p.audio_bitrate_kbps == 128
    # 8 MPEG1-L3 frames = 8*1152/44100 s ~ 209 ms; CBR estimate from size
    assert abs(p.audio_duration_ms - 8 * 1152 * 1000 / 44100) < 30
    t = rows["tagged"]
    assert (t.audio_codec, t.audio_channels, t.audio_sample_rate) == ("mp3", 1, 32000)
    assert t.audio_bitrate_kbps == 64


def test_audio_metadata_mp3_xing_vbr(spark):
    from aws_sdk_pandas_spark.operators.multimodal import audio_metadata

    b = make_test_media(
        "mp3", sample_rate=48000, bitrate_kbps=96, mp3_frames=2, xing_frames=1000
    )
    df = spark.createDataFrame([("x", bytearray(b))], "media_id string, payload binary")
    r = audio_metadata(df).first()
    # Xing frame count wins over the CBR size estimate
    assert r.audio_duration_ms == 1000 * 1152 * 1000 // 48000


def test_audio_metadata_flac_streaminfo(spark):
    from aws_sdk_pandas_spark.operators.multimodal import audio_metadata

    b = make_test_media(
        "flac", sample_rate=96000, channels=6, bits=24, total_samples=96000 * 7
    )
    df = spark.createDataFrame([("f", bytearray(b))], "media_id string, payload binary")
    r = audio_metadata(df).first()
    assert (r.audio_codec, r.audio_channels, r.audio_sample_rate, r.audio_bits) == (
        "flac", 6, 96000, 24,
    )
    assert r.audio_duration_ms == 7000


def test_audio_metadata_ogg_opus_and_vorbis(spark):
    from aws_sdk_pandas_spark.operators.multimodal import audio_metadata

    opus = make_test_media(
        "ogg", codec="opus", channels=2, sample_rate=44100,
        granule=96312, pre_skip=312,
    )
    vorb = make_test_media(
        "ogg", codec="vorbis", channels=1, sample_rate=22050, granule=44100
    )
    df = spark.createDataFrame(
        [("o", bytearray(opus)), ("v", bytearray(vorb))],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in audio_metadata(df).collect()}
    o = rows["o"]
    # Opus: input rate preserved in the header; duration on the 48kHz clock
    assert (o.audio_codec, o.audio_channels, o.audio_sample_rate) == ("opus", 2, 44100)
    assert o.audio_duration_ms == (96312 - 312) * 1000 // 48000  # exactly 2s
    v = rows["v"]
    assert (v.audio_codec, v.audio_channels, v.audio_sample_rate) == (
        "vorbis", 1, 22050,
    )
    assert v.audio_duration_ms == 2000


def test_audio_metadata_wav_and_unknown_rows(spark):
    from aws_sdk_pandas_spark.operators.multimodal import audio_metadata, sniff_format

    wav = make_test_media("wav", sample_rate=16000, channels=2, bits=16, n_frames=8000)
    junk = b"\x00\x01\x02\x03" * 64
    df = spark.createDataFrame(
        [("w", bytearray(wav)), ("j", bytearray(junk)), ("n", None)],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in audio_metadata(df).collect()}
    w = rows["w"]
    assert (w.audio_codec, w.audio_duration_ms, w.audio_bitrate_kbps) == (
        "pcm", 500, 512,
    )
    assert rows["j"].audio_codec is None and rows["n"].audio_codec is None


def test_sniff_format_audio_containers(spark):
    from aws_sdk_pandas_spark.operators.multimodal import sniff_format

    rows = [
        ("flac", bytearray(make_test_media("flac"))),
        ("ogg", bytearray(make_test_media("ogg"))),
        ("mp3", bytearray(make_test_media("mp3"))),
        ("id3", bytearray(make_test_media("mp3", id3_size=64))),
        ("wav", bytearray(make_test_media("wav"))),
    ]
    df = spark.createDataFrame(rows, "expect string, payload binary")
    got = df.select("expect", sniff_format("payload").alias("got")).collect()
    for r in got:
        assert r.got == ("mp3" if r.expect == "id3" else r.expect), r


def test_mp3_sync_needs_consecutive_frames():
    from aws_sdk_pandas_spark.operators.multimodal import _mp3_meta_py

    # a lone sync pattern inside junk with no second frame where the
    # length field says -> rejected, not misparsed
    junk = b"\x12" * 100 + b"\xff\xfb\x92\x00" + b"\x34" * 2000
    assert _mp3_meta_py(junk) is None


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: real video frame decode via RIFF walk + jpeg_lite
# ---------------------------------------------------------------------------


def _solid_rgb(w, h, rgb):
    return bytes(rgb) * (w * h)


def test_avi_metadata_and_sniff(spark):
    from aws_sdk_pandas_spark.operators.multimodal import sniff_format, video_metadata

    f0 = _jpeg_encode(_solid_rgb(16, 16, (200, 30, 90)), 16, 16)
    avi = make_test_media("avi", 16, 16, frames=[f0] * 24, fps=12)
    df = spark.createDataFrame(
        [("v", bytearray(avi))], "media_id string, payload binary"
    )
    assert df.select(sniff_format("payload")).first()[0] == "avi"
    r = video_metadata(df).first()
    assert r.video_brand == "AVI "
    assert r.video_timescale == 12          # fps
    assert r.video_duration_seconds == pytest.approx(2.0, abs=1e-3)  # 1e6//12 rounding
    assert (r.video_width, r.video_height) == (16, 16)
    assert r.video_track_types == ["vids"] and r.video_n_tracks == 1


def test_decode_video_frames_real_mjpeg(spark):
    from aws_sdk_pandas_spark.operators.multimodal import decode_video_frames

    # three solid-color frames: decoded means must recover each color
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
    frames = [_jpeg_encode(_solid_rgb(16, 16, c), 16, 16) for c in colors]
    avi = make_test_media("avi", 16, 16, frames=frames, fps=5)
    df = spark.createDataFrame(
        [("v", bytearray(avi)), ("null", None)], "media_id string, payload binary"
    )
    rows = {r.frame_idx: r for r in decode_video_frames(df).collect()}
    assert sorted(rows) == [0, 1, 2]
    for i, (cr, cg, cb) in enumerate(colors):
        r = rows[i]
        assert (r.width, r.height) == (16, 16)
        # baseline JPEG round-trip of a solid color is near-exact
        assert abs(r.mean_r - cr) < 3 and abs(r.mean_g - cg) < 3
        assert abs(r.mean_b - cb) < 3

    sampled = decode_video_frames(df, frame_indices=[0, 2]).collect()
    assert sorted(r.frame_idx for r in sampled) == [0, 2]


def test_parse_subtitles_srt_and_vtt(spark):
    from aws_sdk_pandas_spark.operators.multimodal import parse_subtitles

    srt = (
        "1\r\n00:00:01,000 --> 00:00:04,200\r\nHello world\r\n\r\n"
        "2\r\n00:01:02,500 --> 00:01:05,000\r\nSecond cue\r\nwith two lines\r\n"
    )
    vtt = (
        "WEBVTT\n\nintro-cue\n00:00:00.000 --> 00:00:02.000\nVTT first\n\n"
        "NOTE a comment block\n\n00:10:00.000 --> 00:10:30.123\n42\n"
    )
    df = spark.createDataFrame(
        [("a", srt), ("b", vtt), ("c", "no cues here"), ("d", None)],
        "media_id string, text string",
    )
    rows = {(r.media_id, r.cue_idx): r for r in parse_subtitles(df).collect()}
    assert rows[("a", 1)].start_ms == 1000 and rows[("a", 1)].end_ms == 4200
    assert rows[("a", 1)].text == "Hello world"
    assert rows[("a", 2)].start_ms == 62500
    assert rows[("a", 2)].text == "Second cue\nwith two lines"
    assert rows[("b", 1)].text == "VTT first"
    # an all-digit cue text must NOT be mistaken for an SRT index
    assert rows[("b", 2)].text == "42"
    assert rows[("b", 2)].end_ms == 600_000 + 30_123
    assert {k[0] for k in rows} == {"a", "b"}  # headers/NOTE/cueless drop


def test_align_cues_to_frames(spark):
    from aws_sdk_pandas_spark.operators.multimodal import (
        align_cues_to_frames,
        frame_sample_plan,
        parse_subtitles,
    )

    srt = (
        "1\n00:00:00,000 --> 00:00:02,500\nfirst caption\n\n"
        "2\n00:00:04,000 --> 00:00:06,000\nsecond caption\n"
    )
    cues = parse_subtitles(
        spark.createDataFrame([("v", srt)], "media_id string, text string")
    )
    frames = frame_sample_plan(
        spark.createDataFrame([("v", 6000)], "media_id string, duration_ms bigint"),
        every_ms=1000,
    )  # ts 0..6000
    got = align_cues_to_frames(frames, cues).collect()
    pairs = sorted((r.sample_ts_ms, r.text) for r in got)
    assert pairs == [
        (0, "first caption"), (1000, "first caption"), (2000, "first caption"),
        (4000, "second caption"), (5000, "second caption"), (6000, "second caption"),
    ]
    # left join keeps the caption-less frame at 3000
    left = align_cues_to_frames(frames, cues, how="left").collect()
    ts3000 = [r for r in left if r.sample_ts_ms == 3000]
    assert len(ts3000) == 1 and ts3000[0].text is None


# ---------------------------------------------------------------------------
# EXIF parse + metadata stripping (privacy scrub)
# ---------------------------------------------------------------------------


def _exif_app1(*, orientation=None, make=None, model=None, dt=None,
               gps=False, byte_order="II"):
    """Test-side EXIF APP1 builder (TIFF IFD written from the spec)."""
    import struct

    end = "<" if byte_order == "II" else ">"
    entries = []
    extra = bytearray()

    def add(tag, typ, cnt, val_bytes):
        entries.append((tag, typ, cnt, val_bytes))

    if make:
        add(0x010F, 2, len(make) + 1, make.encode() + b"\x00")
    if model:
        add(0x0110, 2, len(model) + 1, model.encode() + b"\x00")
    if orientation is not None:
        add(0x0112, 3, 1, struct.pack(end + "H", orientation) + b"\x00\x00")
    if dt:
        add(0x0132, 2, len(dt) + 1, dt.encode() + b"\x00")
    if gps:
        add(0x8825, 4, 1, None)  # pointer patched below

    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    data_off = 8 + ifd_size
    body = bytearray()
    ifd = bytearray(struct.pack(end + "H", n))
    for tag, typ, cnt, vb in sorted(entries):
        if tag == 0x8825:
            gps_off = data_off + len(body)
            body += struct.pack(end + "H", 0)  # empty GPS IFD
            vb4 = struct.pack(end + "I", gps_off)
        elif len(vb) <= 4:
            vb4 = vb + b"\x00" * (4 - len(vb))
        else:
            vb4 = struct.pack(end + "I", data_off + len(body))
            body += vb
        ifd += struct.pack(end + "HHI", tag, typ, cnt) + vb4
    ifd += b"\x00" * 4  # next-IFD = none
    tiff = (
        (b"II" if byte_order == "II" else b"MM")
        + struct.pack(end + "H", 42) + struct.pack(end + "I", 8)
        + bytes(ifd) + bytes(body)
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def test_image_exif_parse(spark):
    from aws_sdk_pandas_spark.operators.multimodal import image_exif

    rgb = _solid_rgb(8, 8, (10, 20, 30))
    base = _jpeg_encode(rgb, 8, 8)
    app1 = _exif_app1(orientation=6, make="TestCam", model="X100",
                      dt="2024:01:02 03:04:05", gps=True)
    with_exif = base[0:2] + app1 + base[2:]
    app1_mm = _exif_app1(orientation=3, byte_order="MM")
    with_mm = base[0:2] + app1_mm + base[2:]
    df = spark.createDataFrame(
        [("a", bytearray(with_exif)), ("b", bytearray(base)),
         ("c", None), ("d", bytearray(with_mm))],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in image_exif(df).collect()}
    a = rows["a"]
    assert (a.exif_orientation, a.exif_make, a.exif_model) == (6, "TestCam", "X100")
    assert a.exif_datetime == "2024:01:02 03:04:05" and a.exif_has_gps is True
    assert rows["b"].exif_orientation is None and rows["b"].exif_has_gps is None
    assert rows["c"].exif_orientation is None
    assert rows["d"].exif_orientation == 3  # big-endian TIFF


def test_strip_image_metadata_jpeg_and_png(spark):
    import zlib as _z

    from aws_sdk_pandas_spark.operators.multimodal import (
        decode_image,
        image_exif,
        strip_image_metadata,
    )

    rgb = _solid_rgb(8, 8, (200, 100, 50))
    base = _jpeg_encode(rgb, 8, 8)
    app1 = _exif_app1(orientation=6, gps=True, make="TestCam")
    dirty_jpeg = base[0:2] + app1 + b"\xff\xfe\x00\x07hello" + base[2:]

    png = make_test_media("png", 4, 2, pixels=bytes(range(24)))
    # splice a tEXt chunk after IHDR (8-byte sig + 25-byte IHDR chunk)
    import struct
    text = b"tEXt" + b"Author\x00secret"
    chunk = struct.pack(">I", len(text) - 4) + text + struct.pack(
        ">I", _z.crc32(text) & 0xFFFFFFFF
    )
    dirty_png = png[:33] + chunk + png[33:]

    df = spark.createDataFrame(
        [("j", bytearray(dirty_jpeg)), ("p", bytearray(dirty_png)), ("n", None)],
        "media_id string, payload binary",
    )
    clean = strip_image_metadata(df)
    rows = {r.media_id: r.payload for r in clean.collect()}
    assert rows["n"] is None
    # EXIF + GPS gone, comment gone, pixels decode identically
    got = image_exif(clean).where("media_id = 'j'").first()
    assert got.exif_has_gps is None and got.exif_orientation is None
    assert b"hello" not in bytes(rows["j"])
    w, h, pix = decode_image(bytes(rows["j"]))
    w0, h0, pix0 = decode_image(base)
    assert (w, h, pix) == (w0, h0, pix0)
    # PNG: tEXt removed, pixels identical
    assert b"secret" not in bytes(rows["p"])
    w, h, pix = decode_image(bytes(rows["p"]))
    assert (w, h) == (4, 2) and pix == bytes(range(24))


def test_audio_tags_id3(spark):
    from aws_sdk_pandas_spark.operators.multimodal import audio_metadata, audio_tags

    tagged = make_test_media(
        "mp3", sample_rate=44100, bitrate_kbps=128, mp3_frames=4,
        id3_frames={"TIT2": "My Song", "TPE1": "The Band",
                    "TALB": "Album X", "TYER": "1999"},
    )
    plain = make_test_media("mp3", mp3_frames=4)
    wav = make_test_media("wav")
    df = spark.createDataFrame(
        [("t", bytearray(tagged)), ("p", bytearray(plain)),
         ("w", bytearray(wav)), ("n", None)],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r for r in audio_tags(df).collect()}
    t = rows["t"]
    assert (t.tag_title, t.tag_artist, t.tag_album, t.tag_year) == (
        "My Song", "The Band", "Album X", "1999",
    )
    assert rows["p"].tag_title is None and rows["w"].tag_title is None
    assert rows["n"].tag_title is None
    # the technical parse still skips the v2.3 tag correctly
    m = audio_metadata(df).where("media_id = 't'").first()
    assert (m.audio_codec, m.audio_sample_rate) == ("mp3", 44100)


def test_audio_tags_utf16(spark):
    import struct

    from aws_sdk_pandas_spark.operators.multimodal import audio_tags

    # hand-built v2.4 tag: TIT2 with utf-16 BOM text, syncsafe frame size
    text = "Café ☕".encode("utf-16")
    body = b"\x01" + text
    frame = b"TIT2" + bytes(
        [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
         (len(body) >> 7) & 0x7F, len(body) & 0x7F]
    ) + b"\x00\x00" + body
    n = len(frame)
    tag = b"ID3\x04\x00\x00" + bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    ) + frame
    df = spark.createDataFrame(
        [("x", bytearray(tag + b"\xff\xfb\x92\x00" + b"\x00" * 300))],
        "media_id string, payload binary",
    )
    assert audio_tags(df).first().tag_title == "Café ☕"


def test_curate_media_end_to_end(spark):
    """The media gauntlet: junk dropped, near-dup images collapse to the
    min id, EXIF stripped from survivors, audio deduped independently."""
    import struct as _struct

    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import curate_media, image_exif

    base_px = bytes([((r * 16 + c) * 7) % 256 for r in range(16) for c in range(16)
                     for _ in range(3)])
    jpg = _jpeg_encode(base_px, 16, 16)
    jpg_exif = jpg[0:2] + _exif_app1(orientation=6, gps=True) + jpg[2:]
    png_same = make_test_media("png", 16, 16, pixels=base_px)  # same picture
    other_px = bytes(reversed(base_px))
    png_other = make_test_media("png", 16, 16, pixels=other_px)

    pcm = np.round(0.4 * 32767 * np.sin(np.arange(4000) / 5.0)).astype(np.int16)
    wav1 = make_test_media("wav", sample_rate=8000, channels=1, bits=16,
                           data=pcm.tobytes())
    wav2 = make_test_media("wav", sample_rate=8000, channels=1, bits=16,
                           data=(pcm // 2).tobytes())  # gain change: near-dup

    rows = [
        ("a1", bytearray(jpg_exif)),
        ("a2", bytearray(png_same)),     # image near-dup of a1
        ("b", bytearray(png_other)),
        ("w1", bytearray(wav1)),
        ("w2", bytearray(wav2)),         # audio near-dup of w1
        ("junk", bytearray(b"\x00\x01" * 100)),
        ("tiny", bytearray(b"BM")),      # under min_bytes
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = curate_media(df)
    kept = {r.media_id: r for r in out.collect()}
    assert sorted(kept) == ["a1", "b", "w1"]
    assert kept["a1"].format == "jpeg" and kept["w1"].format == "wav"
    # survivors are scrubbed: the EXIF GPS is gone from a1's payload
    scrubbed = image_exif(out).where("media_id = 'a1'").first()
    assert scrubbed.exif_has_gps is None
    # whitelist: audio-only corpus
    audio_only = curate_media(df, formats=["wav"])
    assert sorted(r.media_id for r in audio_only.collect()) == ["w1"]


def test_parse_subtitles_vtt_optional_hours(spark):
    """Round-4 verdict repro: WebVTT makes the hours component OPTIONAL
    (MM:SS.mmm is the canonical short form for <1h media) — short-form
    cues must parse, not silently drop."""
    from aws_sdk_pandas_spark.operators.multimodal import (
        align_cues_to_frames,
        parse_subtitles,
    )

    vtt = (
        "WEBVTT\n\n"
        "00:05.000 --> 00:10.000\nshort form cue\n\n"
        "00:01:00.000 --> 00:01:05.500\nlong form cue\n\n"
        "1:02:03.456 --> 1:02:04.000\nsingle-digit hour\n"
    )
    df = spark.createDataFrame([("m1", vtt)], "media_id string, text string")
    rows = {r.cue_idx: r for r in parse_subtitles(df).collect()}
    assert len(rows) == 3  # nothing dropped
    assert (rows[1].start_ms, rows[1].end_ms) == (5_000, 10_000)
    assert rows[1].text == "short form cue"
    assert (rows[2].start_ms, rows[2].end_ms) == (60_000, 65_500)
    assert rows[3].start_ms == 1 * 3_600_000 + 2 * 60_000 + 3 * 1000 + 456

    # short-form cues reach the alignment join too
    frames = spark.createDataFrame(
        [("m1", 0, 6_000), ("m1", 1, 20_000)],
        "media_id string, frame_idx int, sample_ts_ms bigint",
    )
    pairs = align_cues_to_frames(frames, parse_subtitles(df)).collect()
    assert any(p.frame_idx == 0 for p in pairs)  # 6s lands in the 5-10s cue


# ---------------------------------------------------------------- TIFF


def _tiff_lzw_encode(data):
    """Test-side TIFF-variant LZW encoder (TIFF 6.0 §13): MSB-first
    codes, Clear=256/EOI=257, EARLY code-width change (width bumps when
    the next free code reaches 2^width - 1), table reset at 4094."""
    bits = []
    width = 9

    def emit(code):
        for i in range(width - 1, -1, -1):
            bits.append((code >> i) & 1)

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    emit(256)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # the decoder lags one table entry behind the encoder, so its
        # early change (bump at table length 2^w - 1) lines up with the
        # encoder bumping one entry later, at 2^w
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:
            emit(256)
            table = fresh()
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(257)
    while len(bits) % 8:
        bits.append(0)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for bit in bits[i : i + 8]:
            byte = (byte << 1) | bit
        out.append(byte)
    return bytes(out)


def _packbits_encode(data):
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (
                j + 2 < n and data[j] == data[j + 1] == data[j + 2]
            )
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _tiff_encode(
    pixels,
    w,
    h,
    *,
    photometric=2,
    compression=1,
    endian="little",
    rows_per_strip=None,
    predictor=1,
    palette=None,
    spp=None,
):
    """Test-side TIFF 6.0 encoder (striped, chunky) — independent of
    the decoder implementation.  ``pixels`` is raw sample bytes
    (w*h*spp); ``palette`` is 256 (r, g, b) 8-bit triples for
    photometric 3."""
    import struct
    import zlib as _zlib

    if spp is None:
        spp = 3 if photometric == 2 else 1
    assert len(pixels) == w * h * spp
    rps = rows_per_strip or h
    row_bytes = w * spp

    strips = []
    r = 0
    while r < h:
        nrows = min(rps, h - r)
        raw = bytearray(pixels[r * row_bytes : (r + nrows) * row_bytes])
        if predictor == 2:
            for rr in range(nrows):
                row = raw[rr * row_bytes : (rr + 1) * row_bytes]
                diff = bytearray(row)
                for x in range(row_bytes - 1, spp - 1, -1):
                    diff[x] = (row[x] - row[x - spp]) & 0xFF
                raw[rr * row_bytes : (rr + 1) * row_bytes] = diff
        raw = bytes(raw)
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif compression == 8:
            strips.append(_zlib.compress(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            raise AssertionError(compression)
        r += nrows

    lt = endian == "little"
    fc = "<" if lt else ">"
    pos = 8
    strip_offsets = []
    body = bytearray()
    for s in strips:
        strip_offsets.append(pos)
        body += s
        if len(s) % 2:
            body += b"\x00"
            pos += 1
        pos += len(s)
    ifd_off = pos

    # (tag, type, values)
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (273, 4, strip_offsets),
        (277, 3, [spp]),
        (278, 4, [rps]),
        (279, 4, [len(s) for s in strips]),
        (284, 3, [1]),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    if palette is not None:
        cmap = (
            [c[0] * 257 for c in palette]
            + [c[1] * 257 for c in palette]
            + [c[2] * 257 for c in palette]
        )
        entries.append((320, 3, cmap))
    entries.sort()

    tsize = {3: 2, 4: 4}
    tfmt = {3: "H", 4: "I"}
    ifd_len = 2 + 12 * len(entries) + 4
    over_off = ifd_off + ifd_len
    overflow = bytearray()
    ifd = struct.pack(fc + "H", len(entries))
    for tag, typ, vals in entries:
        packed = b"".join(struct.pack(fc + tfmt[typ], v) for v in vals)
        ifd += struct.pack(fc + "HHI", tag, typ, len(vals))
        if len(packed) <= 4:
            ifd += packed + b"\x00" * (4 - len(packed))
        else:
            ifd += struct.pack(fc + "I", over_off + len(overflow))
            overflow += packed
    ifd += struct.pack(fc + "I", 0)

    header = (b"II" if lt else b"MM") + struct.pack(fc + "HI", 42, ifd_off)
    return header + bytes(body) + ifd + bytes(overflow)


def _rand_bytes(n, seed=0):
    import numpy as np

    return np.random.RandomState(seed).randint(0, 256, n, dtype=np.uint8).tobytes()


def test_tiff_decode_compression_matrix():
    import numpy as np

    from aws_sdk_pandas_spark.operators.tiff_lite import decode_tiff

    w, h = 21, 13  # odd sizes: short last strip, odd row bytes
    rgb = _rand_bytes(w * h * 3, seed=1)
    gray = _rand_bytes(w * h, seed=2)
    want_gray = np.repeat(
        np.frombuffer(gray, np.uint8).reshape(h, w)[:, :, None], 3, axis=2
    ).tobytes()
    for endian in ("little", "big"):
        for comp in (1, 5, 8, 32773):
            t = _tiff_encode(
                rgb, w, h, compression=comp, endian=endian, rows_per_strip=5
            )
            assert decode_tiff(t) == (w, h, rgb), (endian, comp, "rgb")
            t = _tiff_encode(
                gray, w, h, photometric=1, compression=comp, endian=endian,
                rows_per_strip=4,
            )
            assert decode_tiff(t) == (w, h, want_gray), (endian, comp, "gray")


def test_tiff_white_is_zero_inverts():
    import numpy as np

    from aws_sdk_pandas_spark.operators.tiff_lite import decode_tiff

    w, h = 9, 4
    gray = _rand_bytes(w * h, seed=3)
    inv = (255 - np.frombuffer(gray, np.uint8)).reshape(h, w)
    want = np.repeat(inv[:, :, None], 3, axis=2).tobytes()
    assert decode_tiff(_tiff_encode(gray, w, h, photometric=0)) == (w, h, want)


def test_tiff_predictor2_lzw_and_deflate():
    from aws_sdk_pandas_spark.operators.tiff_lite import decode_tiff

    w, h = 33, 11
    rgb = _rand_bytes(w * h * 3, seed=4)
    for comp in (5, 8):
        t = _tiff_encode(
            rgb, w, h, compression=comp, predictor=2, rows_per_strip=3
        )
        assert decode_tiff(t) == (w, h, rgb), comp
    # predictor also applies to grayscale (spp=1 differencing)
    gray = _rand_bytes(w * h, seed=5)
    t = _tiff_encode(gray, w, h, photometric=1, compression=5, predictor=2)
    got = decode_tiff(t)
    assert got[2][::3] == gray


def test_tiff_palette_and_alpha():
    import numpy as np

    from aws_sdk_pandas_spark.operators.tiff_lite import decode_tiff

    w, h = 16, 8
    idx = _rand_bytes(w * h, seed=6)
    palette = [((i * 7) % 256, (i * 13) % 256, (i * 29) % 256) for i in range(256)]
    t = _tiff_encode(idx, w, h, photometric=3, palette=palette, compression=5)
    lut = np.array(palette, np.uint8)
    want = lut[np.frombuffer(idx, np.uint8).reshape(h, w)].tobytes()
    assert decode_tiff(t) == (w, h, want)

    # RGBA: 4 samples/pixel, alpha dropped
    rgba = _rand_bytes(w * h * 4, seed=7)
    t = _tiff_encode(rgba, w, h, photometric=2, spp=4, compression=32773)
    a = np.frombuffer(rgba, np.uint8).reshape(h, w, 4)
    assert decode_tiff(t) == (w, h, a[:, :, :3].tobytes())


def test_tiff_lzw_table_reset_on_large_image():
    from aws_sdk_pandas_spark.operators.tiff_lite import decode_tiff

    # 64x64 RGB random: ~12 KiB of incompressible data drives the LZW
    # table past the 511/1023/2047 early-change points AND the 4094
    # reset — the whole width schedule is exercised
    w, h = 64, 64
    rgb = _rand_bytes(w * h * 3, seed=8)
    t = _tiff_encode(rgb, w, h, compression=5)
    assert decode_tiff(t) == (w, h, rgb)


def test_tiff_refusals():
    import struct

    import pytest as _pytest

    from aws_sdk_pandas_spark.operators.tiff_lite import decode_tiff

    w, h = 8, 8
    good = _tiff_encode(_rand_bytes(w * h * 3, seed=9), w, h)
    with _pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX" + good[2:])
    # 16-bit samples refuse: patch BitsPerSample (tag 258) SHORT values
    b = bytearray(good)
    ifd_off = struct.unpack("<I", good[4:8])[0]
    n = struct.unpack("<H", good[ifd_off : ifd_off + 2])[0]
    for ei in range(n):
        e = ifd_off + 2 + 12 * ei
        tag = struct.unpack("<H", b[e : e + 2])[0]
        if tag == 258:
            voff = struct.unpack("<I", b[e + 8 : e + 12])[0]
            for s in range(3):
                b[voff + 2 * s : voff + 2 * s + 2] = struct.pack("<H", 16)
    with _pytest.raises(ValueError, match="8-bit"):
        decode_tiff(bytes(b))
    # tiled layout refuses: add a TileWidth (322) entry by rewriting
    # the planar-config tag id
    b = bytearray(good)
    for ei in range(n):
        e = ifd_off + 2 + 12 * ei
        if struct.unpack("<H", b[e : e + 2])[0] == 284:
            b[e : e + 2] = struct.pack("<H", 322)
    with _pytest.raises(ValueError, match="tiled"):
        decode_tiff(bytes(b))
    # unsupported compression (CCITT G4 = 4)
    b = bytearray(good)
    for ei in range(n):
        e = ifd_off + 2 + 12 * ei
        if struct.unpack("<H", b[e : e + 2])[0] == 259:
            b[e + 8 : e + 10] = struct.pack("<H", 4)
    with _pytest.raises(ValueError, match="compression 4"):
        decode_tiff(bytes(b))


def test_tiff_through_decode_images_and_metadata(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import (
        decode_images,
        image_dimensions,
        image_pixel_stats,
        sniff_format,
    )
    import pyspark.sql.functions as F

    w, h = 12, 6
    rgb = _rand_bytes(w * h * 3, seed=10)
    t_le = _tiff_encode(rgb, w, h, compression=5, endian="little")
    t_be = _tiff_encode(rgb, w, h, compression=32773, endian="big")
    df = spark.createDataFrame(
        [("a", bytearray(t_le)), ("b", bytearray(t_be)), ("junk", bytearray(b"nope"))],
        "media_id string, payload binary",
    )
    fmts = {
        r.media_id: r.fmt
        for r in df.select("media_id", sniff_format("payload").alias("fmt")).collect()
    }
    assert fmts == {"a": "tiff", "b": "tiff", "junk": "unknown"}

    meta = {
        r.media_id: (r.img_format, r.img_width, r.img_height)
        for r in image_dimensions(df).collect()
    }
    assert meta["a"] == ("tiff", w, h)
    assert meta["b"] == ("tiff", w, h)

    imgs = df.where(sniff_format("payload") == "tiff")  # screen-first contract
    decoded = {r.media_id: r for r in decode_images(imgs).collect()}
    assert bytes(decoded["a"].pixels) == rgb and decoded["a"].width == w
    assert bytes(decoded["b"].pixels) == rgb

    stats = {r.media_id: r for r in image_pixel_stats(imgs).collect()}
    a = np.frombuffer(rgb, np.uint8).astype(float).reshape(-1, 3)
    assert abs(stats["a"].mean_r - a[:, 0].mean()) < 1e-6
    assert abs(stats["b"].mean_b - a[:, 2].mean()) < 1e-6


# ---------------------------------------------------------------- WebP


class _VP8LBitWriter:
    def __init__(self):
        self.bits = []

    def write(self, n, v):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, length, code):
        # prefix-code bits go MSB-of-code-first into the LSB-first stream
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                byte |= bit << j
            out.append(byte)
        return bytes(out)


def _vp8l_lengths(used_syms):
    """Balanced COMPLETE canonical code lengths for the used symbols
    (shorter codes to lower symbols); {} -> caller handles."""
    k = len(used_syms)
    assert k >= 2
    L = max(1, (k - 1).bit_length())
    n1 = (1 << L) - k  # symbols that get length L-1
    lengths = {}
    for i, s in enumerate(sorted(used_syms)):
        lengths[s] = (L - 1) if (i < n1 and L > 1) else L
    return lengths


def _vp8l_canonical(lengths_by_sym):
    """Same canonical assignment as the decoder: increasing (length,
    symbol)."""
    codes = {}
    code = 0
    last = 0
    for ln, sym in sorted((ln, s) for s, ln in lengths_by_sym.items()):
        code <<= ln - last
        last = ln
        codes[sym] = (ln, code)
        code += 1
    return codes


_VP8L_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                  13, 14, 15]


def _vp8l_write_prefix_code(bw, lengths_by_sym, alphabet, *,
                            use_max_symbol=False):
    """Emit one prefix code: simple form when possible, else the
    code-length-code machinery with 16/17/18 runs."""
    used = sorted(lengths_by_sym)
    if len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(1, len(used) - 1)
        bw.write(1, 1)  # first symbol as 8 bits
        bw.write(8, used[0])
        if len(used) == 2:
            bw.write(8, used[1])
        return
    bw.write(1, 0)  # normal
    lengths = [lengths_by_sym.get(s, 0) for s in range(alphabet)]
    # RLE the lengths into code-length symbols
    stream = []  # (symbol, extra_val, extra_bits)
    i = 0
    last_nonzero = max(s for s in range(alphabet) if lengths[s])
    end = alphabet if not use_max_symbol else last_nonzero + 1
    prev = 8
    while i < end:
        if lengths[i] == 0:
            run = 0
            while i + run < end and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                stream.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                stream.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                stream.append((0, 0, 0))
            i += run
            continue
        v = lengths[i]
        stream.append((v, 0, 0))
        prev = v
        i += 1
        rep = 0
        while i + rep < end and lengths[i + rep] == v:
            rep += 1
        left = rep
        while left >= 3:
            take = min(left, 6)
            stream.append((16, take - 3, 2))
            left -= take
        for _ in range(left):
            stream.append((v, 0, 0))
        i += rep
    cl_used = sorted({s for s, _, _ in stream})
    if len(cl_used) == 1:
        cl_lengths = {cl_used[0]: 1}  # incomplete 1-symbol codes are
        # not representable with 3-bit lengths alone; give it length 1
        # and burn one bit per symbol -- the decoder treats a
        # single-length-1 code as... (not complete). Use two symbols.
        # Safer: force a second dummy symbol of equal length.
        dummy = 0 if cl_used[0] != 0 else 1
        cl_lengths = {cl_used[0]: 1, dummy: 1}
    else:
        cl_lengths = _vp8l_lengths(cl_used)
    num_cl = max(_VP8L_CL_ORDER.index(s) for s in cl_lengths) + 1
    num_cl = max(num_cl, 4)
    bw.write(4, num_cl - 4)
    for s in _VP8L_CL_ORDER[:num_cl]:
        bw.write(3, cl_lengths.get(s, 0))
    if use_max_symbol:
        bw.write(1, 1)
        max_symbol = len(stream)
        nbits_sel = 0
        while (2 + 2 * nbits_sel) < (max_symbol - 2).bit_length():
            nbits_sel += 1
        bw.write(3, nbits_sel)
        bw.write(2 + 2 * nbits_sel, max_symbol - 2)
    else:
        bw.write(1, 0)
    cl_codes = _vp8l_canonical(cl_lengths)
    for s, ev, eb in stream:
        bw.write_code(*cl_codes[s])
        if eb:
            bw.write(eb, ev)


def _vp8l_lz77_sym(v):
    """Inverse of the decoder's length/distance prefix-value coding."""
    if v <= 4:
        return v - 1, 0, 0
    for sym in range(4, 40):
        extra = (sym - 2) >> 1
        off = (2 + (sym & 1)) << extra
        if off <= v - 1 < off + (1 << extra):
            return sym, v - 1 - off, extra
    raise AssertionError(v)


def _vp8l_dist_code(d, w):
    """Prefer a 2D neighborhood code (1..120) when the distance maps to
    one for this width — exercises the decoder's DIST_MAP branch."""
    from aws_sdk_pandas_spark.operators.webp_lite import DIST_MAP

    for i, (dx, dy) in enumerate(DIST_MAP):
        if max(1, dy * w + dx) == d:
            return i + 1
    return d + 120


def _vp8l_write_entropy_image(bw, px, w, h, *, cache_bits=0, lz77=False,
                              meta=False, use_max_symbol=False,
                              level0=False):
    """Encode pixels (list of ARGB ints) as one entropy-coded image."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(4, cache_bits)
    else:
        bw.write(1, 0)
    if level0 and not meta:
        bw.write(1, 0)  # no meta prefix image
    if meta:
        assert level0
        # trivial meta prefix image: every block -> group 0, through
        # the real meta machinery
        bw.write(1, 1)
        bw.write(3, 5)  # size_bits 7 -> blocks of 128
        mw = (w + 127) >> 7
        mh = (h + 127) >> 7
        _vp8l_write_entropy_image(bw, [0xFF000000] * (mw * mh), mw, mh)

    # plan the symbol stream (cache state is deterministic, two passes)
    def plan():
        cache = [0] * (1 << cache_bits) if cache_bits else None
        ops = []
        i = 0
        n = len(px)
        while i < n:
            if lz77 and i > 0:
                best_run, best_d = 0, 1
                for d in (1, w):
                    if d > i:
                        continue
                    run = 0
                    while i + run < n and px[i + run] == px[i + run - d] and run < 4096:
                        run += 1
                    if run > best_run:
                        best_run, best_d = run, d
                if best_run >= 3:
                    ops.append(("ref", best_run, best_d))
                    if cache is not None:
                        for j in range(i, i + best_run):
                            v = px[j]
                            cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)] = v
                    i += best_run
                    continue
            v = px[i]
            if cache is not None:
                hidx = (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)
                if cache[hidx] == v:
                    ops.append(("cache", hidx))
                    i += 1
                    continue
                cache[hidx] = v
            ops.append(("lit", v))
            i += 1
        return ops

    ops = plan()
    greens, reds, blues, alphas, dists = {}, {}, {}, {}, {}

    def bump(d, s):
        d[s] = d.get(s, 0) + 1

    for op in ops:
        if op[0] == "lit":
            v = op[1]
            bump(greens, (v >> 8) & 0xFF)
            bump(reds, (v >> 16) & 0xFF)
            bump(blues, v & 0xFF)
            bump(alphas, (v >> 24) & 0xFF)
        elif op[0] == "ref":
            bump(greens, 256 + _vp8l_lz77_sym(op[1])[0])
            bump(dists, _vp8l_lz77_sym(_vp8l_dist_code(op[2], w))[0])
        else:
            bump(greens, 280 + op[1])

    cache_size = (1 << cache_bits) if cache_bits else 0

    def code_for(hist, alphabet):
        used = sorted(hist)
        if not used:
            return {0: 1}, None  # unused code: simple single-symbol 0
        if len(used) == 1:
            return {used[0]: 1}, None
        return _vp8l_lengths(used), None

    for hist, alphabet in (
        (greens, 256 + 24 + cache_size),
        (reds, 256),
        (blues, 256),
        (alphas, 256),
        (dists, 40),
    ):
        lengths, _ = code_for(hist, alphabet)
        _vp8l_write_prefix_code(
            bw, lengths, alphabet,
            use_max_symbol=use_max_symbol and len(lengths) > 2,
        )
        hist["__codes__"] = _vp8l_canonical(lengths) if len(lengths) >= 2 else {
            s: (0, 0) for s in lengths
        }

    def emit(hist, sym):
        ln, code = hist["__codes__"][sym]
        if ln:
            bw.write_code(ln, code)

    for op in ops:
        if op[0] == "lit":
            v = op[1]
            emit(greens, (v >> 8) & 0xFF)
            emit(reds, (v >> 16) & 0xFF)
            emit(blues, v & 0xFF)
            emit(alphas, (v >> 24) & 0xFF)
        elif op[0] == "ref":
            lsym, lev, leb = _vp8l_lz77_sym(op[1])
            emit(greens, 256 + lsym)
            if leb:
                bw.write(leb, lev)
            dsym, dev, deb = _vp8l_lz77_sym(_vp8l_dist_code(op[2], w))
            emit(dists, dsym)
            if deb:
                bw.write(deb, dev)
        else:
            emit(greens, 280 + op[1])


def _webp_encode(
    rgb,
    w,
    h,
    *,
    transforms=(),
    cache_bits=0,
    lz77=False,
    meta=False,
    use_max_symbol=False,
    predictor_mode=2,
    container="simple",
):
    """Test-side VP8L encoder written from the WebP Lossless Bitstream
    Specification — independent of the decoder implementation.
    ``transforms`` is an ordered subset of ("subtract_green",
    "predictor", "palette")."""
    px = []
    for i in range(w * h):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        px.append(0xFF000000 | (r << 16) | (g << 8) | b)

    bw = _VP8LBitWriter()
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 0)
    bw.write(3, 0)

    cur_w = w
    for t in transforms:
        bw.write(1, 1)
        if t == "subtract_green":
            bw.write(2, 2)
            px = [
                (p & 0xFF00FF00)
                | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
                | ((((p >> 0) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
                for p in px
            ]
        elif t == "predictor":
            bw.write(2, 0)
            bs = 4
            bw.write(3, bs - 2)
            tw = (cur_w + (1 << bs) - 1) >> bs
            th = (h + (1 << bs) - 1) >> bs
            _vp8l_write_entropy_image(
                bw, [0xFF000000 | (predictor_mode << 8)] * (tw * th), tw, th
            )
            from aws_sdk_pandas_spark.operators.webp_lite import _predict

            res = []
            for i in range(cur_w * h):
                x, y = i % cur_w, i // cur_w
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - cur_w]
                else:
                    pred = _predict(
                        predictor_mode, px[i - 1], px[i - cur_w],
                        px[i - cur_w - 1], px[i - cur_w + 1],
                    )
                d = 0
                for shift in (0, 8, 16, 24):
                    d |= ((((px[i] >> shift) & 0xFF) - ((pred >> shift) & 0xFF)) & 0xFF) << shift
                res.append(d)
            px = res
        elif t == "palette":
            bw.write(2, 3)
            colors = []
            seen = {}
            for p in px:
                if p not in seen:
                    seen[p] = len(colors)
                    colors.append(p)
            assert len(colors) <= 256
            bw.write(8, len(colors) - 1)
            deltas = []
            prev = 0
            for c in colors:
                d = 0
                for shift in (0, 8, 16, 24):
                    d |= ((((c >> shift) & 0xFF) - ((prev >> shift) & 0xFF)) & 0xFF) << shift
                deltas.append(d)
                prev = c
            _vp8l_write_entropy_image(bw, deltas, len(colors), 1)
            n = len(colors)
            wb = 3 if n <= 2 else (2 if n <= 4 else (1 if n <= 16 else 0))
            idx = [seen[p] for p in px]
            if wb:
                per = 1 << wb
                bits = 8 >> wb
                pw = (cur_w + per - 1) >> wb
                packed = []
                for y in range(h):
                    for bx in range(pw):
                        v = 0
                        for k in range(per):
                            x = bx * per + k
                            if x < cur_w:
                                v |= idx[y * cur_w + x] << (k * bits)
                        packed.append(0xFF000000 | (v << 8))
                px = packed
                cur_w = pw
            else:
                px = [0xFF000000 | (i << 8) for i in idx]
        else:
            raise AssertionError(t)
    bw.write(1, 0)  # no more transforms

    _vp8l_write_entropy_image(
        bw, px, cur_w, h, cache_bits=cache_bits, lz77=lz77, meta=meta,
        use_max_symbol=use_max_symbol, level0=True,
    )
    payload = bw.tobytes()

    import struct

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    if container == "vp8x":
        vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
        chunk = vp8x + chunk
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_webp_lossless_literal_roundtrip_exact():
    from aws_sdk_pandas_spark.operators.webp_lite import decode_webp

    w, h = 23, 9
    rgb = _rand_bytes(w * h * 3, seed=11)
    assert decode_webp(_webp_encode(rgb, w, h)) == (w, h, rgb)
    # extended container finds the VP8L chunk too
    assert decode_webp(_webp_encode(rgb, w, h, container="vp8x")) == (w, h, rgb)


def test_webp_lossless_cache_lz77_meta_roundtrip():
    import numpy as np

    from aws_sdk_pandas_spark.operators.webp_lite import decode_webp

    w, h = 40, 17
    # repetitive image: runs (LZ77) + recurring colors (cache hits)
    px = bytearray()
    pal = [(10, 200, 30), (200, 10, 30), (0, 0, 0), (255, 255, 255)]
    for y in range(h):
        for x in range(w):
            px += bytes(pal[(x // 7 + y // 3) % 4])
    rgb = bytes(px)
    for kwargs in (
        {"cache_bits": 4},
        {"lz77": True},
        {"cache_bits": 6, "lz77": True},
        {"meta": True},
        {"use_max_symbol": True},
        {"cache_bits": 3, "lz77": True, "meta": True, "use_max_symbol": True},
    ):
        assert decode_webp(_webp_encode(rgb, w, h, **kwargs)) == (w, h, rgb), kwargs


def test_webp_lossless_transforms_roundtrip():
    from aws_sdk_pandas_spark.operators.webp_lite import decode_webp

    w, h = 19, 12
    rgb = _rand_bytes(w * h * 3, seed=12)
    for transforms in (
        ("subtract_green",),
        ("predictor",),
        ("subtract_green", "predictor"),
    ):
        got = decode_webp(_webp_encode(rgb, w, h, transforms=transforms))
        assert got == (w, h, rgb), transforms
    # every predictor mode inverts exactly
    for mode in range(14):
        got = decode_webp(
            _webp_encode(rgb, w, h, transforms=("predictor",),
                         predictor_mode=mode)
        )
        assert got == (w, h, rgb), mode


def test_webp_lossless_palette_roundtrip():
    from aws_sdk_pandas_spark.operators.webp_lite import decode_webp

    for n_colors, w, h in ((2, 21, 5), (4, 13, 7), (16, 10, 10), (200, 30, 20)):
        pal = [
            ((i * 37) % 256, (i * 101) % 256, (i * 11) % 256)
            for i in range(n_colors)
        ]
        idx = [
            (x * 7 + y * 3 + (x * y) % n_colors) % n_colors
            for y in range(h)
            for x in range(w)
        ]
        rgb = b"".join(bytes(pal[i]) for i in idx)
        got = decode_webp(_webp_encode(rgb, w, h, transforms=("palette",)))
        assert got == (w, h, rgb), n_colors


def test_webp_predictor_and_color_delta_golden():
    """Hand-derived spec vectors, independent of both encoder and
    decoder plumbing."""
    from aws_sdk_pandas_spark.operators.webp_lite import _ct_delta, _predict

    L = 0xFF102030
    T = 0xFF405060
    TL = 0xFF010203
    TR = 0xFF808080
    assert _predict(1, L, T, TL, TR) == L
    assert _predict(2, L, T, TL, TR) == T
    # avg(L, T): channels (0x10+0x40)/2=0x28, (0x20+0x50)/2=0x38, (0x30+0x60)/2=0x48
    assert _predict(7, L, T, TL, TR) == 0xFF283848
    # ClampAddSubtractFull: L + T - TL = 0x10+0x40-0x01=0x4f, 0x20+0x50-0x02=0x6e, 0x30+0x60-0x03=0x8d
    assert _predict(12, L, T, TL, TR) == 0xFF4F6E8D
    # Select: sum|T-TL| = 0x3f+0x4e+0x5d, sum|L-TL| = 0xf+0x1e+0x2d -> T
    assert _predict(11, L, T, TL, TR) == T
    # clamping kicks in
    assert _predict(12, 0xFFFF0000, 0xFFFF0000, 0xFF000000, 0) == 0xFFFF0000
    # ColorTransformDelta: int8 * int8 >> 5 (arithmetic)
    assert _ct_delta(0x10, 0x20) == (16 * 32) >> 5
    assert _ct_delta(0xF0, 0x20) == (-16 * 32) >> 5  # 0xf0 = -16
    assert _ct_delta(0x80, 0x7F) == (-128 * 127) >> 5
    assert _ct_delta(0, 0xFF) == 0


def test_webp_color_transform_inverse_unit():
    """Drive _inv_color_transform directly with a hand-built element."""
    import numpy as np

    from aws_sdk_pandas_spark.operators.webp_lite import (
        _ct_delta,
        _inv_color_transform,
    )

    g2r, g2b, r2b = 0x12, 0xF3, 0x07
    elem = (r2b << 16) | (g2b << 8) | g2r
    # forward transform of one pixel (spec: deltas SUBTRACTED forward;
    # red_to_blue keys on the ORIGINAL red — the inverse adds back
    # green_to_red first, so its reconstructed red equals the original)
    a, r, g, b = 0xFF, 0x55, 0x66, 0x77
    fr = (r - _ct_delta(g2r, g)) & 0xFF
    fb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
    px = np.array([(a << 24) | (fr << 16) | (g << 8) | fb], np.uint32)
    _inv_color_transform(px, 1, 1, 2, np.array([[elem]], np.uint32))
    assert int(px[0]) == (a << 24) | (r << 16) | (g << 8) | b


def test_webp_refusals_and_sniff(spark):
    import struct

    import pytest as _pytest

    from aws_sdk_pandas_spark.operators.multimodal import (
        decode_image,
        sniff_format,
    )
    from aws_sdk_pandas_spark.operators.webp_lite import decode_webp

    # lossy VP8 refuses loudly
    payload = b"\x00" * 10
    lossy = b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" + \
        b"VP8 " + struct.pack("<I", len(payload)) + payload
    with _pytest.raises(ValueError, match="lossy"):
        decode_webp(lossy)
    with _pytest.raises(ValueError, match="no VP8L"):
        decode_webp(b"RIFF" + struct.pack("<I", 4) + b"WEBP")

    w, h = 8, 5
    rgb = _rand_bytes(w * h * 3, seed=13)
    good = _webp_encode(rgb, w, h)
    assert decode_image(good) == (w, h, rgb)
    df = spark.createDataFrame(
        [("a", bytearray(good)), ("b", bytearray(lossy))],
        "media_id string, payload binary",
    )
    fmts = {
        r.media_id: r.fmt
        for r in df.select(
            "media_id", sniff_format("payload").alias("fmt")
        ).collect()
    }
    assert fmts == {"a": "webp", "b": "webp"}
    # truncated stream refuses, never loops
    with _pytest.raises(ValueError):
        decode_webp(good[: len(good) - 6])


def test_webp_lz77_2d_distance_codes():
    from aws_sdk_pandas_spark.operators.webp_lite import decode_webp

    # identical rows: the whole image past row 0 is one backward ref at
    # distance == width, which the encoder emits as 2D code (0, 1);
    # horizontal runs inside row 0 use 2D code (1, 0)
    w, h = 31, 14
    row = (_rand_bytes(8 * 3, seed=14) * 4)[: w * 3]
    rgb = row * h
    got = decode_webp(_webp_encode(rgb, w, h, lz77=True))
    assert got == (w, h, rgb)
    # a width where dist == w also matches a diagonal map entry
    for w2 in (2, 7, 9, 16):
        row2 = (_rand_bytes(4 * 3, seed=15) * 8)[: w2 * 3]
        rgb2 = row2 * 6
        assert decode_webp(_webp_encode(rgb2, w2, 6, lz77=True)) == (w2, 6, rgb2)


# ----------------------------------------------- PNG: depths + Adam7


def _png_encode_v2(samples, w, h, *, color=2, depth=8, interlace=False,
                   palette=None, filter_cycle=(0, 1, 2, 3, 4)):
    """Generalized test-side PNG encoder (pure ints, independent of the
    numpy decoder): any legal depth (1/2/4/8/16), all color types,
    optional Adam7 pass splitting — each pass filtered independently
    with the spec's filter functions over byte-packed scanlines."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    assert len(samples) == w * h * ch

    def pack_row(vals):
        if depth == 8:
            return list(vals)
        if depth == 16:
            out = []
            for v in vals:
                out += [v >> 8, v & 0xFF]
            return out
        bits = []
        for v in vals:
            for i in range(depth - 1, -1, -1):
                bits.append((v >> i) & 1)
        while len(bits) % 8:
            bits.append(0)
        return [
            sum(bit << (7 - j) for j, bit in enumerate(bits[i : i + 8]))
            for i in range(0, len(bits), 8)
        ]

    adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    passes = adam7 if interlace else [(0, 0, 1, 1)]
    bpp = max(1, ch * depth // 8)
    raw = bytearray()
    fi = 0
    for x0, y0, dx, dy in passes:
        pw = 0 if w <= x0 else (w - x0 - 1) // dx + 1
        ph = 0 if h <= y0 else (h - y0 - 1) // dy + 1
        if pw == 0 or ph == 0:
            continue
        prev = None
        for ry in range(ph):
            y = y0 + ry * dy
            vals = []
            for rx in range(pw):
                x = x0 + rx * dx
                vals += samples[(y * w + x) * ch : (y * w + x) * ch + ch]
            row = pack_row(vals)
            pr = prev if prev is not None else [0] * len(row)
            ft = filter_cycle[fi % len(filter_cycle)]
            fi += 1
            raw.append(ft)
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = pr[i]
                c = pr[i - bpp] if i >= bpp else 0
                if ft == 0:
                    f = row[i]
                elif ft == 1:
                    f = row[i] - a
                elif ft == 2:
                    f = row[i] - b
                elif ft == 3:
                    f = row[i] - (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    f = row[i] - pred
                raw.append(f & 0xFF)
            prev = row

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0),
    )
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_16bit_depths():
    import random

    from aws_sdk_pandas_spark.operators.multimodal import decode_png

    rng = random.Random(21)
    w, h = 9, 6
    for color, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        samples = [rng.randrange(65536) for _ in range(w * h * ch)]
        got = decode_png(_png_encode_v2(samples, w, h, color=color, depth=16))
        eight = [v >> 8 for v in samples]
        if color == 0:
            want = bytes(v for v in eight for _ in range(3))
        elif color == 2:
            want = bytes(eight)
        elif color == 4:
            want = bytes(eight[i] for i in range(0, len(eight), 2) for _ in range(3))
        else:
            want = bytes(
                v for i, v in enumerate(eight) if i % 4 != 3
            )
        assert got == (w, h, want), color


def test_png_sub_byte_depths():
    import random

    from aws_sdk_pandas_spark.operators.multimodal import decode_png

    rng = random.Random(22)
    w, h = 11, 7  # odd width: partial final byte per scanline
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        g = [rng.randrange(mx + 1) for _ in range(w * h)]
        got = decode_png(_png_encode_v2(g, w, h, color=0, depth=depth))
        want = bytes(v * 255 // mx for v in g for _ in range(3))
        assert got == (w, h, want), depth
        # palette at the same depth
        pal = bytes(rng.randrange(256) for _ in range(3 * (mx + 1)))
        got = decode_png(
            _png_encode_v2(g, w, h, color=3, depth=depth, palette=pal)
        )
        want = bytes(pal[i * 3 + k] for i in g for k in range(3))
        assert got == (w, h, want), ("palette", depth)


def test_png_adam7_interlace():
    import random

    from aws_sdk_pandas_spark.operators.multimodal import decode_png

    rng = random.Random(23)
    # odd dims exercise partial passes; tiny dims leave passes empty
    for w, h in ((13, 11), (8, 8), (3, 2), (1, 1), (16, 5)):
        px = [rng.randrange(256) for _ in range(w * h * 3)]
        plain = decode_png(_png_encode_v2(px, w, h, color=2, depth=8))
        inter = decode_png(
            _png_encode_v2(px, w, h, color=2, depth=8, interlace=True)
        )
        assert inter == plain == (w, h, bytes(px)), (w, h)
    # interlace composes with 16-bit and sub-byte palette
    w, h = 10, 9
    g16 = [rng.randrange(65536) for _ in range(w * h)]
    got = decode_png(_png_encode_v2(g16, w, h, color=0, depth=16, interlace=True))
    assert got == (w, h, bytes(v >> 8 for v in g16 for _ in range(3)))
    pal = bytes(rng.randrange(256) for _ in range(48))
    idx = [rng.randrange(16) for _ in range(w * h)]
    got = decode_png(
        _png_encode_v2(idx, w, h, color=3, depth=4, palette=pal, interlace=True)
    )
    assert got == (w, h, bytes(pal[i * 3 + k] for i in idx for k in range(3)))


# ---------------------------------------------------------------- FLAC


class _FlacBW:
    def __init__(self):
        self.bits = []

    def w(self, n, v):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def sw(self, n, v):
        self.w(n, v & ((1 << n) - 1))

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for bit in self.bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)


def _flac_crc8(data):
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data):
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _flac_utf8(bw, v):
    if v < 0x80:
        bw.w(8, v)
        return
    assert v < 0x800
    bw.w(8, 0xC0 | (v >> 6))
    bw.w(8, 0x80 | (v & 0x3F))


def _flac_rice_residual(bw, res, porder, *, escape_raw=None):
    """Rice-code a residual sequence with 4-bit params; escape_raw
    forces escape partitions of that raw width."""
    bw.w(2, 0)  # 4-bit rice method
    bw.w(4, porder)
    partitions = 1 << porder
    n_total = None  # partition sizes handled by caller splitting
    # caller passes res already split per partition
    for part in res:
        if escape_raw is not None:
            bw.w(4, 15)
            bw.w(5, escape_raw)
            for v in part:
                bw.sw(escape_raw, v)
            continue
        zig = [(v << 1) ^ (v >> 63) if v >= 0 else ((-v << 1) - 1) for v in part]
        zig = [(v << 1) if v >= 0 else ((-v << 1) - 1) for v in part]
        mx = max(zig) if part else 0
        param = max(0, mx.bit_length() - 3)
        assert param < 15
        bw.w(4, param)
        for v in zig:
            q = v >> param
            for _ in range(q):
                bw.w(1, 0)
            bw.w(1, 1)
            if param:
                bw.w(param, v & ((1 << param) - 1))


def _flac_subframe(bw, samples, bps, kind, *, porder=0, wasted=0,
                   escape_raw=None):
    n = len(samples)
    bw.w(1, 0)
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in samples)
        samples = [v >> wasted for v in samples]
        bps -= wasted
    if kind == "constant":
        assert len(set(samples)) == 1
        bw.w(6, 0)
        _w_wasted(bw, wasted)
        bw.sw(bps, samples[0])
        return
    if kind == "verbatim":
        bw.w(6, 1)
        _w_wasted(bw, wasted)
        for v in samples:
            bw.sw(bps, v)
        return
    if kind.startswith("fixed"):
        order = int(kind[-1])
        coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
        bw.w(6, 8 + order)
        _w_wasted(bw, wasted)
        for v in samples[:order]:
            bw.sw(bps, v)
        res = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
    elif kind == "lpc":
        order, prec, shift = 2, 5, 1
        coefs = [3, -1]
        bw.w(6, 32 + order - 1)
        _w_wasted(bw, wasted)
        for v in samples[:order]:
            bw.sw(bps, v)
        bw.w(4, prec - 1)
        bw.sw(5, shift)
        for c in coefs:
            bw.sw(prec, c)
        res = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, n)
        ]
    else:
        raise AssertionError(kind)
    per = n >> porder
    parts = []
    start = 0
    for pi in range(1 << porder):
        cnt = per - order if pi == 0 else per
        parts.append(res[start : start + cnt])
        start += cnt
    _flac_rice_residual(bw, parts, porder, escape_raw=escape_raw)


def _w_wasted(bw, wasted):
    if wasted:
        bw.w(1, 1)
        for _ in range(wasted - 1):
            bw.w(1, 0)
        bw.w(1, 1)
    else:
        bw.w(1, 0)


def _flac_encode(chans, sr, bits, *, blocksize=192, mode="independent",
                 kind="fixed1", porder=0, wasted=0, escape_raw=None):
    """Test-side FLAC encoder written from the xiph spec — independent
    of the decoder (own CRC tables, rice coder, predictors)."""
    import struct

    ch = len(chans)
    n_total = len(chans[0])
    out = bytearray(b"fLaC")
    info = _FlacBW()
    info.w(16, blocksize)
    info.w(16, blocksize)
    info.w(24, 0)
    info.w(24, 0)
    info.w(20, sr)
    info.w(3, ch - 1)
    info.w(5, bits - 1)
    info.w(36, n_total)
    body = info.tobytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    ss_map = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}
    frame_idx = 0
    for start in range(0, n_total, blocksize):
        n = min(blocksize, n_total - start)
        bw = _FlacBW()
        bw.w(14, 0x3FFE)
        bw.w(1, 0)
        bw.w(1, 0)  # fixed blocksize
        bw.w(4, 7)  # 16-bit explicit blocksize
        bw.w(4, 0)  # sample rate from STREAMINFO
        chmap = {"independent": ch - 1, "left-side": 8, "right-side": 9,
                 "mid-side": 10}
        bw.w(4, chmap[mode])
        bw.w(3, ss_map.get(bits, 0))
        bw.w(1, 0)
        _flac_utf8(bw, frame_idx)
        bw.w(16, n - 1)
        hdr = bw.tobytes()
        bw2 = _FlacBW()
        bw2.w(8, _flac_crc8(hdr))

        blocks = [c[start : start + n] for c in chans]
        if mode == "independent":
            subs = [(b_, bits) for b_ in blocks]
        elif mode == "left-side":
            side = [l - r for l, r in zip(blocks[0], blocks[1])]
            subs = [(blocks[0], bits), (side, bits + 1)]
        elif mode == "right-side":
            side = [l - r for l, r in zip(blocks[0], blocks[1])]
            subs = [(side, bits + 1), (blocks[1], bits)]
        else:
            side = [l - r for l, r in zip(blocks[0], blocks[1])]
            mid = [(l + r) >> 1 for l, r in zip(blocks[0], blocks[1])]
            subs = [(mid, bits), (side, bits + 1)]
        for samples, bps in subs:
            k = kind
            if k.startswith("fixed") and len(set(samples)) == 1:
                k = "constant"
            _flac_subframe(bw2, samples, bps, k, porder=porder,
                           wasted=wasted, escape_raw=escape_raw)
        bw2.align()
        frame_wo_crc16 = hdr + bw2.tobytes()
        out += frame_wo_crc16 + struct.pack(">H", _flac_crc16(frame_wo_crc16))
        frame_idx += 1
    return bytes(out)


def _flac_test_signal(n, ch, bits, seed=0, wasted=0):
    import math
    import random

    rng = random.Random(seed)
    lim = (1 << (bits - 1)) - 1
    chans = []
    for c in range(ch):
        vals = []
        for i in range(n):
            v = int(lim * 0.6 * math.sin(i * (0.03 + 0.01 * c))) + rng.randrange(-40, 41)
            v = max(-lim - 1, min(lim, v))
            vals.append((v >> wasted) << wasted)
        chans.append(vals)
    return chans


def test_flac_decode_roundtrip_matrix():
    import numpy as np

    from aws_sdk_pandas_spark.operators.flac_lite import decode_flac

    n, sr, bits = 500, 16000, 16
    chans = _flac_test_signal(n, 2, bits, seed=1)
    want = (np.array(chans, np.float64).T / (1 << (bits - 1))).astype(np.float32)
    for mode in ("independent", "left-side", "right-side", "mid-side"):
        for kind in ("verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "lpc"):
            ch, got_sr, got = decode_flac(
                _flac_encode(chans, sr, bits, mode=mode, kind=kind)
            )
            assert (ch, got_sr) == (2, sr)
            assert got.shape == (n, 2)
            assert (got == want).all(), (mode, kind)


def test_flac_rice_partitions_escapes_wasted():
    import numpy as np

    from aws_sdk_pandas_spark.operators.flac_lite import decode_flac

    n, sr, bits = 512, 44100, 16
    chans = _flac_test_signal(n, 1, bits, seed=2)
    want = (np.array(chans, np.float64).T / (1 << (bits - 1))).astype(np.float32)
    # partition orders
    for porder in (0, 1, 2, 4):
        _, _, got = decode_flac(
            _flac_encode(chans, sr, bits, blocksize=256, kind="fixed2",
                         porder=porder)
        )
        assert (got == want).all(), porder
    # escape partitions: raw 17-bit residuals
    _, _, got = decode_flac(
        _flac_encode(chans, sr, bits, kind="fixed1", escape_raw=17)
    )
    assert (got == want).all()
    # wasted bits
    chw = _flac_test_signal(n, 1, bits, seed=3, wasted=3)
    wantw = (np.array(chw, np.float64).T / (1 << (bits - 1))).astype(np.float32)
    _, _, got = decode_flac(_flac_encode(chw, sr, bits, kind="fixed1", wasted=3))
    assert (got == wantw).all()
    # constant blocks + 8-bit depth
    const = [[37] * 300]
    _, _, got = decode_flac(_flac_encode(const, 8000, 8, kind="fixed1"))
    assert (got == np.float32(37 / 128.0)).all()


def test_flac_crc_verification():
    import pytest as _pytest

    from aws_sdk_pandas_spark.operators.flac_lite import decode_flac

    chans = _flac_test_signal(300, 1, 16, seed=4)
    good = _flac_encode(chans, 16000, 16)
    decode_flac(good)
    bad = bytearray(good)
    bad[-1] ^= 0x01  # last CRC-16 byte
    with _pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(bad))
    # flip a bit inside the first frame header -> CRC-8 catches it
    hdr_pos = good.index(b"\xff\xf8", 42)
    bad = bytearray(good)
    bad[hdr_pos + 3] ^= 0x40  # channel-assignment bits
    with _pytest.raises(ValueError):
        decode_flac(bytes(bad))


def test_flac_equals_wav_through_audio_kernels(spark):
    """The SAME PCM through WAV and FLAC must produce IDENTICAL pcm
    stats and audio dHash — a cross-format consistency check that
    doesn't trust either codec in isolation."""
    import struct

    from aws_sdk_pandas_spark.operators.multimodal import (
        audio_dhash,
        audio_pcm_stats,
        make_test_media,
        sniff_format,
    )

    chans = _flac_test_signal(400, 1, 16, seed=5)
    pcm = struct.pack(f"<{len(chans[0])}h", *chans[0])
    wav = make_test_media("wav", sample_rate=16000, channels=1, bits=16, data=pcm)
    flac = _flac_encode(chans, 16000, 16, kind="fixed2")
    df = spark.createDataFrame(
        [("w", bytearray(wav)), ("f", bytearray(flac))],
        "media_id string, payload binary",
    )
    fmts = {
        r.media_id: r.fmt
        for r in df.select("media_id", sniff_format("payload").alias("fmt")).collect()
    }
    assert fmts == {"w": "wav", "f": "flac"}
    stats = {r.media_id: r for r in audio_pcm_stats(df).collect()}
    for field in ("channels", "sample_rate", "n_frames", "rms", "peak",
                  "zero_crossing_rate"):
        assert getattr(stats["w"], field) == getattr(stats["f"], field), field
    hashes = {r.media_id: r.adhash for r in audio_dhash(df).collect()}
    assert hashes["w"] == hashes["f"]


def _jpeg_encode12_gray(samples, w, h):
    """Test-side 12-bit BASELINE grayscale JPEG encoder (T.81 extended
    precision: 2048 level shift, 16-bit DQT, DC categories up to 15) —
    independent of the decoder."""
    import struct

    import numpy as np

    from aws_sdk_pandas_spark.operators.jpeg_lite import _A, ZIGZAG

    Q = np.full(64, 32, np.int64)
    Q[0] = 16

    dc_syms = list(range(16))
    ac_syms = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 15)] + [0xF0]
    dc_code = {sym: (5, i) for i, sym in enumerate(dc_syms)}
    ac_code = {sym: (9, i) for i, sym in enumerate(ac_syms)}

    p = np.asarray(samples, np.float64).reshape(h, w)
    th, tw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(p, ((0, th - h), (0, tw - w)), mode="edge") - 2048.0

    bits = []

    def put(nbits, code):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def put_val(v, t):
        if t:
            put(t, v if v > 0 else v + (1 << t) - 1)

    pred = 0
    for by in range(th // 8):
        for bx in range(tw // 8):
            F_ = _A @ p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] @ _A.T
            zz = np.round(F_.reshape(64)[ZIGZAG] / Q).astype(np.int64)
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = 0 if diff == 0 else abs(diff).bit_length()
            put(*dc_code[t])
            put_val(diff, t)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    put(*ac_code[0x00])
                    break
                while run >= 16:
                    put(*ac_code[0xF0])
                    run -= 16
                v = int(zz[k])
                s_cat = abs(v).bit_length()
                put(*ac_code[(run << 4) | s_cat])
                put_val(v, s_cat)
                k += 1
    while len(bits) % 8:
        bits.append(1)
    scan = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for bit in bits[i : i + 8]:
            byte = (byte << 1) | bit
        scan.append(byte)
        if byte == 0xFF:
            scan.append(0x00)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    dqt = bytes([0x10]) + b"".join(struct.pack(">H", int(x)) for x in Q)
    out += seg(0xDB, dqt)
    out += seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    dc_bits = [0] * 16
    dc_bits[4] = 16
    ac_bits = [0] * 16
    ac_bits[8] = len(ac_syms)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out + bytes(scan) + b"\xff\xd9"


def test_jpeg_12bit_precision():
    import numpy as np

    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    w, h = 16, 16
    # solid 12-bit value: DC-only, decodes near-exactly then scales /16
    solid = [3000] * (w * h)
    gw, gh, got = decode_jpeg(_jpeg_encode12_gray(solid, w, h))
    assert (gw, gh) == (w, h)
    a = np.frombuffer(got, np.uint8).reshape(h, w, 3)
    assert abs(int(a[3, 3, 0]) - round(3000 * 255 / 4095)) <= 2
    assert (a[:, :, 0] == a[:, :, 1]).all()

    # 12-bit gradient survives above 30 dB PSNR at 8-bit output scale
    grad = [(x * 200 + y * 37) % 4096 for y in range(h) for x in range(w)]
    _, _, got2 = decode_jpeg(_jpeg_encode12_gray(grad, w, h))
    want = np.array(grad, np.float64).reshape(h, w) * 255 / 4095
    y8 = np.frombuffer(got2, np.uint8).reshape(h, w, 3)[:, :, 0].astype(float)
    mse = float(np.mean((want - y8) ** 2))
    assert 10 * np.log10(255**2 / mse) > 25, mse


# ------------------------------------------- decoder mutation fuzzing


def test_decoder_mutation_fuzz():
    """Deterministic byte-flip / truncate / splice fuzzing over every
    codec: a mutated file must either decode to a well-formed result
    or raise ValueError/NotImplementedError — never hang, never leak a
    low-level exception, never return a malformed pixel buffer."""
    import random

    from aws_sdk_pandas_spark.operators.flac_lite import decode_flac
    from aws_sdk_pandas_spark.operators.multimodal import (
        decode_image,
        make_test_media,
    )

    rng = random.Random(42)
    w, h = 12, 9
    rgb = _rand_bytes(w * h * 3, seed=30)
    files = {
        "bmp": make_test_media("bmp", w, h, pixels=rgb),
        "png": _png_encode_v2(list(rgb), w, h, color=2, depth=8),
        "png16i": _png_encode_v2(
            [rng.randrange(65536) for _ in range(w * h)], w, h, color=0,
            depth=16, interlace=True,
        ),
        "jpeg": _jpeg_encode(rgb, w, h),
        "jpegp": _jpeg_encode_progressive(rgb, w, h),
        "tiff": _tiff_encode(rgb, w, h, compression=5, rows_per_strip=4),
        "webp": _webp_encode(
            rgb, w, h, transforms=("subtract_green", "predictor"),
            lz77=True, cache_bits=3,
        ),
        "flac": _flac_encode(
            _flac_test_signal(200, 2, 16, seed=32), 16000, 16,
            mode="mid-side", kind="fixed2",
        ),
    }
    for name, blob in files.items():
        dec = decode_flac if name == "flac" else decode_image
        for _trial in range(60):
            b = bytearray(blob)
            op = rng.randrange(3)
            if op == 0:
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
            elif op == 1:
                b = b[: rng.randrange(1, len(b))]
            else:
                i = rng.randrange(len(b))
                b[i : i + 4] = bytes(rng.randrange(256) for _ in range(4))
            try:
                out = dec(bytes(b))
                if name != "flac":
                    ww, hh, px = out
                    assert isinstance(px, bytes) and len(px) == ww * hh * 3
            except (ValueError, NotImplementedError):
                pass  # loud refusal is the contract for corrupt input


def test_decoder_decompression_bombs_bounded():
    """Crafted high-ratio streams with small claimed dimensions must
    not expand past the geometry budget."""
    import struct
    import zlib

    import pytest as _pytest

    from aws_sdk_pandas_spark.operators.multimodal import decode_png
    from aws_sdk_pandas_spark.operators.tiff_lite import (
        _tiff_lzw_decode,
        decode_tiff,
    )

    # PNG claiming 2x2 but carrying 10 MB of zeros: the bounded inflate
    # stops at the scanline budget and the length check refuses
    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * (10 << 20)))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="scanline"):
        decode_png(bomb)
    # implausible dimensions refuse before any allocation
    huge = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="implausible"):
        decode_png(huge)

    # TIFF LZW expanding past its strip budget is cut at the budget
    runs = _tiff_lzw_encode(b"\x07" * 100000)
    assert len(_tiff_lzw_decode(runs, max_out=1000)) <= 1000 + 4096
    # and a strip claiming tiny dims over that stream decodes-short
    t = bytearray(_tiff_encode(b"\x07" * 12, 2, 2, compression=5))
    with _pytest.raises(ValueError):
        decode_tiff(bytes(t[:40]))  # truncated IFD refuses


def _jpeg_encode_cmyk(cmyk, w, h, *, adobe=True, ycck=False):
    """Test-side 4-component JPEG encoder (T.81 + Adobe APP14
    conventions), independent of the decoder: ``cmyk`` is direct
    (uninverted) C,M,Y,K bytes; Adobe files store inverted samples and
    transform 2 additionally YCC-codes the first three channels."""
    import struct

    import numpy as np

    from aws_sdk_pandas_spark.operators.jpeg_lite import _A, ZIGZAG

    Q = np.full(64, 8, np.int64)
    Q[0] = 4
    dc_syms = list(range(12))
    ac_syms = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
    dc_code = {sym: (4, i) for i, sym in enumerate(dc_syms)}
    ac_code = {sym: (8, i) for i, sym in enumerate(ac_syms)}

    arr = np.frombuffer(bytes(cmyk), np.uint8).reshape(h, w, 4).astype(np.float64)
    if adobe:
        arr = 255.0 - arr  # Adobe-inverted storage
    assert ycck is False or adobe, "YCCK is an Adobe transform"
    if ycck:
        r_, g_, b_ = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128,
            0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128,
            arr[:, :, 3],
        ]
    else:
        planes = [arr[:, :, i] for i in range(4)]

    th, tw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [
        np.pad(p, ((0, th - h), (0, tw - w)), mode="edge") - 128.0
        for p in planes
    ]

    bits = []

    def put(nbits, code):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def put_val(v, t):
        if t:
            put(t, v if v > 0 else v + (1 << t) - 1)

    preds = [0] * 4
    for by in range(th // 8):
        for bx in range(tw // 8):
            for ci, p in enumerate(planes):
                F_ = _A @ p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] @ _A.T
                zz = np.round(F_.reshape(64)[ZIGZAG] / Q).astype(np.int64)
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                t = 0 if diff == 0 else abs(diff).bit_length()
                put(*dc_code[t])
                put_val(diff, t)
                k = 1
                while k < 64:
                    run = 0
                    while k < 64 and zz[k] == 0:
                        run += 1
                        k += 1
                    if k == 64:
                        put(*ac_code[0x00])
                        break
                    while run >= 16:
                        put(*ac_code[0xF0])
                        run -= 16
                    v = int(zz[k])
                    s_cat = abs(v).bit_length()
                    put(*ac_code[(run << 4) | s_cat])
                    put_val(v, s_cat)
                    k += 1
    while len(bits) % 8:
        bits.append(1)
    scan = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for bit in bits[i : i + 8]:
            byte = (byte << 1) | bit
        scan.append(byte)
        if byte == 0xFF:
            scan.append(0x00)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    if adobe:
        out += seg(
            0xEE,
            b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 2 if ycck else 0),
        )
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in Q))
    sof = struct.pack(">BHHB", 8, h, w, 4)
    for ci in range(4):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes([0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8) + bytes(ac_syms))
    sos = bytes([4])
    for ci in range(4):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    return out + bytes(scan) + b"\xff\xd9"


def test_jpeg_cmyk_and_ycck():
    import numpy as np

    from aws_sdk_pandas_spark.operators.jpeg_lite import decode_jpeg

    w, h = 16, 16

    def want_rgb(cmyk):
        a = np.frombuffer(bytes(cmyk), np.uint8).reshape(h, w, 4).astype(float)
        return (255.0 - a[:, :, :3]) * (255.0 - a[:, :, 3:4]) / 255.0

    # solid patch: DC-only, all three conventions land near the formula
    solid = bytes([60, 120, 30, 40]) * (w * h)
    for kwargs in ({"adobe": False}, {"adobe": True}, {"adobe": True, "ycck": True}):
        gw, gh, got = decode_jpeg(_jpeg_encode_cmyk(solid, w, h, **kwargs))
        assert (gw, gh) == (w, h)
        a = np.frombuffer(got, np.uint8).astype(float).reshape(h, w, 3)
        assert np.abs(a - want_rgb(solid)).max() <= 4, kwargs

    # gradient: PSNR against the formula output
    grad = bytearray()
    for y in range(h):
        for x in range(w):
            grad += bytes([(x * 9) % 256, (y * 11) % 256, ((x + y) * 5) % 256,
                           (x * y) % 128])
    for kwargs in ({"adobe": True}, {"adobe": True, "ycck": True}):
        _, _, got = decode_jpeg(_jpeg_encode_cmyk(bytes(grad), w, h, **kwargs))
        a = np.frombuffer(got, np.uint8).astype(float).reshape(h, w, 3)
        mse = float(np.mean((a - want_rgb(bytes(grad))) ** 2))
        assert 10 * np.log10(255**2 / mse) > 22, (kwargs, mse)


# ------------------------------------------------ BMP: RLE + sub-byte


def _bmp_paletted(w, h, bpp, palette, pixel_data, *, compression=0,
                  n_colors=None):
    """Generic paletted BMP writer (raw rows already padded, or RLE
    stream) — independent of the decoder."""
    import struct

    n = n_colors if n_colors is not None else len(palette)
    pal_bytes = b"".join(bytes([c[2], c[1], c[0], 0]) for c in palette)
    data_offset = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
        len(pixel_data), 2835, 2835, n, 0,
    )
    hdr = b"BM" + struct.pack("<IHHI", data_offset + len(pixel_data), 0, 0,
                              data_offset)
    return hdr + info + pal_bytes + pixel_data


def test_bmp_rle8_and_rle4():
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import decode_bmp

    pal = [(10 * i, 20 * i % 256, 5 * i) for i in range(16)]
    w, h = 10, 4
    # RLE8 stream building the BOTTOM-UP index image:
    # bottom row: 10x color 1; row 1: 3x2, abs run [3,4,5,6], 3x7;
    # row 2: delta skip (2,0) then 8x8; row 3: 4x9 then EOL; EOB
    rle8 = bytes(
        [10, 1, 0, 0,
         3, 2, 0, 4, 3, 4, 5, 6, 3, 7, 0, 0,
         0, 2, 2, 0, 8, 8, 0, 0,
         4, 9, 0, 0,
         0, 1]
    )
    got = decode_bmp(_bmp_paletted(w, h, 8, pal, rle8, compression=1))
    idx = np.zeros((h, w), int)
    idx[0] = [9, 9, 9, 9, 0, 0, 0, 0, 0, 0]          # top row (stream row 3)
    idx[1] = [0, 0, 8, 8, 8, 8, 8, 8, 8, 8]          # stream row 2 after delta
    idx[2] = [2, 2, 2, 3, 4, 5, 6, 7, 7, 7]          # stream row 1
    idx[3] = [1] * 10                                # bottom row
    want = bytes(v for r in idx for i in r for v in pal[i])
    assert got == (w, h, want)

    # RLE4: encoded run alternates two nibbles; absolute run packs them
    w4, h4 = 7, 2
    rle4 = bytes(
        # row0: 5-run alternating 3/5, then abs run of FOUR nibbles
        # [1,2,6,0] (absolute mode needs v >= 3; (0,2) is the delta
        # escape) -- but only 2 fit the 7-wide row, the rest clip
        [5, (3 << 4) | 5, 0, 4, 0x12, 0x60, 0, 0,
         7, (1 << 4) | 4, 0, 0,                    # row1: 1,4,1,4,1,4,1
         0, 1]
    )
    got4 = decode_bmp(_bmp_paletted(w4, h4, 4, pal, rle4, compression=2))
    idx4 = [[1, 4, 1, 4, 1, 4, 1], [3, 5, 3, 5, 3, 1, 2]]
    want4 = bytes(v for r in idx4 for i in r for v in pal[i])
    assert got4 == (w4, h4, want4)


def test_bmp_sub_byte_depths():
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import decode_bmp

    pal2 = [(0, 0, 0), (255, 255, 255)]
    w, h = 11, 3  # odd width: padding bits in the last byte
    bits_rows = [
        [1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1],
        [0] * 11,
        [1] * 11,
    ]
    rows = bytearray()
    for r in reversed(bits_rows):  # bottom-up storage
        bits = r + [0] * (32 - ((len(r) + 31) % 32 + 1))
        row = bytearray()
        acc = []
        for bit in r:
            acc.append(bit)
            if len(acc) == 8:
                row.append(sum(v << (7 - i) for i, v in enumerate(acc)))
                acc = []
        if acc:
            row.append(sum(v << (7 - i) for i, v in enumerate(acc)))
        while len(row) % 4:
            row.append(0)
        rows += row
    got = decode_bmp(_bmp_paletted(w, h, 1, pal2, bytes(rows)))
    want = bytes(v for r in bits_rows for bit in r for v in pal2[bit])
    assert got == (w, h, want)

    # 4-bit uncompressed
    pal16 = [(i * 16, 255 - i * 16, i * 7) for i in range(16)]
    w4, h4 = 5, 2
    idx_rows = [[1, 2, 3, 4, 5], [15, 0, 7, 8, 9]]
    rows4 = bytearray()
    for r in reversed(idx_rows):
        row = bytearray()
        for i in range(0, len(r), 2):
            hi = r[i]
            lo = r[i + 1] if i + 1 < len(r) else 0
            row.append((hi << 4) | lo)
        while len(row) % 4:
            row.append(0)
        rows4 += row
    got4 = decode_bmp(_bmp_paletted(w4, h4, 4, pal16, bytes(rows4)))
    want4 = bytes(v for r in idx_rows for i in r for v in pal16[i])
    assert got4 == (w4, h4, want4)


def test_bmp_rle_refusals():
    import pytest as _pytest

    from aws_sdk_pandas_spark.operators.multimodal import decode_bmp

    pal = [(0, 0, 0)] * 16
    with _pytest.raises(ValueError, match="matching"):
        decode_bmp(_bmp_paletted(4, 2, 4, pal, b"\x00\x01", compression=1))
    with _pytest.raises(ValueError, match="truncated BMP RLE"):
        decode_bmp(_bmp_paletted(4, 2, 8, pal, bytes([0, 2, 1]), compression=1))
    with _pytest.raises(ValueError, match="compression=3"):
        decode_bmp(_bmp_paletted(4, 2, 8, pal, b"\x00\x01", compression=3))


# -------------------------------------------------- GIF: animation


def _gif_encode_anim(sw, sh, palette, frames):
    """Multi-frame GIF89a writer (independent of the decoder): each
    frame = dict(left, top, w, h, indexes, delay_cs=0, disposal=0,
    transparent=None, interlace=False)."""
    import struct

    n_colors = len(palette) // 3
    size_bits = max(1, (n_colors - 1).bit_length()) - 1
    min_code = max(2, (n_colors - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | size_bits, 0, 0])
    out += bytes(palette) + b"\x00" * (3 * ((2 << size_bits) - n_colors))
    for fr in frames:
        flags = (fr.get("disposal", 0) & 7) << 2
        if fr.get("transparent") is not None:
            flags |= 1
        out += bytes([0x21, 0xF9, 4, flags])
        out += struct.pack("<H", fr.get("delay_cs", 0))
        out += bytes([fr.get("transparent") or 0, 0])
        out += bytes([0x2C])
        out += struct.pack("<HHHH", fr["left"], fr["top"], fr["w"], fr["h"])
        out += bytes([0x40 if fr.get("interlace") else 0])
        out += bytes([min_code])
        data, _codes = _gif_lzw_encode(fr["indexes"], min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_compositing():
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import decode_gif_frames

    pal = bytes([0, 0, 0,  255, 0, 0,  0, 255, 0,  0, 0, 255])  # k,r,g,b
    sw, sh = 6, 4
    frames = [
        # frame 0: full screen of color 1 (red), disposal 1 (leave)
        {"left": 0, "top": 0, "w": sw, "h": sh,
         "indexes": [1] * (sw * sh), "disposal": 1, "delay_cs": 5},
        # frame 1: 2x2 green patch at (2,1) with one transparent pixel
        # (index 0 declared transparent) -> red shows through there
        {"left": 2, "top": 1, "w": 2, "h": 2,
         "indexes": [2, 0, 2, 2], "transparent": 0, "disposal": 1},
        # frame 2: 2x1 blue patch at (0,0), disposal 2 -> its region
        # resets to background AFTER this frame
        {"left": 0, "top": 0, "w": 2, "h": 1,
         "indexes": [3, 3], "disposal": 2},
        # frame 3: full-frame no-op patch (all transparent) shows the
        # post-disposal canvas
        {"left": 0, "top": 0, "w": sw, "h": sh,
         "indexes": [0] * (sw * sh), "transparent": 0},
    ]
    blob = _gif_encode_anim(sw, sh, pal, frames)
    got = decode_gif_frames(blob)
    assert [f[0] for f in got] == [0, 1, 2, 3]
    assert got[0][1] == 50  # delay 5cs -> 50ms

    def grid(rgb):
        return np.frombuffer(rgb, np.uint8).reshape(sh, sw, 3)

    red, green, blue = (255, 0, 0), (0, 255, 0), (0, 0, 255)
    g0 = grid(got[0][2])
    assert (g0 == red).all()
    g1 = grid(got[1][2])
    assert tuple(g1[1, 2]) == green and tuple(g1[2, 2]) == green
    assert tuple(g1[1, 3]) == red  # transparent pixel: red shows through
    assert tuple(g1[2, 3]) == green
    g2 = grid(got[2][2])
    assert tuple(g2[0, 0]) == blue and tuple(g2[0, 1]) == blue
    g3 = grid(got[3][2])
    # disposal 2 restored (0,0)-(0,1) to the BACKGROUND color (index 0)
    assert tuple(g3[0, 0]) == (0, 0, 0) and tuple(g3[0, 1]) == (0, 0, 0)
    assert tuple(g3[1, 2]) == green  # frame-1 patch persisted

    # frame selection: only frame 3, still correctly composited
    sel = decode_gif_frames(blob, frame_indices=[3])
    assert len(sel) == 1 and sel[0][0] == 3
    assert sel[0][2] == got[3][2]


def test_gif_animation_disposal_previous():
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import decode_gif_frames

    pal = bytes([10, 10, 10,  200, 0, 0,  0, 200, 0])
    sw, sh = 4, 3
    frames = [
        {"left": 0, "top": 0, "w": sw, "h": sh, "indexes": [1] * 12,
         "disposal": 1},
        # disposal 3: after showing the green patch, restore what was
        # underneath
        {"left": 1, "top": 1, "w": 2, "h": 1, "indexes": [2, 2],
         "disposal": 3},
        {"left": 0, "top": 0, "w": 1, "h": 1, "indexes": [2]},
    ]
    got = decode_gif_frames(_gif_encode_anim(sw, sh, pal, frames))

    def grid(rgb):
        return np.frombuffer(rgb, np.uint8).reshape(sh, sw, 3)

    assert tuple(grid(got[1][2])[1, 1]) == (0, 200, 0)
    g2 = grid(got[2][2])
    assert tuple(g2[1, 1]) == (200, 0, 0)  # restored to previous (red)
    assert tuple(g2[0, 0]) == (0, 200, 0)  # frame 2's own patch


def test_gif_animation_through_video_frames_kernel(spark):
    from aws_sdk_pandas_spark.operators.multimodal import decode_video_frames

    pal = bytes([0, 0, 0, 255, 255, 255])
    sw, sh = 4, 4
    frames = [
        {"left": 0, "top": 0, "w": sw, "h": sh, "indexes": [1] * 16},
        {"left": 0, "top": 0, "w": sw, "h": sh, "indexes": [0] * 16},
    ]
    blob = _gif_encode_anim(sw, sh, pal, frames)
    df = spark.createDataFrame(
        [("g", bytearray(blob))], "media_id string, payload binary"
    )
    rows = {r.frame_idx: r for r in decode_video_frames(df).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].mean_r == 255.0 and rows[1].mean_r == 0.0
    assert rows[0].width == sw and rows[0].height == sh
    sampled = decode_video_frames(df, frame_indices=[1]).collect()
    assert len(sampled) == 1 and sampled[0].frame_idx == 1


# -------------------------------------------------------------- AIFF


def _aiff_encode(chans, sr, bits, *, aifc_codec=None):
    """Test-side AIFF/AIFC writer (independent of the decoder): COMM
    with the 80-bit extended-float sample rate built from first
    principles, SSND big-endian PCM (or little-endian for sowt)."""
    import struct

    ch = len(chans)
    n_frames = len(chans[0])
    # 80-bit extended float for the rate
    import math

    if sr == 0:
        ext = bytes(10)
    else:
        e = math.floor(math.log2(sr))
        mant = int(sr / 2.0**e * (1 << 63))
        ext = struct.pack(">HQ", 16383 + e, mant)
    comm = struct.pack(">hIh", ch, n_frames, bits) + ext
    if aifc_codec:
        comm += aifc_codec + b"\x0dnot compressed"  # pascal-ish name pad
        if len(comm) % 2:
            comm += b"\x00"
    little = aifc_codec == b"sowt"
    fmt = {8: "b", 16: "h", 32: "i"}[bits]
    endch = "<" if little else ">"
    inter = []
    for f in range(n_frames):
        for c in range(ch):
            inter.append(chans[c][f])
    pcm = struct.pack(f"{endch}{len(inter)}{fmt}", *inter)
    ssnd = struct.pack(">II", 0, 0) + pcm

    def chunk(cid, body):
        out = cid + struct.pack(">I", len(body)) + body
        if len(body) % 2:
            out += b"\x00"
        return out

    form = (b"AIFC" if aifc_codec else b"AIFF") + chunk(b"COMM", comm) + chunk(
        b"SSND", ssnd
    )
    return b"FORM" + struct.pack(">I", len(form)) + form


def test_aiff_decode_and_wav_equivalence(spark):
    import struct

    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import (
        audio_pcm_stats,
        decode_aiff,
        make_test_media,
        sniff_format,
    )

    chans = _flac_test_signal(300, 2, 16, seed=8)
    blob = _aiff_encode(chans, 44100, 16)
    ch, sr, samples = decode_aiff(blob)
    assert (ch, sr) == (2, 44100) and samples.shape == (300, 2)
    want = (np.array(chans, np.float64).T / 32768.0).astype(np.float32)
    assert (samples == want).all()

    # 8-bit AIFF is SIGNED (unlike WAV)
    mono8 = [[-128, -1, 0, 1, 127]]
    _, _, s8 = decode_aiff(_aiff_encode(mono8, 8000, 8))
    assert list(s8[:, 0]) == [v / 128.0 for v in mono8[0]]

    # AIFC sowt = little-endian samples, same values
    _, _, s_sowt = decode_aiff(_aiff_encode(chans, 44100, 16, aifc_codec=b"sowt"))
    assert (s_sowt == want).all()

    # the same PCM as WAV and AIFF produces identical kernel stats
    inter = []
    for f in range(300):
        for c in range(2):
            inter.append(chans[c][f])
    wav = make_test_media(
        "wav", sample_rate=44100, channels=2, bits=16,
        data=struct.pack(f"<{len(inter)}h", *inter),
    )
    df = spark.createDataFrame(
        [("w", bytearray(wav)), ("a", bytearray(blob))],
        "media_id string, payload binary",
    )
    fmts = {r.media_id: r.f for r in
            df.select("media_id", sniff_format("payload").alias("f")).collect()}
    assert fmts == {"w": "wav", "a": "aiff"}
    stats = {r.media_id: r for r in audio_pcm_stats(df).collect()}
    assert stats["w"].rms == stats["a"].rms
    assert stats["w"].n_frames == stats["a"].n_frames == 300

    # compressed AIFC refuses loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="codec"):
        decode_aiff(_aiff_encode(chans, 44100, 16, aifc_codec=b"ulaw"))


def test_ico_decode_png_and_dib_entries():
    import struct

    from aws_sdk_pandas_spark.operators.multimodal import (
        decode_ico,
        decode_image,
        make_test_media,
    )

    # PNG-embedded icon: two entries, the larger (a real PNG) wins
    w, h = 12, 10
    rgb = _rand_bytes(w * h * 3, seed=40)
    png = _png_encode_v2(list(rgb), w, h, color=2)
    small = _png_encode_v2([0, 0, 0] * 4, 2, 2, color=2)

    def ico(entries):
        out = bytearray(b"\x00\x00\x01\x00" + struct.pack("<H", len(entries)))
        off = 6 + 16 * len(entries)
        for ew, eh, data in entries:
            out += bytes([ew % 256, eh % 256, 0, 0])
            out += struct.pack("<HHII", 1, 32, len(data), off)
            off += len(data)
        for _, _, data in entries:
            out += data
        return bytes(out)

    blob = ico([(2, 2, small), (w, h, png)])
    assert decode_ico(blob) == (w, h, rgb)
    assert decode_image(blob) == (w, h, rgb)

    # DIB-embedded icon: headerless BMP with doubled height + AND mask
    bw, bh = 8, 6
    brgb = _rand_bytes(bw * bh * 3, seed=41)
    bmp = make_test_media("bmp", bw, bh, pixels=brgb)
    info = bytearray(bmp[14:])  # strip the file header
    struct.pack_into("<i", info, 8, bh * 2)  # doubled height
    and_mask = b"\x00" * (((bw + 31) // 32) * 4 * bh)
    dib = bytes(info) + and_mask
    blob2 = ico([(bw, bh, dib)])
    assert decode_ico(blob2) == (bw, bh, brgb)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"\x01\x00\x01\x00\x00\x00")
    with _pytest.raises(ValueError, match="no images"):
        decode_ico(b"\x00\x00\x01\x00\x00\x00")


# -------------------------------------------------------------- APNG


def _apng_encode(w, h, frames, *, color=6, depth=8):
    """Test-side APNG writer (independent of the decoder): acTL + per
    frame fcTL and IDAT/fdAT (filter 0 rows, zlib).  ``frames`` =
    list of dict(x, y, w, h, pixels(channel bytes), delay_num=1,
    delay_den=10, dispose=0, blend=0)."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0))
    out += chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, f in enumerate(frames):
        fw, fh = f["w"], f["h"]
        out += chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB", seq, fw, fh, f.get("x", 0), f.get("y", 0),
                f.get("delay_num", 1), f.get("delay_den", 10),
                f.get("dispose", 0), f.get("blend", 0),
            ),
        )
        seq += 1
        raw = bytearray()
        stride = fw * ch
        px = f["pixels"]
        for r in range(fh):
            raw.append(0)
            raw += bytes(px[r * stride : (r + 1) * stride])
        z = zlib.compress(bytes(raw))
        if i == 0:
            out += chunk(b"IDAT", z)
        else:
            out += chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += chunk(b"IEND", b"")
    return out


def test_apng_compositing_and_dispose():
    import numpy as np

    from aws_sdk_pandas_spark.operators.multimodal import decode_apng_frames

    w, h = 6, 4
    red = [255, 0, 0, 255]
    green_half = [0, 255, 0, 128]
    blue = [0, 0, 255, 255]
    frames = [
        {"w": w, "h": h, "pixels": red * (w * h), "delay_num": 3,
         "delay_den": 100},
        # 2x2 half-transparent green at (2,1), OVER blending,
        # dispose 2 (restore previous after)
        {"w": 2, "h": 2, "x": 2, "y": 1, "pixels": green_half * 4,
         "blend": 1, "dispose": 2},
        # 2x1 opaque blue at (0,0), SOURCE, dispose 1 (to transparent)
        {"w": 2, "h": 1, "x": 0, "y": 0, "pixels": blue * 2, "blend": 0,
         "dispose": 1},
        # full no-op frame: transparent everywhere, OVER (canvas shows
        # through)
        {"w": w, "h": h, "pixels": [0, 0, 0, 0] * (w * h), "blend": 1},
    ]
    got = decode_apng_frames(_apng_encode(w, h, frames))
    assert [g[0] for g in got] == [0, 1, 2, 3]
    assert got[0][1] == 30  # 3/100 s

    def grid(rgb):
        return np.frombuffer(rgb, np.uint8).reshape(h, w, 3)

    assert (grid(got[0][2]) == (255, 0, 0)).all()
    g1 = grid(got[1][2])
    # OVER: (0,255,0,a=128/255) over opaque red
    sa = 128 / 255.0
    want_r = round(0 * sa + 255 * (1 - sa) + 0.5)
    want_g = round(255 * sa + 0.5)
    got_px = tuple(int(v) for v in g1[1, 2])
    assert abs(got_px[0] - want_r) <= 1 and abs(got_px[1] - want_g) <= 1
    assert tuple(g1[0, 0]) == (255, 0, 0)  # outside the patch
    g2 = grid(got[2][2])
    assert tuple(g2[0, 0]) == (0, 0, 255)
    assert tuple(g2[1, 2]) == (255, 0, 0)  # dispose 2 restored the blend
    g3 = grid(got[3][2])
    assert tuple(g3[0, 0]) == (0, 0, 0)  # dispose 1 left transparent black
    assert tuple(g3[2, 2]) == (255, 0, 0)

    # frame selection composites correctly
    sel = decode_apng_frames(_apng_encode(w, h, frames), frame_indices=[2])
    assert len(sel) == 1 and sel[0][2] == got[2][2]


def test_apng_still_png_is_frame_zero(spark):
    from aws_sdk_pandas_spark.operators.multimodal import (
        decode_apng_frames,
        decode_video_frames,
    )

    w, h = 5, 3
    rgb = _rand_bytes(w * h * 3, seed=50)
    png = _png_encode_v2(list(rgb), w, h, color=2)
    got = decode_apng_frames(png)
    assert got == [(0, 0, rgb)]

    # the video kernel covers APNG too
    frames = [
        {"w": 4, "h": 4, "pixels": [255, 255, 255, 255] * 16},
        {"w": 4, "h": 4, "pixels": [0, 0, 0, 255] * 16},
    ]
    blob = _apng_encode(4, 4, frames)
    df = spark.createDataFrame(
        [("a", bytearray(blob))], "media_id string, payload binary"
    )
    rows = {r.frame_idx: r for r in decode_video_frames(df).collect()}
    assert rows[0].mean_r == 255.0 and rows[1].mean_r == 0.0
