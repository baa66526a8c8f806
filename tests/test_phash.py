"""DCT perceptual hash (pHash): reference replay, invariances,
banded dedup."""
import numpy as np
import pytest

from aws_sdk_pandas_spark.operators.multimodal import (
    dedup_images_phash,
    image_phash,
    make_test_media,
)


def _ham(a, b):
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _gradient_rgb(w, h, fx=10, fy=12):
    px = bytearray()
    for r in range(h):
        for c in range(w):
            v = (c * fx + r * fy) % 256
            px += bytes([v, (v * 2) % 256, (v * 3) % 256])
    return bytes(px)


def _ref_phash(rgb, w, h):
    """Independent in-test replay of the pHash definition."""
    a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).mean(axis=2)
    n = 32
    basis = np.array(
        [
            [
                (np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n))
                * np.cos((2 * x + 1) * u * np.pi / (2 * n))
                for x in range(n)
            ]
            for u in range(n)
        ]
    )
    ri = (np.arange(h) * n) // h
    ci = (np.arange(w) * n) // w
    acc = np.zeros((n, n))
    cnt = np.zeros((n, n))
    np.add.at(acc, (ri[:, None], ci[None, :]), a)
    np.add.at(cnt, (ri[:, None], ci[None, :]), 1.0)
    low = (basis @ (acc / np.maximum(cnt, 1.0)) @ basis.T)[:8, :8]
    med = np.median(low)
    v = 0
    for k in np.nonzero((low > med).reshape(-1))[0]:
        v |= 1 << int(k)
    return int(np.uint64(v).astype(np.int64))


def test_phash_matches_reference_and_nulls(spark):
    w, h = 40, 30
    rgb = _gradient_rgb(w, h)
    df = spark.createDataFrame(
        [("a", bytearray(make_test_media("bmp", w, h, pixels=rgb))),
         ("n", None)],
        "media_id string, payload binary",
    )
    got = {r.media_id: r.phash for r in image_phash(df).collect()}
    assert got["a"] == _ref_phash(rgb, w, h)
    assert got["n"] is None


def test_phash_invariances(spark):
    w, h = 48, 36
    rgb = _gradient_rgb(w, h)
    # same picture at a different scale
    big = _gradient_rgb(w * 2, h * 2, fx=5, fy=6)
    # brightness shift (clip-free region)
    dim = bytes(min(255, v + 20) for v in rgb)
    other = _gradient_rgb(w, h, fx=90, fy=3)[::-1]
    rows = [
        ("base", make_test_media("bmp", w, h, pixels=rgb)),
        ("scaled", make_test_media("bmp", w * 2, h * 2, pixels=big)),
        ("bright", make_test_media("bmp", w, h, pixels=dim)),
        ("other", make_test_media("bmp", w, h, pixels=bytes(other))),
    ]
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in rows], "media_id string, payload binary"
    )
    got = {r.media_id: r.phash for r in image_phash(df).collect()}
    assert _ham(got["base"], got["scaled"]) <= 8
    assert _ham(got["base"], got["bright"]) <= 6
    assert _ham(got["base"], got["other"]) > 16


def test_phash_collides_across_formats(spark):
    import sys
    sys.path.insert(0, "tests")
    from test_multimodal_decode import _png_encode_v2

    w, h = 32, 24
    rgb = _gradient_rgb(w, h)
    df = spark.createDataFrame(
        [
            ("bmp", bytearray(make_test_media("bmp", w, h, pixels=rgb))),
            ("png", bytearray(_png_encode_v2(list(rgb), w, h, color=2))),
        ],
        "media_id string, payload binary",
    )
    got = {r.media_id: r.phash for r in image_phash(df).collect()}
    assert got["bmp"] == got["png"]  # lossless formats: identical pixels


def test_dedup_images_phash_pairs(spark):
    w, h = 24, 24
    a = _gradient_rgb(w, h)
    b = bytes(min(255, v + 10) for v in a)  # near-dup of a
    c = _gradient_rgb(w, h, fx=77, fy=41)
    df = spark.createDataFrame(
        [("1", bytearray(make_test_media("bmp", w, h, pixels=a))),
         ("2", bytearray(make_test_media("bmp", w, h, pixels=b))),
         ("3", bytearray(make_test_media("bmp", w, h, pixels=c)))],
        "media_id string, payload binary",
    )
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in dedup_images_phash(df, max_distance=8).collect()}
    assert ("1", "2") in pairs and pairs[("1", "2")] <= 8
    assert ("1", "3") not in pairs and ("2", "3") not in pairs


def test_extract_features_routes_riff_by_form_type(spark):
    """RIFF is WAVE *and* WEBP: features must route WebP to the image
    path and WAV/FLAC to the audio path."""
    import struct
    import sys

    sys.path.insert(0, "tests")
    from test_multimodal_decode import (
        _flac_encode,
        _flac_test_signal,
        _webp_encode,
    )

    from aws_sdk_pandas_spark.operators.multimodal import extract_features

    w, h = 16, 12
    rgb = bytes((i * 7) % 256 for i in range(w * h * 3))
    chans = _flac_test_signal(300, 1, 16, seed=6)
    pcm = struct.pack(f"<{len(chans[0])}h", *chans[0])
    from aws_sdk_pandas_spark.operators.multimodal import make_test_media

    df = spark.createDataFrame(
        [
            ("webp", bytearray(_webp_encode(rgb, w, h))),
            ("wav", bytearray(make_test_media(
                "wav", sample_rate=16000, channels=1, bits=16, data=pcm))),
            ("flac", bytearray(_flac_encode(chans, 16000, 16))),
        ],
        "media_id string, payload binary",
    )
    rows = {r.media_id: r.feature for r in extract_features(df, dim=16).collect()}
    assert all(len(v) == 16 for v in rows.values())
    # identical PCM through WAV and FLAC produces the identical histogram
    assert rows["wav"] == rows["flac"]
    # the image histogram is over luminance, not amplitude: different
    assert rows["webp"] != rows["wav"]
