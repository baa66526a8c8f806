"""Property tests (hypothesis) for the pure driver-side kernels of the
new operators: Bloom sizing laws and the BPE encode round-trip.  These
run without Spark — hundreds of cases per second."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_sdk_pandas_spark.operators.bloom import _size_for
from aws_sdk_pandas_spark.operators.bpe import END_OF_WORD, _encode_word, decode_bpe


@given(n=st.integers(min_value=1, max_value=10**9), fpp=st.floats(min_value=1e-6, max_value=0.5))
@settings(max_examples=300, deadline=None)
def test_bloom_sizing_laws(n, fpp):
    m, k = _size_for(n, fpp)
    assert m % 64 == 0 and m > 0
    assert 1 <= k <= 8
    # enough bits for the theoretical optimum (unless clamped by whole-word rounding)
    assert m >= -n * math.log(fpp) / (math.log(2) ** 2) - 64


@given(n=st.integers(min_value=1, max_value=10**6))
@settings(max_examples=100, deadline=None)
def test_bloom_sizing_monotone_in_fpp(n):
    m1, _ = _size_for(n, 0.1)
    m2, _ = _size_for(n, 0.01)
    m3, _ = _size_for(n, 0.001)
    assert m1 <= m2 <= m3  # stricter fpp never shrinks the filter


_words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
    min_size=1,
    max_size=24,
)


@given(word=_words, data=st.data())
@settings(max_examples=300, deadline=None)
def test_bpe_encode_roundtrip_any_merges(word, data):
    """For ANY word and ANY merge list built from its own substrings,
    the greedy encode must concatenate back to word + marker, and every
    token must be non-empty."""
    # derive a deterministic pseudo-random merge list from the word
    syms = list(word) + [END_OF_WORD]
    merges = []
    h = int(hashlib.md5(word.encode()).hexdigest(), 16)
    cur = list(syms)
    for _ in range(data.draw(st.integers(min_value=0, max_value=8))):
        if len(cur) < 2:
            break
        i = h % (len(cur) - 1)
        h //= max(len(cur) - 1, 1) or 1
        pair = (cur[i], cur[i + 1])
        merges.append(pair)
        cur[i : i + 2] = [cur[i] + cur[i + 1]]
    ranks = {p: r for r, p in enumerate(merges)}
    toks = _encode_word(word, ranks)
    assert all(toks)
    assert "".join(toks) == word + END_OF_WORD
    assert decode_bpe(toks) == word


@given(
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
    fmt=st.sampled_from(["png", "gif", "jpeg", "bmp"]),
)
@settings(max_examples=200, deadline=None)
def test_media_header_synth_parse_roundtrip(w, h, fmt):
    """make_test_media -> header parse is the identity for any
    dimensions each container can express (GIF/JPEG are uint16-bound;
    PNG/BMP u32/i32)."""
    from aws_sdk_pandas_spark.operators.multimodal import (
        _jpeg_dims_py,
        make_test_media,
    )

    b = make_test_media(fmt, w, h)
    if fmt == "jpeg":
        assert _jpeg_dims_py(b) == (w, h)
        return
    # fixed-offset formats: decode with the same integer arithmetic the
    # JVM expressions implement
    if fmt == "png":
        assert int.from_bytes(b[16:20], "big") == w
        assert int.from_bytes(b[20:24], "big") == h
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
    elif fmt == "gif":
        assert int.from_bytes(b[6:8], "little") == w
        assert int.from_bytes(b[8:10], "little") == h
    elif fmt == "bmp":
        assert int.from_bytes(b[18:22], "little", signed=True) == w
        assert int.from_bytes(b[22:26], "little", signed=True) == h


@given(
    sr=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    ch=st.integers(min_value=1, max_value=8),
    bits=st.sampled_from([8, 16, 24, 32]),
    n_frames=st.integers(min_value=0, max_value=100_000),
)
@settings(max_examples=100, deadline=None)
def test_wav_chunk_walk_roundtrip(sr, ch, bits, n_frames):
    from aws_sdk_pandas_spark.operators.multimodal import (
        _wav_meta_py,
        make_test_media,
    )

    b = make_test_media("wav", sample_rate=sr, channels=ch, bits=bits, n_frames=n_frames)
    got = _wav_meta_py(b)
    assert got is not None
    g_ch, g_sr, g_bits, g_dur = got
    assert (g_ch, g_sr, g_bits) == (ch, sr, bits)
    byte_rate = sr * ch * bits // 8
    data_len = n_frames * ch * bits // 8
    expect_dur = (data_len * 1000 // byte_rate) if data_len else None
    assert g_dur == expect_dur


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=400, unique=True),
    k=st.sampled_from([16, 64, 256]),
)
@settings(max_examples=50, deadline=None)
def test_kmv_estimator_laws(keys, k):
    """Pure-python KMV replica: exact below k; saturated estimate within
    50% for n >= 4k (loose law bound — tighter accuracy is pinned
    statistically in test_sketches); estimator is scale-free in the
    hash domain."""
    import hashlib as _h

    hashes = sorted(
        int(_h.md5(f"{x}:0".encode()).hexdigest()[:13], 16) for x in keys
    )
    bottom = hashes[:k]
    n = len(keys)
    if n < k:
        est = float(len(bottom))
        assert est == n
    else:
        theta = bottom[-1]
        est = (k - 1) * float(2**52) / theta
        if n >= 4 * k:
            assert 0.5 * n < est < 1.5 * n
