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
