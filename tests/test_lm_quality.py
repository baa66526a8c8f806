"""N-gram LM perplexity quality scoring (operators/lm_quality.py):
serial recompute of the exact add-alpha math, top-k cap determinism,
dirty-corpus row preservation, and the CCNet-style filter contract."""

from __future__ import annotations

import math

import pytest

from aws_sdk_pandas_spark.operators.lm_quality import (
    NgramLM,
    filter_by_perplexity,
    perplexity,
    train_bigram_lm,
)


def _toks(s):
    return [t.lower() for t in s.strip().split() if t]


def _serial_model(texts, k1, k2):
    uni, big = {}, {}
    for s in texts:
        w = _toks(s)
        for t in w:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    uni_kept = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:k1])
    big_kept = dict(sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:k2])
    return uni_kept, big_kept


def _serial_xent(text, uni, big, v, alpha):
    w = _toks(text)
    if len(w) < 2:
        return None
    lps = [
        math.log(
            (big.get((a, b), 0) + alpha) / (uni.get(a, 0) + alpha * v)
        )
        for a, b in zip(w, w[1:])
    ]
    return -sum(lps) / len(lps)


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat ate the fish",
    "a dog and a cat",
]
SCORE = [
    (0, "the cat sat on the mat"),        # in-domain
    (1, "the dog ate the fish"),          # composed of seen grams
    (2, "zyx qwv plk mno"),               # out-of-vocabulary gibberish
    (3, "the the the the"),               # degenerate repetition
]


def test_perplexity_matches_serial_recompute(spark):
    train = spark.createDataFrame([(i, t) for i, t in enumerate(TRAIN)], "doc_id int, text string")
    lm = train_bigram_lm(train, "text", top_k_unigrams=1000, top_k_bigrams=1000, alpha=0.1)
    uni, big = _serial_model(TRAIN, 1000, 1000)
    assert lm.vocab_size == len(uni)
    assert {(r.w1, r.c1) for r in lm.unigrams.collect()} == set(uni.items())
    assert {((r.w1, r.w2), r.c2) for r in lm.bigrams.collect()} == set(big.items())

    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    got = {r.doc_id: (r.ppl_xent, r.ppl) for r in perplexity(docs, lm).collect()}
    for i, t in SCORE:
        want = _serial_xent(t, uni, big, len(uni), 0.1)
        assert got[i][0] == pytest.approx(want, rel=1e-9)
        assert got[i][1] == pytest.approx(math.exp(want), rel=1e-9)
    # in-domain text must out-score OOV gibberish by a wide margin
    assert got[0][1] < got[2][1] / 2


def test_top_k_cap_is_deterministic_and_binds(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id int, text string"
    )
    k1, k2 = 5, 6
    uni, big = _serial_model(TRAIN, k1, k2)
    for n_parts in (1, 3):
        lm = train_bigram_lm(
            train.repartition(n_parts), "text",
            top_k_unigrams=k1, top_k_bigrams=k2,
        )
        assert lm.vocab_size == k1
        assert {(r.w1, r.c1) for r in lm.unigrams.collect()} == set(uni.items())
        assert {((r.w1, r.w2), r.c2) for r in lm.bigrams.collect()} == set(
            big.items()
        )


def test_dirty_corpus_rows_survive_with_null_scores(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id int, text string"
    )
    lm = train_bigram_lm(train, "text")
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, None),            # NULL text
            (2, ""),              # empty
            (3, "   \t  "),       # whitespace only
            (4, "single"),        # one token: no bigram
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in perplexity(docs, lm).collect()}
    assert sorted(got) == [0, 1, 2, 3, 4]  # every row survives
    assert got[0].ppl is not None and got[0].ppl_n_bigrams == 5
    for i in (1, 2, 3, 4):
        assert got[i].ppl is None and got[i].ppl_xent is None

    kept = filter_by_perplexity(docs, lm, max_ppl=1e9).collect()
    assert [r.doc_id for r in kept] == [0]  # unscored dropped by default
    kept2 = filter_by_perplexity(docs, lm, max_ppl=1e9, keep_unscored=True)
    assert sorted(r.doc_id for r in kept2.collect()) == [0, 1, 2, 3, 4]
    # the filter removes its scratch columns
    assert set(kept2.columns) == {"doc_id", "text"}


def test_filter_threshold_orders_by_domain_fit(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id int, text string"
    )
    lm = train_bigram_lm(train, "text")
    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    scored = {r.doc_id: r.ppl for r in perplexity(docs, lm).collect()}
    cut = (scored[0] + scored[2]) / 2
    kept = sorted(
        r.doc_id
        for r in filter_by_perplexity(docs, lm, max_ppl=cut).collect()
    )
    assert 0 in kept and 2 not in kept


def test_empty_model_refused(spark):
    empty = spark.createDataFrame([], "doc_id int, text string")
    lm = train_bigram_lm(empty, "text")
    docs = spark.createDataFrame([(0, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="empty vocabulary"):
        perplexity(docs, lm)
    assert isinstance(lm, NgramLM) and lm.vocab_size == 0
