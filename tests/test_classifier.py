"""Trainable fastText-style quality classifier: featurization laws,
planted-signal learning, dirty-input contract, numpy replay,
save/load."""
import numpy as np
import pytest

from aws_sdk_pandas_spark.operators.classifier import (
    apply_text_classifier,
    hashed_text_features,
    load_text_classifier,
    save_text_classifier,
    train_text_classifier,
)


def _toy_corpus(spark, n=120, seed=5):
    """Half 'quality' docs (clean vocabulary), half spam (spam tokens
    mixed into the same base vocabulary) — a planted, learnable
    signal."""
    import random

    rng = random.Random(seed)
    base = ["data", "table", "query", "merge", "window", "filter",
            "column", "sort", "batch", "stream"]
    spam = ["viagra", "lottery", "winner", "casino"]
    rows = []
    for i in range(n):
        good = i % 2 == 0
        words = [rng.choice(base) for _ in range(12)]
        if not good:
            words[::3] = [rng.choice(spam) for _ in words[::3]]
        rows.append((i, " ".join(words), 1 if good else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_hashed_features_law(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("  Hello   World  ",), ("hello world",), ("one",), ("",),
         ("   ",), (None,)],
        "text string",
    )
    got = df.select(
        hashed_text_features("text", dim=1 << 16).alias("f")
    ).collect()
    # case/whitespace-insensitive: first two rows identical features
    assert sorted(got[0].f) == sorted(got[1].f)
    # unigrams + one bigram for a 2-token doc, distinct
    assert len(got[0].f) == 3
    # single token: no bigram
    assert len(got[2].f) == 1
    # blank -> empty, NULL -> NULL
    assert got[3].f == [] and got[4].f == []
    assert got[5].f is None
    # ids match xxhash64 pmod dim computed independently
    expect = {
        r.h
        for r in spark.createDataFrame(
            [("hello",), ("world",), ("hello world",)], "g string"
        ).select(F.pmod(F.xxhash64("g"), F.lit(1 << 16)).alias("h")).collect()
    }
    assert set(got[0].f) == expect
    # every id in range
    assert all(0 <= f < (1 << 16) for f in got[0].f)


def test_classifier_learns_planted_signal(spark):
    df = _toy_corpus(spark, n=160)
    train = df.where("doc_id % 10 < 8")
    test = df.where("doc_id % 10 >= 8")  # both parities held out
    model = train_text_classifier(
        train, dim=1 << 14, iterations=30, learning_rate=2.0
    )
    scored = apply_text_classifier(test, model).collect()
    pos = [r.quality_score for r in scored if r.label == 1]
    neg = [r.quality_score for r in scored if r.label == 0]
    assert min(pos) > max(neg)  # perfect separation on the held-out split
    assert sum(pos) / len(pos) > 0.7
    assert sum(neg) / len(neg) < 0.3


def test_classifier_dirty_input_contract(spark):
    df = _toy_corpus(spark, n=40)
    model = train_text_classifier(df, dim=1 << 13, iterations=5)
    dirty = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "data table query")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.quality_score for r in
           apply_text_classifier(dirty, model).collect()}
    assert got[1] is None  # NULL text -> NULL score, row kept
    prior = 1.0 / (1.0 + np.exp(-model.bias))
    assert got[2] == pytest.approx(prior) and got[3] == pytest.approx(prior)
    assert got[4] is not None and got[4] != pytest.approx(prior)
    # training refuses when nothing is labeled 0/1
    from aws_sdk_pandas_spark.exceptions import InvalidArgument

    unlabeled = spark.createDataFrame(
        [(1, "x", None)], "doc_id long, text string, label int"
    )
    with pytest.raises(InvalidArgument, match="no trainable rows"):
        train_text_classifier(unlabeled, dim=1 << 13, iterations=1)


def test_classifier_matches_numpy_replay(spark):
    """The distributed optimizer must match a serial numpy replay of
    the same full-batch updates on the same feature sets."""
    df = _toy_corpus(spark, n=60, seed=9)
    dim, iters, lr, l2 = 1 << 12, 8, 1.0, 1e-6
    model = train_text_classifier(
        df, dim=dim, iterations=iters, learning_rate=lr, l2=l2
    )
    rows = df.select(
        "label", hashed_text_features("text", dim=dim).alias("f")
    ).collect()
    ys = np.array([r.label for r in rows], np.float64)
    feats = [np.array(sorted(r.f), np.int64) for r in rows]
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        s = np.array([w[f].sum() for f in feats]) + b
        p = 1.0 / (1.0 + np.exp(-s))
        r = p - ys
        g = np.zeros(dim)
        for ri, f in zip(r, feats):
            g[f] += ri
        w -= lr * (g / len(ys) + l2 * w)
        b -= lr * r.mean()
    assert np.abs(model.weights - w).max() < 1e-9
    assert abs(model.bias - b) < 1e-9


def test_classifier_partitioning_invariance(spark):
    df = _toy_corpus(spark, n=80, seed=11)
    m1 = train_text_classifier(df.repartition(1), dim=1 << 13, iterations=6)
    m2 = train_text_classifier(df.repartition(7), dim=1 << 13, iterations=6)
    assert np.abs(m1.weights - m2.weights).max() < 1e-9
    assert abs(m1.bias - m2.bias) < 1e-9


def test_classifier_save_load_roundtrip(spark, tmp_path):
    df = _toy_corpus(spark, n=40)
    model = train_text_classifier(df, dim=1 << 13, iterations=4)
    path = str(tmp_path / "clf.npz")
    save_text_classifier(model, path)
    back = load_text_classifier(path)
    assert (back.weights == model.weights).all()
    assert back.bias == model.bias and back.dim == model.dim
    a = apply_text_classifier(df, model).orderBy("doc_id").collect()
    bb = apply_text_classifier(df, back).orderBy("doc_id").collect()
    assert [r.quality_score for r in a] == [r.quality_score for r in bb]
