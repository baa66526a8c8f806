"""Corpus drift: divergence laws (identity -> 0, symmetry of JS,
disjoint corpora -> near-max), numpy cross-check of the smoothed math,
and bucket boundedness."""

from __future__ import annotations

import math

import numpy as np

from aws_sdk_pandas_spark.operators.drift import corpus_divergence, gram_bucket_counts

DOCS_A = [
    ("a1", "spark shuffles data across the cluster nodes"),
    ("a2", "the optimizer prunes partitions before any scan"),
    ("a3", "broadcast joins avoid shuffling the large table"),
]
DOCS_B = [
    ("b1", "recipes for sourdough bread need patient kneading"),
    ("b2", "the oven temperature controls the crust color"),
    ("b3", "flour water salt and starter make the dough"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_identical_corpora_zero_divergence(spark):
    a = _df(spark, DOCS_A)
    out = corpus_divergence(a, a, buckets=64).collect()
    assert out
    assert all(r.js == 0.0 and r.psi == 0.0 for r in out)
    assert all(r.n_a == r.n_b for r in out)


def test_js_symmetry_and_disjoint_divergence(spark):
    a, b = _df(spark, DOCS_A), _df(spark, DOCS_B)
    ab = {r.bucket: (r.js, r.psi) for r in corpus_divergence(a, b, buckets=64).collect()}
    ba = {r.bucket: (r.js, r.psi) for r in corpus_divergence(b, a, buckets=64).collect()}
    assert set(ab) == set(ba)
    for k in ab:
        assert abs(ab[k][0] - ba[k][0]) < 1e-12  # JS symmetric
        assert abs(ab[k][1] - ba[k][1]) < 1e-12  # PSI symmetric by construction
    js_total = sum(v[0] for v in ab.values())
    assert 0.01 < js_total <= math.log(2) + 1e-9  # disjoint content: well away from 0


def test_matches_numpy_recompute(spark):
    a, b = _df(spark, DOCS_A), _df(spark, DOCS_B)
    B, alpha = 64, 1.0
    ca = {r.bucket: r.n for r in gram_bucket_counts(a, buckets=B).collect()}
    cb = {r.bucket: r.n for r in gram_bucket_counts(b, buckets=B).collect()}
    got = {r.bucket: r for r in corpus_divergence(a, b, buckets=B).collect()}
    ta, tb = sum(ca.values()), sum(cb.values())
    for k in set(ca) | set(cb):
        p = (ca.get(k, 0) + alpha) / (ta + alpha * B)
        q = (cb.get(k, 0) + alpha) / (tb + alpha * B)
        m = (p + q) / 2
        js = (p * np.log(p / m) + q * np.log(q / m)) / 2
        psi = (p - q) * np.log(p / q)
        assert abs(got[k].js - round(js, 8)) < 1e-9
        assert abs(got[k].psi - round(psi, 8)) < 1e-9
        assert got[k].n_a == ca.get(k, 0) and got[k].n_b == cb.get(k, 0)


def test_bucket_bound(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    en = docs.where("lang = 'en'")
    fr = docs.where("lang = 'fr'")
    out = corpus_divergence(en, fr, buckets=128)
    assert out.count() <= 128
    psi_total = sum(r.psi for r in out.collect())
    assert psi_total > 0  # different languages genuinely diverge
