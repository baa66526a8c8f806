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


def test_psi_numeric_detects_shift(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.drift import psi_numeric

    rng = np.random.default_rng(67)
    base_v = np.round(rng.normal(50, 10, 2000), 2)
    same_v = np.round(rng.normal(50, 10, 1800), 2)
    shift_v = np.round(rng.normal(58, 14, 1800), 2)
    mk = lambda vs: spark.createDataFrame([(float(v),) for v in vs], "x double")
    base = mk(base_v)

    stable = psi_numeric(base, mk(same_v), value_col="x", n_bins=10).collect()
    shifted = psi_numeric(base, mk(shift_v), value_col="x", n_bins=10).collect()

    # serial recompute for the shifted case
    edges = [round(float(np.percentile(base_v, q * 10, method="linear")), 6)
             for q in range(1, 10)]
    def shares(vs):
        bins = np.searchsorted(edges, vs, side="left")
        # searchsorted 'left': v <= edge -> bin i matches the operator's v <= e
        bins = np.array([next((i for i, e in enumerate(edges) if v <= e), 9)
                         for v in vs])
        return np.bincount(bins, minlength=10) / len(vs)
    sb, sn = shares(base_v), shares(shift_v)
    got = {r.bin: r for r in shifted}
    eps = 1e-6
    for i in range(10):
        assert abs(got[i].share_base - round(float(sb[i]), 6)) < 1e-9
        assert abs(got[i].share_new - round(float(sn[i]), 6)) < 1e-9
        b, n = max(sb[i], eps), max(sn[i], eps)
        assert abs(got[i].psi_contrib - round(float((n - b) * np.log(n / b)), 6)) < 1e-9
    # baseline ~uniform across its own quantile bins
    assert all(abs(r.share_base - 0.1) < 0.03 for r in shifted)
    # the index separates stable from shifted
    assert sum(r.psi_contrib for r in stable) < 0.05
    assert sum(r.psi_contrib for r in shifted) > 0.25
    # bounds carried through
    assert shifted[0].lo is None and shifted[-1].hi is None
