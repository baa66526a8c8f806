"""BM25 scoring + reciprocal-rank fusion (operators/retrieval)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.retrieval import bm25_scores, rrf_fuse


def test_bm25_matches_reference_formula(spark):
    """Engine scores equal an independent pure-python BM25 on a tiny
    corpus (Lucene idf, k1=1.2, b=0.75)."""
    corpus = {
        1: "spark shuffle join spark",
        2: "pandas join frame",
        3: "spark table scan scan scan",
        4: "nothing relevant here",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id int, text string")
    q = ["spark", "join"]

    # reference implementation
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    expect = {}
    for d, tl in toks.items():
        s = 0.0
        for term in q:
            tf = tl.count(term)
            if tf == 0:
                continue
            nt = sum(1 for v in toks.values() if term in v)
            idf = math.log(1 + (n - nt + 0.5) / (nt + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tl) / avgdl))
        if s > 0:
            expect[d] = round(s, 6)

    got = {r.doc_id: r.score for r in bm25_scores(df, q, id_col="doc_id").collect()}
    assert got == expect
    assert 4 not in got  # no query terms -> absent


def test_bm25_top_k_and_case_fold(spark):
    df = spark.createDataFrame(
        [(1, "Spark SPARK spark"), (2, "spark"), (3, "x")], "doc_id int, text string"
    )
    rows = bm25_scores(df, ["SPARK"], top_k=1).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1


def test_rrf_fusion_hybrid(spark):
    """A doc ranked mid-list in BOTH modalities beats one that tops a
    single list — the hybrid-retrieval property; distance lists rank
    ascending."""
    kw = spark.createDataFrame(
        [(10, 5.0), (11, 4.0), (12, 3.0)], "doc_id int, score double"
    )
    vec = spark.createDataFrame(
        [(12, 0.1), (13, 0.2), (11, 0.3)], "doc_id int, distance double"
    )
    out = rrf_fuse([kw, vec], ascending=[False, True]).collect()
    got = {r.doc_id: (r.rrf_score, r.n_lists) for r in out}
    # ranks: kw: 10->1, 11->2, 12->3 ; vec: 12->1, 13->2, 11->3
    assert got[11][0] == round(1 / 62 + 1 / 63, 6) and got[11][1] == 2
    assert got[12][0] == round(1 / 63 + 1 / 61, 6) and got[12][1] == 2
    assert got[10] == (round(1 / 61, 6), 1)
    assert got[13] == (round(1 / 62, 6), 1)
    # both-lists docs outrank single-list docs here
    order = [r.doc_id for r in out]
    assert set(order[:2]) == {11, 12}


def test_rrf_explicit_rank_column(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id int, rank int")
    b = spark.createDataFrame([(2, 1)], "doc_id int, rank int")
    got = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b]).collect()}
    assert got[2] == round(1 / 62 + 1 / 61, 6)
    assert got[1] == round(1 / 61, 6)


def test_ranking_metrics_hand_computed(spark):
    """nDCG/MRR/precision/recall@k against hand-worked values."""
    import math

    from aws_sdk_pandas_spark.operators.retrieval import ranking_metrics

    results = spark.createDataFrame(
        # q1: ranked d1..d4; q2: d9 then d5; q3 retrieves only junk
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3), ("q1", "d4", 4),
         ("q2", "d9", 1), ("q2", "d5", 2),
         ("q3", "dx", 1)],
        "query_id string, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        # q1: d2 rel 2, d3 rel 1, d7 rel 3 (never retrieved)
        [("q1", "d2", 2), ("q1", "d3", 1), ("q1", "d7", 3),
         ("q2", "d5", 1),
         ("q4", "d1", 1)],  # query with judgments but no results
        "query_id string, doc_id string, rel int",
    )
    got = {r.query_id: r for r in
           ranking_metrics(results, qrels, k=3).collect()}

    r1 = got["q1"]
    assert r1.precision_at_k == pytest.approx(2 / 3)
    assert r1.recall_at_k == pytest.approx(2 / 3)
    assert r1.mrr_at_k == pytest.approx(0.5)
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert r1.ndcg_at_k == pytest.approx(dcg / idcg, abs=1e-6)

    r2 = got["q2"]
    assert r2.precision_at_k == pytest.approx(1 / 3)
    assert r2.recall_at_k == pytest.approx(1.0)
    assert r2.mrr_at_k == pytest.approx(0.5)
    assert r2.ndcg_at_k == pytest.approx((1 / math.log2(3)) / 1.0, abs=1e-6)

    # q3: no judged-relevant docs at all -> recall/ndcg NULL, not zero
    r3 = got["q3"]
    assert r3.precision_at_k == 0.0 and r3.mrr_at_k == 0.0
    assert r3.recall_at_k is None and r3.ndcg_at_k is None

    # q4: judged but nothing retrieved -> zeros (and recall 0)
    r4 = got["q4"]
    assert r4.precision_at_k == 0.0 and r4.recall_at_k == 0.0
    assert r4.mrr_at_k == 0.0 and r4.ndcg_at_k == 0.0

    # ranks beyond k are ignored
    deep = ranking_metrics(results, qrels, k=1).collect()
    assert {r.query_id: r.precision_at_k for r in deep}["q1"] == 0.0
