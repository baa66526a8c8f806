"""IVF ANN: recall against brute force, and the probe-prunes-corpus property."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.similarity import (
    build_ivf_index,
    knn_brute_force,
    knn_ivf,
)
from aws_sdk_pandas_spark.sources import read_parquet


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id = 0").select("embedding").first()[0]
    corpus = emb.where("vec_id <> 0")

    exact = {
        r.vec_id
        for r in knn_brute_force(
            corpus, q, k=10, id_col="vec_id", vector_col="embedding"
        ).collect()
    }
    assigned, centroids = build_ivf_index(
        corpus, vector_col="embedding", n_clusters=8
    )
    approx = {
        r.vec_id
        for r in knn_ivf(
            assigned, centroids, q, k=10, id_col="vec_id",
            vector_col="embedding", n_probe=4,
        ).collect()
    }
    # probing half the clusters must recover most of the true top-10
    assert len(exact & approx) >= 6


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id = 0").select("embedding").first()[0]
    corpus = emb.where("vec_id <> 0")
    assigned, centroids = build_ivf_index(corpus, vector_col="embedding", n_clusters=8)
    exact = [
        (r.vec_id, r.distance)
        for r in knn_brute_force(
            corpus, q, k=5, id_col="vec_id", vector_col="embedding"
        ).collect()
    ]
    full = [
        (r.vec_id, r.distance)
        for r in knn_ivf(
            assigned, centroids, q, k=5, id_col="vec_id",
            vector_col="embedding", n_probe=8,
        ).collect()
    ]
    assert full == exact  # probing every cluster = exact search


def test_pq_refined_recall_vs_brute_force(spark, sf_dir):
    from aws_sdk_pandas_spark.operators.similarity import build_pq_index, knn_pq

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id = 7").select("embedding").first()[0]
    corpus = emb.where("vec_id <> 7")

    exact = {
        r.vec_id
        for r in knn_brute_force(
            corpus, q, k=10, id_col="vec_id", vector_col="embedding"
        ).collect()
    }
    enc, cb = build_pq_index(corpus, id_col="vec_id", vector_col="embedding", m=8, bits=6)
    # raw ADC never touches the floats; refined re-ranks a k*factor sliver
    refined = [
        r.vec_id
        for r in knn_pq(
            enc, cb, q, k=10, id_col="vec_id",
            refine_vector_col="embedding", refine_factor=8,
        ).collect()
    ]
    assert len(refined) == 10
    assert len(exact & set(refined)) >= 8  # >= 0.8 recall with refine

    # codebook shape: m tables of 2^bits x dim/m
    assert len(cb) == 8 and all(len(t[0]) == 8 for t in cb)
    # encode is deterministic: same seed -> same codes
    enc2, cb2 = build_pq_index(corpus, id_col="vec_id", vector_col="embedding", m=8, bits=6)
    assert cb == cb2


def test_pq_self_query_ranks_itself_first(spark, sf_dir):
    from aws_sdk_pandas_spark.operators.similarity import build_pq_index, knn_pq

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet").limit(100)
    q = emb.where("vec_id = 3").select("embedding").first()[0]
    enc, cb = build_pq_index(emb, id_col="vec_id", vector_col="embedding", m=8, bits=6)
    top = knn_pq(
        enc, cb, q, k=1, id_col="vec_id", refine_vector_col="embedding"
    ).collect()
    assert top[0].vec_id == 3 and top[0].distance <= 1e-6


def test_ivf_pq_recall_and_pruning(spark, sf_dir):
    from aws_sdk_pandas_spark.operators.similarity import (
        build_ivf_pq_index,
        knn_ivf_pq,
    )

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id = 11").select("embedding").first()[0]
    corpus = emb.where("vec_id <> 11")
    exact = {
        r.vec_id
        for r in knn_brute_force(
            corpus, q, k=5, id_col="vec_id", vector_col="embedding"
        ).collect()
    }
    enc, cents, cbs = build_ivf_pq_index(
        corpus, id_col="vec_id", vector_col="embedding", n_clusters=8, m=8, bits=6
    )
    enc = enc.persist()
    # full probe + refine must recover most of the exact set
    got = [
        r.vec_id
        for r in knn_ivf_pq(
            enc, cents, cbs, q, k=5, id_col="vec_id", n_probe=8,
            refine_vector_col="embedding", refine_factor=8,
        ).collect()
    ]
    assert len(exact & set(got)) >= 4
    # probing fewer clusters scans strictly fewer rows
    n_all = enc.count()
    n_probe2 = enc.where(
        F.col("__cluster").isin(
            [c for c, _ in cents][:2]
        )
    ).count()
    assert n_probe2 < n_all
