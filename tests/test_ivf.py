"""IVF ANN: recall against brute force, and the probe-prunes-corpus property."""

from __future__ import annotations

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
