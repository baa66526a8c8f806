"""Relational + pipeline operators: merge/upsert family, deduplication,
similarity search, multimodal column plumbing."""

from __future__ import annotations

from aws_sdk_pandas_spark.operators.dedup import (
    dedup_exact,
    dedup_fingerprint,
    minhash_duplicates,
    ngram_jaccard_duplicates,
    semantic_dedup,
    simhash_signatures,
)
from aws_sdk_pandas_spark.operators.merge import (
    latest_snapshot,
    merge_upsert,
    upsert_dataframe,
)
from aws_sdk_pandas_spark.operators.sampling import dsir_importance_weights
from aws_sdk_pandas_spark.operators.scd import scd2_from_changes
from aws_sdk_pandas_spark.operators.textstats import (
    benchmark_contamination,
    tfidf_top_terms,
)
from aws_sdk_pandas_spark.operators.similarity import (
    knn_brute_force,
    knn_lsh,
    mine_hard_negatives,
    similarity_join,
)
from aws_sdk_pandas_spark.operators.retrieval import bm25_scores, rrf_fuse
from aws_sdk_pandas_spark.operators.timeseries import (
    autocorr,
    cross_corr,
    ewma,
    holt_smoothing,
    rolling_quantile,
    seasonal_decompose,
)
from aws_sdk_pandas_spark.operators.pipeline import build_rag_index, rag_search

__all__ = [
    "autocorr",
    "bm25_scores",
    "build_rag_index",
    "cross_corr",
    "ewma",
    "holt_smoothing",
    "mine_hard_negatives",
    "rag_search",
    "rolling_quantile",
    "rrf_fuse",
    "seasonal_decompose",
    "benchmark_contamination",
    "dedup_exact",
    "dedup_fingerprint",
    "knn_brute_force",
    "knn_lsh",
    "latest_snapshot",
    "merge_upsert",
    "scd2_from_changes",
    "minhash_duplicates",
    "semantic_dedup",
    "dsir_importance_weights",
    "ngram_jaccard_duplicates",
    "simhash_signatures",
    "similarity_join",
    "tfidf_top_terms",
    "upsert_dataframe",
]
