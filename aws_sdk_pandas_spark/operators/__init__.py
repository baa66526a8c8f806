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

from aws_sdk_pandas_spark.operators.behavior import (
    cohort_ltv,
    event_transitions,
    rfm_segments,
    rolling_active_users,
    step_latency,
    survival_curve,
    top_paths,
    window_funnel,
)
from aws_sdk_pandas_spark.operators.evaluation import (
    cohen_kappa,
    krippendorff_alpha,
    apply_isotonic,
    binary_metrics,
    calibration_curve,
    confusion_at,
    fit_isotonic,
    lift_curve,
    roc_curve,
)
from aws_sdk_pandas_spark.operators.features import (
    frequency_encode,
    target_encode,
    woe_iv,
)
from aws_sdk_pandas_spark.operators.itemsets import item_similarity
from aws_sdk_pandas_spark.operators.skyline import pareto_front
from aws_sdk_pandas_spark.operators.stats import (
    ab_test,
    apply_conformal,
    apply_ols,
    benford_test,
    bootstrap_ci,
    chi_square_test,
    cuped_adjust,
    diff_in_diff,
    fdr_correct,
    anova_oneway,
    kruskal_wallis,
    spearman_corr,
    fit_conformal,
    fit_ols,
    gini_coefficient,
    apdex,
    effective_sample_size,
    ks_test,
    mann_whitney_u,
    mutual_information,
    ratio_ab_test,
)
from aws_sdk_pandas_spark.operators.timeseries import (
    burst_detect,
    burstiness,
    forecast_accuracy,
    holt_winters,
    p_chart,
    rolling_corr,
)
from aws_sdk_pandas_spark.operators.sampling import balance_classes
from aws_sdk_pandas_spark.operators.similarity import diverse_subset

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
    "cohort_ltv",
    "event_transitions",
    "rfm_segments",
    "rolling_active_users",
    "step_latency",
    "survival_curve",
    "top_paths",
    "window_funnel",
    "apply_isotonic",
    "binary_metrics",
    "cohen_kappa",
    "krippendorff_alpha",
    "calibration_curve",
    "confusion_at",
    "fit_isotonic",
    "lift_curve",
    "roc_curve",
    "frequency_encode",
    "target_encode",
    "woe_iv",
    "item_similarity",
    "pareto_front",
    "ab_test",
    "apply_conformal",
    "apply_ols",
    "benford_test",
    "bootstrap_ci",
    "chi_square_test",
    "cuped_adjust",
    "diff_in_diff",
    "fdr_correct",
    "fit_conformal",
    "fit_ols",
    "gini_coefficient",
    "ks_test",
    "mann_whitney_u",
    "mutual_information",
    "burst_detect",
    "burstiness",
    "forecast_accuracy",
    "holt_winters",
    "p_chart",
    "balance_classes",
    "diverse_subset",
    "apdex",
    "effective_sample_size",
    "ratio_ab_test",
    "anova_oneway",
    "kruskal_wallis",
    "spearman_corr",
    "rolling_corr",
]
