"""Corpus drift detection: distribution divergence between two corpus
snapshots (this week's crawl vs last week's, a new source vs the
curated baseline) over hashed n-gram feature buckets.

The monitoring question every continuously-ingesting training pipeline
has to answer — "did the content distribution move?" — reduced to two
bounded aggregations: each corpus collapses to a ``buckets``-sized
md5-hashed gram histogram (the DSIR featurization from
`operators/sampling._hashed_grams` — md5 so ANY engine re-derives the
same buckets from gram strings), then Jensen-Shannon and PSI
contributions come from one full-outer join of the two histograms.
Corpus size only affects the two counting passes; the divergence math
runs on at most ``buckets`` rows.

Every bucket 0..buckets-1 appears in the output, including those
unobserved in both corpora: when the corpora differ in SIZE the
smoothed probabilities of an empty bucket differ too
(alpha/(Ta+alpha*B) vs alpha/(Tb+alpha*B)), so empty buckets carry
real divergence mass — dropping them would bias the JS/PSI totals
low exactly when one snapshot is much larger than the other.

Reference parity: aws-sdk-pandas has no drift surface; this extends its
data-quality family (`wr.data_quality`, reference
awswrangler/data_quality/_create.py) from per-column rule checks to
corpus-level distribution monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_sdk_pandas_spark.operators.sampling import _hashed_grams


def gram_bucket_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    ngrams: tuple = (1, 2),
    buckets: int = 512,
) -> DataFrame:
    """Corpus gram histogram: ``bucket, n`` — one explode + one
    map-side-combinable count, output bounded by ``buckets``."""
    g = _hashed_grams(
        df.select(F.lit(0).alias("__rid"), F.col(text_col)),
        "__rid",
        text_col,
        ngrams,
        buckets,
    )
    return g.groupBy(F.col("__bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


def corpus_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    *,
    text_col: str = "text",
    ngrams: tuple = (1, 2),
    buckets: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket divergence of corpus A vs corpus B: Laplace-smoothed
    probabilities and the Jensen-Shannon / PSI contributions.

    Returns ``bucket, n_a, n_b, p_a, p_b, js, psi`` (rounded; sum the
    ``js`` column for the JS divergence in nats — bounded by ln 2 — and
    ``psi`` for the population-stability index; the usual alert
    thresholds are PSI > 0.1 warn / > 0.25 act).

    Scale shape: the corpora are each read ONCE into a
    ``buckets``-row histogram; the join, window totals, and math all
    run on those bounded frames, so a 100x corpus changes only the two
    counting scans.
    """
    ca = gram_bucket_counts(df_a, text_col=text_col, ngrams=ngrams, buckets=buckets)
    cb = gram_bucket_counts(df_b, text_col=text_col, ngrams=ngrams, buckets=buckets)
    spark = df_a.sparkSession
    all_buckets = spark.range(buckets).select(F.col("id").alias("bucket"))
    j = (
        all_buckets.join(ca.withColumnRenamed("n", "n_a"), "bucket", "left")
        .join(cb.withColumnRenamed("n", "n_b"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    w = Window.partitionBy()  # bounded: at most `buckets` rows
    ta = F.sum("n_a").over(w)
    tb = F.sum("n_b").over(w)
    p = (F.col("n_a") + F.lit(alpha)) / (ta + F.lit(alpha * buckets))
    q = (F.col("n_b") + F.lit(alpha)) / (tb + F.lit(alpha * buckets))
    m = (p + q) / 2
    js = (p * F.log(p / m) + q * F.log(q / m)) / 2
    psi = (p - q) * F.log(p / q)
    return j.select(
        "bucket",
        "n_a",
        "n_b",
        F.round(p, 8).alias("p_a"),
        F.round(q, 8).alias("p_b"),
        F.round(js, 8).alias("js"),
        F.round(psi, 8).alias("psi"),
    )
