"""Sketch aggregates: accuracy bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.functions.sketches import (
    approx_distinct,
    approx_percentile_col,
    approx_quantiles,
    frequent_items,
)


def test_approx_distinct_within_rsd(spark):
    df = spark.range(100_000).selectExpr("CAST(id % 9173 AS STRING) AS k")
    got = df.agg(approx_distinct("k", rsd=0.02).alias("n")).first().n
    assert abs(got - 9173) / 9173 < 0.06  # 3x rsd


def test_approx_quantiles_close_to_exact(spark):
    df = spark.range(50_000).selectExpr("CAST(id AS DOUBLE) AS v")
    q25, q50, q99 = approx_quantiles(df, "v", [0.25, 0.5, 0.99], relative_error=0.001)
    assert abs(q25 - 12_500) < 200
    assert abs(q50 - 25_000) < 200
    assert abs(q99 - 49_500) < 300


def test_approx_percentile_col_in_groupby(spark):
    df = spark.range(10_000).selectExpr("id % 2 AS g", "CAST(id AS DOUBLE) AS v")
    rows = {
        r.g: r.p50
        for r in df.groupBy("g")
        .agg(approx_percentile_col("v", 0.5).alias("p50"))
        .collect()
    }
    assert abs(rows[0] - 5_000) < 120 and abs(rows[1] - 5_000) < 120


def test_frequent_items_finds_heavy_hitter(spark):
    df = spark.range(10_000).selectExpr(
        "CASE WHEN id % 10 < 4 THEN 'hot' ELSE CAST(id AS STRING) END AS k"
    )
    freq = frequent_items(df, ["k"], support=0.3).first()[0]
    assert "hot" in freq


def test_weighted_quantile_exact(spark):
    """Lower weighted quantile: heavy row dominates the median; q=1.0 is
    the max; zero/null weights ignored."""
    import pytest

    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    from aws_sdk_pandas_spark.operators.aggregates import weighted_quantile

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 8.0),
         ("b", 10.0, 1.0), ("b", 20.0, 0.0), ("b", 30.0, None)],
        "g string, v double, w double",
    )
    got = {r.g: r.wq_v for r in weighted_quantile(df, ["g"], "v", "w", 0.5).collect()}
    assert got == {"a": 3.0, "b": 10.0}
    top = {r.g: r.wq_v for r in weighted_quantile(df, ["g"], "v", "w", 1.0).collect()}
    assert top == {"a": 3.0, "b": 10.0}
    with pytest.raises(InvalidArgument):
        weighted_quantile(df, ["g"], "v", "w", 0.0)


# ------------------------------------------------- incremental aggregation
def test_incremental_aggregate_equals_full_recompute(spark):
    from aws_sdk_pandas_spark.operators.aggregates import (
        finalize_aggregates,
        merge_aggregates,
        partial_aggregate,
    )

    df = spark.createDataFrame(
        [(i % 4, float(i), float(-i) if i % 5 else None) for i in range(200)],
        "g int, a double, b double",
    )
    metrics = {"a": ["sum", "avg", "max"], "b": ["min", "count"]}
    # three arriving batches aggregated independently, then merged
    batches = [df.where(F.col("a") % 3 == k) for k in range(3)]
    states = [partial_aggregate(b, ["g"], metrics) for b in batches]
    merged = finalize_aggregates(merge_aggregates(states, ["g"]), metrics, ["g"])
    direct = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("a_sum"),
        F.avg("a").alias("a_avg"),
        F.max("a").alias("a_max"),
        F.min("b").alias("b_min"),
        F.count("b").alias("b_count"),
    )
    got = {r.g: r.asDict() for r in merged.collect()}
    want = {r.g: r.asDict() for r in direct.collect()}
    assert got == want


def test_partial_aggregate_rejects_non_mergeable(spark):
    import pytest as _pytest
    from aws_sdk_pandas_spark.operators.aggregates import partial_aggregate

    df = spark.createDataFrame([(1, 2.0)], "g int, a double")
    with _pytest.raises(ValueError, match="non-mergeable"):
        partial_aggregate(df, ["g"], {"a": ["median"]})


def test_kmv_exact_below_k(spark):
    """Unsaturated sketches are exact for counts, union AND intersection."""
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.functions.sketches import (
        kmv_estimate,
        kmv_set_ops,
        kmv_sketch,
    )

    a = spark.range(0, 50).select(F.col("id").alias("k"))
    b = spark.range(30, 110).select(F.col("id").alias("k"))  # overlap = 20
    sa = kmv_sketch(a, "k", k=256)
    sb = kmv_sketch(b, "k", k=256)
    assert kmv_estimate(sa, k=256).first().est_distinct == 50.0
    r = kmv_set_ops(sa, sb, k=256).first()
    assert (r.est_a, r.est_b, r.est_union, r.est_intersection) == (50.0, 80.0, 110.0, 20.0)
    assert abs(r.est_jaccard - 20.0 / 110.0) < 1e-12


def test_kmv_estimate_accuracy_saturated(spark):
    """10k distinct keys, k=256: estimate within ~4 standard errors
    (1/sqrt(k-2) ~ 6.3%); union/intersection track a 50% overlap."""
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.functions.sketches import (
        kmv_estimate,
        kmv_set_ops,
        kmv_sketch,
    )

    n = 10_000
    a = spark.range(0, n).select(F.col("id").alias("k"))
    b = spark.range(n // 2, n + n // 2).select(F.col("id").alias("k"))
    sa = kmv_sketch(a, "k", k=256)
    sb = kmv_sketch(b, "k", k=256)
    est = kmv_estimate(sa, k=256).first().est_distinct
    assert abs(est - n) / n < 0.25
    r = kmv_set_ops(sa, sb, k=256).first()
    assert abs(r.est_union - 1.5 * n) / (1.5 * n) < 0.25
    assert abs(r.est_intersection - 0.5 * n) / (0.5 * n) < 0.35
    assert 0.15 < r.est_jaccard < 0.55  # true jaccard = 1/3


def test_kmv_grouped_and_deterministic(spark):
    """Per-group sketches ride one frame; md5 derivation makes reruns
    byte-identical."""
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.functions.sketches import kmv_sketch

    df = spark.createDataFrame(
        [("g1", i) for i in range(30)] + [("g2", i) for i in range(5)],
        "g string, k int",
    )
    s1 = kmv_sketch(df, "k", by=["g"], k=16).orderBy("g").collect()
    s2 = kmv_sketch(df.repartition(7), "k", by=["g"], k=16).orderBy("g").collect()
    assert [r.hashes for r in s1] == [r.hashes for r in s2]
    assert {r.g: r.n_kept for r in s1} == {"g1": 16, "g2": 5}


def test_incremental_hll_distinct_equals_direct(spark):
    """Daily partial HLL states merged across days give EXACTLY the
    estimate of aggregating the raw history directly (register-wise
    max is order/partition-independent)."""
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.operators.aggregates import (
        finalize_aggregates,
        merge_aggregates,
        partial_aggregate,
    )

    rows = [("g", d, f"u{i % 37}") for d in range(3) for i in range(d * 10, d * 10 + 50)]
    df = spark.createDataFrame(rows, "g string, day int, user string")
    metrics = {"user": ["approx_distinct", "count"]}
    states = [
        partial_aggregate(df.where(F.col("day") == d), ["g"], metrics)
        for d in range(3)
    ]
    merged = merge_aggregates(states, ["g"])
    inc = finalize_aggregates(merged, metrics, ["g"]).collect()[0]
    direct = finalize_aggregates(
        partial_aggregate(df, ["g"], metrics), metrics, ["g"]
    ).collect()[0]
    assert inc.user_approx_distinct == direct.user_approx_distinct
    assert inc.user_count == direct.user_count == 150
    # 37 true distincts: HLL at default precision is exact at this size
    assert inc.user_approx_distinct == 37
