"""salted_join / two_stage_distinct equivalence with the plain formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.skew import salted_join, two_stage_distinct


def _skewed(spark):
    # key 1 is hot (100 rows on each side), others are singletons
    left = spark.range(200).select(
        F.when(F.col("id") < 100, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(150).select(
        F.when(F.col("id") < 100, 1).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 10).alias("rv"),
    )
    return left, right


def test_salted_inner_equals_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"]).groupBy("k").count()
    salted = salted_join(left, right, ["k"], num_salts=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # hot key multiplicity preserved: 100 x 100
    assert dict(map(tuple, salted.collect()))[1] == 10000


def test_salted_left_keeps_unmatched(spark):
    left, right = _skewed(spark)
    salted = salted_join(left, right, ["k"], num_salts=8, how="left")
    plain = left.join(right, ["k"], "left")
    assert salted.count() == plain.count()
    unmatched = salted.where(F.col("rv").isNull()).select("k").distinct().count()
    assert unmatched == plain.where(F.col("rv").isNull()).select("k").distinct().count()


def test_two_stage_distinct_equals_direct(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 13).alias("v")
    )
    direct = {
        (r.k, r.n) for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    staged = {
        (r.k, r.n_distinct_v) for r in two_stage_distinct(df, ["k"], "v").collect()
    }
    assert staged == direct


def test_key_distribution_and_skew_metrics(spark):
    """Heaviest key ranks first with the right share; entropy_norm is 1
    for uniform keys, low for a hot-key column; nulls counted."""
    import math

    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.operators.skew import key_distribution, skew_metrics

    rows = (
        [("hot", i) for i in range(80)]
        + [("warm", i) for i in range(15)]
        + [(f"u{i}", i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "k string, v int")
    top = key_distribution(df, "k", top_k=2).collect()
    assert [(r.rank, r.key, r.n) for r in top] == [(1, "hot", 80), (2, "warm", 15)]
    assert abs(top[0].share - 0.8) < 1e-9

    uniform = spark.createDataFrame([(f"k{i % 10}",) for i in range(100)], "u string")
    m = {r.column: r for r in skew_metrics(uniform, ["u"]).collect()}
    assert abs(m["u"].entropy_norm - 1.0) < 1e-6
    assert abs(m["u"].max_share - 0.1) < 1e-9

    skewed = {r.column: r for r in skew_metrics(df, ["k"]).collect()}
    assert skewed["k"].max_share == 0.8
    assert skewed["k"].entropy_norm < 0.5
    # manual entropy cross-check
    n = [80, 15] + [1] * 5
    tot = sum(n)
    h = -sum(x / tot * math.log(x / tot) for x in n) / math.log(len(n))
    assert abs(skewed["k"].entropy_norm - round(h, 6)) < 1e-6

    withnull = spark.createDataFrame([("a",), (None,), (None,)], "k string")
    mn = skew_metrics(withnull, ["k"]).collect()[0]
    assert mn.n_nulls == 2 and mn.n_distinct == 1
