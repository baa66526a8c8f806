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
