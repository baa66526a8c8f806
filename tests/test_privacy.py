"""k-anonymity audit/enforcement + deterministic-noise DP release."""
import math

import pytest

from aws_sdk_pandas_spark.exceptions import InvalidArgument
from aws_sdk_pandas_spark.operators.privacy import (
    dp_aggregate,
    suppress_small_classes,
)


def _people(spark):
    rows = [
        # (zip, age_band, disease) — class sizes: (10001,30s):3,
        # (10001,40s):1, (10002,30s):2, (NULL,30s):2
        (1, "10001", "30s", "flu"),
        (2, "10001", "30s", "flu"),
        (3, "10001", "30s", "cold"),
        (4, "10001", "40s", "flu"),
        (5, "10002", "30s", "cold"),
        (6, "10002", "30s", "cold"),
        (7, None, "30s", "flu"),
        (8, None, "30s", None),
    ]
    return spark.createDataFrame(
        rows, "id long, zip string, age_band string, disease string"
    )


def test_suppress_small_classes_modes(spark):
    df = _people(spark)
    kept = suppress_small_classes(df, ["zip", "age_band"], k=2)
    ids = sorted(r.id for r in kept.collect())
    assert ids == [1, 2, 3, 5, 6, 7, 8]  # the singleton (id 4) dropped
    # NULL zip forms its own class and survives (size 2)
    nulled = suppress_small_classes(df, ["zip", "age_band"], k=2, mode="null")
    rows = {r.id: r for r in nulled.collect()}
    assert len(rows) == 8  # nothing dropped
    assert rows[4].zip is None and rows[4].age_band is None
    assert rows[1].zip == "10001"
    with pytest.raises(InvalidArgument, match="drop|null"):
        suppress_small_classes(df, ["zip"], mode="redact")


def test_dp_aggregate_deterministic_and_accurate(spark):
    import pyspark.sql.functions as F

    df = spark.range(0, 4000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.lit(1.0).alias("v"),
    )
    a = dp_aggregate(df, ["g"], "v", agg="sum", epsilon=1.0, seed=7)
    b = dp_aggregate(df.repartition(13), ["g"], "v", agg="sum", epsilon=1.0, seed=7)
    ra = {r.g: r.sum_v_dp for r in a.collect()}
    rb = {r.g: r.sum_v_dp for r in b.collect()}
    assert ra == rb  # md5-deterministic: partitioning cannot change a release
    # noise at eps=1, sens=1 is O(1) vs true sums of 1000
    for g, v in ra.items():
        assert abs(v - 1000.0) < 50.0
    # different seed -> different release
    c = {r.g: r.sum_v_dp for r in
         dp_aggregate(df, ["g"], "v", epsilon=1.0, seed=8).collect()}
    assert c != ra
    # count mode + validation
    cc = {r.g: r.count_v_dp for r in
          dp_aggregate(df, ["g"], "v", agg="count", epsilon=0.5, seed=1).collect()}
    assert all(abs(v - 1000.0) < 100.0 for v in cc.values())
    with pytest.raises(InvalidArgument):
        dp_aggregate(df, ["g"], "v", epsilon=0.0)
    with pytest.raises(InvalidArgument):
        dp_aggregate(df, ["g"], "v", agg="avg")


def test_dp_noise_matches_closed_form(spark):
    """The emitted noise must equal the inverse-CDF formula applied to
    the md5 uniform — recomputed here independently."""
    import hashlib

    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a", 10.0), ("b", 20.0)], "g string, v double")
    got = {
        r.g: r.sum_v_dp
        for r in dp_aggregate(
            df, ["g"], "v", epsilon=2.0, sensitivity=3.0, seed=42
        ).collect()
    }
    for g, true in (("a", 10.0), ("b", 20.0)):
        u = int(hashlib.md5(f"{g}:42".encode()).hexdigest()[:8], 16) / 2**32
        c = u - 0.5
        noise = -(3.0 / 2.0) * math.copysign(1.0, c) * math.log(1 - 2 * abs(c))
        assert got[g] == pytest.approx(round(true + noise, 6), abs=1e-6)


def test_dp_laplace_distribution_shape(spark):
    """Across many groups the deterministic noises behave Laplace:
    symmetric, mean ~0, spread ~scale."""
    import numpy as np
    import pyspark.sql.functions as F

    df = spark.range(0, 2000).select(
        F.col("id").cast("string").alias("g"), F.lit(0.0).alias("v")
    )
    vals = np.array([
        r.sum_v_dp
        for r in dp_aggregate(df, ["g"], "v", epsilon=1.0, seed=3).collect()
    ])
    assert abs(float(np.mean(vals))) < 0.15
    # Laplace(0,1): mean |x| = 1
    assert 0.8 < float(np.mean(np.abs(vals))) < 1.2
    assert (vals > 0).mean() == pytest.approx(0.5, abs=0.06)
