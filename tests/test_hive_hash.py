"""Golden-value tests for the Hive-compatible bucket hash.

Expected values are public Java semantics: String.hashCode
(h = 31*h + c, 32-bit wraparound), Long.hashCode ((v >>> 32) ^ v),
Boolean.hashCode (1231/1237) — the contract the reference ports at
awswrangler/s3/_write_dataset.py:34-72.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_sdk_pandas_spark.functions.hashing import hive_bucket, hive_hash_string


def _java_string_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def test_string_hash_golden(spark):
    cases = ["", "a", "ab", "hello", "Supplier#000000064", "polar bear"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r.s: r.h for r in df.withColumn("h", hive_hash_string(F.col("s"))).collect()}
    for c in cases:
        assert got[c] == _java_string_hash(c), c
    # spot-check the well-known constant
    assert _java_string_hash("hello") == 99162322


def test_long_and_bool_hash(spark):
    df = spark.createDataFrame(
        [(1, (1 << 33) + 5, True), (2, -7, False)], "id int, v long, b boolean"
    )
    from aws_sdk_pandas_spark.functions.hashing import hive_hash

    got = {
        r.id: (r.hv, r.hb)
        for r in df.select(
            "id",
            hive_hash(F.col("v"), dtypes=[T.LongType()]).alias("hv"),
            hive_hash(F.col("b"), dtypes=[T.BooleanType()]).alias("hb"),
        ).collect()
    }
    # Java Long.hashCode((1<<33)+5) = (int)((v>>>32) ^ v) = 2 ^ 5 = 7
    assert got[1] == (7, 1231)
    # Long.hashCode(-7): v=0xFFFFFFFFFFFFFFF9; (v>>>32)=0xFFFFFFFF; xor=0x6 -> 6
    assert got[2] == (6, 1237)


def test_bucket_stability_and_range(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "k string")
    b = df.withColumn("bucket", hive_bucket(8, "k", df=df))
    vals = [r.bucket for r in b.collect()]
    assert set(vals) <= set(range(8))
    assert len(set(vals)) > 1  # spreads
    again = [r.bucket for r in df.withColumn("bucket", hive_bucket(8, "k", df=df)).collect()]
    assert vals == again


def test_hash_split_deterministic_and_leak_free(spark):
    from aws_sdk_pandas_spark.functions.hashing import hash_split

    df = spark.range(10000).selectExpr("id", "id % 1000 AS user")
    split = hash_split(df, "user", {"train": 0.8, "val": 0.1, "test": 0.1})
    frac = {
        r.split: r.n for r in split.groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    assert 0.7 < frac["train"] / 10000 < 0.9
    assert set(frac) == {"train", "val", "test"}
    # key-level: every row of a user lands in ONE split (no leakage)
    leaks = (
        split.groupBy("user").agg({"split": "approx_count_distinct"}).where(
            "`approx_count_distinct(split)` > 1"
        ).count()
    )
    assert leaks == 0
    # stable across invocations
    a = {r.user: r.split for r in split.select("user", "split").distinct().collect()}
    b = {
        r.user: r.split
        for r in hash_split(df, "user", {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("user", "split").distinct().collect()
    }
    assert a == b


def test_hash_split_md5_portable(spark):
    """md5 mode must match an independent python re-derivation of the
    assignment (the portability contract)."""
    import hashlib

    from aws_sdk_pandas_spark.functions.hashing import hash_split

    df = spark.range(500).withColumnRenamed("id", "k")
    rows = hash_split(
        df, "k", {"train": 0.75, "val": 0.125, "test": 0.125}, seed=7, algo="md5"
    ).collect()
    for r in rows:
        u = int(hashlib.md5(f"{r['k']}:7".encode()).hexdigest()[:8], 16) / float(1 << 32)
        want = "train" if u < 0.75 else ("val" if u < 0.875 else "test")
        assert r["split"] == want
    # sane proportions on 500 keys
    from collections import Counter

    c = Counter(r["split"] for r in rows)
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_hash_split_bad_algo(spark):
    import pytest

    from aws_sdk_pandas_spark.exceptions import InvalidDataType
    from aws_sdk_pandas_spark.functions.hashing import hash_split

    df = spark.range(5)
    with pytest.raises(InvalidDataType):
        hash_split(df, "id", {"a": 0.5, "b": 0.5}, algo="sha999")


def test_kfold_split_balanced_and_deterministic(spark):
    import hashlib

    from aws_sdk_pandas_spark.functions.hashing import kfold_split

    df = spark.createDataFrame([(i,) for i in range(1000)], "id bigint")
    out = {r.id: r.fold for r in kfold_split(df, "id", 5).collect()}
    assert set(out.values()) == {0, 1, 2, 3, 4}
    # md5-rederivable assignment
    for i in (0, 17, 999):
        want = int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:8], 16) % 5
        assert out[i] == want
    # roughly balanced folds
    from collections import Counter

    c = Counter(out.values())
    assert all(150 < n < 250 for n in c.values())
    # partitioning invariance
    again = {r.id: r.fold for r in kfold_split(df.repartition(7), "id", 5).collect()}
    assert again == out
