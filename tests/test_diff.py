"""Dataset diff: added/removed/changed classification, null-sentinel
hash correctness, and symmetric inversion."""

from __future__ import annotations

from aws_sdk_pandas_spark.operators.diff import diff_frames, row_hash


def test_diff_classifies_all_three(spark):
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", 30)], "id int, s string, v int"
    )
    b = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 99), (4, "w", 40)], "id int, s string, v int"
    )
    got = {r.id: r.change_type for r in diff_frames(a, b, keys=["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}
    # inverse diff swaps added/removed, keeps changed
    inv = {r.id: r.change_type for r in diff_frames(b, a, keys=["id"]).collect()}
    assert inv == {2: "changed", 3: "added", 4: "removed"}


def test_null_sentinel_no_collision(spark):
    # (a, NULL) must differ from (NULL, a) and from ("a",) alone
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, "a")], "id int, x string, y string"
    )
    hashes = [r.h for r in df.select(row_hash(["x", "y"]).alias("h")).collect()]
    assert hashes[0] != hashes[1]

    a = spark.createDataFrame([(1, "a", None)], "id int, x string, y string")
    b = spark.createDataFrame([(1, None, "a")], "id int, x string, y string")
    out = diff_frames(a, b, keys=["id"]).collect()
    assert len(out) == 1 and out[0].change_type == "changed"


def test_identical_snapshots_empty_diff(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert diff_frames(orders, orders, keys=["o_orderkey"]).count() == 0


def test_null_keys_match_null_safe(spark):
    a = spark.createDataFrame([(None, "same"), (1, "x")], "id int, v string")
    b = spark.createDataFrame([(None, "same"), (1, "y")], "id int, v string")
    got = {r.id: r.change_type for r in diff_frames(a, b, keys=["id"]).collect()}
    # the NULL-key row is identical in both snapshots: NOT added+removed
    assert got == {1: "changed"}
    b2 = spark.createDataFrame([(None, "different"), (1, "x")], "id int, v string")
    got2 = {r.id: r.change_type for r in diff_frames(a, b2, keys=["id"]).collect()}
    assert got2 == {None: "changed"}
