"""pack_sequences: deterministic prefix-sum chunk packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.packing import pack_sequences


def test_pack_basic_chunking(spark):
    # tokens 600,600,600,600 with budget 1000: starts at 0,600,1200,1800
    # -> seq ids 0,0,1,1
    df = spark.createDataFrame(
        [(i, 600) for i in range(4)], "doc_id long, n long"
    )
    out = pack_sequences(df, "n", 1000, order_cols=["doc_id"]).orderBy("doc_id")
    assert [r["seq_id"] for r in out.collect()] == [0, 0, 1, 1]


def test_pack_straddle_belongs_to_start(spark):
    # 900 then 300: second doc starts at 900 < 1000 -> same sequence
    df = spark.createDataFrame([(0, 900), (1, 300), (2, 300)], "doc_id long, n long")
    out = pack_sequences(df, "n", 1000, order_cols=["doc_id"]).orderBy("doc_id")
    assert [r["seq_id"] for r in out.collect()] == [0, 0, 1]


def test_pack_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 0, 800), ("a", 1, 800), ("b", 0, 800)], "g string, doc_id long, n long"
    )
    out = pack_sequences(df, "n", 1000, by=["g"], order_cols=["doc_id"])
    got = {(r["g"], r["doc_id"]): r["seq_id"] for r in out.collect()}
    assert got == {("a", 0): 0, ("a", 1): 0, ("b", 0): 0}
    # second group restarts its running total
    assert got[("b", 0)] == 0


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, n long")
    with pytest.raises(ValueError):
        pack_sequences(df, "n", 0)

