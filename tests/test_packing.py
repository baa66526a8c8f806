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


def test_chunk_documents_windows_and_overlap(spark):
    from aws_sdk_pandas_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c"), (3, "")],
        "doc_id bigint, text string",
    )
    got = chunk_documents(docs, chunk_tokens=4, overlap_tokens=2).orderBy(
        "doc_id", "chunk_id"
    ).collect()
    d1 = [(r.chunk_id, r.start_token, r.n_tokens, r.text) for r in got if r.doc_id == 1]
    # n=10, chunk=4, stride=2 -> 1 + ceil(6/2) = 4 chunks; last ends at doc end
    assert d1 == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 2, 4, "t2 t3 t4 t5"),
        (2, 4, 4, "t4 t5 t6 t7"),
        (3, 6, 4, "t6 t7 t8 t9"),
    ]
    # short doc: single chunk, shorter than chunk_tokens
    d2 = [(r.chunk_id, r.n_tokens, r.text) for r in got if r.doc_id == 2]
    assert d2 == [(0, 3, "a b c")]
    # empty doc: one empty chunk with 0 tokens
    d3 = [(r.chunk_id, r.n_tokens, r.text) for r in got if r.doc_id == 3]
    assert d3 == [(0, 0, "")]
    # no overlap: disjoint cover
    got2 = chunk_documents(docs.where("doc_id = 1"), chunk_tokens=4).collect()
    assert [(r.start_token, r.n_tokens) for r in sorted(got2, key=lambda r: r.chunk_id)] == [
        (0, 4), (4, 4), (8, 2),
    ]
    # a trailing window fully covered by the previous one is not emitted
    got3 = chunk_documents(docs.where("doc_id = 2"), chunk_tokens=2, overlap_tokens=1).collect()
    assert [(r.chunk_id, r.text) for r in sorted(got3, key=lambda r: r.chunk_id)] == [
        (0, "a b"), (1, "b c"),
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)
