"""Megatron indexed-dataset interop (sources/megatron.py): hand-decoded
format golden check, roundtrip fidelity, byte-determinism, dtype range
enforcement, dirty-input refusals."""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pytest

from aws_sdk_pandas_spark.exceptions import InvalidArgument
from aws_sdk_pandas_spark.sources.megatron import read_megatron, to_megatron


def _toks_df(spark, n=24):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").cast("string").alias("key"),
        F.expr(
            "transform(sequence(0, CAST(id % 5 AS INT)), "
            "i -> CAST(id * 100 + i AS INT))"
        ).alias("tokens"),
    )


def test_idx_format_golden_hand_decode(spark, tmp_path):
    """Decode the .idx/.bin bytes BY HAND straight from the MMIDIDX
    layout (magic, version, dtype code, counts, i32 sizes, i64
    pointers, i64 doc index) — no calls into the module's reader."""
    out = str(tmp_path / "mm")
    man = to_megatron(
        _toks_df(spark, 10), out, key_col="key", dtype="int32", n_shards=1
    )
    assert len(man) == 1 and man[0]["n_sequences"] == 10
    prefix = man[0]["path"]
    with open(prefix + ".idx", "rb") as fh:
        blob = fh.read()
    assert blob[:9] == b"MMIDIDX\x00\x00"
    assert struct.unpack_from("<Q", blob, 9)[0] == 1  # version
    assert blob[17] == 4  # int32 dtype code
    n, docs = struct.unpack_from("<QQ", blob, 18)
    assert n == 10 and docs == 10
    off = 34
    sizes = np.frombuffer(blob, dtype=np.int32, count=n, offset=off)
    off += 4 * n
    pointers = np.frombuffer(blob, dtype=np.int64, count=n, offset=off)
    off += 8 * n
    doc_idx = np.frombuffer(blob, dtype=np.int64, count=n + 1, offset=off)
    assert off + 8 * (n + 1) == len(blob)  # idx consumed exactly
    assert list(doc_idx) == list(range(n + 1))
    # sizes: key-sorted ('0','1',..'9' here), doc id%5+1 tokens each
    assert list(sizes) == [i % 5 + 1 for i in range(10)]
    # pointers are the running byte offsets of int32 payloads
    assert list(pointers) == list(np.cumsum([0] + [4 * s for s in sizes[:-1]]))
    with open(prefix + ".bin", "rb") as fh:
        bin_blob = fh.read()
    assert len(bin_blob) == 4 * int(sizes.sum()) == man[0]["bin_bytes"]
    seq3 = np.frombuffer(bin_blob, np.int32, count=int(sizes[3]),
                         offset=int(pointers[3]))
    assert list(seq3) == [300 + i for i in range(3 % 5 + 1)]


def test_roundtrip_and_determinism(spark, tmp_path):
    docs = _toks_df(spark, 24)
    digests = []
    for run, n_parts in enumerate((1, 5)):
        out = str(tmp_path / f"m{run}")
        man = to_megatron(
            docs.repartition(n_parts), out, key_col="key",
            dtype="uint16", n_shards=3,
        )
        assert sum(m["n_sequences"] for m in man) == 24
        d = {}
        for f in sorted(os.listdir(out)):
            with open(os.path.join(out, f), "rb") as fh:
                d[f] = hashlib.sha256(fh.read()).hexdigest()
        digests.append(d)
    assert digests[0] == digests[1]  # byte-identical across partitionings

    back = read_megatron(spark, str(tmp_path / "m0"))
    got = {tuple(r.tokens) for r in back.collect()}
    want = {
        tuple(r.tokens) for r in docs.selectExpr("CAST(tokens AS ARRAY<BIGINT>) AS tokens").collect()
    }
    assert got == want
    assert back.count() == 24


def test_dtype_range_and_dirty_refusals(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "m")
    over = spark.createDataFrame(
        [("a", [70_000])], "key string, tokens array<int>"
    )
    with pytest.raises(Exception, match="out of uint16 range"):
        to_megatron(over, out, key_col="key", dtype="uint16", n_shards=1)
    neg = spark.createDataFrame([("a", [-1])], "key string, tokens array<int>")
    with pytest.raises(Exception, match="uint16|negative"):
        to_megatron(neg, out, key_col="key", dtype="uint16", n_shards=1)
    # int32 accepts both fine
    ok = spark.createDataFrame(
        [("a", [-1]), ("b", [70_000])], "key string, tokens array<int>"
    )
    man = to_megatron(ok, out, key_col="key", dtype="int32", n_shards=1)
    assert man[0]["n_tokens"] == 2

    nulls = spark.createDataFrame(
        [("a", None)], "key string, tokens array<int>"
    )
    with pytest.raises(InvalidArgument, match="NULL"):
        to_megatron(nulls, str(tmp_path / "m2"), key_col="key")
    with pytest.raises(InvalidArgument, match="dtype"):
        to_megatron(ok, out, key_col="key", dtype="complex128")
    with pytest.raises(InvalidArgument, match="no .idx"):
        read_megatron(spark, str(tmp_path / "missing"))
    # a float-payload foreign shard is not token ids: refuse, don't truncate
    import struct as _s

    fdir = tmp_path / "fl"
    fdir.mkdir()
    with open(fdir / "f-000000.idx", "wb") as fh:
        fh.write(b"MMIDIDX\x00\x00" + _s.pack("<Q", 1) + _s.pack("<B", 6)
                 + _s.pack("<QQ", 1, 1)
                 + np.asarray([1], np.int32).tobytes()
                 + np.asarray([0], np.int64).tobytes()
                 + np.asarray([0, 1], np.int64).tobytes())
    with open(fdir / "f-000000.bin", "wb") as fh:
        fh.write(np.asarray([1.5], np.float32).tobytes())
    with pytest.raises(Exception, match="not token ids"):
        read_megatron(spark, str(fdir)).collect()
    # empty sequences are legal (zero-length docs exist in real corpora)
    empty = spark.createDataFrame(
        [("a", []), ("b", [5])], "key string, tokens array<int>"
    )
    man2 = to_megatron(empty, str(tmp_path / "m3"), key_col="key", n_shards=1)
    assert man2[0]["n_sequences"] == 2 and man2[0]["n_tokens"] == 1
    back = {r.seq_index: list(r.tokens) for r in read_megatron(
        spark, str(tmp_path / "m3")).collect()}
    assert back == {0: [], 1: [5]}
