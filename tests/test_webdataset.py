"""WebDataset tar-shard sink/source (sources/webdataset.py): roundtrip
fidelity, byte-determinism, sample pivoting, NULL-modality and
duplicate-key contracts, external-tar readability."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest

from aws_sdk_pandas_spark.exceptions import InvalidArgument
from aws_sdk_pandas_spark.sources.webdataset import (
    read_webdataset,
    to_webdataset,
)


def test_roundtrip_and_manifest(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.range(40).select(
        F.col("id").cast("string").alias("key"),
        F.expr("repeat('x', CAST(id % 7 AS INT) + 1)").alias("text"),
        F.when(
            F.expr("id % 2 = 0"),
            F.expr("encode(concat('IMG', CAST(id AS STRING)), 'utf-8')"),
        ).alias("img"),
    )
    out = str(tmp_path / "wds")
    man = to_webdataset(
        docs, out, key_col="key", columns={"txt": "text", "img": "img"},
        n_shards=4,
    )
    assert {m["shard"] for m in man} <= {0, 1, 2, 3}
    assert sum(m["n_members"] for m in man) == 40 + 20  # txt all, img evens
    for m in man:
        assert os.path.getsize(m["path"]) == m["size_bytes"]

    back = read_webdataset(spark, out)
    rows = back.collect()
    assert len(rows) == 60
    got_txt = {
        r.key: bytes(r.data).decode() for r in rows if r.ext == "txt"
    }
    assert got_txt["13"] == "x" * (13 % 7 + 1)
    got_img = {r.key for r in rows if r.ext == "img"}
    assert got_img == {str(i) for i in range(0, 40, 2)}

    # sample pivot: one row per key with a modality map
    sm = {r.key: dict(r.parts) for r in read_webdataset(spark, out, samples=True).collect()}
    assert len(sm) == 40
    assert bytes(sm["2"]["img"]) == b"IMG2" and "txt" in sm["2"]
    assert "img" not in sm["3"]


def test_byte_deterministic_across_reruns_and_partitionings(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.range(30).select(
        F.col("id").cast("string").alias("key"),
        F.concat(F.lit("body-"), F.col("id").cast("string")).alias("text"),
    )
    digests = []
    for i, n_parts in enumerate((1, 5)):
        out = str(tmp_path / f"w{i}")
        to_webdataset(
            docs.repartition(n_parts), out, key_col="key",
            columns={"txt": "text"}, n_shards=3,
        )
        d = {}
        for f in sorted(os.listdir(out)):
            with open(os.path.join(out, f), "rb") as fh:
                d[f] = hashlib.sha256(fh.read()).hexdigest()
        digests.append(d)
    assert digests[0] == digests[1]  # identical tar BYTES


def test_contracts_and_external_tar(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.range(4).select(
        F.col("id").cast("string").alias("key"), F.lit("t").alias("text")
    )
    out = str(tmp_path / "w")
    with pytest.raises(InvalidArgument, match="columns"):
        to_webdataset(docs, out, key_col="key", columns={})
    with pytest.raises(InvalidArgument, match="not in frame"):
        to_webdataset(docs, out, key_col="key", columns={"txt": "nope"})
    dup = docs.unionByName(docs.limit(1))
    with pytest.raises(Exception, match="duplicate sample key"):
        to_webdataset(dup, out, key_col="key", columns={"txt": "text"}, n_shards=1)
    nullkey = spark.createDataFrame([(None, "t")], "key string, text string")
    with pytest.raises(InvalidArgument, match="NULL sample keys"):
        to_webdataset(nullkey, out, key_col="key", columns={"txt": "text"})
    with pytest.raises(InvalidArgument, match="no .tar shards"):
        read_webdataset(spark, str(tmp_path / "missing"))

    # dotted keys refused: the WebDataset loader splits the basename at
    # its FIRST dot, so 'doc.1' would silently re-split on read
    dotted = spark.createDataFrame([("doc.1", "t")], "key string, text string")
    with pytest.raises(InvalidArgument, match="FIRST dot"):
        to_webdataset(dotted, out, key_col="key", columns={"txt": "text"})

    # a tar written by a FOREIGN tool (plain tarfile here) reads fine:
    # extension-less members, multi-dot extensions split at the FIRST
    # basename dot (the webdataset loader rule), dotted directory parts,
    # and directory entries skipped
    ext_dir = tmp_path / "ext"
    ext_dir.mkdir()
    t = str(ext_dir / "other.tar")
    with tarfile.open(t, "w") as tf:
        import io

        for name, data in [
            ("a.txt", b"alpha"),
            ("a.cls", b"7"),
            ("noext", b"n"),
            ("b.json.gz", b"zipped"),
            ("d.v1/c.txt", b"subdir"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        d = tarfile.TarInfo("subdir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)  # directory entry skipped
    rows = {(r.key, r.ext): bytes(r.data) for r in read_webdataset(spark, t).collect()}
    assert rows == {
        ("a", "txt"): b"alpha", ("a", "cls"): b"7", ("noext", ""): b"n",
        ("b", "json.gz"): b"zipped", ("d.v1/c", "txt"): b"subdir",
    }
