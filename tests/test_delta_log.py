"""Delta-protocol log interop for lakelite (jar-free): every lakelite
commit exports a `_delta_log/{v:020d}.json` of protocol-valid actions
(protocol/metaData/add/remove/txn), and `read_deltalake` replays a
Delta log — including a foreign one written by delta-rs — when present.
Reference behavior: awswrangler/s3/_write_deltalake.py:129-133 (writes
the real Delta log via delta-rs), s3/_read_deltalake.py:38."""

from __future__ import annotations

import json
import os
import urllib.parse

import pytest

from aws_sdk_pandas_spark import delta_log, lakehouse, lakehouse_shim as shim
from aws_sdk_pandas_spark.exceptions import InvalidArgument


def _df(spark, rows, schema="k int, part string, v int"):
    return spark.createDataFrame(rows, schema)


def _actions(path, version):
    fname = os.path.join(path, "_delta_log", f"{version:020d}.json")
    assert os.path.exists(fname), f"missing Delta commit {version}"
    out = []
    with open(fname) as fh:
        for line in fh:
            if line.strip():
                out.append(json.loads(line))
    return out


def _live_paths(path, upto):
    """Replay the log like a Delta reader would: add/remove by path."""
    live = set()
    for v in range(upto + 1):
        for a in _actions(path, v):
            if "add" in a:
                live.add(urllib.parse.unquote(a["add"]["path"]))
            elif "remove" in a:
                live.discard(urllib.parse.unquote(a["remove"]["path"]))
    return live


def test_export_action_shapes_and_replay_parity(spark, tmp_path):
    p = str(tmp_path / "t")
    lakehouse.to_deltalake(
        _df(spark, [(1, "a", 1), (2, "b", 1)]), p,
        mode="overwrite", partition_cols=["part"],
    )
    lakehouse.to_deltalake(_df(spark, [(3, "a", 2)]), p, mode="append")
    shim.merge(spark, _df(spark, [(2, "b", 9), (4, "c", 1)]), p, keys=["k"])
    shim.delete(spark, _df(spark, [(1, "a", 0)]), p, keys=["k"])

    # v0 carries protocol + metaData per the Delta spec
    a0 = _actions(p, 0)
    kinds0 = [next(iter(a)) for a in a0]
    assert kinds0[0] == "commitInfo"
    proto = next(a["protocol"] for a in a0 if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in a0 if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == ["part"]
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert set(schema.fieldNames()) == {"k", "part", "v"}
    assert isinstance(meta["id"], str) and len(meta["id"]) >= 32

    # every add: decodable relative path to an existing parquet file,
    # string partitionValues, size/modificationTime/dataChange
    for v in range(4):
        for a in _actions(p, v):
            if "add" not in a:
                continue
            add = a["add"]
            rel = urllib.parse.unquote(add["path"])
            assert not os.path.isabs(rel)
            assert os.path.exists(os.path.join(p, rel))
            assert add["dataChange"] is True
            assert isinstance(add["size"], int) and add["size"] > 0
            assert isinstance(add["modificationTime"], int)
            assert set(add["partitionValues"]) == {"part"}
            if "stats" in add:
                st = json.loads(add["stats"])  # stats is a JSON *string*
                assert isinstance(st.get("numRecords"), int)

    # replaying the Delta log reproduces each lakelite snapshot exactly
    for v in range(4):
        man_files = {e["path"] for e in shim._read_manifest(p, v)["files"]}
        assert _live_paths(p, v) == man_files, f"version {v}"

    # and the replay READER returns the same rows as the lakelite reader
    for v in (0, 1, 2, 3):
        got = sorted(
            tuple(r) for r in delta_log.read_delta_log(
                spark, p, version=v, columns=["k", "part", "v"]
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in shim.read(spark, p, version=v)
            .select("k", "part", "v")
            .collect()
        )
        assert got == want, f"version {v}"
    # partition column type survives the log round-trip (from metaData
    # schemaString, not inference)
    assert dict(delta_log.read_delta_log(spark, p).dtypes)["part"] == "string"


def test_read_deltalake_prefers_delta_log(spark, tmp_path):
    import shutil

    p = str(tmp_path / "t")
    lakehouse.to_deltalake(_df(spark, [(1, "a", 1), (2, "b", 1)]), p, mode="overwrite")
    lakehouse.to_deltalake(_df(spark, [(3, "c", 1)]), p, mode="append")
    # remove the lakelite manifests: the Delta log alone must serve reads
    shutil.rmtree(os.path.join(p, "_lakelite"))
    assert lakehouse.read_deltalake(spark, p).count() == 3
    assert lakehouse.read_deltalake(spark, p, version=0).count() == 2
    assert lakehouse.read_deltalake(spark, p, columns=["k"]).columns == ["k"]


def test_txn_action_and_schema_change_metadata(spark, tmp_path):
    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", 1)]), p, mode="overwrite")
    shim.write(_df(spark, [(2, "b", 2)]), p, txn=("appX", 7))
    a1 = _actions(p, 1)
    txn = next(a["txn"] for a in a1 if "txn" in a)
    assert txn == {"appId": "appX", "version": 7}
    # schema evolution emits a fresh metaData with the SAME table id
    wider = spark.createDataFrame([(3, "c", 3, "x")], "k int, part string, v int, extra string")
    shim.write(wider, p, schema_mode="merge")
    id0 = next(a["metaData"]["id"] for a in _actions(p, 0) if "metaData" in a)
    m2 = next(a["metaData"] for a in _actions(p, 2) if "metaData" in a)
    assert m2["id"] == id0
    assert "extra" in m2["schemaString"]


def test_export_table_backfill(spark, tmp_path):
    import shutil

    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", 1)]), p, mode="overwrite")
    shim.write(_df(spark, [(2, "b", 1)]), p)
    shutil.rmtree(os.path.join(p, "_delta_log"))  # simulate a pre-export table
    assert delta_log.export_table(p) == 2
    assert _live_paths(p, 1) == {e["path"] for e in shim._read_manifest(p, 1)["files"]}


def test_vacuumed_history_skips_export_gracefully(spark, tmp_path):
    import shutil

    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", 1)]), p, mode="overwrite")
    shim.write(_df(spark, [(2, "b", 1)]), p)
    shim.vacuum(p, keep_versions=1)  # drops manifest v0
    shutil.rmtree(os.path.join(p, "_delta_log"))
    # the next commit cannot build a contiguous-from-0 log: skip, no crash
    shim.write(_df(spark, [(3, "c", 1)]), p)
    assert not delta_log.has_delta_log(p)
    assert shim.read(spark, p).count() == 3  # lakelite reads unaffected


def test_foreign_delta_log_roundtrip(spark, tmp_path):
    """A log we didn't write (delta-rs shape): partitioned adds +
    a remove, read through read_deltalake with partition values taken
    from the log, not the directory layout."""
    p = str(tmp_path / "foreign")
    os.makedirs(os.path.join(p, "_delta_log"))
    # data files in a FLAT layout (no hive dirs) — the protocol allows it
    df_a = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    df_b = spark.createDataFrame([(3, 30)], "k int, v int")
    df_a.coalesce(1).write.parquet(os.path.join(p, "fa"))
    df_b.coalesce(1).write.parquet(os.path.join(p, "fb"))
    fa = next(f for f in os.listdir(os.path.join(p, "fa")) if f.endswith(".parquet"))
    fb = next(f for f in os.listdir(os.path.join(p, "fb")) if f.endswith(".parquet"))
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
                {"name": "v", "type": "integer", "nullable": True, "metadata": {}},
                {"name": "part", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )

    def _w(version, actions):
        with open(os.path.join(p, "_delta_log", f"{version:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    _w(0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "abc", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_str, "partitionColumns": ["part"],
                      "configuration": {}}},
        {"add": {"path": f"fa/{fa}", "partitionValues": {"part": "7"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    _w(1, [
        {"add": {"path": f"fb/{fb}", "partitionValues": {"part": "8"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    got = sorted(
        tuple(r) for r in lakehouse.read_deltalake(spark, p).collect()
    )
    assert got == [(1, 10, 7), (2, 20, 7), (3, 30, 8)]
    assert dict(lakehouse.read_deltalake(spark, p).dtypes)["part"] == "int"
    # version 0 time travel sees only the first file
    assert lakehouse.read_deltalake(spark, p, version=0).count() == 2
    # a remove action drops the file from the snapshot
    _w(2, [{"remove": {"path": f"fa/{fa}", "deletionTimestamp": 1, "dataChange": True}}])
    assert [tuple(r) for r in lakehouse.read_deltalake(spark, p).collect()] == [(3, 30, 8)]


def test_unsupported_reader_protocol_refused(spark, tmp_path):
    p = str(tmp_path / "dvtable")
    os.makedirs(os.path.join(p, "_delta_log"))
    with open(os.path.join(p, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                          "readerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                                          "schemaString": json.dumps({"type": "struct", "fields": []}),
                                          "partitionColumns": [], "configuration": {}}}) + "\n")
    with pytest.raises(InvalidArgument, match="minReaderVersion"):
        lakehouse.read_deltalake(spark, p)
    # a non-contiguous log (checkpointed tail) is refused, not misread
    p2 = str(tmp_path / "gap")
    os.makedirs(os.path.join(p2, "_delta_log"))
    with open(os.path.join(p2, "_delta_log", f"{5:020d}.json"), "w") as fh:
        fh.write(json.dumps({"metaData": {"id": "y", "format": {"provider": "parquet", "options": {}},
                                          "schemaString": json.dumps({"type": "struct", "fields": []}),
                                          "partitionColumns": [], "configuration": {}}}) + "\n")
    with pytest.raises(InvalidArgument, match="contiguous"):
        lakehouse.read_deltalake(spark, p2)


def test_foreign_checkpoint_seeds_replay(spark, tmp_path):
    """A delta-rs-style table whose old JSON commits were cleaned up:
    the parquet checkpoint seeds the state and only the later JSON
    commits replay on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "ckpt_table")
    os.makedirs(os.path.join(p, "_delta_log"))
    df_a = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    df_b = spark.createDataFrame([(3, 30)], "k int, v int")
    df_a.coalesce(1).write.parquet(os.path.join(p, "fa"))
    df_b.coalesce(1).write.parquet(os.path.join(p, "fb"))
    fa = "fa/" + next(f for f in os.listdir(os.path.join(p, "fa")) if f.endswith(".parquet"))
    fb = "fb/" + next(f for f in os.listdir(os.path.join(p, "fb")) if f.endswith(".parquet"))
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
                {"name": "v", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    # checkpoint at version 1: protocol + metaData + the single live add,
    # with the protocol's map<string,string> partitionValues layout
    ck_schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None},
        {"protocol": None,
         "metaData": {"id": "ck", "schemaString": schema_str, "partitionColumns": []},
         "add": None},
        {"protocol": None, "metaData": None,
         "add": {"path": fa, "partitionValues": {}, "size": 1, "dataChange": False}},
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=ck_schema),
        os.path.join(p, "_delta_log", f"{1:020d}.checkpoint.parquet"),
    )
    # JSON commit 2 on top of the checkpoint; commits 0-1 were cleaned up
    with open(os.path.join(p, "_delta_log", f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": {"path": fb, "partitionValues": {}, "size": 1,
                                     "modificationTime": 0, "dataChange": True}}) + "\n")
    got = sorted(tuple(r) for r in lakehouse.read_deltalake(spark, p).collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    # time travel to the checkpoint version itself
    assert lakehouse.read_deltalake(spark, p, version=1).count() == 2
    # version 0 predates the checkpoint and its JSON is gone -> honest error
    with pytest.raises(InvalidArgument, match="not reachable|not found"):
        lakehouse.read_deltalake(spark, p, version=0)


def test_convert_to_delta_api(spark, tmp_path):
    import shutil

    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", 1)]), p, mode="overwrite")
    shim.write(_df(spark, [(2, "b", 1)]), p)
    shutil.rmtree(os.path.join(p, "_delta_log"))
    assert lakehouse.convert_to_delta(p) == 2
    assert delta_log.read_delta_log(spark, p).count() == 2
    assert lakehouse.convert_to_delta(p) == 0  # idempotent
