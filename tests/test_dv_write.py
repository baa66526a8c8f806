"""Writer-side deletion vectors: merge-on-read DELETE in lakelite,
Delta-protocol DV export (reader 3 / writer 7), Iceberg positional-
delete export, and the read/CDF/compact/vacuum/OCC/streaming
integration.  Closes the round-4 verdict's documented boundary
("deletion vectors are read-only").

Reference semantics: Delta protocol deletion-vectors spec (the same
public format the round-3/4 READ path was built against) and Iceberg
v2 positional deletes (spec reserved field ids 2147483546/2147483545).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark import delta_log as dl
from aws_sdk_pandas_spark import lakehouse_shim as shim


def _mk_table(spark, p, n=100, parts=2):
    df = spark.range(n).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id % 7 AS INT) AS v",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
    ).repartition(parts)
    shim.write(df, p, mode="overwrite")
    return df


def _df1(spark, rows, schema):
    # ONE slice — a multi-slice local frame pays one Python-worker round
    # trip per slice per consuming action (~150 ms x defaultParallelism
    # through coalesce(1), measured); same rows, same order, one file
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _keys(spark, ids):
    return _df1(spark, [(int(i),) for i in ids], "k int")


def test_rbarray_encode_decode_property():
    import random

    rng = random.Random(20260816)
    for _ in range(20):
        n = rng.randrange(0, 3000)
        hi = rng.choice([70_000, 200_000, 2**33])
        idx = sorted(rng.sample(range(hi), min(n, hi)))
        assert dl._rbarray_decode(dl._rbarray_encode(idx)) == idx
    # container-boundary shapes: exactly 4096 (array) and 4097 (bitmap)
    for card in (4095, 4096, 4097, 5000):
        idx = list(range(card))
        assert dl._rbarray_decode(dl._rbarray_encode(idx)) == idx


def test_write_dv_file_decodes_with_independent_spec_decoder(tmp_path):
    """Spec closure in the WRITE direction (round-5 verdict item 4): a
    decoder re-derived HERE from the Delta DV on-disk spec plus the
    RoaringFormatSpec — zero calls into delta_log's own decode helpers
    — must recover write_dv_file's exact index set through the full
    framing: format-version byte, big-endian length, RoaringBitmapArray
    magic + bitmap count, array AND bitmap containers, offset index,
    big-endian CRC32."""
    import struct
    import zlib

    root = str(tmp_path)
    # cross the 4096-cardinality boundary (forces a BITMAP container in
    # key 0), keep an ARRAY container in key 1, and spill into a second
    # 32-bit roaring bitmap (index >= 2^32)
    idx = sorted(set(range(5000)) | {70_000, 70_002, (1 << 32) + 7})
    dv = dl.write_dv_file(root, idx, prefix="_dv")
    assert dv["storageType"] == "u" and dv["cardinality"] == len(idx)
    with open(dl.dv_file_path(root, dv), "rb") as fh:
        blob = fh.read()

    assert blob[0:1] == b"\x01"  # format version
    off = dv["offset"]
    (size,) = struct.unpack_from(">i", blob, off)
    assert size == dv["sizeInBytes"]
    data = blob[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    assert zlib.crc32(data) & 0xFFFFFFFF == crc
    assert off + 4 + size + 4 == len(blob)  # nothing after the CRC

    (magic,) = struct.unpack_from("<I", data, 0)
    assert magic == 1681511377  # RoaringBitmapArray portable magic
    (n_maps,) = struct.unpack_from("<q", data, 4)
    assert n_maps == 2  # highest index >> 32 == 1, empties included
    pos, out = 12, []
    for high in range(n_maps):
        base = pos  # offsets are relative to THIS bitmap's start
        cookie, n = struct.unpack_from("<II", data, pos)
        pos += 8
        assert cookie == 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
        keys, cards = [], []
        for _ in range(n):
            k, c1 = struct.unpack_from("<HH", data, pos)
            pos += 4
            keys.append(k)
            cards.append(c1 + 1)
        offsets = struct.unpack_from(f"<{n}I", data, pos)
        pos += 4 * n
        for i in range(n):
            assert base + offsets[i] == pos  # offset index is coherent
            if cards[i] <= 4096:  # array container
                vals = struct.unpack_from(f"<{cards[i]}H", data, pos)
                pos += 2 * cards[i]
            else:  # bitmap container: 2^16 bits as 1024 u64 words
                words = struct.unpack_from("<1024Q", data, pos)
                pos += 8192
                vals = [
                    (w_i << 6) | b
                    for w_i, w in enumerate(words)
                    for b in range(64)
                    if (w >> b) & 1
                ]
                assert len(vals) == cards[i]
            out.extend(
                (high << 32) | (keys[i] << 16) | v for v in vals
            )
    assert pos == len(data)  # consumed exactly
    assert out == idx


def test_z85_encode_is_decode_inverse():
    import random

    rng = random.Random(7)
    for ln in (4, 8, 16, 64):
        b = bytes(rng.randrange(256) for _ in range(ln))
        assert dl._z85_decode(dl._z85_encode(b)) == b


def test_dv_delete_roundtrip_no_rewrite(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=100)
    files_before = {e["path"] for e in shim._read_manifest(p, 0)["files"]}

    res = shim.delete(spark, _keys(spark, [3, 7, 11]), p, ["k"],
                      use_deletion_vectors=True)
    assert res["files_rewritten"] == 0
    assert res["rows_deleted"] == 3
    man = shim._read_manifest(p, shim.latest_version(p))
    # no data file rewritten or added — same paths, some now DV-bearing
    assert {e["path"] for e in man["files"]} == files_before
    assert sum(1 for e in man["files"] if e.get("dv")) == res["files_dv"] >= 1

    got = sorted(r.k for r in shim.read(spark, p).select("k").collect())
    assert got == sorted(set(range(100)) - {3, 7, 11})
    # time travel still sees the pre-delete snapshot
    v0 = shim.read(spark, p, version=0).count()
    assert v0 == 100

    # second DV delete MERGES bitmaps (includes re-deleting row 3)
    res2 = shim.delete(spark, _keys(spark, [3, 20]), p, ["k"],
                       use_deletion_vectors=True)
    assert res2["rows_deleted"] == 1  # 3 was already gone
    got2 = sorted(r.k for r in shim.read(spark, p).select("k").collect())
    assert got2 == sorted(set(range(100)) - {3, 7, 11, 20})


def test_dv_delta_export_protocol_and_self_read(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=60)
    shim.delete(spark, _keys(spark, [1, 2, 59]), p, ["k"],
                use_deletion_vectors=True)

    # the exported commit upgrades the protocol and re-adds the touched
    # file with a deletionVector descriptor after removing the old one
    actions = dl._read_actions(p, 1)
    prot = [a["protocol"] for a in actions if "protocol" in a]
    assert prot and prot[0]["minReaderVersion"] == 3
    assert prot[0]["minWriterVersion"] == 7
    assert "deletionVectors" in prot[0]["readerFeatures"]
    assert "deletionVectors" in prot[0]["writerFeatures"]
    adds = [a["add"] for a in actions if "add" in a]
    removes = [a["remove"] for a in actions if "remove" in a]
    assert adds and all(a.get("deletionVector") for a in adds)
    assert {r["path"] for r in removes} == {a["path"] for a in adds}
    dv = adds[0]["deletionVector"]
    assert dv["storageType"] == "u" and dv["cardinality"] >= 1
    # descriptor resolves through the SAME reader delta-rs tables use
    root = shim._local(p)
    assert os.path.exists(dl.dv_file_path(root, dv))

    # the foreign-log reader (delta-rs contract) sees the deleted rows gone
    got = sorted(r.k for r in dl.read_delta_log(spark, p).select("k").collect())
    assert got == sorted(set(range(60)) - {1, 2, 59})
    # and agrees with the lakelite reader
    ours = sorted(r.k for r in shim.read(spark, p).select("k").collect())
    assert got == ours


def test_dv_checkpoint_carries_descriptors(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=30, parts=1)
    shim.delete(spark, _keys(spark, [5]), p, ["k"], use_deletion_vectors=True)
    dl.write_checkpoint(p, 1)
    adds, _meta, protocol = dl._load_checkpoint(p, 1)
    assert protocol["minReaderVersion"] == 3
    dvs = [a.get("deletionVector") for a in adds.values()]
    assert any(d and d.get("cardinality") == 1 for d in dvs)
    # replay seeded from the checkpoint reads the same rows
    got = sorted(r.k for r in dl.read_delta_log(spark, p).select("k").collect())
    assert got == sorted(set(range(30)) - {5})


def test_dv_iceberg_positional_delete_export(spark, tmp_path):
    from aws_sdk_pandas_spark import iceberg_meta as im

    p = str(tmp_path / "t")
    _mk_table(spark, p, n=50, parts=2)
    im.export_table(p)  # make the Iceberg sidecar sticky
    shim.delete(spark, _keys(spark, [4, 9]), p, ["k"],
                use_deletion_vectors=True)

    # metadata: the new snapshot's manifest list carries a content=1
    # delete manifest whose entries point at a positional-delete parquet
    meta = json.load(open(im._metadata_file(p, shim.latest_version(p))))
    snap_id = meta["current-snapshot-id"]
    _data, dels = im._live_entries(p, meta, snap_id)
    assert dels, "no positional-delete entries exported"
    assert all(e["data_file"]["content"] == 1 for e in dels)
    assert sum(e["data_file"]["record_count"] for e in dels) == 2
    import pyarrow.parquet as pq

    dfile = im._local(dels[0]["data_file"]["file_path"])
    sch = pq.read_schema(dfile)
    assert sch.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
    assert sch.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"

    # the Iceberg reader applies them: deleted keys gone
    got = sorted(r.k for r in im.read_iceberg_meta(spark, p).select("k").collect())
    assert got == sorted(set(range(50)) - {4, 9})
    # a second delete REPLACES the delete files (per-snapshot lists)
    shim.delete(spark, _keys(spark, [10]), p, ["k"], use_deletion_vectors=True)
    meta2 = json.load(open(im._metadata_file(p, shim.latest_version(p))))
    _d2, dels2 = im._live_entries(p, meta2, meta2["current-snapshot-id"])
    assert sum(e["data_file"]["record_count"] for e in dels2) == 3
    got2 = sorted(r.k for r in im.read_iceberg_meta(spark, p).select("k").collect())
    assert got2 == sorted(set(range(50)) - {4, 9, 10})


def test_dv_cdf_emits_deletes(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=40)
    shim.delete(spark, _keys(spark, [6, 13]), p, ["k"],
                use_deletion_vectors=True)
    ch = shim.table_changes(spark, p, ["k"], from_version=0).collect()
    assert {(r.k, r._change_type) for r in ch} == {
        (6, "delete"), (13, "delete"),
    }


def test_dv_compact_materializes(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=40)
    shim.delete(spark, _keys(spark, [0, 1]), p, ["k"],
                use_deletion_vectors=True)
    shim.compact(spark, p)
    man = shim._read_manifest(p, shim.latest_version(p))
    assert not any(e.get("dv") for e in man["files"])
    got = sorted(r.k for r in shim.read(spark, p).select("k").collect())
    assert got == list(range(2, 40))


def test_dv_vacuum_reclaims_dead_bins(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=40)
    shim.delete(spark, _keys(spark, [0]), p, ["k"], use_deletion_vectors=True)
    shim.delete(spark, _keys(spark, [1]), p, ["k"], use_deletion_vectors=True)
    root = shim._local(p)
    dv_dir = os.path.join(root, "_dv")
    bins = sorted(os.listdir(dv_dir))
    assert len(bins) >= 2  # v1's DV superseded by v2's merged DV
    # keeping the latest 1 version: only the live merged DV survives
    removed = shim.vacuum(p, keep_versions=1)
    live = sorted(os.listdir(dv_dir))
    man = shim._read_manifest(p, shim.latest_version(p))
    live_names = {
        os.path.basename(dl.dv_file_path(root, e["dv"]))
        for e in man["files"]
        if e.get("dv")
    }
    assert set(live) == live_names
    assert any(r.startswith("_dv") for r in removed)
    got = sorted(r.k for r in shim.read(spark, p).select("k").collect())
    assert got == list(range(2, 40))


def test_dv_occ_same_file_conflicts_disjoint_rebases(spark, tmp_path):
    p = str(tmp_path / "t")
    # exactly ONE file per partition group 'g' so "same file" vs
    # "disjoint files" is deterministic
    df = spark.range(40).selectExpr(
        "CAST(id AS INT) AS k",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
    ).coalesce(1)
    shim.write(df, p, mode="overwrite", partition_cols=["g"])
    assert len(shim._read_manifest(p, 0)["files"]) == 2
    base = shim._read_manifest(p, 0)

    # writer A deletes from partition a (commits version 1)
    shim.delete(spark, _keys(spark, [0]), p, ["k"], use_deletion_vectors=True)

    # writer B (stale base) deletes from partition b: disjoint files -> rebase
    touched_b, untouched_b, _, _raw_b = shim._touched_files(
        spark, p, _keys(spark, [1]), ["k"], False
    )
    # build B's manifest against the STALE base to force the race
    from aws_sdk_pandas_spark import delta_log as _dl

    root = shim._local(p)
    e_b = dict(touched_b[0])
    # row index of k=1 inside its file
    scan = (
        spark.read.option(
            "basePath", os.path.join(root, e_b["commit"])
        ).parquet(os.path.join(root, e_b["path"]))
        .withColumn("__ri", F.col("_metadata.row_index"))
    )
    idx = [int(r["__ri"]) for r in scan.where("k = 1").collect()]
    e_b["dv"] = _dl.write_dv_file(root, sorted(idx), prefix="_dv")
    stale_files = [
        e for e in base["files"] if e["path"] != e_b["path"]
    ] + [e_b]
    shim._commit_or_rebase(
        spark, p,
        {
            "version": base["version"] + 1,
            "mode": "delete",
            "schema": base["schema"],
            "partition_cols": base["partition_cols"],
            "files": stale_files,
            "stats_cols": base.get("stats_cols") or [],
            "txns": shim._carry_txns(base, None, path=p),
        },
        base, [e_b],
        touched_paths={e_b["path"]},
        source_keys=_keys(spark, [1]), keys=["k"], match_nulls=False,
        mode_desc="delete",
    )
    # both deletes landed after the rebase
    got = sorted(r.k for r in shim.read(spark, p).select("k").collect())
    assert got == sorted(set(range(40)) - {0, 1})

    # same-file race: two deletes of the SAME file, second must raise
    base2 = shim._read_manifest(p, shim.latest_version(p))
    shim.delete(spark, _keys(spark, [2]), p, ["k"], use_deletion_vectors=True)
    by_path = {e["path"]: e for e in base2["files"]}
    tgt = next(
        e for e in shim._read_manifest(p, shim.latest_version(p))["files"]
        if e.get("dv") and e["partition_values"].get("g") == "a"
    )
    e_c = dict(by_path[tgt["path"]])
    e_c["dv"] = _dl.write_dv_file(root, [0], prefix="_dv")
    with pytest.raises(Exception, match="conflict"):
        shim._commit_or_rebase(
            spark, p,
            {
                "version": base2["version"] + 1,
                "mode": "delete",
                "schema": base2["schema"],
                "partition_cols": base2["partition_cols"],
                "files": [
                    e for e in base2["files"] if e["path"] != e_c["path"]
                ] + [e_c],
                "stats_cols": base2.get("stats_cols") or [],
                "txns": shim._carry_txns(base2, None, path=p),
            },
            base2, [e_c],
            touched_paths={e_c["path"]},
            source_keys=_keys(spark, [4]), keys=["k"], match_nulls=False,
            mode_desc="delete",
        )


def test_dv_streaming_contract(spark, tmp_path):
    from aws_sdk_pandas_spark.streaming.lakelite_source import (
        LakeliteStreamDataSource,
    )

    p = str(tmp_path / "t")
    _mk_table(spark, p, n=20, parts=1)
    try:
        spark.dataSource.register(LakeliteStreamDataSource)
    except Exception:
        pass

    def drain(out, ck, opts=None):
        reader = spark.readStream.format("lakelite_stream").option("path", p)
        for k_, v_ in (opts or {}).items():
            reader = reader.option(k_, v_)
        q = (
            reader.load().writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        exc = q.exception()
        if exc is not None:
            raise exc
        return sorted(r.k for r in spark.read.parquet(out).select("k").collect())

    # baseline drain, then a DV delete
    assert drain(str(tmp_path / "o1"), str(tmp_path / "c1")) == list(range(20))
    shim.delete(spark, _keys(spark, [5]), p, ["k"], use_deletion_vectors=True)

    # a DV commit is a row-level delete: the stream must refuse by default
    with pytest.raises(Exception, match="row-level-deleted|ignoreChanges"):
        drain(str(tmp_path / "o1"), str(tmp_path / "c1"))
    # delete-only commit passes with ignoreDeletes: the fresh checkpoint
    # replays v0's 20 rows and the DV commit emits NOTHING
    assert drain(
        str(tmp_path / "o2"), str(tmp_path / "c2a"), {"ignoreDeletes": "true"}
    ) == list(range(20))
    # ignoreChanges re-emits the file MINUS its deleted rows
    got = drain(
        str(tmp_path / "o3"), str(tmp_path / "c3"),
        {"ignoreChanges": "true", "startingVersion": "0"},
    )
    # v0 emits all 20, v1 re-emits the file without k=5 -> 39 rows
    assert len(got) == 39 and got.count(5) == 1


def test_dv_merge_mor_update_and_insert(spark, tmp_path):
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=30, parts=2)
    src = _df1(spark, [(5, 99, "z"), (7, 98, "z"), (100, 1, "new")], "k int, v int, g string"
    )
    res = shim.merge(spark, src, p, ["k"], use_deletion_vectors=True)
    assert res["files_rewritten"] == 0
    assert res["rows_deleted"] == 2  # old versions of 5 and 7
    got = {r.k: (r.v, r.g) for r in shim.read(spark, p).collect()}
    assert len(got) == 31
    assert got[5] == (99, "z") and got[7] == (98, "z")
    assert got[100] == (1, "new")
    assert got[6] == (6, "a")  # untouched row in a touched file survives
    # the foreign Delta reader agrees
    got_d = {r.k: (r.v, r.g) for r in dl.read_delta_log(spark, p).collect()}
    assert got_d == got


def test_dv_merge_mor_precombine_target_wins(spark, tmp_path):
    p = str(tmp_path / "t")
    df = _df1(
        spark, [(1, 10, "x"), (2, 20, "x"), (3, 30, "x")], "k int, ver int, val string")
    shim.write(df, p, mode="overwrite")
    src = _df1(spark, [(1, 99, "upd"),   # source wins (99 > 10)
         (2, 5, "stale"),  # TARGET wins (20 > 5): row survives untouched
         (4, 1, "ins")],   # unmatched: inserted
        "k int, ver int, val string",
    )
    res = shim.merge(
        spark, src, p, ["k"], precombine_key="ver", use_deletion_vectors=True
    )
    assert res["files_rewritten"] == 0 and res["rows_deleted"] == 1
    got = {r.k: (r.ver, r.val) for r in shim.read(spark, p).collect()}
    assert got == {
        1: (99, "upd"), 2: (20, "x"), 3: (30, "x"), 4: (1, "ins")
    }
    # CoW merge on an identical twin table produces the same result
    p2 = str(tmp_path / "t2")
    shim.write(df, p2, mode="overwrite")
    shim.merge(spark, src, p2, ["k"], precombine_key="ver")
    got2 = {r.k: (r.ver, r.val) for r in shim.read(spark, p2).collect()}
    assert got2 == got


def test_dv_merge_mor_ghost_row_does_not_outrank_reinsert(spark, tmp_path):
    """Round-5 advisor finding (high): _merge_mor scanned touched files
    RAW, so a row already deleted by an existing DV re-entered the
    precombine window as a ghost and could out-rank the source row —
    an upsert of a previously DV-deleted key with a LOWER precombine
    value was silently dropped instead of inserted.  The live-row scan
    (_mor_scan) must exclude existing DV rows; CoW agrees."""
    p = str(tmp_path / "t")
    df = _df1(
        spark, [(1, 50, "orig"), (2, 20, "x"), (3, 30, "x")], "k int, ver int, val string")
    shim.write(df, p, mode="overwrite")
    # DV-delete key 1 (its ver=50 row becomes a ghost in the data file)
    res = shim.delete(spark, _keys(spark, [1]), p, ["k"], use_deletion_vectors=True)
    assert res["rows_deleted"] == 1
    assert shim.read(spark, p).where("k = 1").count() == 0
    # MoR-merge key 1 back with a LOWER precombine value (5 < 50),
    # alongside a live key (2) so the file IS touched and the ghost
    # enters the scan: the ghost must not win — key 1 is live again
    src = _df1(spark, [(1, 5, "reborn"), (2, 25, "upd2")], "k int, ver int, val string"
    )
    shim.merge(spark, src, p, ["k"], precombine_key="ver", use_deletion_vectors=True)
    got = {r.k: (r.ver, r.val) for r in shim.read(spark, p).collect()}
    assert got == {1: (5, "reborn"), 2: (25, "upd2"), 3: (30, "x")}
    # no-precombine variant: same reinsert contract
    p2 = str(tmp_path / "t2")
    shim.write(df, p2, mode="overwrite")
    shim.delete(spark, _keys(spark, [1]), p2, ["k"], use_deletion_vectors=True)
    shim.merge(spark, src, p2, ["k"], use_deletion_vectors=True)
    got2 = {r.k: (r.ver, r.val) for r in shim.read(spark, p2).collect()}
    assert got2 == {1: (5, "reborn"), 2: (25, "upd2"), 3: (30, "x")}
    # the foreign Delta reader agrees with the shim reader
    got_d = {r.k: (r.ver, r.val) for r in dl.read_delta_log(spark, p).collect()}
    assert got_d == got


def test_dv_delete_twice_same_key_is_noop_second_time(spark, tmp_path):
    """Deleting a key whose rows are all already DV-deleted must be a
    clean no-op commit (kept_touched path), not a crash or a bogus
    rows_deleted count."""
    p = str(tmp_path / "t")
    _mk_table(spark, p, n=40)
    r1 = shim.delete(spark, _keys(spark, [4, 5]), p, ["k"], use_deletion_vectors=True)
    assert r1["rows_deleted"] == 2
    r2 = shim.delete(spark, _keys(spark, [4, 5]), p, ["k"], use_deletion_vectors=True)
    assert r2["rows_deleted"] == 0
    assert shim.read(spark, p).count() == 38
    assert sorted(r.k for r in shim.read(spark, p).where("k < 8").collect()) == [
        0, 1, 2, 3, 6, 7
    ]


def _foreign_delta(spark, p, *, partitioned=False, dv_on_first=False,
                   extra_config=None, protocol=None):
    """Hand-write a minimal foreign (delta-rs-shaped) Delta table."""
    os.makedirs(os.path.join(p, "_delta_log"))
    fields = [
        {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "v", "type": "integer", "nullable": True, "metadata": {}},
    ]
    if partitioned:
        fields.append(
            {"name": "part", "type": "string", "nullable": True, "metadata": {}}
        )
    schema_str = json.dumps({"type": "struct", "fields": fields})

    def _w(version, actions):
        with open(
            os.path.join(p, "_delta_log", f"{version:020d}.json"), "w"
        ) as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    def _data(rows, sub):
        df = _df1(spark, rows, "k int, v int")
        df.write.parquet(os.path.join(p, sub))
        f = next(
            x for x in os.listdir(os.path.join(p, sub)) if x.endswith(".parquet")
        )
        return f"{sub}/{f}"

    if partitioned:
        f0 = _data([(1, 10), (2, 20)], "part=a")
        f1 = _data([(3, 30)], "part=b")
        pv0, pv1 = {"part": "a"}, {"part": "b"}
    else:
        f0 = _data([(1, 10), (2, 20)], "d0")
        f1 = _data([(3, 30)], "d1")
        pv0 = pv1 = {}
    prot = protocol or {"minReaderVersion": 1, "minWriterVersion": 2}
    _w(0, [
        {"protocol": prot},
        {"metaData": {
            "id": "foreign-id", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str,
            "partitionColumns": ["part"] if partitioned else [],
            "configuration": extra_config or {},
        }},
        {"add": {"path": f0, "partitionValues": pv0, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}},
    ])
    add1 = {"path": f1, "partitionValues": pv1, "size": 1,
            "modificationTime": 0, "dataChange": True}
    acts = [{"add": add1}]
    if dv_on_first:
        # "foreign" DV deleting row 0 of f0 (k=1), in the std layout
        dv = dl.write_dv_file(p, [0], prefix="fdv")
        acts += [
            {"remove": {"path": f0, "deletionTimestamp": 1, "dataChange": True}},
            {"add": {"path": f0, "partitionValues": pv0, "size": 1,
                     "modificationTime": 0, "dataChange": True,
                     "deletionVector": dv}},
        ]
    _w(1, acts)
    return f0, f1


def test_convert_from_delta_and_continue_chain(spark, tmp_path):
    """Adopting a foreign DV-bearing Delta table: lakelite reads it,
    appends/deletes continue the SAME _delta_log chain, and the foreign
    reader keeps following."""
    p = str(tmp_path / "foreign")
    _foreign_delta(spark, p, dv_on_first=True)
    res = dl.convert_from_delta(p)
    assert res == {"delta_version": 1, "files": 2, "dv_files": 1}

    # lakelite read == foreign-log read (k=1 deleted by the foreign DV)
    ours = sorted(tuple(r) for r in shim.read(spark, p).collect())
    assert ours == [(2, 20), (3, 30)]
    assert ours == sorted(tuple(r) for r in dl.read_delta_log(spark, p).collect())

    # append continues the chain at delta version 2
    shim.write(spark.createDataFrame([(9, 90)], "k int, v int"), p)
    assert dl.delta_versions(p) == [0, 1, 2]
    got = sorted(tuple(r) for r in dl.read_delta_log(spark, p).collect())
    assert got == [(2, 20), (3, 30), (9, 90)]

    # a DV delete of a FOREIGN file merges with its foreign DV
    shim.delete(spark, _keys(spark, [2]), p, ["k"], use_deletion_vectors=True)
    assert dl.delta_versions(p) == [0, 1, 2, 3]
    got2 = sorted(tuple(r) for r in dl.read_delta_log(spark, p).collect())
    assert got2 == [(3, 30), (9, 90)]
    assert got2 == sorted(tuple(r) for r in shim.read(spark, p).collect())
    # the version-3 commit carries the spec'd remove+add-with-DV pair
    acts = dl._read_actions(p, 3)
    assert any("remove" in a for a in acts)
    assert any(a.get("add", {}).get("deletionVector") for a in acts)


def test_convert_from_delta_hive_partitioned(spark, tmp_path):
    p = str(tmp_path / "foreign")
    _foreign_delta(spark, p, partitioned=True)
    res = dl.convert_from_delta(p)
    assert res["files"] == 2
    got = sorted(tuple(r) for r in shim.read(spark, p).collect())
    assert got == [(1, 10, "a"), (2, 20, "a"), (3, 30, "b")]
    # partition-filter pruning works off the imported partition_values
    only_b = shim.read(
        spark, p, partition_filter=lambda pv: pv.get("part") == "b"
    )
    assert [tuple(r) for r in only_b.collect()] == [(3, 30, "b")]


def _foreign_mapped_delta(spark, p):
    """Hand-write a foreign NAME-column-mapped Delta table (the delta-rs
    / Delta Spark default for new tables): logical columns k/v/part map
    to col-uuid physical names, parquet files and partition dirs carry
    the PHYSICAL names, partitionValues are physical-keyed (the
    protocol's column-mapping rule)."""
    os.makedirs(os.path.join(p, "_delta_log"))
    phys = {"k": "col-aaa1", "v": "col-bbb2", "part": "col-ccc3"}
    fields = [
        {
            "name": n,
            "type": "integer" if n in ("k", "v") else "string",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": i + 1,
                "delta.columnMapping.physicalName": phys[n],
            },
        }
        for i, n in enumerate(["k", "v", "part"])
    ]
    schema_str = json.dumps({"type": "struct", "fields": fields})

    def _data(rows, sub):
        df = _df1(spark, rows, f"`{phys['k']}` int, `{phys['v']}` int")
        df.write.parquet(os.path.join(p, sub))
        f = next(
            x for x in os.listdir(os.path.join(p, sub)) if x.endswith(".parquet")
        )
        return f"{sub}/{f}"

    f0 = _data([(1, 10), (2, 20)], f"{phys['part']}=a")
    f1 = _data([(3, 30)], f"{phys['part']}=b")
    with open(os.path.join(p, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {
                "id": "mapped-id",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_str,
                "partitionColumns": ["part"],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
            }},
            {"add": {"path": f0, "partitionValues": {phys["part"]: "a"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
            {"add": {"path": f1, "partitionValues": {phys["part"]: "b"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ]:
            fh.write(json.dumps(a) + "\n")
    return phys


def test_convert_from_delta_name_mapped(spark, tmp_path):
    """Round-5 verdict item 3: adopt a NAME-column-mapped foreign table
    for writes.  Lakelite speaks logical names at the boundary, runs
    physical inside, and the continued _delta_log keeps the mapping
    intact for foreign readers (read_delta_log resolves it)."""
    p = str(tmp_path / "mapped")
    phys = _foreign_mapped_delta(spark, p)
    res = dl.convert_from_delta(p)
    assert res["files"] == 2

    # lakelite read speaks LOGICAL names
    df = shim.read(spark, p)
    assert set(df.columns) == {"k", "v", "part"}
    assert sorted(tuple(r) for r in df.collect()) == [
        (1, 10, "a"), (2, 20, "a"), (3, 30, "b")
    ]
    # the foreign reader agrees (mapping resolved from the v0 metaData)
    got_d = sorted(tuple(r) for r in dl.read_delta_log(spark, p).collect())
    assert got_d == [(1, 10, "a"), (2, 20, "a"), (3, 30, "b")]
    # logical partition filter and column pruning work at the boundary
    only_b = shim.read(
        spark, p, partition_filter=lambda pv: pv.get("part") == "b",
        columns=["k", "part"],
    )
    assert [tuple(r) for r in only_b.collect()] == [(3, "b")]

    # a lakelite MERGE with a LOGICAL source continues the chain
    src = spark.createDataFrame(
        [(2, 99, "a"), (9, 90, "b")], "k int, v int, part string"
    )
    shim.merge(spark, src, p, ["k"])
    assert dl.delta_versions(p) == [0, 1]
    got2 = sorted(tuple(r) for r in dl.read_delta_log(spark, p).collect())
    assert got2 == [(1, 10, "a"), (2, 99, "a"), (3, 30, "b"), (9, 90, "b")]
    assert got2 == sorted(tuple(r) for r in shim.read(spark, p).collect())
    # new add actions carry PHYSICAL partitionValues keys (protocol rule)
    adds = [a["add"] for a in dl._read_actions(p, 1) if "add" in a]
    assert adds and all(
        set(a["partitionValues"]) == {phys["part"]} for a in adds
    )

    # DV delete with a logical key: protocol upgrade keeps columnMapping
    shim.delete(spark, _keys(spark, [1]), p, ["k"], use_deletion_vectors=True)
    prot = next(
        a["protocol"] for a in dl._read_actions(p, 2) if "protocol" in a
    )
    assert "deletionVectors" in prot["readerFeatures"]
    assert "columnMapping" in prot["readerFeatures"]
    assert {"deletionVectors", "columnMapping"} <= set(prot["writerFeatures"])
    got3 = sorted(tuple(r) for r in dl.read_delta_log(spark, p).collect())
    assert got3 == [(2, 99, "a"), (3, 30, "b"), (9, 90, "b")]
    assert got3 == sorted(tuple(r) for r in shim.read(spark, p).collect())

    # compact materializes the DVs and stays mapped: both readers agree
    shim.compact(spark, p)
    got4 = sorted(tuple(r) for r in shim.read(spark, p).collect())
    assert got4 == got3
    assert got4 == sorted(tuple(r) for r in dl.read_delta_log(spark, p).collect())
    assert set(shim.read(spark, p).columns) == {"k", "v", "part"}

    # a lakelite append with a LOGICAL frame keeps working post-compact
    shim.write(spark.createDataFrame([(7, 70, "a")], "k int, v int, part string"), p)
    assert shim.read(spark, p).where("k = 7").count() == 1

    # schema evolution on a mapped table is refused loudly
    wide = spark.createDataFrame(
        [(7, 70, "a", "x")], "k int, v int, part string, extra string"
    )
    with pytest.raises(Exception, match="column-mapped"):
        shim.write(wide, p, schema_mode="merge")


def test_convert_from_delta_refusals(spark, tmp_path):
    # name-mode column mapping whose fields lack physicalName metadata
    p1 = str(tmp_path / "cm")
    _foreign_delta(
        spark, p1, extra_config={"delta.columnMapping.mode": "name"}
    )
    with pytest.raises(Exception, match="column-mapped|physicalName"):
        dl.convert_from_delta(p1)
    # id-mode column mapping (field-id parquet resolution): refused
    p1b = str(tmp_path / "cmid")
    _foreign_delta(
        spark, p1b, extra_config={"delta.columnMapping.mode": "id"}
    )
    with pytest.raises(Exception, match="only mode 'name'"):
        dl.convert_from_delta(p1b)
    # name-mode with a NESTED physical rename: refused (both this repo's
    # readers translate top-level only — exposing physical inner names
    # would be a silent wrong answer)
    p1c = str(tmp_path / "cmnest")
    os.makedirs(os.path.join(p1c, "_delta_log"))
    nested_schema = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-a"}},
        {"name": "s", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-b"},
         "type": {"type": "struct", "fields": [
             {"name": "inner", "type": "integer", "nullable": True,
              "metadata": {"delta.columnMapping.id": 3,
                           "delta.columnMapping.physicalName": "col-c"}},
         ]}},
    ]})
    with open(os.path.join(p1c, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {"id": "n", "format": {"provider": "parquet", "options": {}},
                          "schemaString": nested_schema, "partitionColumns": [],
                          "configuration": {"delta.columnMapping.mode": "name"}}},
        ]:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(Exception, match="NESTED"):
        dl.convert_from_delta(p1c)
    # append-only contract
    p2 = str(tmp_path / "ao")
    _foreign_delta(spark, p2, extra_config={"delta.appendOnly": "true"})
    with pytest.raises(Exception, match="appendOnly"):
        dl.convert_from_delta(p2)
    # unsupported writer features
    p3 = str(tmp_path / "wf")
    _foreign_delta(
        spark, p3,
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["invariants"]},
    )
    with pytest.raises(Exception, match="writer"):
        dl.convert_from_delta(p3)
    # non-hive layout with partition columns: values live only in the log
    p4 = str(tmp_path / "flat")
    os.makedirs(os.path.join(p4, "_delta_log"))
    df = _df1(spark, [(1, 10)], "k int, v int")
    df.write.parquet(os.path.join(p4, "flat0"))
    f = next(x for x in os.listdir(os.path.join(p4, "flat0"))
             if x.endswith(".parquet"))
    schema_str = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "v", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "part", "type": "string", "nullable": True, "metadata": {}},
    ]})
    with open(os.path.join(p4, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                          "schemaString": schema_str,
                          "partitionColumns": ["part"], "configuration": {}}},
            {"add": {"path": f"flat0/{f}", "partitionValues": {"part": "7"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ]:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(Exception, match="non-hive"):
        dl.convert_from_delta(p4)
    # already a lakelite table
    p5 = str(tmp_path / "ll")
    _mk_table(spark, p5, n=4, parts=1)
    with pytest.raises(Exception, match="already"):
        dl.convert_from_delta(p5)


def test_delta_clean_log_retention(spark, tmp_path):
    """Log retention: JSON commits covered by the newest checkpoint are
    removable; readers recover THROUGH the checkpoint (time travel below
    the cut refuses loudly instead of misreading)."""
    p = str(tmp_path / "t")
    shim.write(_df1(spark, [(0, 0)], "k int, v int"), p, mode="overwrite")
    for i in range(1, 12):
        shim.write(spark.createDataFrame([(i, i)], "k int, v int"), p)
    # the exporter checkpoints every 10 commits -> checkpoint at delta v9
    assert dl.checkpoint_versions(p) == [9]
    removed = dl.clean_log(p)
    assert removed == list(range(9))
    assert dl.delta_versions(p) == [9, 10, 11]
    # latest read recovers through the checkpoint
    assert dl.read_delta_log(spark, p).count() == 12
    # time travel at/after the checkpoint works; below it refuses
    assert dl.read_delta_log(spark, p, version=10).count() == 11
    assert dl.read_delta_log(spark, p, version=9).count() == 10
    with pytest.raises(Exception, match="not reachable"):
        dl.read_delta_log(spark, p, version=5)
    # keep_versions retains headroom below the checkpoint
    p2 = str(tmp_path / "t2")
    shim.write(spark.createDataFrame([(0, 0)], "k int, v int"), p2, mode="overwrite")
    for i in range(1, 12):
        shim.write(spark.createDataFrame([(i, i)], "k int, v int"), p2)
    assert dl.clean_log(p2, keep_versions=3) == list(range(6))
    assert dl.delta_versions(p2)[0] == 6
    # and the table still accepts new commits afterwards
    shim.write(spark.createDataFrame([(99, 99)], "k int, v int"), p2)
    assert dl.read_delta_log(spark, p2).count() == 13


def test_dv_merge_mor_null_safe_keys(spark, tmp_path):
    """MoR merge with match_nulls: a NULL-keyed target row is one
    identity (Delta's <=>) — its old version joins the DV and the
    source's NULL-keyed row lands as the new version."""
    p = str(tmp_path / "t")
    df = _df1(
        spark, [(1, "a"), (None, "nullkey-old"), (3, "c")], "k int, v string")
    shim.write(df, p, mode="overwrite")
    src = spark.createDataFrame(
        [(None, "nullkey-new"), (9, "ins")], "k int, v string"
    )
    res = shim.merge(
        spark, src, p, ["k"], match_nulls=True, use_deletion_vectors=True
    )
    assert res["files_rewritten"] == 0 and res["rows_deleted"] == 1
    got = sorted(
        (r.k if r.k is not None else -1, r.v)
        for r in shim.read(spark, p).collect()
    )
    assert got == [(-1, "nullkey-new"), (1, "a"), (3, "c"), (9, "ins")]


def test_convert_from_delta_checkpoint_seeded(spark, tmp_path):
    """A foreign table whose old JSON commits were cleaned up imports
    from the newest checkpoint (the protocol's recovery path) and the
    chain continues above the imported version."""
    import shutil

    p = str(tmp_path / "t")
    shim.write(spark.createDataFrame([(0, 0)], "k int, v int"), p,
               mode="overwrite")
    for i in range(1, 12):
        shim.write(spark.createDataFrame([(i, i)], "k int, v int"), p)
    assert len(dl.clean_log(p)) == 9  # checkpoint at delta v9
    # forget the lakelite identity: now a FOREIGN checkpoint-seeded log
    shutil.rmtree(os.path.join(p, "_lakelite"))
    res = dl.convert_from_delta(p)
    assert res["delta_version"] == 11
    assert shim.read(spark, p).count() == 12
    shim.write(spark.createDataFrame([(99, 99)], "k int, v int"), p)
    assert dl.delta_versions(p)[-1] == 12
    assert dl.read_delta_log(spark, p).count() == 13
