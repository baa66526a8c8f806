"""Jar-free Iceberg v2 metadata interop (iceberg_meta.py + avro_ocf.py).

Three independent validation layers:
1. Avro binary codec vs the SPEC's own golden vectors (zigzag/varint).
2. CROSS-IMPLEMENTATION: files written by the pure-Python writer are
   read back by the Apache Avro *Java* library that ships on the Spark
   JVM classpath (avro-1.12.1.jar), and files written by the Java
   ``DataFileWriter`` are read back by the Python reader — so the codec
   is pinned against Apache's reference implementation, not itself.
3. Table level: every exported snapshot read through the Iceberg
   metadata chain (version-hint -> metadata.json -> manifest list ->
   manifests) equals the direct lakelite read, snapshot by snapshot,
   plus spec-shape assertions on the metadata.json required fields.

Reference behavior being interop'd: awswrangler writes real Iceberg
through Athena (athena/_write_iceberg.py:411) and S3 Tables
(s3/_s3_tables_iceberg.py:160).
"""

from __future__ import annotations

import json
import os

import pytest

from aws_sdk_pandas_spark import avro_ocf, iceberg_meta, lakehouse, lakehouse_shim as shim
from aws_sdk_pandas_spark.exceptions import InvalidArgument



def _df1(spark, rows, schema):
    # ONE slice — a multi-slice local frame pays one Python-worker round
    # trip per slice per consuming action through coalesce(1) (measured
    # ~150 ms x defaultParallelism); same rows, same order, one file
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _df(spark, rows, schema="k int, name string, lang string"):
    # ONE slice — see test_delta_log._df: a multi-slice local frame costs
    # one Python-worker round trip per slice per action through coalesce(1)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- avro codec


def test_avro_zigzag_spec_vectors():
    """The Avro spec's binary-encoding examples, byte for byte."""
    def enc(n):
        b = bytearray()
        avro_ocf.encode_long(n, b)
        return bytes(b)

    assert enc(0) == b"\x00"
    assert enc(-1) == b"\x01"
    assert enc(1) == b"\x02"
    assert enc(-2) == b"\x03"
    assert enc(2) == b"\x04"
    assert enc(-64) == b"\x7f"
    assert enc(64) == b"\x80\x01"
    for v in (0, 1, -1, 63, -64, 8191, 2**62, -(2**62), 123456789):
        assert avro_ocf.decode_long(enc(v), 0)[0] == v


def test_avro_container_roundtrip(tmp_path):
    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"], "default": None},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ],
    }
    recs = [
        {"s": "héllo", "n": None, "d": 2.5, "b": True, "raw": b"\x00\xff",
         "arr": [1, -2, 3], "m": {"a": "x"}},
        {"s": "", "n": -(2**40), "d": -0.0, "b": False, "raw": b"",
         "arr": [], "m": {}},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        avro_ocf.write_container(p, schema, recs, codec=codec,
                                 metadata={"k": "v"})
        s, meta, got = avro_ocf.read_container(p)
        assert got == recs
        assert meta["k"] == b"v"
        assert meta["avro.codec"] == codec.encode()


def test_avro_cross_validation_with_java(spark, tmp_path):
    """Python-written OCF read by org.apache.avro (Java), and Java-written
    OCF read by the Python reader — cross-implementation, both codecs."""
    jvm = spark._jvm
    schema = {
        "type": "record", "name": "rec", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snap", "type": ["null", "long"], "default": None},
            {"name": "path", "type": "string"},
            {"name": "ids", "type": {"type": "array", "items": "long"}},
        ],
    }
    recs = [
        {"status": 1, "snap": 1234567890123, "path": "a/b.parquet",
         "ids": [1, 2, 3]},
        {"status": 0, "snap": None, "path": "é-unicode", "ids": []},
    ]
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))

    for codec in ("null", "deflate"):
        py_file = str(tmp_path / f"py_{codec}.avro")
        avro_ocf.write_container(py_file, schema, recs, codec=codec)
        reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
        dfr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(py_file), reader
        )
        got = []
        while dfr.hasNext():
            r = dfr.next()
            ids = r.get("ids")
            got.append(
                (r.get("status"), r.get("snap"), str(r.get("path")),
                 [ids.get(i) for i in range(ids.size())])
            )
        dfr.close()
        assert got == [
            (1, 1234567890123, "a/b.parquet", [1, 2, 3]),
            (0, None, "é-unicode", []),
        ], f"java misread python-written avro ({codec})"

    # reverse: Java writes, Python reads
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    java_file = str(tmp_path / "java.avro")
    dfw.create(jschema, jvm.java.io.File(java_file))
    for rec in recs:
        jr = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        jr.put("status", rec["status"])
        jr.put("snap", rec["snap"])
        jr.put("path", rec["path"])
        arr = jvm.java.util.ArrayList()
        for i in rec["ids"]:
            arr.add(jvm.java.lang.Long(i))
        jr.put("ids", arr)
        dfw.append(jr)
    dfw.close()
    _s, _m, got = avro_ocf.read_container(java_file)
    assert got == recs, "python misread java-written avro"


def test_avro_random_roundtrip_property():
    """Hypothesis: random record schemas (primitives, [null, X] unions,
    arrays, maps, nested records) with random matching values round-trip
    bit-exactly through the container codec."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    prim = st.sampled_from(["boolean", "int", "long", "string", "bytes", "double"])

    def type_and_value(depth=0):
        base = prim.flatmap(lambda t: st.tuples(st.just(t), _value_for(t)))
        if depth >= 2:
            return base
        nested = st.deferred(
            lambda: st.one_of(
                base,
                # optional union
                prim.flatmap(
                    lambda t: st.tuples(
                        st.just(["null", t]),
                        st.one_of(st.none(), _value_for(t)),
                    )
                ),
                # array
                type_and_value(depth + 1).flatmap(
                    lambda tv: st.tuples(
                        st.just({"type": "array", "items": tv[0]}),
                        st.lists(st.just(tv[1]), max_size=3),
                    )
                ),
                # map
                type_and_value(depth + 1).flatmap(
                    lambda tv: st.tuples(
                        st.just({"type": "map", "values": tv[0]}),
                        st.dictionaries(
                            st.text(max_size=5), st.just(tv[1]), max_size=3
                        ),
                    )
                ),
            )
        )
        return nested

    def _value_for(t):
        return {
            "boolean": st.booleans(),
            "int": st.integers(-(2**31), 2**31 - 1),
            "long": st.integers(-(2**63), 2**63 - 1),
            "string": st.text(max_size=20),
            "bytes": st.binary(max_size=20),
            "double": st.floats(allow_nan=False),
        }[t]

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(type_and_value(), min_size=1, max_size=5),
        st.integers(1, 3),
        st.sampled_from(["null", "deflate"]),
    )
    def run(field_tvs, n_records, codec):
        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": f"f{i}", "type": t} for i, (t, _v) in enumerate(field_tvs)
            ],
        }
        recs = [
            {f"f{i}": v for i, (_t, v) in enumerate(field_tvs)}
            for _ in range(n_records)
        ]
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/t.avro"
            avro_ocf.write_container(path, schema, recs, codec=codec)
            _s, _m, got = avro_ocf.read_container(path)
        assert got == recs

    run()


# ------------------------------------------------------------- table export


def test_export_and_read_every_snapshot(spark, tmp_path):
    """Partitioned table through append / dynamic partition overwrite /
    merge / delete: every snapshot read via the Iceberg metadata chain
    equals the direct lakelite read."""
    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", "en"), (2, "b", "fr")]), p,
               mode="overwrite", partition_cols=["lang"])
    shim.write(_df(spark, [(3, "c", "en")]), p, mode="append",
               partition_cols=["lang"])
    shim.merge(spark, _df(spark, [(2, "B2", "fr"), (4, "d", "de")]), p, ["k"])
    shim.delete(spark, _df(spark, [(1, None, None)], "k int, name string, lang string"),
                p, ["k"])

    assert lakehouse.convert_to_iceberg(p) == 4
    meta = iceberg_meta._load_metadata(p)
    assert len(meta["snapshots"]) == 4

    for v, snap in enumerate(meta["snapshots"]):
        want = _sorted_rows(shim.read(spark, p, version=v))
        got = _sorted_rows(
            iceberg_meta.read_iceberg_meta(spark, p, snapshot_id=snap["snapshot-id"])
        )
        assert got == want, f"snapshot {v} mismatch"

    # current snapshot == latest lakelite
    assert _sorted_rows(iceberg_meta.read_iceberg_meta(spark, p)) == _sorted_rows(
        shim.read(spark, p)
    )
    # idempotent re-export
    assert lakehouse.convert_to_iceberg(p) == 0


def test_metadata_json_spec_shape(spark, tmp_path):
    """The v2 required fields from the spec's 'Table Metadata' table,
    identity partition spec fields, and snapshot summary/string rules."""
    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", "en"), (2, "b", "fr")]), p,
               mode="overwrite", partition_cols=["lang"])
    shim.write(_df(spark, [(3, "c", "en")]), p, mode="append",
               partition_cols=["lang"])
    lakehouse.convert_to_iceberg(p)

    meta = iceberg_meta._load_metadata(p)
    for key in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
        "default-spec-id", "partition-specs", "last-partition-id",
        "default-sort-order-id", "sort-orders", "current-snapshot-id",
        "snapshots", "snapshot-log", "metadata-log",
    ):
        assert key in meta, f"metadata.json missing required {key!r}"
    assert meta["format-version"] == 2

    schema = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    ids = [f["id"] for f in schema["fields"]]
    assert len(ids) == len(set(ids)) and min(ids) >= 1
    assert meta["last-column-id"] >= max(ids)

    spec = next(
        s for s in meta["partition-specs"] if s["spec-id"] == meta["default-spec-id"]
    )
    [pf] = spec["fields"]
    assert pf["transform"] == "identity" and pf["field-id"] == 1000
    src = next(f for f in schema["fields"] if f["id"] == pf["source-id"])
    assert src["name"] == "lang"

    # v2 sequence numbers are monotone from 1; summary values are strings
    seqs = [s["sequence-number"] for s in meta["snapshots"]]
    assert seqs == [1, 2]
    for s in meta["snapshots"]:
        assert s["summary"]["operation"] in ("append", "overwrite", "delete", "replace")
        assert all(isinstance(x, str) for x in s["summary"].values())
    # append snapshot counts: 1 added file into en, everything else carried
    assert meta["snapshots"][1]["summary"]["added-records"] == "1"
    assert meta["snapshots"][1]["summary"]["total-records"] == "3"
    # snapshot parentage chain
    assert meta["snapshots"][1]["parent-snapshot-id"] == meta["snapshots"][0]["snapshot-id"]


def test_manifest_entries_added_vs_existing(spark, tmp_path):
    """An append's manifest must carry the NEW file as ADDED(1) with the
    new sequence number and the carried files as EXISTING(0) with their
    ORIGINAL snapshot-id/sequence-number (spec inheritance rules); a
    delete commit writes a DELETED(2) manifest."""
    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", "en")]).coalesce(1), p, mode="overwrite")
    shim.write(_df(spark, [(2, "b", "fr")]).coalesce(1), p, mode="append")
    shim.delete(spark, _df(spark, [(1, None, None)], "k int, name string, lang string"),
                p, ["k"])
    lakehouse.convert_to_iceberg(p)
    meta = iceberg_meta._load_metadata(p)

    snap0, snap1 = meta["snapshots"][0], meta["snapshots"][1]
    _, _, m1 = avro_ocf.read_container(
        os.path.join(iceberg_meta._meta_dir(p), "icm-00000001-data.avro")
    )
    added = [e for e in m1 if e["status"] == 1]
    existing = [e for e in m1 if e["status"] == 0]
    assert len(added) == 1 and added[0]["sequence_number"] == 2
    assert added[0]["snapshot_id"] == snap1["snapshot-id"]
    assert all(e["sequence_number"] == 1 for e in existing)
    assert all(e["snapshot_id"] == snap0["snapshot-id"] for e in existing)

    # the delete commit has a tombstone manifest
    del_path = os.path.join(iceberg_meta._meta_dir(p), "icm-00000002-del.avro")
    assert os.path.exists(del_path)
    _, _, m2 = avro_ocf.read_container(del_path)
    assert all(e["status"] == 2 for e in m2) and len(m2) >= 1

    # manifest-list counts reconcile with the entries
    _, _, mlist = avro_ocf.read_container(
        iceberg_meta._local(snap1["manifest-list"])
    )
    [mf] = mlist
    assert (mf["added_files_count"], mf["existing_files_count"]) == (
        len(added), len(existing),
    )


def test_manifest_column_bounds_and_java_readability(spark, tmp_path):
    """stats_cols min/max land as Iceberg lower/upper bounds (field-id
    keyed, single-value binary serialization), and the REAL manifest
    Avro file is readable by the Apache Avro Java library."""
    import json as _json
    import struct

    p = str(tmp_path / "t")
    df = _df1(spark, [(5, "alpha", "en"), (42, "zulu", "en")], "k int, name string, lang string")
    shim.write(df, p, mode="overwrite", stats_cols=["k", "name"])
    lakehouse.convert_to_iceberg(p)

    mpath = os.path.join(iceberg_meta._meta_dir(p), "icm-00000000-data.avro")
    _s, fmeta, entries = avro_ocf.read_container(mpath)
    [entry] = entries
    schema = _json.loads(fmeta["schema"].decode())
    fid = {f["name"]: f["id"] for f in schema["fields"]}
    lower = {r["key"]: r["value"] for r in entry["data_file"]["lower_bounds"]}
    upper = {r["key"]: r["value"] for r in entry["data_file"]["upper_bounds"]}
    assert struct.unpack("<i", lower[fid["k"]])[0] == 5
    assert struct.unpack("<i", upper[fid["k"]])[0] == 42
    assert lower[fid["name"]] == b"alpha" and upper[fid["name"]] == b"zulu"
    assert entry["data_file"]["record_count"] == 2

    # the actual manifest (not a toy schema) parses in Java Avro
    jvm = spark._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(mpath),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    n = 0
    while dfr.hasNext():
        rec = dfr.next()
        assert rec.get("status") == 1
        n += 1
    dfr.close()
    assert n == 1
    # and so does the manifest list
    meta = iceberg_meta._load_metadata(p)
    lpath = iceberg_meta._local(meta["snapshots"][0]["manifest-list"])
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(lpath),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    assert dfr.hasNext() and dfr.next().get("added_files_count") == 1
    dfr.close()


def test_schema_evolution_preserves_field_ids(spark, tmp_path):
    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", "en")]), p, mode="overwrite")
    shim.write(
        _df1(spark, [(2, "b", "fr", 9)],
                              "k int, name string, lang string, extra int"),
        p, mode="append", schema_mode="merge",
    )
    lakehouse.convert_to_iceberg(p)
    meta = iceberg_meta._load_metadata(p)
    assert len(meta["schemas"]) == 2
    s0 = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    s1 = {f["name"]: f["id"] for f in meta["schemas"][1]["fields"]}
    for name, fid in s0.items():
        assert s1[name] == fid, f"field id of {name!r} changed across evolution"
    assert s1["extra"] == meta["last-column-id"]
    # evolved table still reads correctly through the metadata chain
    got = _sorted_rows(iceberg_meta.read_iceberg_meta(spark, p))
    assert got == _sorted_rows(shim.read(spark, p))


def test_to_iceberg_tables_carry_metadata_and_sticky_export(spark, tmp_path):
    """to_iceberg-created tables carry real Iceberg metadata by default,
    later commits keep it current via the shim's sticky sidecar, and
    read_iceberg reads through it (snapshot pin both ways)."""
    table = "icebergdb.sticky"
    path = lakehouse._iceberg_table_path(spark, table)
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    lakehouse.to_iceberg(_df(spark, [(1, "a", "en")]), table, mode="overwrite")
    assert iceberg_meta.has_iceberg_meta(path)
    # a later commit exports WITHOUT an explicit convert call
    lakehouse.to_iceberg(_df(spark, [(2, "b", "fr")]), table, mode="append")
    assert len(iceberg_meta._load_metadata(path)["snapshots"]) == 2

    assert lakehouse.read_iceberg(spark, table).count() == 2
    # back-compat small-int version pin and real snapshot-id pin agree
    meta = iceberg_meta._load_metadata(path)
    assert lakehouse.read_iceberg(spark, table, snapshot_id=0).count() == 1
    real = meta["snapshots"][0]["snapshot-id"]
    assert lakehouse.read_iceberg(spark, table, snapshot_id=real).count() == 1
    with pytest.raises(InvalidArgument, match="no Iceberg snapshot"):
        lakehouse.read_iceberg(spark, table, snapshot_id=7)
    shutil.rmtree(path, ignore_errors=True)


def test_reader_partition_pruning_via_constant_folding(spark, tmp_path):
    """The reader injects identity-partition values as LITERALS, so a
    filter on the partition column constant-folds to FALSE on
    non-matching branches and Catalyst collapses the union — one
    surviving relation out of three partitions, no data read from the
    pruned ones."""
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "fr"), (3, "c", "de")],
        "k int, name string, lang string",
    )
    shim.write(df, p, mode="overwrite", partition_cols=["lang"])
    lakehouse.convert_to_iceberg(p)
    out = iceberg_meta.read_iceberg_meta(spark, p).where("lang = 'en'")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation [") == 1, plan
    assert [tuple(r) for r in out.collect()] == [(1, "a", "en")]


def test_reader_handles_foreign_v1_table(spark, tmp_path):
    """A format-v1 table laid out the way real engines wrote them —
    single 'schema' key, snapshot-inlined 'manifests' list, manifest
    entries without v2 sequence fields or data_file.content — reads
    through the same chain."""
    import json as _json

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "metadata"))
    # one plain parquet data file
    _df1(spark, [(1, "a"), (2, "b")], "k int, name string") \
        .write.parquet(os.path.join(root, "data"))
    dfile = next(
        os.path.join(root, "data", f)
        for f in os.listdir(os.path.join(root, "data"))
        if f.endswith(".parquet")
    )
    v1_entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None,
             "field-id": 1},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": []},
                     "field-id": 102},
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                ]}, "field-id": 2},
        ],
    }
    mpath = os.path.join(root, "metadata", "m0.avro")
    avro_ocf.write_container(
        mpath, v1_entry_schema,
        [{"status": 1, "snapshot_id": 99, "data_file": {
            "file_path": dfile, "file_format": "PARQUET", "partition": {},
            "record_count": 2, "file_size_in_bytes": os.path.getsize(dfile)}}],
        metadata={"partition-spec": "[]", "format-version": "1",
                  "content": "data"},
    )
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": root,
        "last-updated-ms": 1,
        "last-column-id": 2,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "k", "required": False, "type": "int"},
            {"id": 2, "name": "name", "required": False, "type": "string"},
        ]},
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": 99,
        "snapshots": [{"snapshot-id": 99, "timestamp-ms": 1,
                       "manifests": [mpath]}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        _json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    got = iceberg_meta.read_iceberg_meta(spark, root)
    assert sorted(tuple(r) for r in got.collect()) == [(1, "a"), (2, "b")]
    assert [f.dataType.simpleString() for f in got.schema.fields] == ["int", "string"]


def test_reader_applies_positional_deletes(spark, tmp_path):
    """v2 merge-on-read: a content=1 delete manifest whose delete file
    lists (file_path, pos) rows removes exactly those positions from
    data files with data sequence number <= the delete's — the shape
    Athena/Flink row-level DELETE writes."""
    import json as _json

    p = str(tmp_path / "t")
    df = _df1(
        spark,
        [(1, "a", "en"), (2, "b", "en"), (3, "c", "en")],
        "k int, name string, lang string",
    )
    shim.write(df.orderBy("k"), p, mode="overwrite")
    lakehouse.convert_to_iceberg(p)
    meta = iceberg_meta._load_metadata(p)
    d = iceberg_meta._meta_dir(p)

    # the single data file and its manifest-list record
    _s, _m, [entry] = avro_ocf.read_container(
        os.path.join(d, "icm-00000000-data.avro")
    )
    data_uri = entry["data_file"]["file_path"]
    _s2, _m2, [data_mf] = avro_ocf.read_container(
        iceberg_meta._local(meta["snapshots"][0]["manifest-list"])
    )

    # which k sits at row_index 1 inside the file (write order != insert
    # order is possible) — compute the expectation from the file itself
    rows = (
        spark.read.parquet(iceberg_meta._local(data_uri))
        .select("k", "_metadata.row_index")
        .collect()
    )
    deleted_k = next(r.k for r in rows if r.row_index == 1)

    # delete parquet (file_path, pos): remove row at position 1
    del_parquet = os.path.join(d, "del-0.parquet")
    _df1(spark, [(data_uri, 1)], "file_path string, pos long") \
        .write.mode("overwrite").parquet(del_parquet + ".dir")
    inner = next(
        f for f in os.listdir(del_parquet + ".dir") if f.endswith(".parquet")
    )
    os.rename(os.path.join(del_parquet + ".dir", inner), del_parquet)

    # delete manifest (content=1 data_file) at sequence 2
    schema_body = {"type": "struct", "fields": _json.loads(
        avro_ocf.read_container(os.path.join(d, "icm-00000000-data.avro"))[1]["schema"]
    )["fields"]}
    entry_schema = iceberg_meta._manifest_entry_schema([], schema_body)
    del_manifest = os.path.join(d, "icm-del.avro")
    n = avro_ocf.write_container(
        del_manifest, entry_schema,
        [{
            "status": 1, "snapshot_id": 777, "sequence_number": 2,
            "file_sequence_number": 2,
            "data_file": {
                "content": 1, "file_path": "file://" + del_parquet,
                "file_format": "PARQUET", "partition": {},
                "record_count": 1,
                "file_size_in_bytes": os.path.getsize(del_parquet),
                "lower_bounds": None, "upper_bounds": None,
            },
        }],
        metadata={"schema": _json.dumps(schema_body), "schema-id": "0",
                  "partition-spec": "[]", "partition-spec-id": "0",
                  "format-version": "2", "content": "deletes"},
    )
    list_path = os.path.join(d, "snap-777-1-test.avro")
    avro_ocf.write_container(
        list_path, iceberg_meta._MANIFEST_FILE_SCHEMA,
        [
            data_mf,
            {**data_mf, "manifest_path": "file://" + del_manifest,
             "manifest_length": n, "content": 1, "sequence_number": 2,
             "min_sequence_number": 2, "added_snapshot_id": 777,
             "added_files_count": 1, "existing_files_count": 0,
             "deleted_files_count": 0, "added_rows_count": 1,
             "existing_rows_count": 0, "deleted_rows_count": 0,
             "partitions": None},
        ],
        metadata={"snapshot-id": "777", "sequence-number": "2",
                  "parent-snapshot-id": str(meta["current-snapshot-id"]),
                  "format-version": "2"},
    )
    meta2 = dict(meta)
    meta2["last-sequence-number"] = 2
    meta2["current-snapshot-id"] = 777
    meta2["snapshots"] = meta["snapshots"] + [{
        "snapshot-id": 777, "sequence-number": 2, "timestamp-ms": 2,
        "manifest-list": "file://" + list_path,
        "summary": {"operation": "delete"}, "schema-id": 0,
        "parent-snapshot-id": meta["current-snapshot-id"],
    }]
    with open(os.path.join(d, "v3.metadata.json"), "w") as fh:
        _json.dump(meta2, fh)
    with open(os.path.join(d, "version-hint.text"), "w") as fh:
        fh.write("3")

    got = sorted(r.k for r in iceberg_meta.read_iceberg_meta(spark, p).collect())
    assert got == sorted({1, 2, 3} - {deleted_k})
    # the pre-delete snapshot still reads all three rows
    old = iceberg_meta.read_iceberg_meta(
        spark, p, snapshot_id=meta["current-snapshot-id"]
    )
    assert old.count() == 3


def test_reader_applies_equality_deletes(spark, tmp_path):
    """v2 equality deletes (content=2, the Flink-CDC shape): rows
    matching the delete file's equality_ids columns null-safely are
    dropped from data files with sequence number STRICTLY below the
    delete's."""
    import copy
    import json as _json

    p = str(tmp_path / "t")
    df = _df1(spark, [(1, "a", "en"), (2, "b", "en"), (3, None, "en")],
        "k int, name string, lang string",
    )
    shim.write(df.orderBy("k"), p, mode="overwrite")
    lakehouse.convert_to_iceberg(p)
    meta = iceberg_meta._load_metadata(p)
    d = iceberg_meta._meta_dir(p)
    _s, fmeta0, _e = avro_ocf.read_container(
        os.path.join(d, "icm-00000000-data.avro")
    )
    schema_body = _json.loads(fmeta0["schema"].decode())
    schema_body.pop("schema-id", None)
    fid = {f["name"]: f["id"] for f in schema_body["fields"]}
    _s2, _m2, [data_mf] = avro_ocf.read_container(
        iceberg_meta._local(meta["snapshots"][0]["manifest-list"])
    )

    # delete by name = NULL (null-safe must match) and by k = 2
    del_parquet = os.path.join(d, "eqdel-0.parquet")
    _df1(spark, [(2, "b"), (3, None)], "k int, name string") \
        .write.mode("overwrite").parquet(del_parquet + ".dir")
    inner = next(
        f for f in os.listdir(del_parquet + ".dir") if f.endswith(".parquet")
    )
    os.rename(os.path.join(del_parquet + ".dir", inner), del_parquet)

    entry_schema = copy.deepcopy(
        iceberg_meta._manifest_entry_schema([], schema_body)
    )
    for f in entry_schema["fields"]:
        if f["name"] == "data_file":
            f["type"]["fields"].append(
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int",
                                   "element-id": 136}],
                 "default": None, "field-id": 135}
            )
    del_manifest = os.path.join(d, "icm-eqdel.avro")
    n = avro_ocf.write_container(
        del_manifest, entry_schema,
        [{
            "status": 1, "snapshot_id": 888, "sequence_number": 2,
            "file_sequence_number": 2,
            "data_file": {
                "content": 2, "file_path": "file://" + del_parquet,
                "file_format": "PARQUET", "partition": {},
                "record_count": 2,
                "file_size_in_bytes": os.path.getsize(del_parquet),
                "lower_bounds": None, "upper_bounds": None,
                "equality_ids": [fid["k"], fid["name"]],
            },
        }],
        metadata={"schema": _json.dumps(schema_body), "schema-id": "0",
                  "partition-spec": "[]", "partition-spec-id": "0",
                  "format-version": "2", "content": "deletes"},
    )
    list_path = os.path.join(d, "snap-888-1-test.avro")
    avro_ocf.write_container(
        list_path, iceberg_meta._MANIFEST_FILE_SCHEMA,
        [
            data_mf,
            {**data_mf, "manifest_path": "file://" + del_manifest,
             "manifest_length": n, "content": 1, "sequence_number": 2,
             "min_sequence_number": 2, "added_snapshot_id": 888,
             "added_files_count": 1, "existing_files_count": 0,
             "deleted_files_count": 0, "added_rows_count": 2,
             "existing_rows_count": 0, "deleted_rows_count": 0,
             "partitions": None},
        ],
        metadata={"snapshot-id": "888", "sequence-number": "2",
                  "parent-snapshot-id": str(meta["current-snapshot-id"]),
                  "format-version": "2"},
    )
    meta2 = dict(meta)
    meta2["last-sequence-number"] = 2
    meta2["current-snapshot-id"] = 888
    meta2["snapshots"] = meta["snapshots"] + [{
        "snapshot-id": 888, "sequence-number": 2, "timestamp-ms": 2,
        "manifest-list": "file://" + list_path,
        "summary": {"operation": "delete"}, "schema-id": 0,
        "parent-snapshot-id": meta["current-snapshot-id"],
    }]
    with open(os.path.join(d, "v3.metadata.json"), "w") as fh:
        _json.dump(meta2, fh)
    with open(os.path.join(d, "version-hint.text"), "w") as fh:
        fh.write("3")

    got = sorted(r.k for r in iceberg_meta.read_iceberg_meta(spark, p).collect())
    assert got == [1]  # k=2 matched exactly; k=3 matched with NULL name
    assert iceberg_meta.read_iceberg_meta(
        spark, p, snapshot_id=meta["current-snapshot-id"]
    ).count() == 3


def test_reader_resolves_by_parquet_field_id(spark, tmp_path):
    """Engine-written files carry parquet field ids; the spec says
    resolve columns by ID, not name — so a table whose columns were
    RENAMED after write still reads correctly."""
    import json as _json

    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "metadata"))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    ws = T.StructType([
        T.StructField("old_k", T.IntegerType(), True, {"parquet.field.id": 1}),
        T.StructField("old_name", T.StringType(), True, {"parquet.field.id": 2}),
    ])
    _df1(spark, [(1, "a"), (2, "b")], ws) \
        .write.parquet(os.path.join(root, "data"))
    dfile = next(
        os.path.join(root, "data", f)
        for f in os.listdir(os.path.join(root, "data"))
        if f.endswith(".parquet")
    )
    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None,
             "field-id": 1},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": []},
                     "field-id": 102},
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                ]}, "field-id": 2},
        ],
    }
    mpath = os.path.join(root, "metadata", "m0.avro")
    avro_ocf.write_container(
        mpath, entry_schema,
        [{"status": 1, "snapshot_id": 6, "data_file": {
            "file_path": dfile, "file_format": "PARQUET", "partition": {},
            "record_count": 2, "file_size_in_bytes": os.path.getsize(dfile)}}],
        metadata={"partition-spec": "[]", "format-version": "1",
                  "content": "data"},
    )
    # the TABLE schema renamed both columns; ids are authoritative
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000003",
        "location": root, "last-updated-ms": 1, "last-column-id": 2,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "renamed_k", "required": False, "type": "int"},
            {"id": 2, "name": "renamed_name", "required": False, "type": "string"},
        ]},
        "partition-spec": [], "properties": {},
        "current-snapshot-id": 6,
        "snapshots": [{"snapshot-id": 6, "timestamp-ms": 1,
                       "manifests": [mpath]}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        _json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    got = iceberg_meta.read_iceberg_meta(spark, root)
    assert got.columns == ["renamed_k", "renamed_name"]
    assert sorted(tuple(r) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_reader_handles_transformed_partitions(spark, tmp_path):
    """bucket[N]/day-style transformed partitions: the derived value in
    the manifest partition struct is NOT injected — the source column
    reads from the data files, where engine writers always store it."""
    import json as _json

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "metadata"))
    _df1(spark, [(1, "a"), (2, "b")], "k int, name string") \
        .write.parquet(os.path.join(root, "data"))
    dfile = next(
        os.path.join(root, "data", f)
        for f in os.listdir(os.path.join(root, "data"))
        if f.endswith(".parquet")
    )
    spec = [{"name": "k_bucket", "transform": "bucket[4]",
             "source-id": 1, "field-id": 1000}]
    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None,
             "field-id": 1},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": [
                            {"name": "k_bucket", "type": ["null", "int"],
                             "default": None, "field-id": 1000}]},
                     "field-id": 102},
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                ]}, "field-id": 2},
        ],
    }
    mpath = os.path.join(root, "metadata", "m0.avro")
    avro_ocf.write_container(
        mpath, entry_schema,
        [{"status": 1, "snapshot_id": 5, "data_file": {
            "file_path": dfile, "file_format": "PARQUET",
            "partition": {"k_bucket": 2}, "record_count": 2,
            "file_size_in_bytes": os.path.getsize(dfile)}}],
        metadata={"partition-spec": _json.dumps(spec), "format-version": "1",
                  "content": "data"},
    )
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000002",
        "location": root, "last-updated-ms": 1, "last-column-id": 2,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "k", "required": False, "type": "int"},
            {"id": 2, "name": "name", "required": False, "type": "string"},
        ]},
        "partition-spec": spec, "properties": {},
        "current-snapshot-id": 5,
        "snapshots": [{"snapshot-id": 5, "timestamp-ms": 1,
                       "manifests": [mpath]}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        _json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")

    got = sorted(tuple(r) for r in iceberg_meta.read_iceberg_meta(spark, root).collect())
    assert got == [(1, "a"), (2, "b")]  # k read from the FILE, not bucket 2


def test_reader_refuses_unsupported_features(spark, tmp_path):
    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", "en")]), p, mode="overwrite")
    lakehouse.convert_to_iceberg(p)
    meta_file = iceberg_meta._metadata_file(p, 0)
    with open(meta_file) as fh:
        meta = json.load(fh)
    meta["format-version"] = 3
    with open(meta_file, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(InvalidArgument, match="format-version"):
        iceberg_meta.read_iceberg_meta(spark, p)


def test_metadata_carries_name_mapping(spark, tmp_path):
    """Exported tables declare schema.name-mapping.default so strict
    engines can resolve lakelite's id-less parquet columns."""
    import json as _json

    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", "en")]), p, mode="overwrite")
    lakehouse.convert_to_iceberg(p)
    meta = iceberg_meta._load_metadata(p)
    nm = _json.loads(meta["properties"]["schema.name-mapping.default"])
    schema = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    assert {m["names"][0]: m["field-id"] for m in nm} == {
        f["name"]: f["id"] for f in schema["fields"]
    }


def test_expire_snapshots(spark, tmp_path):
    """Maintenance: expired snapshots leave the metadata, their manifest
    lists/manifests are deleted, the current snapshot keeps reading, and
    the NEXT lakelite commit builds on the pruned metadata (no
    resurrection)."""
    p = str(tmp_path / "t")
    shim.write(_df(spark, [(1, "a", "en")]).coalesce(1), p, mode="overwrite")
    shim.write(_df(spark, [(2, "b", "fr")]).coalesce(1), p, mode="append")
    shim.write(_df(spark, [(3, "c", "de")]).coalesce(1), p, mode="append")
    lakehouse.convert_to_iceberg(p)
    meta = iceberg_meta._load_metadata(p)
    old_snap = meta["snapshots"][0]["snapshot-id"]
    old_list = iceberg_meta._local(meta["snapshots"][0]["manifest-list"])

    res = iceberg_meta.expire_snapshots(p, keep_last=1)
    assert res["expired_snapshots"] == 2
    assert not os.path.exists(old_list)
    assert not os.path.exists(
        os.path.join(iceberg_meta._meta_dir(p), "icm-00000000-data.avro")
    )
    # current still reads all three rows
    assert iceberg_meta.read_iceberg_meta(spark, p).count() == 3
    with pytest.raises(InvalidArgument, match="not found"):
        iceberg_meta.read_iceberg_meta(spark, p, snapshot_id=old_snap)

    # the next commit exports on top of the PRUNED metadata
    shim.write(_df(spark, [(4, "d", "en")]).coalesce(1), p, mode="append")
    meta2 = iceberg_meta._load_metadata(p)
    assert len(meta2["snapshots"]) == 2  # retained + the new one
    assert iceberg_meta.read_iceberg_meta(spark, p).count() == 4
    # idempotent no-op when nothing to expire beyond keep_last
    assert iceberg_meta.expire_snapshots(p, keep_last=2) == {
        "expired_snapshots": 0, "deleted_files": 0,
    }
    with pytest.raises(InvalidArgument, match="keep_last"):
        iceberg_meta.expire_snapshots(p, keep_last=0)
