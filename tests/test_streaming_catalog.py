"""Streaming parity-with-batch, catalog DDL helpers, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark import catalog, sources, streaming


def test_stream_replays_batch(spark, people_df, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sources.to_parquet(people_df, src, dataset=True, mode="overwrite")

    streaming.run_batch_as_stream(
        spark, src, lambda df: df.where(F.col("score") >= 0), out, ckpt
    )
    got = spark.read.parquet(out)
    assert got.count() == people_df.where("score >= 0").count()


def test_write_stream_dataset(spark, people_df, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sources.to_parquet(people_df, src, dataset=True, mode="overwrite")

    stream = streaming.read_stream(spark, src)
    q = streaming.write_stream_dataset(
        stream, out, checkpoint=ckpt, partition_cols=["country"]
    )
    q.awaitTermination()
    got = sources.read_parquet(spark, out, dataset=True)
    assert got.count() == 5
    assert "country=us" in " ".join(sources.list_objects(spark, out))


def test_windowed_counts_semantics(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a"), ("2024-01-01 00:50:00", "a"),
         ("2024-01-01 01:10:00", "b")],
        "ts string, k string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = streaming.windowed_counts(df, window_duration="1 hour", group_cols=["k"])
    rows = {(r.window.start.hour, r.k): r.n for r in got.collect()}
    assert rows == {(0, "a"): 2, (1, "b"): 1}


def test_catalog_tables(spark, people_df, tmp_path):
    path = str(tmp_path / "cds")
    sources.to_parquet(people_df, path, dataset=True, partition_cols=["country"], mode="overwrite")
    catalog.delete_table_if_exists(spark, "asps_cat_t")
    catalog.create_parquet_table(
        spark,
        database=None,
        table="asps_cat_t",
        path=path,
        columns_types={"id": "bigint", "name": "string", "score": "double", "d": "date"},
        partitions_types={"country": "string"},
    )
    assert catalog.does_table_exist(spark, "asps_cat_t")
    catalog.repair_table(spark, "asps_cat_t")
    assert spark.table("asps_cat_t").count() == 5
    # catalog.table returns DESCRIBE metadata (reference: catalog/_get.py)
    assert "col_name" in catalog.table(spark, "asps_cat_t").columns
    parts = catalog.get_partitions(spark, "asps_cat_t")
    assert {tuple(v) for v in parts.values()} == {("us",), ("de",), ("fr",)}
    types = catalog.get_table_types(spark, "asps_cat_t")
    assert types["id"] == "bigint"
    assert catalog.get_table_location(spark, "asps_cat_t").endswith("cds")
    catalog.delete_table_if_exists(spark, "asps_cat_t")


def test_multimodal_fake_pipeline(spark):
    from aws_sdk_pandas_spark.operators.multimodal import decode_image, extract_features

    media = spark.createDataFrame(
        [("m1", bytearray(b"payload-1")), ("m2", bytearray(b"payload-2"))],
        "media_id string, payload binary",
    )
    feats = extract_features(media, dim=16, fake=True)
    rows = {r.media_id: r for r in feats.collect()}
    assert set(rows) == {"m1", "m2"}
    assert all(len(r.feature) == 16 for r in rows.values())
    assert rows["m1"].n_bytes == 9
    # deterministic across runs
    again = {r.media_id: r.feature for r in extract_features(media, dim=16, fake=True).collect()}
    assert again["m1"] == rows["m1"].feature

    # real decode is an explicit stub until decode libs exist
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_store_parquet_metadata(spark, people_df, tmp_path):
    path = str(tmp_path / "spm")
    sources.to_parquet(
        people_df, path, dataset=True, partition_cols=["country"], mode="overwrite"
    )
    catalog.delete_table_if_exists(spark, "asps_spm_t")
    cols, parts = catalog.store_parquet_metadata(spark, path, "asps_spm_t")
    assert cols["id"] == "bigint" and parts == {"country": "string"}
    assert spark.table("asps_spm_t").count() == 5
    catalog.delete_table_if_exists(spark, "asps_spm_t")


def test_wait_objects(spark, people_df, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "w")
    sources.to_parquet(people_df, path)
    objs = [o for o in sources.list_objects(spark, path) if o.endswith(".parquet")]
    sources.wait_objects_exist(spark, objs[:2])
    with _pytest.raises(TimeoutError):
        sources.wait_objects_exist(
            spark, [path + "/nope.parquet"], delay=0.01, max_attempts=2
        )
    sources.wait_objects_not_exist(spark, [path + "/nope.parquet"])


def test_sql_read_sql_table(spark, people_df):
    people_df.createOrReplaceTempView("rst_people")
    from aws_sdk_pandas_spark.sql import read_sql_table

    assert read_sql_table(spark, "rst_people").count() == 5


def test_sessionize_batch(spark):
    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00"),
            ("u1", "2024-01-01 10:10:00"),   # same session (gap 30m)
            ("u1", "2024-01-01 11:30:00"),   # new session
            ("u2", "2024-01-01 10:00:00"),
        ],
        "user string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = streaming.sessionize(df, gap="30 minutes", group_cols=["user"]).orderBy(
        "user", "session_start"
    )
    rows = [(r.user, r.session_start.hour, r.n_events) for r in got.collect()]
    assert rows == [("u1", 10, 2), ("u1", 11, 1), ("u2", 10, 1)]


def test_sessionize_streaming_equals_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-01 10:05:00"),
         ("u2", "2024-01-01 12:00:00")],
        "user string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)

    stream = streaming.read_stream(spark, src)
    q = (
        streaming.sessionize(stream, gap="30 minutes", group_cols=["user"],
                             watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user, r.n_events) for r in spark.table("sess_mem").collect()}
    assert got == {("u1", 2), ("u2", 1)}


def test_running_state_per_key(spark, tmp_path):
    src = str(tmp_path / "st")
    df = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", 5.0), ("u1", "2024-01-01 10:05:00", 7.0),
         ("u2", "2024-01-01 12:00:00", 1.0)],
        "user string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)

    stream = streaming.read_stream(spark, src)
    q = (
        streaming.running_state_per_key(stream, key_col="user", value_col="value")
        # NoTimeout default: a ProcessingTimeTimeout would keep the
        # availableNow trigger alive in "cleaning up state" batches
        .writeStream.format("memory")
        .queryName("state_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.key: (r.n_events, r.sum_value) for r in spark.table("state_mem").collect()}
    assert got == {"u1": (2, 12.0), "u2": (1, 1.0)}


def test_dedup_stream(spark, tmp_path):
    src = str(tmp_path / "dds")
    df = spark.createDataFrame(
        [("e1", "2024-01-01 10:00:00"), ("e1", "2024-01-01 10:00:30"),
         ("e2", "2024-01-01 10:01:00")],
        "event_key string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(src)

    stream = streaming.read_stream(spark, src)
    q = (
        streaming.dedup_stream(stream, ["event_key"], watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("dds_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    keys = [r.event_key for r in spark.table("dds_mem").collect()]
    assert sorted(keys) == ["e1", "e2"]

    # batch fallback: same semantics, no state store
    assert streaming.dedup_stream(df, ["event_key"]).count() == 2


def test_catalog_table_parameters_roundtrip(spark, tmp_path):
    """TBLPROPERTIES upsert/overwrite/get (reference: catalog
    get/upsert/overwrite_table_parameters)."""
    from aws_sdk_pandas_spark import catalog as C

    spark.range(3).write.mode("overwrite").option("path", f"{tmp_path}/tp").saveAsTable("tp_tbl")
    try:
        got = C.upsert_table_parameters(spark, "tp_tbl", {"team": "data", "stage": "raw"})
        assert got["team"] == "data" and got["stage"] == "raw"
        got = C.upsert_table_parameters(spark, "tp_tbl", {"stage": "clean"})
        assert got["team"] == "data" and got["stage"] == "clean"
        got = C.overwrite_table_parameters(spark, "tp_tbl", {"only": "this"})
        assert got.get("only") == "this" and "team" not in got
    finally:
        spark.sql("DROP TABLE IF EXISTS tp_tbl")


def test_catalog_add_column_and_search(spark, tmp_path):
    from aws_sdk_pandas_spark import catalog as C

    spark.range(3).write.mode("overwrite").option("path", f"{tmp_path}/ac").saveAsTable("ac_tbl")
    try:
        C.add_column(spark, "ac_tbl", "extra", "string")
        assert "extra" in [f.name for f in spark.catalog.listColumns("ac_tbl")]
        assert "ac_tbl" in C.search_tables(spark, "ac_")
        assert C.get_tables(spark) == C.tables(spark)
    finally:
        spark.sql("DROP TABLE IF EXISTS ac_tbl")


def test_catalog_delete_partitions(spark, tmp_path):
    from aws_sdk_pandas_spark import catalog as C

    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "v long, p string")
    df.write.mode("overwrite").partitionBy("p").option("path", f"{tmp_path}/dp").saveAsTable("dp_tbl")
    try:
        assert len(C.get_partitions(spark, "dp_tbl")) == 2
        C.delete_partitions(spark, "dp_tbl", [["a"]])
        assert len(C.get_partitions(spark, "dp_tbl")) == 1
        deleted = C.delete_all_partitions(spark, "dp_tbl")
        assert deleted == [["b"]]
        assert C.get_partitions(spark, "dp_tbl") == {}
    finally:
        spark.sql("DROP TABLE IF EXISTS dp_tbl")


def test_catalog_duplicate_column_repair(spark):
    from aws_sdk_pandas_spark import catalog as C

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long").toDF("x", "y", "x")
    dropped = C.drop_duplicated_columns(df)
    assert dropped.columns == ["x", "y"]
    assert dropped.collect()[0] == (1, 2)  # first occurrence kept
    renamed = C.rename_duplicated_columns(df)
    assert renamed.columns == ["x", "y", "x_1"]


def test_catalog_extract_athena_types(spark):
    from aws_sdk_pandas_spark import catalog as C

    df = spark.createDataFrame([(1, "a", 1.5)], "k long, p string, v double")
    cols, parts = C.extract_athena_types(df, partition_cols=["p"])
    assert cols == {"k": "bigint", "v": "double"}
    assert parts == {"p": "string"}


def test_upsert_stream_applies_cdc(spark, tmp_path):
    """Streaming CDC apply == batch upsert semantics: the change stream
    lands on the target with newest-version-wins."""
    from aws_sdk_pandas_spark import streaming as S

    target = f"file://{tmp_path}/target"
    changes_path = f"file://{tmp_path}/changes"
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, v string, ver long"
    ).write.parquet(target)
    # two change rows for k=2 (ver 2 and 3 — 3 must win) and an insert k=3
    spark.createDataFrame(
        [(2, "b2", 2), (2, "b3", 3), (3, "c", 1)], "k long, v string, ver long"
    ).write.parquet(changes_path)

    stream = S.read_stream(spark, changes_path)
    q = S.upsert_stream(
        stream, target, ["k"],
        checkpoint=f"{tmp_path}/ckpt", precombine_key="ver",
    )
    q.awaitTermination(120)
    got = {r.k: (r.v, r.ver) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 1), 2: ("b3", 3), 3: ("c", 1)}


def test_stream_stream_join_equals_batch(spark, tmp_path):
    views = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", "ad1"),
         ("u1", "2024-01-01 11:00:00", "ad2"),
         ("u2", "2024-01-01 10:30:00", "ad3")],
        "user string, ts string, ad string",
    ).withColumn("ts", F.to_timestamp("ts"))
    clicks = spark.createDataFrame(
        [("u1", "2024-01-01 10:05:00", 1.0),   # within 15m of ad1
         ("u1", "2024-01-01 11:40:00", 2.0),   # outside 15m of ad2
         ("u2", "2024-01-01 10:31:00", 3.0)],  # within 15m of ad3
        "user string, ts string, paid double",
    ).withColumn("ts", F.to_timestamp("ts"))

    expected = {("u1", "ad1", 1.0), ("u2", "ad3", 3.0)}
    batch = streaming.stream_stream_join(
        views, clicks, ["user"], within="15 minutes"
    )
    assert {(r.user, r.ad, r.right_paid) for r in batch.collect()} == expected

    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.write.parquet(vsrc)
    clicks.write.parquet(csrc)
    q = (
        streaming.stream_stream_join(
            streaming.read_stream(spark, vsrc),
            streaming.read_stream(spark, csrc),
            ["user"],
            within="15 minutes",
        )
        .writeStream.format("memory")
        .queryName("ssj_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user, r.ad, r.right_paid) for r in spark.table("ssj_mem").collect()}
    assert got == expected


def test_catalog_table_versions_and_column_params(spark, tmp_path):
    from aws_sdk_pandas_spark import catalog

    src = str(tmp_path / "t1")
    spark.createDataFrame([(1, "x")], "id long, name string").write.parquet(src)
    catalog.create_parquet_table(
        spark, table="vers_t", columns_types={"id": "bigint", "name": "string"},
        path=src,
    )
    try:
        assert catalog.get_table_number_of_versions(spark, "vers_t") == 0
        catalog.add_column(spark, "vers_t", "extra", "int")
        catalog.add_column(spark, "vers_t", "extra2", "int")
        vers = catalog.get_table_versions(spark, "vers_t")
        assert [v["VersionId"] for v in vers] == ["1", "2"]
        assert catalog.get_table_number_of_versions(spark, "vers_t") == 2
        params = catalog.get_columns_parameters(spark, "vers_t")
        assert "id" in params and "extra" in params
    finally:
        catalog.delete_table_if_exists(spark, "vers_t")


def test_catalog_connection_registry():
    from aws_sdk_pandas_spark import catalog
    from aws_sdk_pandas_spark.exceptions import InvalidArgument
    import pytest as _pytest

    catalog.register_connection("pg_main", {"url": "jdbc:postgresql://h/db", "user": "u"})
    assert catalog.get_connection("pg_main")["url"] == "jdbc:postgresql://h/db"
    with _pytest.raises(InvalidArgument):
        catalog.get_connection("nope")


def test_vector_bucket_lifecycle(spark, tmp_path):
    from aws_sdk_pandas_spark import vectors

    root = str(tmp_path)
    b = vectors.create_vector_bucket(spark, f"{root}/vb1")
    assert vectors.list_vector_buckets(spark, root) != []
    info = vectors.get_vector_bucket(spark, b)
    assert info["Indexes"] == []
    vectors.delete_vector_bucket(spark, b)
    assert vectors.list_vector_buckets(spark, root) == []


def test_delete_column_rebuild_fallback(spark, tmp_path):
    from aws_sdk_pandas_spark import catalog

    src = str(tmp_path / "t2")
    spark.createDataFrame([(1, "x", 2.0)], "id long, name string, v double").write.parquet(src)
    catalog.create_parquet_table(
        spark, table="dropc_t",
        columns_types={"id": "bigint", "name": "string", "v": "double"},
        path=src,
    )
    try:
        catalog.delete_column(spark, "dropc_t", "name")
        cols = [c.name for c in spark.catalog.listColumns("dropc_t")]
        assert cols == ["id", "v"]
        assert spark.table("dropc_t").count() == 1
    finally:
        catalog.delete_table_if_exists(spark, "dropc_t")


def test_near_dup_filter_stream_two_batches(spark, tmp_path):
    """Two micro-batch arrivals: within-batch near-dups drop, cross-batch
    near-dups drop against the persistent index, distinct docs admit."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long and winding tune about distributed systems and shuffles"
    )
    alt = (
        "completely different content about parquet footers statistics "
        "pruning and adaptive query execution in modern engines today"
    )
    third = (
        "yet another unrelated document discussing watermarks state stores "
        "and exactly once semantics for streaming pipelines at scale"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    kw = dict(
        checkpoint=ckpt, threshold=0.6, num_hashes=64, bands=16, shingle_k=5
    )

    # batch 1: doc 1 + its near-copy doc 2 (one char changed) + distinct doc 3
    # ONE slice (coalesce(1) over a multi-slice local frame pays one
    # sequential Python-worker round trip per slice per action)
    b1 = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(1, base), (2, base + "!"), (3, alt)], 1
        ),
        "doc_id long, text string",
    )
    b1.write.mode("append").parquet(src)
    q = streaming.near_dup_filter_stream(
        streaming.read_stream(spark, src, schema="doc_id long, text string"),
        out, idx, **kw,
    )
    q.awaitTermination()
    admitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert admitted == [1, 3]  # 2 dropped within-batch (larger id of the pair)

    # batch 2: near-copy of doc 1 again (index hit) + genuinely new doc 5
    b2 = spark.createDataFrame(
        spark.sparkContext.parallelize([(4, base + "?"), (5, third)], 1),
        "doc_id long, text string",
    )
    b2.write.mode("append").parquet(src)
    q = streaming.near_dup_filter_stream(
        streaming.read_stream(spark, src, schema="doc_id long, text string"),
        out, idx, **kw,
    )
    q.awaitTermination()
    admitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert admitted == [1, 3, 5]  # 4 rejected by the index match
    # index holds exactly the admitted signatures
    assert sorted(r.id for r in spark.read.parquet(idx).collect()) == [1, 3, 5]


def test_decontaminate_stream_matches_offline(spark, tmp_path, sf_dir):
    """Stream-replay of the corpus through the decontamination guard
    admits exactly the offline operator's survivor set."""
    from aws_sdk_pandas_spark.operators.bloom import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where("source <> 'src0'").select("doc_id", "text")
    eval_df = docs.where("source = 'src0'").select("doc_id", "text")

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    rej = str(tmp_path / "rej")
    ckpt = str(tmp_path / "ckpt")
    # two arrival batches -> two files
    half = corpus.where("doc_id % 2 = 0")
    rest = corpus.where("doc_id % 2 = 1")
    half.coalesce(1).write.mode("append").parquet(src)
    rest.coalesce(1).write.mode("append").parquet(src)

    q = streaming.decontaminate_stream(
        streaming.read_stream(spark, src, schema="doc_id long, text string"),
        eval_df, out, checkpoint=ckpt, n=3, reject_path=rej,
    )
    q.awaitTermination()

    admitted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    want = sorted(r.doc_id for r in decontaminate(corpus, eval_df, n=3).collect())
    assert admitted == want
    rejected = sorted(r.doc_id for r in spark.read.parquet(rej).collect())
    assert sorted(admitted + rejected) == sorted(r.doc_id for r in corpus.collect())
    assert len(rejected) > 0


def test_drift_monitor_stream(spark, tmp_path, sf_dir):
    """Two arrival batches against a frozen baseline: the same-language
    batch shows less drift than the different-language batch, and each
    batch's metrics equal the batch-mode corpus_divergence totals."""
    from aws_sdk_pandas_spark.operators.drift import corpus_divergence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    baseline = docs.where("lang = 'en'").select("doc_id", "text")
    same = docs.where("lang = 'en'").select("doc_id", "text")
    other = docs.where("lang = 'fr'").select("doc_id", "text")

    src = str(tmp_path / "src")
    met = str(tmp_path / "met")
    ckpt = str(tmp_path / "ckpt")
    same.coalesce(1).write.mode("append").parquet(src)

    q = streaming.drift_monitor_stream(
        streaming.read_stream(spark, src, schema="doc_id long, text string"),
        baseline, met, checkpoint=ckpt, buckets=64,
    )
    q.awaitTermination()
    other.coalesce(1).write.mode("append").parquet(src)
    q = streaming.drift_monitor_stream(
        streaming.read_stream(spark, src, schema="doc_id long, text string"),
        baseline, met, checkpoint=ckpt, buckets=64,
    )
    q.awaitTermination()

    rows = sorted(spark.read.parquet(met).collect(), key=lambda r: r.batch_id)
    assert len(rows) == 2
    js_same, js_other = rows[0].js_total, rows[1].js_total
    assert js_same < js_other  # identical distribution drifts less

    # batch-mode parity: the stream metric equals corpus_divergence sums
    for batch_df, row in ((same, rows[0]), (other, rows[1])):
        d = corpus_divergence(batch_df, baseline, buckets=64).agg(
            F.sum("js"), F.sum("psi")
        ).first()
        assert abs(row.js_total - d[0]) < 1e-6
        assert abs(row.psi_total - d[1]) < 1e-6


def test_chunk_audio_plan(spark):
    from aws_sdk_pandas_spark.operators.multimodal import chunk_audio_plan

    rows = [
        ("a", 16000, 16000 * 25),   # 25 s @ 16 kHz
        ("b", 8000, 8000 * 5),      # 5 s @ 8 kHz -> one short tail chunk
        ("c", 16000, None),         # no metadata -> excluded
    ]
    df = spark.createDataFrame(rows, "media_id string, sample_rate int, n_samples long")
    out = chunk_audio_plan(df, window_ms=10_000, overlap_ms=2_000)
    got = {}
    for r in out.collect():
        got.setdefault(r.media_id, []).append((r.chunk_idx, r.start_sample, r.end_sample))
    assert "c" not in got
    # 25s with 10s windows advancing 8s: minimal cover is starts 0,8,16
    # (the 16s window clamps to 25s; a 24s start would be redundant)
    a = sorted(got["a"])
    assert [s for _, s, _ in a] == [0, 16000 * 8, 16000 * 16]
    assert a[0][2] == 16000 * 10 and a[-1][2] == 16000 * 25  # tail clamps
    # coverage: consecutive windows overlap, nothing is skipped
    for (_, s1, e1), (_, s2, e2) in zip(a, a[1:]):
        assert s2 < e1
    b = sorted(got["b"])
    assert b == [(0, 0, 8000 * 5)]  # shorter than one window -> single clamped chunk


def test_image_dimensions_real_headers(spark):
    """PNG/GIF/BMP parse as pure JVM expressions; JPEG via the Arrow
    kernel; negative BMP height (top-down) normalizes; garbage is
    'unknown' with NULL dims."""
    from aws_sdk_pandas_spark.operators.multimodal import (
        image_dimensions,
        make_test_media,
    )

    rows = [
        ("png", make_test_media("png", 640, 480)),
        ("gif", make_test_media("gif", 320, 200)),
        ("bmp", make_test_media("bmp", 800, 600)),
        ("bmp_td", make_test_media("bmp", 100, 0, signed_height=-50)),
        ("jpeg", make_test_media("jpeg", 1024, 768)),
        ("junk", b"\x00\x01\x02\x03 not an image"),
    ]
    df = spark.createDataFrame(rows, "name string, payload binary")
    got = {
        r.name: (r.img_format, r.img_width, r.img_height)
        for r in image_dimensions(df).collect()
    }
    assert got["png"] == ("png", 640, 480)
    assert got["gif"] == ("gif", 320, 200)
    assert got["bmp"] == ("bmp", 800, 600)
    assert got["bmp_td"] == ("bmp", 100, 50)
    assert got["jpeg"] == ("jpeg", 1024, 768)
    assert got["junk"] == ("unknown", None, None)


def test_image_dimensions_jvm_only_plan_has_no_python(spark):
    """With jpeg=False the whole parse is codegen — no Python eval node
    in the plan (the 100 TB fast path for PNG/GIF/BMP corpora)."""
    from aws_sdk_pandas_spark.operators.multimodal import (
        image_dimensions,
        make_test_media,
    )

    df = spark.createDataFrame(
        [("a", make_test_media("png", 2, 3))], "name string, payload binary"
    )
    out = image_dimensions(df, jpeg=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    r = out.collect()[0]
    assert (r.img_width, r.img_height) == (2, 3)


def test_audio_metadata_wav_walk(spark):
    from aws_sdk_pandas_spark.operators.multimodal import (
        audio_metadata,
        make_test_media,
    )

    rows = [
        ("a", make_test_media("wav", sample_rate=16000, channels=1, bits=16, n_frames=16000)),
        ("b", make_test_media("wav", sample_rate=48000, channels=2, bits=16, n_frames=12000)),
        ("c", b"RIFFxxxxNOPE"),
    ]
    df = spark.createDataFrame(rows, "name string, payload binary")
    got = {
        r.name: (r.audio_channels, r.audio_sample_rate, r.audio_bits, r.audio_duration_ms)
        for r in audio_metadata(df).collect()
    }
    assert got["a"] == (1, 16000, 16, 1000)
    assert got["b"] == (2, 48000, 16, 250)
    assert got["c"] == (None, None, None, None)


def test_incremental_rollup_stream_equals_direct(spark, tmp_path):
    """Two arrival batches stream into the mergeable state table; the
    finalized rollup equals aggregating ALL raw rows directly —
    including the HLL distinct state (register-wise max under union)."""
    from aws_sdk_pandas_spark import streaming as S
    from aws_sdk_pandas_spark.operators.aggregates import finalize_aggregates

    src = str(tmp_path / "roll_src")
    state = str(tmp_path / "roll_state")
    metrics = {"v": ["sum", "avg", "min", "max"], "u": ["approx_distinct"]}

    day1 = [("a", 1.0, 10), ("a", 3.0, 11), ("b", 5.0, 12)]
    day2 = [("a", 7.0, 10), ("b", -1.0, 13), ("b", 2.0, 12), ("c", 9.0, 14)]
    spark.createDataFrame(day1, "g string, v double, u long").write.parquet(src)

    def run():
        q = S.incremental_rollup_stream(
            S.read_stream(spark, src),
            state,
            keys=["g"],
            metrics=metrics,
            checkpoint=str(tmp_path / "roll_ckpt"),
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(day2, "g string, v double, u long").write.mode(
        "append"
    ).parquet(src)
    run()  # second availableNow pass picks up only the new files

    got = {
        r.g: r
        for r in finalize_aggregates(
            spark.read.parquet(state), metrics, ["g"]
        ).collect()
    }
    direct = {
        r.g: r
        for r in finalize_aggregates(
            __import__("aws_sdk_pandas_spark.operators.aggregates",
                       fromlist=["partial_aggregate"]).partial_aggregate(
                spark.createDataFrame(day1 + day2, "g string, v double, u long"),
                ["g"], metrics,
            ),
            metrics, ["g"],
        ).collect()
    }
    assert set(got) == {"a", "b", "c"}
    for g in got:
        assert got[g].n == direct[g].n
        assert abs(got[g].v_sum - direct[g].v_sum) < 1e-9
        assert abs(got[g].v_avg - direct[g].v_avg) < 1e-9
        assert got[g].v_min == direct[g].v_min
        assert got[g].v_max == direct[g].v_max
        # HLL merged across batches == direct sketch of all history
        assert got[g].u_approx_distinct == direct[g].u_approx_distinct


def test_lakelite_stream_source_microbatches(spark, tmp_path):
    """Python-DataSource streaming source over a lakelite table: commits
    become micro-batches by version offset, restarts resume from the
    checkpoint, rewrites fail without ignoreChanges (Delta's contract)."""
    import pytest as _pytest

    from aws_sdk_pandas_spark import lakehouse_shim as shim
    from aws_sdk_pandas_spark.streaming.lakelite_source import (
        LakeliteStreamDataSource,
    )

    p = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    shim.write(
        spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k int, g string, v int"),
        p, mode="overwrite", partition_cols=["g"],
    )
    shim.write(spark.createDataFrame([(3, "a", 2)], "k int, g string, v int"), p)

    spark.dataSource.register(LakeliteStreamDataSource)

    def drain(opts=None):
        reader = spark.readStream.format("lakelite_stream").option("path", p)
        for k_, v_ in (opts or {}).items():
            reader = reader.option(k_, v_)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {tuple(r) for r in spark.read.parquet(out).select("k", "g", "v").collect()}

    got = drain()
    assert got == {(1, "a", 1), (2, "b", 1), (3, "a", 2)}
    # partition column typed from the manifest schema, injected from dirs
    assert dict(
        spark.readStream.format("lakelite_stream").option("path", p).load().dtypes
    )["g"] == "string"

    # new commit -> restart from the checkpoint appends ONLY the delta
    shim.write(spark.createDataFrame([(4, "c", 3)], "k int, g string, v int"), p)
    got2 = drain()
    assert got2 == {(1, "a", 1), (2, "b", 1), (3, "a", 2), (4, "c", 3)}
    # exactly-once across the restart: no row duplicated
    assert spark.read.parquet(out).count() == 4

    # a rewriting commit (merge) fails the stream without ignoreChanges
    shim.merge(
        spark, spark.createDataFrame([(1, "a", 99)], "k int, g string, v int"),
        p, keys=["k"],
    )
    with _pytest.raises(Exception, match="ignoreChanges"):
        q = (
            spark.readStream.format("lakelite_stream").option("path", p).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        exc = q.exception()
        if exc is not None:
            raise exc

    # with ignoreChanges the rewritten file re-emits (duplicates allowed)
    out2 = str(tmp_path / "out2")
    q2 = (
        spark.readStream.format("lakelite_stream").option("path", p)
        .option("ignoreChanges", "true")
        .option("startingVersion", "0").load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    rows = {tuple(r) for r in spark.read.parquet(out2).select("k", "g", "v").collect()}
    assert (1, "a", 99) in rows  # the post-merge value streamed through


def test_lakelite_stream_source_name_mapped_table(spark, tmp_path):
    """The streaming source over an ADOPTED name-column-mapped table
    (round 6) speaks LOGICAL names like every other lakelite entry
    point: the schema renames physical->logical, the per-partition
    reader resolves parquet columns and hive partition dirs by their
    PHYSICAL names."""
    from tests.test_dv_write import _foreign_mapped_delta
    from aws_sdk_pandas_spark import delta_log as dl
    from aws_sdk_pandas_spark import lakehouse_shim as shim
    from aws_sdk_pandas_spark.streaming.lakelite_source import (
        LakeliteStreamDataSource,
    )

    p = str(tmp_path / "mapped")
    _foreign_mapped_delta(spark, p)
    dl.convert_from_delta(p)
    # one lakelite commit on top (logical-named source) -> 2 micro-batches
    shim.write(
        spark.createDataFrame([(9, 90, "b")], "k int, v int, part string"), p
    )

    spark.dataSource.register(LakeliteStreamDataSource)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = spark.readStream.format("lakelite_stream").option("path", p).load()
    assert set(stream.columns) == {"k", "v", "part"}  # logical names
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.read.parquet(out).select("k", "v", "part").collect()}
    assert got == {(1, 10, "a"), (2, 20, "a"), (3, 30, "b"), (9, 90, "b")}
