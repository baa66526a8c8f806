"""Physical-plan quality gates — the 100 TB design assertions.

Correctness says the operator works; these tests pin HOW it executes:
filters reach the parquet scan (PushedFilters), projections prune the
read schema, small dimensions broadcast, top-k compiles to
TakeOrderedAndProject, partition pruning eliminates directories.  A
regression here is a silent 100x at scale even when results stay right.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from aws_sdk_pandas_spark import sources


@pytest.fixture(autouse=True)
def _stock_local_frames(spark):
    """Plan-shape tests must build local frames the stock way: the
    conftest pandas fast path plans them as a constant-folded
    ``LocalRelation``, which hides the scan/filter/join nodes these
    tests assert on."""
    patched = spark.createDataFrame
    orig = getattr(patched, "_orig", None)
    if orig is not None:
        spark.createDataFrame = orig
    yield
    if orig is not None:
        spark.createDataFrame = patched


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = entry.queries()["scan_projection_pushdown"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = sources.read_parquet(
        spark, f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    plan = _plan(df)
    m = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "l_orderkey" in m and "l_quantity" in m
    assert "l_comment" not in m and "l_shipdate" not in m


def test_small_dims_broadcast_in_q05(spark, sf_dir):
    df = entry.queries()["q05_local_supplier_volume"](spark, sf_dir)
    df.collect()  # finalize the AQE plan before inspecting it
    plan = _plan(df)
    # nation/region/supplier are small: the joins must broadcast — a
    # sort-merge join on the dims would shuffle lineitem at scale
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_is_take_ordered_not_global_sort(spark, sf_dir):
    df = entry.queries()["emb_knn_cosine"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    # a global Sort exchange would be the scale bug
    assert "rangepartitioning" not in plan.lower()


def test_partition_pruning(spark, people_df, tmp_path):
    path = str(tmp_path / "pp")
    sources.to_parquet(
        people_df, path, dataset=True, partition_cols=["country"], mode="overwrite"
    )
    df = sources.read_parquet(
        spark, path, dataset=True, partition_filter=lambda p: p["country"] == "us"
    )
    # only the surviving partition's files are scanned
    scan_meta = _plan(df)
    assert df.count() == 2
    assert "country=de" not in scan_meta


def test_events_daily_single_shuffle(spark, sf_dir):
    """One groupBy = one Exchange (plus AQE reads); a second shuffle on the
    same keys would mean lost partial aggregation."""
    df = entry.queries()["events_daily_stats"](spark, sf_dir)
    optimized = _optimized(df)
    assert optimized.count("Aggregate") <= 2  # partial + final, not more


def test_dq_single_aggregation_job(spark, sf_dir):
    """All non-custom rules must share one Aggregate (one scan)."""
    from aws_sdk_pandas_spark import dq

    events = sources.read_parquet(spark, f"{sf_dir}/events.parquet")
    # count jobs via the physical plan of the single agg row
    agg_df = events.agg(
        F.count(F.lit(1)).alias("a"),
        (F.count("user_id") / F.count(F.lit(1))).alias("b"),
        F.count_distinct("event_id").alias("c"),
    )
    assert _optimized(agg_df).count("Relation") == 1


def test_minhash_no_cartesian(spark, sf_dir):
    from aws_sdk_pandas_spark.operators.dedup import minhash_duplicates
    from aws_sdk_pandas_spark.sources import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    df = minhash_duplicates(docs, "doc_id", "text", num_hashes=16, bands=4)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_gram_join_no_cartesian(spark, sf_dir):
    """The decontamination overlap count must be a gram-keyed equi join
    (one left join against the distinct eval gram set computes totals AND
    hits in a single corpus pass) — never a doc-by-doc comparison, and
    never a second kernel evaluation for the totals."""
    import re

    from aws_sdk_pandas_spark.operators.textstats import benchmark_contamination

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    df = benchmark_contamination(
        docs.where("source <> 'src0'"), docs.where("source = 'src0'")
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftOuter" in plan  # gram-keyed equi join carrying the hit flag
    # one kernel evaluation per lineage: corpus side + eval side = 2
    assert len(re.findall(r"ArrowEvalPython|BatchEvalPython", plan)) == 2


def test_uniform_sample_k_is_take_ordered(spark, sf_dir):
    """Exact-k sampling must be per-partition heaps + driver merge, not
    a global sort of the corpus."""
    from aws_sdk_pandas_spark.operators.sampling import uniform_sample_k

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    plan = _plan(uniform_sample_k(docs, 10, key_col="doc_id"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_bloom_decontaminate_prefilters_before_join(spark, sf_dir):
    """The bloom test (xxhash64 bit probes) must sit BELOW the exact
    verify join — the join only ever sees the bloom-positive sliver —
    and the contaminated-id set must broadcast back, not shuffle the
    corpus."""
    from aws_sdk_pandas_spark.operators.bloom import decontaminate

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    df = decontaminate(
        docs.where("source <> 'src0'"), docs.where("source = 'src0'"), n=3
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "xxhash64" in plan  # bloom probe is a JVM expression in the scan stage
    assert "LeftSemi" in plan  # exact verify of bloom positives
    assert "LeftAnti" in plan  # contaminated ids dropped from the corpus
    opt = _optimized(df)
    # the bloom membership Filter must appear before (below) the semi join
    assert opt.index("xxhash64") > opt.index("LeftSemi"), (
        "bloom filter not pushed beneath the verify join"
    )


def test_embedding_decontaminate_broadcasts_eval(spark, sf_dir):
    """The eval set must broadcast (BNLJ build-right anti is the
    intended plan — |corpus| x |eval| JVM comparisons distributed over
    corpus partitions); the corpus itself must not shuffle and the
    distance must stay out of Python."""
    from aws_sdk_pandas_spark.operators.similarity import decontaminate_by_embedding

    emb = sources.read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    eval_df = emb.where("vec_id % 97 = 0").select("embedding")
    plan = _plan(decontaminate_by_embedding(emb, eval_df, id_col="vec_id"))
    assert "BroadcastNestedLoopJoin BuildRight, LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange hashpartitioning" not in plan  # corpus never shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_single_exchange_for_both_windows(spark, sf_dir):
    """Change detection (lag) and interval close (lead) share the same
    partitioning+ordering: Catalyst must plan ONE shuffle, one sort."""
    from aws_sdk_pandas_spark.operators.scd import scd2_from_changes

    orders = sources.read_parquet(spark, f"{sf_dir}/orders.parquet")
    df = scd2_from_changes(
        orders,
        keys=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        track_cols=["o_orderpriority"],
    )
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 1 or plan.count("[o_custkey") >= 1


def test_zorder_write_is_range_partitioned(spark, sf_dir):
    """write_zordered must plan a range partitioning on the Morton key
    (disjoint per-file key spans -> tight row-group stats), not a plain
    round-robin repartition."""
    from aws_sdk_pandas_spark.functions.zorder import zorder_key

    li = sources.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    key = zorder_key(
        [F.pmod(F.col("l_partkey"), F.lit(1024)), F.pmod(F.col("l_suppkey"), F.lit(1024))],
        bits=10,
    )
    staged = (
        li.withColumn("__zkey", key)
        .repartitionByRange(8, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    plan = _plan(staged)
    assert "rangepartitioning" in plan.lower()


def test_latest_snapshot_single_window_shuffle(spark, sf_dir):
    from aws_sdk_pandas_spark.operators.merge import latest_snapshot

    orders = sources.read_parquet(spark, f"{sf_dir}/orders.parquet")
    df = latest_snapshot(orders, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1


def test_plans_helpers(spark, sf_dir):
    from aws_sdk_pandas_spark import plans

    df = entry.queries()["q05_local_supplier_volume"](spark, sf_dir)
    df.collect()
    plans.assert_scale_safe(df)
    assert sum(plans.join_strategies(df).values()) >= 4
    assert "l_shipdate" in plans.pushed_filters(
        entry.queries()["scan_projection_pushdown"](spark, sf_dir)
    )

    a = spark.range(5).crossJoin(spark.range(5))
    with pytest.raises(AssertionError):
        plans.assert_scale_safe(a)


def test_repetition_signals_stays_jvm_side(spark, sf_dir):
    """The Gopher-signal pipeline must be pure JVM (explode + two
    hash aggregates) — a Python eval node here is a 10-100x at scale."""
    df = entry.queries()["doc_repetition_signals"](spark, sf_dir)
    plan = _plan(df)
    assert "EvalPython" not in plan  # no row- or arrow-batched Python
    assert plan.count("HashAggregate") >= 2  # partial + final per level


def test_mad_outliers_broadcasts_stats(spark, sf_dir):
    """Median/MAD stats are |groups| rows — they must broadcast back
    against events, never sort-merge the big side."""
    df = entry.queries()["dq_outliers_mad"](spark, sf_dir)
    df.collect()  # finalize AQE
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_shuffle_per_group_key(spark, sf_dir):
    """Chunk packing is one window over the shard key: exactly one
    exchange for the window (plus the final agg) — no global sort."""
    from aws_sdk_pandas_spark.functions.text import token_count
    from aws_sdk_pandas_spark.operators.packing import pack_sequences
    from aws_sdk_pandas_spark import sources

    docs = (
        sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", token_count("text").alias("n_tokens"))
    )
    packed = pack_sequences(docs, "n_tokens", 2000, by=["lang"], order_cols=["doc_id"])
    plan = _plan(packed)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan.lower()


def test_temperature_sample_broadcasts_weights(spark, sf_dir):
    """The per-group weight table must broadcast — a shuffle join on the
    group key would exchange the whole corpus to apply a 5-row map."""
    from aws_sdk_pandas_spark.operators.sampling import temperature_sample

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    df = temperature_sample(docs, "lang", temperature=2.0, key_col="doc_id")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_keep_best_no_cartesian_and_split_window(spark, sf_dir):
    """keep-best must never cross-product, and unpaired rows must bypass
    the cluster window (a NULL-keyed window partition would funnel the
    whole corpus into one task)."""
    from aws_sdk_pandas_spark.operators.graph import dedup_keep_best

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    df = dedup_keep_best(docs, pairs, id_col="doc_id", score_col="n_chars")
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # two branches (unpaired bypass + clustered argmax), ONE window total —
    # the corpus never funnels through a NULL-keyed window partition —
    # and rank<=1 compiles to WindowGroupLimit (partial top-1 per group
    # before the exchange)
    assert "Union" in plan
    assert plan.count("Window [row_number") == 1
    assert "WindowGroupLimit" in plan


def test_minhash_incremental_index_side_no_python(spark, sf_dir):
    """Matching against a stored index must not re-run the Python kernel
    over the corpus: exactly ONE Arrow/pandas evaluation (the new batch);
    the index side is JVM signature slicing."""
    from aws_sdk_pandas_spark.operators.dedup import (
        build_minhash_index,
        minhash_match_against,
    )

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    index_path = "/tmp/asps_mh_idx_plan"
    build_minhash_index(docs.where(F.col("doc_id") < 100)).write.mode("overwrite").parquet(
        index_path
    )
    index = spark.read.parquet(index_path)
    new_docs = docs.where(F.col("doc_id") >= 100).limit(50)
    df = minhash_match_against(index, new_docs, threshold=0.5)
    plan = _plan(df)
    # the stored index is scanned as parquet (id, h, sig) — no text
    # column read, no Python kernel on the corpus side
    index_scans = [
        l for l in plan.splitlines() if "asps_mh_idx_plan" in l and "Scan parquet" in l
    ]
    assert index_scans, "index must be read from its parquet files"
    assert all("text" not in l for l in index_scans)


def test_bucket_layout_prunes_point_lookup(spark, tmp_path):
    """The Hive-hash bucket directories (bucket=N/) must partition-prune:
    a point lookup on the bucketing key computes its bucket client-side
    and scans 1/n of the dataset files."""
    from aws_sdk_pandas_spark.functions.hashing import hive_bucket
    from aws_sdk_pandas_spark.sources import read_parquet
    from aws_sdk_pandas_spark.sources._write import write_dataset

    df = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    path = f"file://{tmp_path}/bucketed"
    write_dataset(df, path, "parquet", bucketing_info=(["k"], 8))

    # client-side bucket of the probe key (same ported Java hash; dtype
    # resolved from a one-row frame matching the table's key type)
    probe_df = spark.createDataFrame([(123,)], "k bigint")
    probe_bucket = probe_df.select(hive_bucket(8, "k", df=probe_df)).first()[0]
    out = read_parquet(spark, path, dataset=True).where(
        (F.col("bucket") == probe_bucket) & (F.col("k") == 123)
    )
    assert [r.v for r in out.collect()] == [246]
    plan = _plan(out)
    # partition pruning: only the probe bucket's directory is scanned
    m = [l for l in plan.splitlines() if "partitions read" in l.lower() or "PartitionFilters" in l]
    assert any("bucket" in l for l in m), plan[:2000]


def test_remove_passages_stays_jvm_no_cartesian(spark, sf_dir):
    """Passage chunking/reassembly must compile to higher-order JVM
    expressions (no Python workers in the hot path), and the dup-set
    join must never degenerate to a cartesian."""
    from aws_sdk_pandas_spark.operators.dedup import remove_repeated_passages

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    df = remove_repeated_passages(docs, passage_words=3)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert py_op not in plan


def test_weighted_sample_single_window_shuffle_jvm(spark, sf_dir):
    from aws_sdk_pandas_spark.operators.sampling import weighted_sample

    orders = sources.read_parquet(spark, f"{sf_dir}/orders.parquet")
    df = weighted_sample(
        orders, 7, weight_col="o_totalprice", key_col="o_orderkey",
        group_cols=["o_orderpriority"],
    )
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # rank-then-keep-n compiles to the window-group-limit pushdown, so
    # each task keeps n rows per group instead of materializing the sort
    assert "WindowGroupLimit" in plan


def test_stream_stream_join_batch_plan_is_hash_or_merge(spark, sf_dir):
    """The interval condition must ride on an equi-join (SortMerge/Hash),
    never a nested loop over the streams' cross product."""
    from aws_sdk_pandas_spark.streaming import stream_stream_join

    ev = sources.read_parquet(spark, f"{sf_dir}/events.parquet")
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    df = stream_stream_join(views, clicks, ["user_id"], within="30 minutes")
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_dsir_weights_broadcast_ratio_jvm_only(spark, sf_dir):
    """DSIR scoring: the bucket log-ratio table (<= buckets rows) must
    broadcast onto the exploded-grams side, the whole featurize path
    stays JVM expressions (split/transform/explode/conv — no Python
    workers), and nothing degenerates to a nested-loop join."""
    from aws_sdk_pandas_spark.operators.sampling import dsir_importance_weights

    docs = sources.read_parquet(spark, f"{sf_dir}/documents.parquet")
    df = dsir_importance_weights(docs, docs.where(F.col("lang") == "en"), buckets=512)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert py_op not in plan


def test_semantic_dedup_join_is_cluster_keyed(spark, sf_dir):
    """SemDeDup's dominance join must key on the cluster id (hash or
    broadcast equi-join) — the quadratic term is bounded per cluster,
    never a corpus-wide cross product."""
    from aws_sdk_pandas_spark.operators.dedup import semantic_dedup

    emb = sources.read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    df = semantic_dedup(emb, id_col="vec_id", vector_col="embedding", n_clusters=8, threshold=0.35)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bm25_top_k_is_take_ordered_and_no_python(spark, sf_dir):
    """BM25 top-k must heap-merge, not globally sort, and the whole
    scoring pipeline stays JVM-side."""
    df = entry.queries()["docs_bm25_search"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_triangle_count_no_cartesian(spark, sf_dir):
    """Wedge join + closing join are equi-joins; a cartesian here is a
    quadratic blow-up on any real graph."""
    df = entry.queries()["graph_triangle_counts"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_single_window_shuffle(spark, sf_dir):
    """The EWMA fold rides ONE hash exchange on the group key — the
    frame collect and the fold are projection-level, not extra
    shuffles."""
    from aws_sdk_pandas_spark.operators.timeseries import ewma
    from aws_sdk_pandas_spark.sources import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    df = ewma(
        ev, ts_col="ts", value_col="value", by=["user_id"], lookback=60,
        tie_breakers=["event_id"],
    )
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan


def test_kmv_ungrouped_is_take_ordered(spark, sf_dir):
    """Ungrouped bottom-k must compile to TakeOrderedAndProject, not a
    single-partition window funnel."""
    from aws_sdk_pandas_spark.functions.sketches import kmv_sketch
    from aws_sdk_pandas_spark.sources import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    df = kmv_sketch(ev, "user_id", k=64)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_image_dimensions_jvm_only_no_python(spark, sf_dir):
    """PNG/GIF/BMP header parse is whole-stage codegen — the jpeg=False
    path must contain no Python eval node."""
    df = entry.queries()["multimodal_image_dims"](spark, sf_dir)
    assert "EvalPython" not in _plan(df)


def test_plan_lint_findings(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.plans import lint

    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")

    # clean equi-join: no findings at error/warn level
    clean = a.join(b, a.x == b.y).groupBy().count()
    assert [f for f in lint(clean) if f["severity"] != "info"] == []

    # cartesian product flagged as error
    cart = a.crossJoin(b)
    codes = {f["code"] for f in lint(cart)}
    assert "cartesian_product" in codes or "nested_loop_join" in codes

    # global window funnel flagged as warn
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    funnel = a.withColumn("rt", F.sum("x").over(w))
    assert any(f["code"] == "single_partition_exchange" for f in lint(funnel))

    # row-at-a-time python UDF flagged as error
    @F.udf("long")
    def slow(v):
        return v + 1

    pyudf = a.select(slow("x"))
    assert any(f["code"] == "python_row_udf" for f in lint(pyudf))

    # one-row summary agg is NOT flagged as a funnel
    summary = a.agg(F.sum("x"))
    assert not any(f["code"] == "single_partition_exchange" for f in lint(summary))


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """sources.to_parquet_table native bucketing: two tables co-bucketed
    on the join key join with ZERO Exchange — Catalyst proves the
    bucket partitioning satisfies the join distribution, the property
    that deletes the dominant shuffle of a repeated 100 TB fact-fact
    join.  A plain (unbucketed) rewrite of the same join must show the
    Exchanges, proving the elimination comes from the bucketing."""
    from aws_sdk_pandas_spark.sources import to_parquet_table

    left = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS b")
    to_parquet_table(
        left, "bq_left", bucketing_info=(["k"], 8), path=str(tmp_path / "l")
    )
    to_parquet_table(
        right, "bq_right", bucketing_info=(["k"], 8), path=str(tmp_path / "r")
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bq_left").join(spark.table("bq_right"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert joined.count() == 10_000

            flat = (
                spark.read.parquet(str(tmp_path / "l"))
                .join(spark.read.parquet(str(tmp_path / "r")), "k")
            )
            flat_plan = flat._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in flat_plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bq_left")
        spark.sql("DROP TABLE IF EXISTS bq_right")


def test_repeated_spans_jvm_only_and_broadcast_reconstruction(spark, sf_dir):
    """Sliding-window span dedup stays entirely JVM-side (window fan-out,
    dup aggregate, island merge, reconstruction are HOFs/windows/aggs —
    no Python evaluators), and the merged-span side of the
    reconstruction join broadcasts so the corpus never reshuffles."""
    from aws_sdk_pandas_spark.operators.dedup import remove_repeated_spans
    from aws_sdk_pandas_spark.sources import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    df = remove_repeated_spans(docs, min_tokens=8)
    df.count()  # AQE finalizes join strategies at runtime
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # span lists broadcast back


def test_sparql_bgp_constant_pushdown_no_cartesian(spark):
    """Every constant in a triple pattern becomes a pushed filter on the
    triples scan; shared-variable joins are hash joins, and a connected
    BGP never degenerates to a product."""
    from aws_sdk_pandas_spark.connectors.sparql import compile_sparql

    triples = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "knows", "c"), ("a", "age", "29")],
        "s string, p string, o string",
    )
    df = compile_sparql(
        "SELECT ?x ?z WHERE { ?x <knows> ?y . ?y <knows> ?z . }", triples
    )
    plan = _plan(df)
    opt = _optimized(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert opt.count("knows") >= 2  # both constants pushed into scans


def test_round3_query_language_gates_plan_smells(spark, sf_dir):
    """The round-3 compiler gates must stay free of scale-killers: no
    cartesian/nested-loop joins, no row-at-a-time Python, no Python at
    all (these compilers are pure plan rewriters)."""
    for name in (
        "graph_gremlin_select",
        "graph_gremlin_not_filter",
        "graph_cypher_optional_match",
        "graph_cypher_with_pipeline",
        "graph_sparql_path_seq",
        "dedup_lines_corpus",
        "trino_dialect_scalars",
    ):
        df = entry.queries()[name](spark, sf_dir)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_round4_gates_plan_quality(spark, sf_dir):
    """Round-4 additions: the tier-3 Trino rewrites and the Cypher WITH
    ORDER+LIMIT stage stay JVM-only (plan rewriters add no Python), the
    dHash dedups keep Python confined to the one Arrow-batched decode
    kernel, and the banded join never degenerates to a cartesian."""
    for name in ("trino_dialect_tier3", "graph_cypher_with_topk"):
        df = entry.queries()[name](spark, sf_dir)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    # the WITH ... ORDER BY ... LIMIT pipeline stage is a distributed
    # top-k, not a global sort exchange
    topk = entry.queries()["graph_cypher_with_topk"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(topk)

    for name in ("multimodal_image_dhash_dups", "multimodal_audio_dhash_dups"):
        df = entry.queries()[name](spark, sf_dir)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        # exactly the decode+hash kernels are Python (Arrow-batched);
        # nothing row-at-a-time
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" in plan, name
