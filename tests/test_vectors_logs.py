"""Vector index lifecycle (reference: awswrangler/s3/_vectors/) and the
CloudWatch Logs Insights translator (reference: awswrangler/cloudwatch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark import logs, vectors
from aws_sdk_pandas_spark.exceptions import InvalidArgument


@pytest.fixture()
def index_path(spark, tmp_path):
    path = str(tmp_path / "vecidx")
    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0], "red", 1),
            ("b", [0.0, 1.0], "blue", 2),
            ("c", [1.0, 1.0], "red", 3),
            ("d", [-1.0, 0.0], "blue", 4),
        ],
        "key string, vector array<float>, color string, rank bigint",
    )
    vectors.create_vector_index(spark, path, dimension=2, distance_metric="cosine")
    vectors.put_vectors_from_df(df, path, mode="overwrite")
    return path


def test_index_lifecycle(spark, index_path):
    props = vectors.describe_vector_index(spark, index_path)
    assert props["dimension"] == 2 and props["distance_metric"] == "cosine"

    assert vectors.list_vectors(spark, index_path).count() == 4
    got = vectors.get_vectors(spark, index_path, ["a", "c"])
    assert sorted(r.key for r in got.collect()) == ["a", "c"]

    vectors.delete_vectors(spark, index_path, ["d"])
    assert sorted(r.key for r in vectors.list_vectors(spark, index_path).collect()) == [
        "a",
        "b",
        "c",
    ]


def test_query_vectors_topk_and_filter(spark, index_path):
    got = vectors.query_vectors(spark, index_path, [1.0, 0.0], top_k=2)
    assert [r.key for r in got.collect()] == ["a", "c"]  # exact, then 45°

    filtered = vectors.query_vectors(
        spark, index_path, [1.0, 0.0], top_k=4,
        metadata_filter={"color": "blue"},
    )
    assert sorted(r.key for r in filtered.collect()) == ["b", "d"]

    ops = vectors.query_vectors(
        spark, index_path, [1.0, 0.0], top_k=4,
        metadata_filter={"$or": [{"rank": {"$lte": 1}}, {"color": {"$ne": "red"}}]},
    )
    assert sorted(r.key for r in ops.collect()) == ["a", "b", "d"]


def test_invalid_index_args(spark, tmp_path):
    with pytest.raises(InvalidArgument):
        vectors.create_vector_index(spark, str(tmp_path / "x"), dimension=0)
    with pytest.raises(InvalidArgument):
        vectors.create_vector_index(
            spark, str(tmp_path / "x"), dimension=2, distance_metric="manhattan"
        )
    with pytest.raises(InvalidArgument):
        vectors.describe_vector_index(spark, str(tmp_path / "nope"))


@pytest.fixture()
def logs_df(spark):
    return spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", "api", "GET /users 200 12ms", 200, 12.0),
            ("2024-01-01 10:01:00", "api", "GET /users 500 3ms", 500, 3.0),
            ("2024-01-01 10:02:00", "worker", "job ok", 0, 45.0),
            ("2024-01-01 10:03:00", "api", "POST /items 200 99ms", 200, 99.0),
            ("2024-01-01 11:00:00", "worker", "job failed", 1, 7.0),
        ],
        "ts string, component string, message string, status int, latency double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_insights_fields_filter_sort_limit(logs_df):
    got = logs.run_query(
        logs_df, "fields ts, status | filter status >= 200 | sort status desc, ts | limit 2"
    )
    assert [r.status for r in got.collect()] == [500, 200]


def test_insights_stats_by(logs_df):
    got = logs.run_query(
        logs_df,
        "stats count(*) as n, avg(latency) as lat, max(status) as mx by component"
        " | sort component",
    )
    rows = {r.component: (r.n, r.mx) for r in got.collect()}
    assert rows == {"api": (3, 500), "worker": (2, 1)}


def test_insights_like_and_regex(logs_df):
    got = logs.run_query(logs_df, "filter message like 'GET' | sort ts")
    assert got.count() == 2
    got2 = logs.run_query(logs_df, "filter message =~ /job (ok|failed)/")
    assert got2.count() == 2
    got3 = logs.run_query(logs_df, "filter message not like /5\\d\\d/")
    assert got3.count() == 4


def test_insights_parse(logs_df):
    got = logs.run_query(
        logs_df,
        "parse message /(?<verb>GET|POST) (?<path>\\S+)/ | filter verb = 'GET'"
        " | fields path, verb",
    )
    assert sorted(r.path for r in got.collect() if r.verb == "GET") == ["/users", "/users"]


def test_read_logs_time_window(logs_df):
    got = logs.read_logs(
        logs_df,
        "stats count(*) as n by component | sort component",
        start_time="2024-01-01 10:00:00",
        end_time="2024-01-01 10:30:00",
    )
    assert {r.component: r.n for r in got.collect()} == {"api": 3, "worker": 1}


def test_insights_unknown_verb(logs_df):
    with pytest.raises(InvalidArgument):
        logs.run_query(logs_df, "explode everything")


def test_embed_texts_deterministic_and_normalized(spark):
    from aws_sdk_pandas_spark.vectors import embed_texts

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "different text"), (4, None)],
        "id bigint, text string",
    )
    out = {r.id: r.embedding for r in embed_texts(df, dim=16).collect()}
    assert out[1] == out[2]            # deterministic across rows/tasks
    assert out[1] != out[3]
    assert len(out[1]) == 16
    norm = sum(x * x for x in out[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-5      # L2-normalized
    assert sum(abs(x) for x in out[4]) == 0.0  # null text -> zero vector


def test_embed_texts_custom_fn(spark):
    from aws_sdk_pandas_spark.vectors import embed_texts

    df = spark.createDataFrame([(1, "abc")], "id bigint, text string")

    def fake(texts):
        return [[float(len(t)), 0.0] for t in texts]

    row = embed_texts(df, dim=2, embed_fn=fake).first()
    assert row.embedding == [3.0, 0.0]


def test_knn_batch_matches_single_queries(spark, sf_dir):
    from aws_sdk_pandas_spark.operators.similarity import knn_batch, knn_brute_force
    from aws_sdk_pandas_spark.sources import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where("vec_id >= 3")
    batched = {
        (r.query_id, r.rank): r.vec_id
        for r in knn_batch(
            corpus, queries, k=3, id_col="vec_id", vector_col="embedding",
            query_id_col="query_id", query_vector_col="embedding",
        ).collect()
    }
    for qid in range(3):
        qv = emb.where(f"vec_id = {qid}").select("embedding").first()[0]
        singles = [
            r.vec_id
            for r in knn_brute_force(
                corpus, qv, k=3, id_col="vec_id", vector_col="embedding"
            ).collect()
        ]
        assert [batched[(qid, rk)] for rk in (1, 2, 3)] == singles


def test_vector_index_mgmt(spark, tmp_path):
    """put_vectors (literal dicts), get/delete_vector_index,
    list_vector_indexes (reference: _vectors/_mgmt.py)."""
    from aws_sdk_pandas_spark import vectors as V

    root = f"file://{tmp_path}"
    idx = f"{root}/idx_a"
    V.create_vector_index(spark, idx, dimension=2, distance_metric="euclidean")
    V.put_vectors(
        spark, idx,
        [{"key": "a", "vector": [1.0, 0.0]}, {"key": "b", "vector": [0.0, 1.0]}],
    )
    assert V.get_vector_index(spark, idx)["distance_metric"] == "euclidean"
    assert V.list_vectors(spark, idx).count() == 2
    found = V.list_vector_indexes(spark, root)
    assert len(found) == 1 and found[0].rstrip("/").endswith("/idx_a")
    V.delete_vector_index(spark, idx)
    assert V.list_vector_indexes(spark, root) == []


def test_cloudwatch_start_wait_query(logs_df):
    qid = logs.start_query(logs_df, "fields ts, status | filter status = 200 | sort ts")
    got = logs.wait_query(qid)
    assert [r.status for r in got.collect()] == [200, 200]
    with pytest.raises(InvalidArgument):
        logs.wait_query("not-a-query-id")


def test_cloudwatch_describe_log_streams(logs_df):
    got = logs.describe_log_streams(logs_df, stream_col="component").collect()
    assert [r.logStreamName for r in got] == ["api", "worker"]
    api = got[0]
    assert str(api.firstEventTimestamp) == "2024-01-01 10:00:00"
    assert str(api.lastEventTimestamp) == "2024-01-01 10:03:00"
    assert api.storedBytes > 0
    by_time = logs.describe_log_streams(
        logs_df, stream_col="component", order_by="LastEventTime", descending=True
    ).collect()
    assert by_time[0].logStreamName == "worker"
    pref = logs.describe_log_streams(
        logs_df, log_stream_name_prefix="wor", stream_col="component"
    ).collect()
    assert [r.logStreamName for r in pref] == ["worker"]


def test_cloudwatch_filter_log_events(logs_df):
    got = logs.filter_log_events(
        logs_df, log_stream_names=["api"], filter_pattern="GET", stream_col="component"
    )
    assert got.count() == 2
    # -term excludes, "quoted phrase" matches exactly, ?any-of ORs
    assert (
        logs.filter_log_events(
            logs_df, filter_pattern="GET -500", stream_col="component"
        ).count()
        == 1
    )
    assert (
        logs.filter_log_events(
            logs_df, filter_pattern='"job ok"', stream_col="component"
        ).count()
        == 1
    )
    assert (
        logs.filter_log_events(
            logs_df, filter_pattern="?ok ?failed", stream_col="component"
        ).count()
        == 2
    )
    # time bounds are inclusive start / inclusive end (reference semantics)
    assert (
        logs.filter_log_events(
            logs_df,
            start_time="2024-01-01 10:01:00",
            end_time="2024-01-01 10:03:00",
            stream_col="component",
        ).count()
        == 3
    )
    with pytest.raises(InvalidArgument):
        logs.filter_log_events(
            logs_df, log_stream_name_prefix="a", log_stream_names=["api"]
        )


def test_mine_hard_negatives_excludes_self_and_label(spark):
    """Hardest different-label neighbor wins; self and same-label rows
    never appear; min_distance floors out near-dups."""
    from pyspark.sql import functions as F

    from aws_sdk_pandas_spark.operators.similarity import mine_hard_negatives

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.99, 0.14], "a"),   # same label: excluded
        (3, [0.95, 0.31], "b"),   # hard negative
        (4, [0.0, 1.0], "b"),     # easy negative
        (5, [1.0, 0.001], "b"),   # near-dup of anchor
    ]
    df = spark.createDataFrame(rows, "key int, vector array<double>, label string")
    anchors = df.where("key = 1").select(
        F.col("key").alias("anchor_id"), "vector", "label"
    )
    got = mine_hard_negatives(
        df, anchors, k=2, id_col="key", vector_col="vector", label_col="label"
    ).collect()
    assert [(r.neg_id, r.rank) for r in got] == [(5, 1), (3, 2)]
    # floor drops the near-duplicate false negative
    floored = mine_hard_negatives(
        df, anchors, k=2, id_col="key", vector_col="vector", label_col="label",
        min_distance=0.01,
    ).collect()
    assert [(r.neg_id, r.rank) for r in floored] == [(3, 1), (4, 2)]


def test_decontaminate_by_embedding(spark):
    """Corpus rows at cosine similarity >= threshold to ANY eval row are
    dropped; NULL-vector corpus rows pass through; max_eval guards the
    broadcast contract."""
    from aws_sdk_pandas_spark.operators.similarity import decontaminate_by_embedding

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),          # exact eval member -> removed
            (2, [0.999, 0.04]),       # near-paraphrase of eval -> removed
            (3, [0.0, 1.0]),          # orthogonal -> kept
            (4, [0.7, 0.72]),         # ~45 degrees -> kept at 0.95
            (5, None),                # NULL vector -> kept (text-side guard)
        ],
        "doc_id int, embedding array<double>",
    )
    eval_df = spark.createDataFrame(
        [([1.0, 0.0],), (None,)], "embedding array<double>"
    )
    got = decontaminate_by_embedding(corpus, eval_df, threshold=0.95)
    assert sorted(r.doc_id for r in got.collect()) == [3, 4, 5]
    # schema passes through untouched
    assert got.columns == corpus.columns
    # tightening the threshold to 1.0-epsilon keeps the paraphrase
    loose = decontaminate_by_embedding(corpus, eval_df, threshold=0.9999)
    assert sorted(r.doc_id for r in loose.collect()) == [2, 3, 4, 5]
    with pytest.raises(ValueError, match="max_eval"):
        decontaminate_by_embedding(corpus, eval_df, threshold=0.9, max_eval=1)


def test_diverse_subset_matches_serial_greedy(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.similarity import diverse_subset

    rng = np.random.default_rng(91)
    # three tight clusters + one outlier: k=4 must hit all four regions
    centers = np.array([[0, 0], [10, 0], [0, 10]])
    pts = []
    for ci, c in enumerate(centers):
        for _ in range(30):
            pts.append(c + rng.normal(0, 0.3, 2))
    pts.append(np.array([30.0, 30.0]))      # outlier
    pts = np.array(pts)
    rows = [(int(i), [float(a), float(b)]) for i, (a, b) in enumerate(pts)]
    df = spark.createDataFrame(rows, "vid long, embedding array<double>").repartition(5)

    got = diverse_subset(df, 4, id_col="vid", vector_col="embedding").collect()
    assert [r.sel_order for r in got] == [0, 1, 2, 3]

    # serial replication of the same deterministic greedy
    centroid = pts.mean(axis=0)
    d0 = np.linalg.norm(pts - centroid, axis=1)
    seed = int(np.lexsort((np.arange(len(pts)), -d0))[0])
    chosen = [seed]
    dists = [0.0]
    while len(chosen) < 4:
        dmin = np.min(
            np.stack([np.linalg.norm(pts - pts[c], axis=1) for c in chosen]),
            axis=0,
        )
        dmin[chosen] = -1
        nxt = int(np.lexsort((np.arange(len(pts)), -dmin))[0])
        chosen.append(nxt)
        dists.append(float(dmin[nxt]))
    assert [r.vid for r in got] == chosen
    for r, want in zip(got, dists):
        assert abs(r.sel_distance - round(want, 6)) < 1e-6

    # coverage: one pick per cluster + the outlier
    picked = pts[[r.vid for r in got]]
    regions = set()
    for p in picked:
        if p[0] > 20:
            regions.add("outlier")
        else:
            regions.add(int(np.argmin(np.linalg.norm(centers - p, axis=1))))
    assert len(regions) == 4

    # determinism across partitionings
    again = diverse_subset(
        df.repartition(11), 4, id_col="vid", vector_col="embedding"
    ).collect()
    assert [r.vid for r in again] == chosen


def test_diverse_subset_releases_round_checkpoints(spark):
    """The farthest-first loop materializes each round with a lazy
    localCheckpoint (constant-size plans instead of a growing persist
    chain); every round's blocks must be freed by the time the operator
    returns — a k-round loop must not leak k corpus copies into the
    block manager."""
    from aws_sdk_pandas_spark.operators.similarity import diverse_subset

    rows = [(int(i), [float(i % 7), float(i % 5)]) for i in range(60)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "vid long, embedding array<double>"
    )
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    out = diverse_subset(df, 6, id_col="vid", vector_col="embedding")
    assert out.count() == 6
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"leaked persistent RDDs: {after - before}"


def test_embedding_health(spark):
    import math

    from aws_sdk_pandas_spark.vectors import embedding_health

    rows = [
        (1, [3.0, 4.0]),            # norm 5
        (2, [0.0, 0.0]),            # zero vector
        (3, [float("nan"), 1.0]),   # NaN coordinate
        (4, None),                  # NULL vector
        (5, [1.0, 0.0, 0.0]),       # wrong dimensionality
        (6, [6.0, 8.0]),            # norm 10
        (7, [None, 1.0]),           # NULL coordinate: its own counter
    ]
    df = spark.createDataFrame(rows, "id int, embedding array<double>")
    r = embedding_health(df).collect()[0]
    assert r.n == 7 and r.n_null == 1 and r.n_nan == 1 and r.n_zero == 1
    assert r.n_null_coord == 1
    assert r.n_dims == 2 and r.dim_mode == 2
    # norm percentiles over the 4 valid-norm vectors {0, 1, 5, 10}:
    # p50 interpolates 1..5 -> 3
    assert abs(r.norm_p50 - 3.0) < 1e-9
    assert r.norm_p99 > 9.0 and r.norm_p01 < 1.0


def test_diverse_subset_max_k_guard(spark):
    """round-3 verdict: diverse_subset is O(k) sequential corpus scans —
    a k beyond max_k must be refused with an actionable error."""
    from aws_sdk_pandas_spark.operators.similarity import diverse_subset

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)], "vid long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="max_k"):
        diverse_subset(df, 500, id_col="vid", vector_col="embedding")
    # raising max_k explicitly opts into the cost (k capped by corpus size)
    got = diverse_subset(df, 10, id_col="vid", vector_col="embedding", max_k=1000)
    assert got.count() == 10
