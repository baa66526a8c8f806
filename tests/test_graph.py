"""connected_components / dedup_clusters semantics."""

from __future__ import annotations

from aws_sdk_pandas_spark.operators.graph import connected_components, dedup_clusters


def test_chain_and_separate_components(spark):
    # chain 1-2-3-4 (diameter 3, needs multi-round propagation) + pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_representatives(spark):
    pairs = spark.createDataFrame([(5, 7), (7, 6)], "id_a bigint, id_b bigint")
    rows = dedup_clusters(pairs).collect()
    reps = {r.id for r in rows if r.is_representative}
    assert reps == {5}
    assert {r.cluster_id for r in rows} == {5}


def test_dedup_keep_best(spark):
    """Clusters keep exactly the best-scoring member; unpaired rows
    survive untouched."""
    from aws_sdk_pandas_spark.operators.graph import dedup_keep_best
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 99), (5, 7)], "doc_id bigint, score bigint"
    )
    # {1,2,3} one cluster (2 wins on score), {4} and {5} unpaired
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    kept = sorted(r.doc_id for r in dedup_keep_best(docs, pairs, score_col="score").collect())
    assert kept == [2, 4, 5]
    # no score: minimum id wins
    kept_min = sorted(r.doc_id for r in dedup_keep_best(docs, pairs).collect())
    assert kept_min == [1, 4, 5]


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from aws_sdk_pandas_spark.connectors.neptune import pagerank

    # graph with a dangling node (d) and a hub (a)
    pairs = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "d"), ("e", "a")]
    edges = spark.createDataFrame(
        [(f"e{i}", "link", s, t) for i, (s, t) in enumerate(pairs)],
        "`~id` string, `~label` string, `~from` string, `~to` string",
    )
    got = {r["~id"]: r["rank"] for r in pagerank(edges, max_iter=25, tol=1e-9).collect()}

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    outd = {}
    for s, t in pairs:
        outd[s] = outd.get(s, 0) + 1
    for s, t in pairs:
        M[idx[t], idx[s]] = 1.0 / outd[s]
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(25):
        dangling_mass = sum(r[idx[v]] for v in nodes if v not in outd)
        r = (1 - d) / n + d * (M @ r + dangling_mass / n)
    assert abs(sum(got.values()) - 1.0) < 1e-6  # ranks are a distribution
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-6, v  # same 25 rounds both sides
    # the hub receiving 3 in-links outranks everything
    assert got["a"] == max(got.values())


def _edge_frame(spark, pairs):
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame(pairs, "f string, t string")
        .select(
            F.concat_ws("-", "f", "t").alias("~id"),
            F.lit("e").alias("~label"),
            F.col("f").alias("~from"),
            F.col("t").alias("~to"),
        )
    )


def test_triangle_count_known_graph(spark):
    """K4 (every vertex in C(3,2)=3 triangles) + a pendant vertex with 0;
    duplicate/reversed/self-loop edges collapse before counting."""
    from aws_sdk_pandas_spark.connectors.neptune import triangle_count

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    noise = [("b", "a"), ("a", "a"), ("a", "b"), ("d", "e")]  # dup, loop, reverse, pendant
    got = {r["~id"]: r.triangles for r in triangle_count(_edge_frame(spark, k4 + noise)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_count_matches_brute_force(spark):
    """Degree-oriented counting equals the itertools definition on a
    pseudo-random graph (deterministic seed)."""
    import itertools
    import random

    from aws_sdk_pandas_spark.connectors.neptune import triangle_count

    rng = random.Random(7)
    verts = [f"v{i}" for i in range(30)]
    edges = sorted(
        {tuple(sorted((rng.choice(verts), rng.choice(verts)))) for _ in range(120)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    eset = set(edges)
    expect = {v: 0 for v in {x for e in edges for x in e}}
    for x, y, z in itertools.combinations(sorted(expect), 3):
        if ((x, y) in eset) and ((y, z) in eset) and ((x, z) in eset):
            expect[x] += 1
            expect[y] += 1
            expect[z] += 1
    got = {r["~id"]: r.triangles for r in triangle_count(_edge_frame(spark, edges)).collect()}
    assert got == expect


def test_k_hop_neighbors_min_hop_and_direction(spark):
    from aws_sdk_pandas_spark.connectors.neptune import k_hop_neighbors

    # a -> b -> c -> d, plus shortcut a -> c: c is 1 hop via the shortcut
    edges = _edge_frame(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    got = {r["~id"]: r.hops for r in k_hop_neighbors(edges, ["a"], k=2, direction="out").collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # undirected from d reaches everything within 3
    both = {r["~id"]: r.hops for r in k_hop_neighbors(edges, ["d"], k=3, direction="both").collect()}
    assert both == {"d": 0, "c": 1, "a": 2, "b": 2}
    # in-direction from b: only a
    inc = {r["~id"]: r.hops for r in k_hop_neighbors(edges, ["b"], k=2, direction="in").collect()}
    assert inc == {"b": 0, "a": 1}


def test_label_propagation_splits_cliques(spark):
    """Two 5-cliques joined by one bridge edge: LPA finds two
    communities where connected_components finds one; deterministic
    across repartitionings."""
    import itertools

    from aws_sdk_pandas_spark.connectors.neptune import label_propagation

    a = [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)]
    edges = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [("a0", "b0")]
    )
    ef = _edge_frame(spark, edges)
    got = {r["~id"]: r.community for r in label_propagation(ef).collect()}
    comm_a = {got[v] for v in a}
    comm_b = {got[v] for v in b}
    assert len(comm_a) == 1 and len(comm_b) == 1
    assert comm_a != comm_b
    got2 = {
        r["~id"]: r.community
        for r in label_propagation(ef.repartition(7)).collect()
    }
    assert got2 == got
