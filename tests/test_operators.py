"""Operator semantics: dedup family, similarity search, upsert/merge.
Oracles are hand-computed expectations on small synthetic frames plus
numpy for vector math.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators import (
    dedup_exact,
    dedup_fingerprint,
    knn_brute_force,
    minhash_duplicates,
    ngram_jaccard_duplicates,
    simhash_signatures,
    upsert_dataframe,
)


@pytest.fixture()
def docs_df(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (1, base),
        (2, base + " tonight"),                      # near-dup of 1
        (3, "completely different text about spark engines and shuffles here now"),
        (4, base),                                   # exact dup of 1
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dedup_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "c")], "k bigint, v string"
    )
    assert dedup_exact(df).count() == 3
    assert dedup_exact(df, subset=["k"]).count() == 2


def test_dedup_fingerprint_whitespace_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "doc_id bigint, text string",
    )
    kept = dedup_fingerprint(df, text_col="text")
    assert kept.count() == 2  # 1 and 2 collapse (case/whitespace-normalized)


def test_minhash_finds_near_and_exact_dups(docs_df):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_duplicates(
            docs_df, "doc_id", "text", num_hashes=64, bands=16, threshold=0.4
        ).collect()
    }
    assert (1, 4) in pairs          # exact dup always survives
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup caught
    assert all(3 not in p and 5 not in p for p in pairs)


def test_minhash_deterministic(docs_df):
    a = minhash_duplicates(docs_df, "doc_id", "text", num_hashes=32, bands=8).collect()
    b = minhash_duplicates(docs_df, "doc_id", "text", num_hashes=32, bands=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ngram_jaccard(docs_df):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_duplicates(docs_df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert got[(1, 4)] == 1.0
    assert (1, 3) not in got


def test_simhash_properties(docs_df):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs_df).collect()}
    assert sigs[1] == sigs[4]       # identical text -> identical signature
    # near-dup hamming distance < far-pair hamming distance
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])
    assert all(s >= 0 for s in sigs.values())  # bit 63 kept clear


def test_knn_brute_force_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype("float32")
    q = vecs[0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(1, 50)],
        "vec_id bigint, embedding array<float>",
    )
    got = knn_brute_force(df, [float(x) for x in q], k=5, id_col="vec_id",
                          vector_col="embedding", metric="cosine")
    got_ids = [r.vec_id for r in got.collect()]

    sims = vecs[1:] @ q / (np.linalg.norm(vecs[1:], axis=1) * np.linalg.norm(q))
    want_ids = (np.argsort(1 - sims, kind="stable")[:5] + 1).tolist()
    assert got_ids == want_ids


def test_knn_top_k_plan_is_take_ordered(spark):
    """orderBy(dist).limit(k) must compile to TakeOrderedAndProject —
    no global sort of the full table at scale."""
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)], "vec_id bigint, embedding array<float>"
    )
    got = knn_brute_force(df, [1.0, 0.0], k=3, id_col="vec_id", vector_col="embedding")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_upsert_dataframe(spark):
    target = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (None, "n", 1)], "k bigint, v string, ver bigint"
    )
    source = spark.createDataFrame(
        [(2, "B", 2), (3, "c", 2), (None, "N", 2)], "k bigint, v string, ver bigint"
    )
    got = {r.k: (r.v, r.ver) for r in upsert_dataframe(target, source, ["k"]).collect()}
    assert got[1] == ("a", 1)
    assert got[2] == ("B", 2)
    assert got[3] == ("c", 2)
    assert got[None] == ("N", 2)    # null-safe matching replaced the null-key row

    # match_nulls=False keeps both null-key rows
    got2 = upsert_dataframe(target, source, ["k"], match_nulls=False)
    assert got2.where("k IS NULL").count() == 2


def test_upsert_precombine(spark):
    target = spark.createDataFrame([(1, "old", 5)], "k bigint, v string, ver bigint")
    source = spark.createDataFrame(
        [(1, "mid", 3), (1, "new", 9)], "k bigint, v string, ver bigint"
    )
    got = upsert_dataframe(target, source, ["k"], precombine_key="ver").collect()
    assert len(got) == 1 and got[0].v == "new" and got[0].ver == 9


def test_merge_upsert_into_table(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS asps_merge_t")
    spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string").write.mode(
        "overwrite"
    ).saveAsTable("asps_merge_t")
    from aws_sdk_pandas_spark.operators.merge import merge_upsert

    src = spark.createDataFrame([(2, "B"), (3, "c")], "k bigint, v string")
    # plain parquet saveAsTable has no MERGE in OSS Spark without the
    # Delta/Iceberg jars: merge_upsert must run its semantics-equivalent
    # DataFrame fallback (merge + rewrite) instead of failing
    merge_upsert(spark, src, "asps_merge_t", ["k"])
    got = {r.k: r.v for r in spark.table("asps_merge_t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}

    # merge_condition='ignore': matched rows keep target values
    merge_upsert(
        spark,
        spark.createDataFrame([(3, "X"), (4, "d")], "k bigint, v string"),
        "asps_merge_t", ["k"], merge_condition="ignore",
    )
    got = {r.k: r.v for r in spark.table("asps_merge_t").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    spark.sql("DROP TABLE IF EXISTS asps_merge_t")


def test_simhash_radius_banding(spark):
    from aws_sdk_pandas_spark.operators.dedup import simhash_duplicates

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "the quick brown fox jumps over the lazy cat again and again"),
            (4, "completely unrelated text about database query optimization"),
        ],
        "doc_id bigint, text string",
    )
    exact = {(r.id_a, r.id_b) for r in simhash_duplicates(df).collect()}
    assert (1, 2) in exact and all(4 not in p for p in exact)

    near = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_duplicates(df, radius=8).collect()
    }
    assert near[(1, 2)] == 0
    assert (1, 3) in near and 0 < near[(1, 3)] <= 8   # one-word change
    assert all(4 not in (a, b) for (a, b) in near)


def test_simhash_radius_matches_brute_force(spark):
    from aws_sdk_pandas_spark.operators.dedup import simhash_duplicates, simhash_signatures
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"document number {i} talks about topic {i % 5} in depth") for i in range(40)],
        "doc_id bigint, text string",
    )
    radius = 6
    banded = {
        (r.id_a, r.id_b)
        for r in simhash_duplicates(docs, radius=radius).collect()
    }
    sigs = simhash_signatures(docs.select("doc_id", "text"))
    l = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    r = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (x.id_a, x.id_b)
        for x in l.crossJoin(r)
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= radius)
        .collect()
    }
    assert banded == brute  # pigeonhole banding is exact, not approximate


def test_minhash_incremental_match(spark, docs_df):
    """A new batch matches against a prebuilt index: the exact dup is
    found, the unrelated doc is not, and the corpus text is never
    re-kerneled (index carries h+sig only)."""
    from aws_sdk_pandas_spark.operators.dedup import (
        build_minhash_index,
        minhash_match_against,
    )

    index = build_minhash_index(docs_df, "doc_id", "text", num_hashes=64)
    base_text = docs_df.where("doc_id = 1").collect()[0]["text"]
    new_docs = spark.createDataFrame(
        [(100, base_text), (101, "entirely unrelated content about databases only")],
        "doc_id bigint, text string",
    )
    got = {
        (r.new_id, r.index_id): r.jaccard
        for r in minhash_match_against(
            index, new_docs, num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    assert got[(100, 1)] == 1.0          # exact dup of corpus doc 1
    assert got.get((100, 4)) == 1.0      # ...and of its corpus twin
    assert all(nid != 101 for nid, _ in got)


def test_minhash_signatures_partitioning_invariant(spark, docs_df):
    """Signatures are a pure function of (text, num_hashes, shingle_k,
    seed) — identical across partition layouts and row orders.  This is
    what makes a stored index (minhash_match_against) valid across runs
    and cluster sizes."""
    from aws_sdk_pandas_spark.operators.dedup import minhash_signatures

    a = {
        r.doc_id: tuple(r.minhash)
        for r in minhash_signatures(docs_df.repartition(1), num_hashes=32).collect()
    }
    b = {
        r.doc_id: tuple(r.minhash)
        for r in minhash_signatures(
            docs_df.repartition(8).sortWithinPartitions("text"), num_hashes=32
        ).collect()
    }
    assert a == b and len(a) == 5


def test_semantic_dedup_drops_near_identical(spark):
    import random

    random.seed(7)
    # three well-separated base directions in R^8, each with 3 near-copies
    # (tiny jitter) and one genuinely distinct member
    bases = [[1, 0, 0, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0, 0, 0]]
    rows = []
    for bi, base in enumerate(bases):
        for ci in range(3):
            vec = [x + random.uniform(-0.01, 0.01) for x in base]
            rows.append((f"b{bi}_dup{ci}", vec))
        distinct = [x * 0.5 for x in base]
        distinct[(bi + 3) % 8] = 1.0
        rows.append((f"b{bi}_far", distinct))
    df = spark.createDataFrame(rows, "id string, vector array<double>")
    from aws_sdk_pandas_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(df, "id", "vector", n_clusters=3, threshold=0.99)
    kept = sorted(r.id for r in out.collect())
    # exactly one of each near-copy trio survives; the far members all survive
    assert len([k for k in kept if "_far" in k]) == 3
    assert len([k for k in kept if "_dup" in k]) == 3
    assert len(kept) == 6

    # survivors are pairwise below the threshold within clusters
    from aws_sdk_pandas_spark.functions.vectors import cosine_similarity

    a = out.select(F.col("id").alias("ia"), F.col("vector").alias("va"), "__cluster")
    b = out.select(F.col("id").alias("ib"), F.col("vector").alias("vb"), "__cluster")
    bad = (
        a.join(b, "__cluster")
        .where(F.col("ia") < F.col("ib"))
        .where(cosine_similarity("va", "vb") >= 0.99)
        .count()
    )
    assert bad == 0


def test_semantic_dedup_keep_preference(spark):
    # two identical-direction vectors: low_centroid_sim keeps the one
    # farther from the centroid of its cluster; ids break ties
    rows = [
        ("near", [1.0, 0.0, 0.0]),
        ("near2", [1.0, 0.001, 0.0]),
        ("other", [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id string, vector array<double>")
    from aws_sdk_pandas_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(df, "id", "vector", n_clusters=2, threshold=0.999)
    kept = sorted(r.id for r in out.collect())
    assert "other" in kept
    assert len(kept) == 2  # one of near/near2 dropped


def test_strip_html(spark):
    from aws_sdk_pandas_spark.functions.text import strip_html

    rows = [
        (1, "<html><head><style>p{color:red}</style></head>"
            "<body><p>Hello <b>world</b></p><script>var x=1;</script></body></html>"),
        (2, "plain text stays"),
        (3, "a &amp; b &lt;tag&gt; &quot;q&quot; &nbsp; c"),
        (4, "<!-- comment -->visible<br/>text"),
        (5, "<SCRIPT>alert('x')</SCRIPT>safe"),
    ]
    df = spark.createDataFrame(rows, "id int, html string")
    got = {r.id: r.text for r in df.select("id", strip_html("html").alias("text")).collect()}
    assert got[1] == "Hello world"
    assert got[2] == "plain text stays"
    assert got[3] == 'a & b <tag> "q" c'
    assert got[4] == "visible text"
    assert got[5] == "safe"  # case-insensitive script scrub
    assert "var x" not in got[1] and "color" not in got[1]

    extra = spark.createDataFrame(
        [(6, "&amp;lt;b&amp;gt; literal"), (7, "don&#x27;t stop")], "id int, html string"
    )
    got2 = {r.id: r.text for r in extra.select("id", strip_html("html").alias("text")).collect()}
    assert got2[6] == "&lt;b&gt; literal"  # double-encoded stays single-decoded
    assert "&#x27;" not in got2[7]  # hex refs cleaned like decimal ones


def test_merge_fallback_precombine_native_contract(spark):
    """The MERGE-less fallback must reproduce the native WHEN MATCHED AND
    s.pk > t.pk contract exactly: strict-greater updates, TIES KEEP THE
    TARGET row, NULL precombine comparisons keep the target, unmatched
    target rows (incl. duplicate keys the source never touches) pass
    through, new keys insert."""
    from aws_sdk_pandas_spark.operators.merge import merge_upsert

    spark.sql("DROP TABLE IF EXISTS asps_merge_pc")
    spark.createDataFrame(
        [(1, "upd_me", 5), (2, "tie_keep", 7), (3, "null_t", None),
         (9, "dupA", 1), (9, "dupB", 2)],
        "k bigint, v string, ver bigint",
    ).write.mode("overwrite").saveAsTable("asps_merge_pc")
    src = spark.createDataFrame(
        [(1, "UPDATED", 9), (2, "tie_clobber", 7), (3, "null_s", 4), (4, "new", 1)],
        "k bigint, v string, ver bigint",
    )
    try:
        merge_upsert(spark, src, "asps_merge_pc", ["k"], precombine_key="ver")
        got = {(r.k, r.v) for r in spark.table("asps_merge_pc").collect()}
        assert got == {
            (1, "UPDATED"),      # 9 > 5: source wins
            (2, "tie_keep"),     # 7 > 7 false: target kept (native tie rule)
            (3, "null_s"),       # 4 > NULL is NULL -> guard false? NO: see below
            (9, "dupA"), (9, "dupB"),  # untouched duplicate-key rows preserved
            (4, "new"),          # unmatched source inserted
        } or got == {
            (1, "UPDATED"), (2, "tie_keep"), (3, "null_t"),
            (9, "dupA"), (9, "dupB"), (4, "new"),
        }
        # pin the NULL rule exactly: s.ver > NULL is NULL -> matched guard
        # false -> target row survives
        assert (3, "null_t") in got and (3, "null_s") not in got
    finally:
        spark.sql("DROP TABLE IF EXISTS asps_merge_pc")


def test_merge_fallback_null_keys_not_matched(spark):
    """Non-null-safe matching: a NULL-key row in target and in source are
    NOT a match — target row kept, source row inserted (two rows), the
    native `t.k = s.k` behavior the first fallback draft collapsed."""
    from aws_sdk_pandas_spark.operators.merge import merge_upsert

    spark.sql("DROP TABLE IF EXISTS asps_merge_nk")
    spark.createDataFrame(
        [(None, "t_null", 1), (1, "a", 1)], "k bigint, v string, ver bigint"
    ).write.mode("overwrite").saveAsTable("asps_merge_nk")
    src = spark.createDataFrame(
        [(None, "s_null", 2)], "k bigint, v string, ver bigint"
    )
    try:
        merge_upsert(spark, src, "asps_merge_nk", ["k"], precombine_key="ver")
        got = sorted((r.v for r in spark.table("asps_merge_nk").collect()))
        assert got == ["a", "s_null", "t_null"]
    finally:
        spark.sql("DROP TABLE IF EXISTS asps_merge_nk")


def test_merge_fallback_preserves_layout(spark):
    """The rewrite must carry the target's partitioning AND bucketing
    into the new table — a merge must not silently flatten the layout a
    co-located join depends on."""
    from aws_sdk_pandas_spark.operators.merge import _table_layout, merge_upsert

    spark.sql("DROP TABLE IF EXISTS asps_merge_layout")
    spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(20)], "k bigint, p int, v string"
    ).write.mode("overwrite").format("parquet").partitionBy("p").bucketBy(
        4, "k"
    ).sortBy("k").saveAsTable("asps_merge_layout")
    try:
        merge_upsert(
            spark,
            spark.createDataFrame([(1, 1, "NEW"), (100, 0, "ins")], "k bigint, p int, v string"),
            "asps_merge_layout",
            ["k"],
        )
        got = {r.k: r.v for r in spark.table("asps_merge_layout").collect()}
        assert got[1] == "NEW" and got[100] == "ins" and len(got) == 21
        layout = _table_layout(spark, "asps_merge_layout")
        assert layout["partition_cols"] == ["p"]
        assert layout["n_buckets"] == 4 and layout["bucket_cols"] == ["k"]
    finally:
        spark.sql("DROP TABLE IF EXISTS asps_merge_layout")
