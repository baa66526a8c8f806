"""cap_per_group / stratified_sample determinism and semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.sampling import cap_per_group, stratified_sample


def test_cap_per_group_counts_and_determinism(spark):
    df = spark.range(1000).selectExpr("id", "id % 3 AS g", "CAST(id AS DOUBLE) AS score")
    capped = cap_per_group(df, ["g"], 10)
    counts = {r.g: r["count"] for r in capped.groupBy("g").count().collect()}
    assert counts == {0: 10, 1: 10, 2: 10}
    again = cap_per_group(df.repartition(7), ["g"], 10)
    assert {r.id for r in capped.collect()} == {r.id for r in again.collect()}


def test_cap_per_group_by_score_keeps_best(spark):
    df = spark.range(100).selectExpr("id", "id % 2 AS g", "CAST(id AS DOUBLE) AS score")
    top = cap_per_group(df, ["g"], 3, order_col="score")
    ids = sorted(r.id for r in top.collect())
    assert ids == [94, 95, 96, 97, 98, 99]  # highest scores per parity group


def test_stratified_sample_fractions_and_determinism(spark):
    df = spark.range(20000).selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS s")
    samp = stratified_sample(df, "s", {"a": 0.5, "b": 0.1})
    n = {r.s: r["count"] for r in samp.groupBy("s").count().collect()}
    assert 0.45 < n["a"] / 10000 < 0.55
    assert 0.05 < n["b"] / 10000 < 0.15
    again = stratified_sample(df.repartition(13), "s", {"a": 0.5, "b": 0.1})
    assert {r.id for r in samp.collect()} == {r.id for r in again.collect()}
    # strata not in the dict are dropped entirely
    assert stratified_sample(df, "s", {"a": 1.0}).where("s = 'b'").count() == 0


def test_stratified_sample_md5_portable(spark):
    """md5+key mode: decision must match an independent python
    re-derivation, and all rows sharing a key decide together."""
    import hashlib

    from aws_sdk_pandas_spark.operators.sampling import stratified_sample

    rows = [(i % 50, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_sample(
        df, "s", {"a": 0.5, "b": 0.25}, seed=3, key_col="k", algo="md5"
    ).collect()
    for r in out:
        u = int(hashlib.md5(f"{r['k']}:3".encode()).hexdigest()[:8], 16) / float(1 << 32)
        assert u < (0.5 if r["s"] == "a" else 0.25)
    # keys decide as a unit: every kept (k, s) keeps all 4 copies
    from collections import Counter

    c = Counter((r["k"], r["s"]) for r in out)
    assert c and all(v == 4 for v in c.values())


def test_stratified_sample_md5_requires_key(spark):
    import pytest

    from aws_sdk_pandas_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError):
        stratified_sample(df, "s", {"a": 0.5}, algo="md5")


def test_temperature_sample_rebalances(spark):
    """T=2 flattens the group distribution: the rarest group survives
    whole, the dominant group is downsampled, and the kept shares are
    strictly flatter than the input shares."""
    from aws_sdk_pandas_spark.operators.sampling import temperature_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    kept = temperature_sample(df, "g", temperature=2.0, key_col="doc_id", seed=7)
    counts = {r["g"]: r["n"] for r in kept.groupBy("g").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert counts["small"] == 100            # rarest group keep_p == 1
    assert counts["big"] < 900               # dominant group downsampled
    # flatter: kept big-share strictly below input big-share (0.9)
    assert counts["big"] / (counts["big"] + counts["small"]) < 0.9


def test_temperature_sample_deterministic_and_identity(spark):
    from aws_sdk_pandas_spark.operators.sampling import temperature_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    a = sorted(r["doc_id"] for r in temperature_sample(df, "g", temperature=3.0, key_col="doc_id").collect())
    b = sorted(r["doc_id"] for r in temperature_sample(df, "g", temperature=3.0, key_col="doc_id").collect())
    assert a == b and a
    # T=1 keeps everything (keep_p == 1 for every group)
    assert temperature_sample(df, "g", temperature=1.0, key_col="doc_id").count() == 300


# ---------------------------------------------------------- weighted sample
def test_weighted_sample_deterministic_and_capped(spark):
    from aws_sdk_pandas_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, "g1" if i < 50 else "g2", float(1 + i % 7)) for i in range(100)],
        "id long, g string, w double",
    )
    a = weighted_sample(df, 10, weight_col="w", key_col="id", group_cols=["g"])
    b = weighted_sample(
        df.repartition(13), 10, weight_col="w", key_col="id", group_cols=["g"]
    )
    rows_a = sorted((r.g, r.id) for r in a.collect())
    rows_b = sorted((r.g, r.id) for r in b.collect())
    assert rows_a == rows_b
    per_g = {}
    for g, _ in rows_a:
        per_g[g] = per_g.get(g, 0) + 1
    assert per_g == {"g1": 10, "g2": 10}


def test_weighted_sample_bias_and_edge(spark):
    from aws_sdk_pandas_spark.operators.sampling import weighted_sample

    # one heavy row among light ones: across seeds it must be included
    # far more often than any individual light row
    df = spark.createDataFrame(
        [(0, 1000.0)] + [(i, 1.0) for i in range(1, 40)], "id long, w double"
    )
    heavy = light = 0
    for seed in range(30):
        got = {r.id for r in
               weighted_sample(df, 5, weight_col="w", key_col="id", seed=seed).collect()}
        assert len(got) == 5
        heavy += 0 in got
        light += 1 in got
    assert heavy > 25 and heavy > light * 3

    # zero/negative weights never sampled; n > group size returns all valid
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 2.0)], "id long, w double"
    )
    got = {r.id for r in
           weighted_sample(df2, 10, weight_col="w", key_col="id").collect()}
    assert got == {3}


def test_dsir_importance_weights_match_numpy(spark):
    import hashlib
    import math
    import re as _re

    raw_rows = [
        ("1", "the cat sat on the mat"),
        ("2", "le chat est noir"),
        ("3", "the dog ran in the park"),
        ("4", ""),
        ("5", "the bird sang a song  today"),
    ]
    tgt_rows = [("t1", "the cat and the dog"), ("t2", "a bird in the park")]
    B, ALPHA = 64, 1.0

    def grams(text):
        ws = [w for w in _re.split(r"\s+", text.strip().lower()) if w]
        return ws + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    def counts(rows):
        c = {}
        for _, t in rows:
            for g in grams(t):
                b = bucket(g)
                c[b] = c.get(b, 0) + 1
        return c

    q, p = counts(raw_rows), counts(tgt_rows)
    qt, pt = sum(q.values()), sum(p.values())

    def logr(b):
        return math.log((p.get(b, 0) + ALPHA) / (pt + ALPHA * B)) - math.log(
            (q.get(b, 0) + ALPHA) / (qt + ALPHA * B)
        )

    expected = {
        i: sum(logr(bucket(g)) for g in grams(t)) for i, t in raw_rows
    }

    from aws_sdk_pandas_spark.operators.sampling import dsir_importance_weights

    raw = spark.createDataFrame(raw_rows, "doc_id string, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id string, text string")
    got = {
        r.doc_id: r.log_weight
        for r in dsir_importance_weights(raw, tgt, buckets=B, alpha=ALPHA).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9, (k, got[k], expected[k])
    assert got["4"] == 0.0  # empty doc


def test_global_prefix_sum_matches_single_partition(spark):
    import random

    random.seed(3)
    rows = [(i, random.randint(1, 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, cost long").repartition(16)
    from aws_sdk_pandas_spark.operators.sampling import global_prefix_sum

    got = {
        r.id: r.running_total
        for r in global_prefix_sum(df, "cost", [F.col("id").asc()], num_partitions=8).collect()
    }
    acc, expected = 0, {}
    for i, c in sorted(rows):
        acc += c
        expected[i] = acc
    assert got == expected


def test_global_prefix_sum_multi_column_and_stable(spark):
    """Two value columns ride one pass; repeated executions agree.

    Regression: repartitionByRange samples boundaries with an
    RDD-id-dependent seed, so without pinning the assignment the totals
    job and the window job could split boundary rows differently —
    offsets from one assignment added to local sums from another
    (observed as wrong KS cumulative counts at 8 partitions)."""
    import random

    random.seed(9)
    # duplicate-heavy float keys: the boundary-straddling case
    rows = [(i, round(random.uniform(0, 50), 1), random.randint(0, 1)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, key double, flag long").repartition(16)
    from aws_sdk_pandas_spark.operators.sampling import global_prefix_sum

    def run():
        out = global_prefix_sum(
            df,
            ["flag", "__one"],
            [F.col("key").asc(), F.col("id").asc()],
            out_col=["cum_flag", "cum_one"],
            num_partitions=8,
        )
        return {r.id: (r.cum_flag, r.cum_one) for r in out.collect()}

    df = df.withColumn("__one", F.lit(1))
    got = run()
    acc_f, acc_1, expected = 0, 0, {}
    for i, _, fl in sorted(rows, key=lambda r: (r[1], r[0])):
        acc_f += fl
        acc_1 += 1
        expected[i] = (acc_f, acc_1)
    assert got == expected
    assert run() == got  # deterministic across materializations


def test_select_by_budget_deterministic_top_slice(spark):
    rows = [
        ("a", 0.9, 40),
        ("b", 0.8, 50),
        ("c", 0.7, 30),
        ("d", 0.6, 20),
        ("e", 0.5, 10),
    ]
    df = spark.createDataFrame(rows, "doc_id string, score double, tokens long")
    from aws_sdk_pandas_spark.operators.sampling import select_by_budget

    kept = sorted(
        r.doc_id
        for r in select_by_budget(
            df, 100, cost_col="tokens", score_col="score", id_col="doc_id"
        ).collect()
    )
    # greedy by score: a(40)+b(50)=90 fits, c would reach 120 > 100 ->
    # c and everything after the overflow point is cut (prefix rule)
    assert kept == ["a", "b"]
    # larger budget takes the next docs
    kept = sorted(
        r.doc_id
        for r in select_by_budget(
            df, 140, cost_col="tokens", score_col="score", id_col="doc_id"
        ).collect()
    )
    assert kept == ["a", "b", "c", "d"]


def test_materialize_mixture_row_quotas(spark):
    rows = [(f"d{i}", "en" if i < 60 else ("fr" if i < 90 else "de"), i) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, score long")
    from aws_sdk_pandas_spark.operators.sampling import materialize_mixture

    out = materialize_mixture(
        df, "lang", {"en": 0.5, "fr": 0.5}, total=40, key_col="doc_id", score_col="score"
    )
    got = {r.lang: 0 for r in out.collect()}
    for r in out.collect():
        got[r.lang] += 1
    assert got == {"en": 20, "fr": 20}  # de dropped, quotas exact
    # score-ranked: the kept en docs are the top-scored ones
    kept_en = sorted(int(r.doc_id[1:]) for r in out.collect() if r.lang == "en")
    assert kept_en == list(range(40, 60))


def test_materialize_mixture_token_budgets(spark):
    rows = [(f"d{i}", "en" if i % 2 == 0 else "fr", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, tokens long")
    from aws_sdk_pandas_spark.operators.sampling import materialize_mixture

    out = materialize_mixture(
        df, "lang", {"en": 3, "fr": 1}, total=200, key_col="doc_id", cost_col="tokens"
    )
    got = {}
    for r in out.collect():
        got[r.lang] = got.get(r.lang, 0) + r.tokens
    # en budget = 150 tokens -> 15 docs; fr budget = 50 -> 5 docs
    assert got == {"en": 150, "fr": 50}
    # md5-ranked (no score col): determinism across reruns
    again = {
        r.doc_id
        for r in materialize_mixture(
            df, "lang", {"en": 3, "fr": 1}, total=200, key_col="doc_id", cost_col="tokens"
        ).collect()
    }
    assert again == {r.doc_id for r in out.collect()}


def test_training_order_is_a_permutation_and_reproducible(spark):
    from aws_sdk_pandas_spark.operators.sampling import training_order

    rows = [(f"d{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string")
    out = training_order(df, key_col="doc_id", seed=7, epoch=0, num_partitions=8)
    got = {r.doc_id: r.position for r in out.collect()}
    assert sorted(got.values()) == list(range(1, 501))  # exact 1..N permutation

    # engine-independent definition: position == rank of md5('7|0|'||key)
    import hashlib

    want = sorted(rows, key=lambda r: (hashlib.md5(f"7|0|{r[0]}".encode()).hexdigest(), r[0]))
    for pos, (doc_id,) in enumerate(want, start=1):
        assert got[doc_id] == pos

    # same seed+epoch reproduces; next epoch is a different permutation
    again = {r.doc_id: r.position for r in training_order(
        df, key_col="doc_id", seed=7, epoch=0, num_partitions=8).collect()}
    assert again == got
    ep1 = {r.doc_id: r.position for r in training_order(
        df, key_col="doc_id", seed=7, epoch=1, num_partitions=8).collect()}
    assert ep1 != got
    assert sorted(ep1.values()) == list(range(1, 501))


def test_leakage_free_split_clusters_stay_together(spark):
    from aws_sdk_pandas_spark.functions.hashing import hash_split
    from aws_sdk_pandas_spark.operators.sampling import leakage_free_split

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
    # components: {1,2,3,50} (chain), {10,11}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 50), (10, 11)], "id_a bigint, id_b bigint"
    )
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = {r.doc_id: r.split for r in leakage_free_split(docs, pairs, weights=w).collect()}
    assert len(out) == 100
    assert out[1] == out[2] == out[3] == out[50]  # whole component together
    assert out[10] == out[11]

    # cluster members get the REPRESENTATIVE's hash_split assignment...
    rep = spark.createDataFrame([(1,), (10,)], "doc_id bigint")
    rep_split = {r.doc_id: r.split for r in hash_split(rep, "doc_id", w, algo="md5").collect()}
    assert out[1] == rep_split[1] and out[10] == rep_split[10]
    # ...and singletons exactly match plain hash_split on their own id
    plain = {r.doc_id: r.split for r in hash_split(docs, "doc_id", w, algo="md5").collect()}
    clustered = {1, 2, 3, 50, 10, 11}
    for d in range(100):
        if d not in clustered:
            assert out[d] == plain[d]


def test_uniform_sample_k_exact_and_deterministic(spark):
    import hashlib

    from aws_sdk_pandas_spark.operators.sampling import uniform_sample_k

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id bigint").repartition(9)
    got = sorted(r.doc_id for r in uniform_sample_k(df, 50, key_col="doc_id", seed=3).collect())
    assert len(got) == 50
    want = sorted(
        range(1000), key=lambda i: (hashlib.md5(f"3|{i}".encode()).hexdigest(), i)
    )[:50]
    assert got == sorted(want)
    # repartitioning does not change membership
    again = sorted(
        r.doc_id
        for r in uniform_sample_k(df.repartition(3), 50, key_col="doc_id", seed=3).collect()
    )
    assert again == got


def test_global_prefix_sum_property(spark):
    """Property-based hardening of the most-reused primitive: random
    value shapes (duplicates, negatives, zero runs), random partition
    counts — the running sum must equal the serial cumsum and be
    independent of both input partitioning and num_partitions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_sdk_pandas_spark.operators.sampling import global_prefix_sum

    @settings(max_examples=12, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=-3, max_value=3),   # heavy key ties
                st.integers(min_value=-50, max_value=50),
            ),
            min_size=1,
            max_size=120,
        ),
        n_parts=st.integers(min_value=1, max_value=9),
        in_parts=st.integers(min_value=1, max_value=6),
    )
    def check(vals, n_parts, in_parts):
        rows = [(i, k, v) for i, (k, v) in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "id long, key long, cost long"
        ).repartition(in_parts)
        out = {
            r.id: r.rt
            for r in global_prefix_sum(
                df,
                "cost",
                [F.col("key").asc(), F.col("id").asc()],
                out_col="rt",
                num_partitions=n_parts,
            ).collect()
        }
        acc = 0
        for i, k, v in sorted(rows, key=lambda r: (r[1], r[0])):
            acc += v
            assert out[i] == acc

    check()


def test_balance_classes_deterministic(spark):
    import hashlib

    from aws_sdk_pandas_spark.operators.sampling import balance_classes

    rows = [(i, "maj" if i < 900 else "min") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, y string")
    out = balance_classes(df, label_col="y", key_col="id", seed=5).collect()
    kept = {r.id for r in out}
    # rarest class keeps everything (p = 1)
    assert all(i in kept for i in range(900, 1000))
    # majority downsampled to ~100 (expected 100/900 rate)
    n_maj = sum(1 for r in out if r.y == "maj")
    assert 70 <= n_maj <= 130
    # decisions re-derivable from md5(key:seed)
    for r in out:
        if r.y == "maj":
            u = int(hashlib.md5(f"{r.id}:5".encode()).hexdigest()[:8], 16) / 2**32
            assert u < 100 / 900
    # rerun identical
    again = {r.id for r in balance_classes(df, label_col="y", key_col="id", seed=5).collect()}
    assert again == kept


def test_global_prefix_sum_float_values(spark):
    """Regression: a float value column used to crash createDataFrame
    (int 0 offsets under a double schema)."""
    from aws_sdk_pandas_spark.operators.sampling import global_prefix_sum

    rows = [(i, float(i) * 0.5 + 0.25) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(7)
    got = {
        r.id: r.rt
        for r in global_prefix_sum(
            df, "v", [F.col("id").asc()], out_col="rt", num_partitions=5
        ).collect()
    }
    acc = 0.0
    for i, v in rows:
        acc += v
        assert abs(got[i] - acc) < 1e-9


def test_global_prefix_sum_offset_paths(spark):
    """The two offset-attachment paths agree with serial replay: the
    literal-map lookup (few partitions — the AQE-sized default) and the
    broadcast join (num_partitions > 64 forces offsets past the literal
    threshold)."""
    import random

    from aws_sdk_pandas_spark.operators.sampling import global_prefix_sum

    random.seed(11)
    rows = [(i, random.randint(1, 9)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, cost long").repartition(16)
    acc, expected = 0, {}
    for i, c in sorted(rows):
        acc += c
        expected[i] = acc
    # default: AQE sizes the range shuffle (locally coalesces to few
    # partitions -> literal-map path)
    got_default = {
        r.id: r.running_total
        for r in global_prefix_sum(df, "cost", [F.col("id").asc()]).collect()
    }
    assert got_default == expected
    # forced wide: > 64 range partitions -> broadcast-join path
    got_wide = {
        r.id: r.running_total
        for r in global_prefix_sum(
            df, "cost", [F.col("id").asc()], num_partitions=80
        ).collect()
    }
    assert got_wide == expected
