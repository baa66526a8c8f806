"""Fuzzy join: deletion-neighborhood completeness (result == brute
force), variant generation correctness, and the no-cross-product plan."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.fuzzy import deletion_variants, fuzzy_match_join


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_deletion_variants(spark):
    df = spark.createDataFrame([("abc",), ("x",), ("",)], "s string")
    got = {r.s: sorted(r.v) for r in df.select(
        "s", deletion_variants(F.col("s"), 2).alias("v")).collect()}
    want_abc = {"abc"}
    for i in range(3):
        want_abc.add("abc"[:i] + "abc"[i + 1:])
    for i, j in itertools.combinations(range(3), 2):
        want_abc.add("".join(c for k, c in enumerate("abc") if k not in (i, j)))
    assert got["abc"] == sorted(want_abc)
    assert got["x"] == ["", "x"]
    assert got[""] == [""]


def test_deletion_variants_match_brute_force(spark):
    # the C(L,2) pair-deletion form must equal delete-i-then-j brute force
    # on repeated-char, short, and longer strings alike
    strings = ["ab", "aa", "aabb", "banana", "mississippi", "promise pale tan"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r.s: sorted(r.v) for r in df.select(
        "s", deletion_variants(F.col("s"), 2).alias("v")).collect()}
    for s in strings:
        want = {s}
        for i in range(len(s)):
            want.add(s[:i] + s[i + 1:])
        for i, j in itertools.combinations(range(len(s)), 2):
            want.add("".join(c for k, c in enumerate(s) if k not in (i, j)))
        assert got[s] == sorted(want), s


def test_fuzzy_join_equals_brute_force(spark):
    names = [
        "cold plate", "old plate", "gold plate", "cold slate", "red widget",
        "red gadget", "blue bolt", "glue bolt", "blue jolt", "completely other",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    for d in (1, 2):
        got = sorted(
            (r.name_a, r.name_b, r.distance)
            for r in fuzzy_match_join(df, df, "name", max_distance=d, self_pairs=True).collect()
        )
        want = sorted(
            (a, b, _lev(a, b))
            for a, b in itertools.combinations(sorted(names), 2)
            if _lev(a, b) <= d
        )
        assert got == want, f"d={d}: symmetric-delete blocking lost a pair"
        assert len(got) > 0


def test_fuzzy_join_two_sided_and_plan(spark):
    a = spark.createDataFrame([("kitten",), ("apple",)], "name string")
    b = spark.createDataFrame([("sitten",), ("applq",), ("banana",)], "name string")
    out = fuzzy_match_join(a, b, "name", max_distance=1)
    rows = sorted((r.name_a, r.name_b, r.distance) for r in out.collect())
    assert rows == [("apple", "applq", 1), ("kitten", "sitten", 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_self_pairs_across_two_frames_unions_the_set(spark):
    # pair split across the two inputs, B-side sorts lower: must be found
    a = spark.createDataFrame([("zee",)], "name string")
    b = spark.createDataFrame([("zed",)], "name string")
    out = fuzzy_match_join(a, b, "name", max_distance=1, self_pairs=True).collect()
    assert [(r.name_a, r.name_b, r.distance) for r in out] == [("zed", "zee", 1)]


def test_resolve_entities_transitive_chain(spark):
    from aws_sdk_pandas_spark.operators.fuzzy import resolve_entities

    rows = [
        (1, "cold plate"), (2, "old plate"), (3, "gold plate"),  # chain via 'old plate'
        (4, "red widget"), (5, "red gadget"),
        (6, "unrelated thing"),
        (7, "cold plate"),  # duplicate record, same entity
    ]
    df = spark.createDataFrame(rows, "rec_id int, name string")
    out = {r.rec_id: r.entity for r in resolve_entities(
        df, name_col="name", max_distance=2).collect()}
    # lev(cold,gold)=1 via substitution? 'cold plate'->'gold plate' is 1 sub;
    # all three chain regardless through 'old plate'
    assert out[1] == out[2] == out[3] == out[7] == "cold plate"
    assert out[4] == out[5] == "red gadget"  # min of the pair
    assert out[6] == "unrelated thing"  # singleton keeps its own name
