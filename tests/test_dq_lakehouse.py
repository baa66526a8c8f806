"""Data-quality ruleset evaluation, lakehouse gating, chunked readers,
embedding dedup."""

from __future__ import annotations

import pytest

from aws_sdk_pandas_spark import dq, lakehouse, sources
from aws_sdk_pandas_spark.exceptions import InvalidArgument


@pytest.fixture()
def dq_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", None), (4, "e", 50.0)],
        "id bigint, name string, score double",
    )


def test_dq_rules_single_pass(dq_df):
    got = dq.evaluate_ruleset(
        dq_df,
        [
            {"rule_type": "RowCount", "expression": "= 5"},
            {"rule_type": "ColumnCount", "expression": "= 3"},
            {"rule_type": "Completeness", "parameter": "name", "expression": ">= 0.8"},
            {"rule_type": "Uniqueness", "parameter": "id", "expression": "= 1"},
            {"rule_type": "ColumnValues", "parameter": "score", "expression": "between 0 and 100"},
            {"rule_type": "Mean", "parameter": "score", "expression": "between 20 and 35"},
            {"rule_type": "DistinctValuesCount", "parameter": "id", "expression": "= 4"},
            {"rule_type": "ColumnExists", "parameter": "score"},
            {"rule_type": "IsComplete", "parameter": "id"},
        ],
    )
    status = {(r.rule_type, r.parameter): r.passed for r in got.collect()}
    assert status[("RowCount", None)] is True
    assert status[("ColumnCount", None)] is True
    assert status[("Completeness", "name")] is True       # 4/5 = 0.8
    assert status[("Uniqueness", "id")] is False          # 4 distinct / 5 rows
    assert status[("ColumnValues", "score")] is True      # nulls excluded
    assert status[("Mean", "score")] is True              # (10+20+30+50)/4 = 27.5
    assert status[("DistinctValuesCount", "id")] is True
    assert status[("ColumnExists", "score")] is True
    assert status[("IsComplete", "id")] is True


def test_dq_custom_sql(spark, dq_df):
    dq_df.createOrReplaceTempView("dq_t")
    got = dq.evaluate_ruleset(
        dq_df,
        [
            {"rule_type": "CustomSql", "parameter": "= 2",
             "expression": "SELECT COUNT(*) FROM dq_t WHERE score > 25"},
        ],
    )
    assert got.first().passed is True


def test_dq_invalid(dq_df):
    with pytest.raises(InvalidArgument):
        dq.evaluate_ruleset(dq_df, [{"rule_type": "Completeness"}])
    with pytest.raises(InvalidArgument):
        dq.evaluate_ruleset(dq_df, [{"rule_type": "Nope", "expression": "= 1"}])
    with pytest.raises(InvalidArgument):
        dq.evaluate_ruleset(dq_df, [{"rule_type": "RowCount", "expression": "approx 5"}])


def test_lakehouse_gated(spark, people_df, tmp_path):
    """No delta/iceberg jars in this env: with require_native the entry
    points must raise the
    documented actionable error, not a Java stack."""
    with pytest.raises(InvalidArgument, match="delta-spark"):
        lakehouse.to_deltalake(people_df, str(tmp_path / "d"), require_native=True)
    with pytest.raises(InvalidArgument, match="delta-spark"):
        lakehouse.read_deltalake(spark, str(tmp_path / "d"), require_native=True)
    with pytest.raises(InvalidArgument, match="iceberg"):
        lakehouse.to_iceberg(people_df, "cat.db.t", require_native=True)


def test_read_parquet_chunked(spark, people_df, tmp_path):
    path = str(tmp_path / "chunks")
    sources.to_parquet(people_df, path)
    chunks = list(sources.read_parquet(spark, path, chunked=2))
    assert [len(c) for c in chunks] == [2, 2, 1]  # exact-row carry-over
    assert sum(len(c) for c in chunks) == 5


def test_embedding_duplicates(spark):
    from aws_sdk_pandas_spark.operators.dedup import embedding_duplicates

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
        (4, [1.0, 0.0, 0.0]),      # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_duplicates(df, threshold=0.05, num_hash_tables=8).collect()
    }
    assert (1, 4) in pairs
    assert (1, 2) in pairs or (2, 4) in pairs
    assert all(3 not in p for p in pairs)


def test_detect_outliers_mad(spark):
    """MAD flags the planted spike and, unlike the z-score, is not
    dragged by it; constant groups yield nothing."""
    from aws_sdk_pandas_spark.dq import detect_outliers_mad

    rows = [("a", float(v)) for v in [10, 11, 10, 12, 11, 10, 11, 1000]] + [
        ("const", 5.0)
    ] * 6
    df = spark.createDataFrame(rows, "grp string, value double")
    out = detect_outliers_mad(df, "value", by=["grp"], threshold=3.0).collect()
    assert [(r["grp"], r["value"]) for r in out] == [("a", 1000.0)]
    assert out[0]["robust_z"] > 100


# ------------------------------------------------------------ ruleset store
def test_ruleset_registry_and_update():
    from aws_sdk_pandas_spark import dq

    dq.store_ruleset("rs1", [{"rule_type": "RowCount", "expression": "> 1"}])
    assert [r.rule_type for r in dq.get_ruleset("rs1")] == ["RowCount"]
    dq.update_ruleset(
        "rs1",
        [{"rule_type": "RowCount", "expression": "> 5"},
         {"rule_type": "IsComplete", "parameter": "x", "expression": ">= 1.0"}],
        mode="upsert",
    )
    rules = {(r.rule_type, r.parameter): r.expression for r in dq.get_ruleset("rs1")}
    assert rules[("RowCount", None)] == "> 5"
    assert ("IsComplete", "x") in rules


def test_recommendation_ruleset_profiles_and_passes(spark):
    from aws_sdk_pandas_spark import dq

    df = spark.createDataFrame(
        [(i, float(i % 10), "a" if i % 3 else None) for i in range(100)],
        "id long, v double, s string",
    )
    rules = dq.create_recommendation_ruleset(df, name="rec1")
    kinds = {(r.rule_type, r.parameter) for r in rules}
    assert ("IsUnique", "id") in kinds          # key-like column
    assert ("IsComplete", "id") in kinds
    assert ("ColumnValues", "v") in kinds       # numeric range rule
    # the recommended rules must PASS on the frame they were profiled from
    res = dq.evaluate_ruleset(df, dq.get_ruleset("rec1"))
    assert all(r.passed for r in res.collect())


def test_s3_tables_mgmt_lifecycle(spark):
    from aws_sdk_pandas_spark import lakehouse as lh

    arn = lh.create_table_bucket(spark, "tb1")
    db = lh.create_namespace(spark, arn, "ns1")
    try:
        fq = lh.create_table(
            spark, arn, "ns1", "t1", {"id": "bigint", "name": "string"}
        )
        assert spark.table(fq).columns == ["id", "name"]
        lh.delete_table(spark, arn, "ns1", "t1")
        assert not spark.catalog.tableExists(f"{db}.t1")
    finally:
        lh.delete_table_bucket(spark, arn)
    assert db not in [d.name for d in spark.catalog.listDatabases()]


def test_profile_table(spark):
    from aws_sdk_pandas_spark.dq import profile_table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0), (4, None, 20.0)],
        "id bigint, s string, v double",
    )
    prof = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"].n_rows == 4 and prof["id"].n_nonnull == 4
    assert prof["id"].n_distinct == 4 and prof["id"].completeness == 1.0
    assert prof["s"].n_nonnull == 3 and prof["s"].n_distinct == 2
    assert prof["s"].min_value is None and prof["s"].avg_value is None
    assert prof["v"].min_value == 10.0 and prof["v"].max_value == 30.0
    assert prof["v"].avg_value == 20.0 and prof["v"].p50_value == 20.0


def test_suggest_keys_and_fk_containment(spark):
    from aws_sdk_pandas_spark.dq import fk_containment, suggest_keys

    child = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, None), (4, 99, "d")],
        "id int, ref int, name string",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pid int")
    keys = {r.column: r for r in suggest_keys(child).collect()}
    assert keys["id"].is_candidate_key and keys["id"].uniqueness == 1.0
    assert not keys["ref"].is_candidate_key  # duplicates
    assert not keys["name"].is_candidate_key and keys["name"].n_nulls == 1
    fk = fk_containment(child, parent, child_col="ref", parent_col="pid").collect()[0]
    # distinct child refs {10,20,99}: 2 of 3 contained
    assert fk.n_child_keys == 3 and fk.n_matched == 2 and fk.n_orphans == 1
    assert abs(fk.containment - 2 / 3) < 1e-6


def test_k_anonymity_and_risky_classes(spark):
    from aws_sdk_pandas_spark.dq import k_anonymity, l_diversity, risky_classes

    rows = (
        [("NY", "M", f"d{i % 3}") for i in range(10)]     # class of 10, 3 diagnoses
        + [("NY", "F", "d0")] * 4                          # class of 4, 1 diagnosis
        + [("SF", "M", "d1")] * 2                          # class of 2
        + [("SF", None, "d2")]                             # NULL quasi: class of 1
    )
    df = spark.createDataFrame(rows, "city string, sex string, diag string")

    r = k_anonymity(df, quasi_cols=["city", "sex"], k=5).collect()[0]
    assert r.n_rows == 17 and r.n_classes == 4
    assert r.min_class_size == 1 and r.n_classes_below_k == 3
    assert abs(r.pct_rows_below_k - round(7 / 17, 6)) < 1e-9

    risky = risky_classes(
        df, quasi_cols=["city", "sex"], k=5, sensitive_col="diag"
    ).collect()
    assert [(x.city, x.sex, x.class_size, x.n_sensitive) for x in risky] == [
        ("SF", None, 1, 1),
        ("SF", "M", 2, 1),
        ("NY", "F", 4, 1),
    ]

    d = l_diversity(
        df, quasi_cols=["city", "sex"], sensitive_col="diag", l=2
    ).collect()[0]
    assert d.n_classes == 4 and d.min_diversity == 1
    assert d.n_classes_below_l == 3
    assert abs(d.pct_classes_below_l - round(3 / 4, 6)) < 1e-9

    # the big class is fine at k=5; everything passes at k=1
    ok = k_anonymity(df, quasi_cols=["city", "sex"], k=1).collect()[0]
    assert ok.n_classes_below_k == 0 and ok.pct_rows_below_k == 0.0


def test_near_zero_variance(spark):
    from aws_sdk_pandas_spark.dq import near_zero_variance

    rows = [(i, "const", "a" if i < 990 else "b", f"v{i}", None) for i in range(1000)]
    df = spark.createDataFrame(
        rows, "id long, c_const string, c_skew string, c_id string, c_null string"
    )
    got = {r.column: r for r in near_zero_variance(df).collect()}
    assert got["c_const"].nzv and got["c_const"].freq_ratio is None
    assert got["c_null"].nzv                         # all-NULL is degenerate
    assert got["c_skew"].nzv                         # 99:1 with 0.2% unique
    assert abs(got["c_skew"].freq_ratio - 99.0) < 1e-9
    assert not got["c_id"].nzv and got["c_id"].unique_pct == 100.0
    assert not got["id"].nzv
    assert got["c_skew"].top_value == "a" and got["c_skew"].n == 1000


def test_volume_anomalies(spark):
    import datetime as dtm

    from aws_sdk_pandas_spark.dq import volume_anomalies

    base = dtm.date(2024, 2, 1)
    rows = []
    # feed A: ~100/day for 14 days, one collapsed day at 5
    for day in range(14):
        n = 5 if day == 9 else 100 + (day % 3)
        rows += [("A", base + dtm.timedelta(days=day))] * n
    # feed B: perfectly constant 50 — zero MAD, then one changed day
    for day in range(10):
        rows += [("B", base + dtm.timedelta(days=day))] * (50 if day != 7 else 60)
    df = spark.createDataFrame(rows, "feed string, d date")
    got = {(r.feed, r.day): r for r in volume_anomalies(
        df, ts_col="d", by=["feed"]).collect()}

    collapsed = got[("A", base + dtm.timedelta(days=9))]
    assert collapsed.anomaly and collapsed.n_rows == 5
    # a TOTAL outage day (zero rows) must appear via the day grid
    rows2 = [("C", base)] * 40 + [("C", base + dtm.timedelta(days=2))] * 40
    got2 = {r.day: r for r in volume_anomalies(
        spark.createDataFrame(rows2, "feed string, d date"),
        ts_col="d", by=["feed"]).collect()}
    gap = got2[base + dtm.timedelta(days=1)]
    assert gap.n_rows == 0 and gap.anomaly
    normal = [r for (f, _), r in got.items() if f == "A" and r.n_rows >= 100]
    assert all(not r.anomaly for r in normal)
    # the robust baseline ignored the collapsed day
    assert collapsed.median_n >= 100
    # zero-MAD constant feed: only the deviating day flags
    b_flags = [d for (f, d), r in got.items() if f == "B" and r.anomaly]
    assert b_flags == [base + dtm.timedelta(days=7)]


def test_join_health(spark):
    from aws_sdk_pandas_spark.dq import join_health

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (None, "e")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "z"), (2, "w"), (9, "q")], "k long, w string"
    )
    r = join_health(left, right, ["k"]).collect()[0]
    assert (r.n_left, r.n_right) == (5, 5)
    assert (r.n_keys_left, r.n_keys_right, r.n_keys_common) == (3, 3, 2)
    # matched rows: left k in {1,2} -> 3 of 5; right k in {1,2} -> 4 of 5
    assert abs(r.match_rate_left - 0.6) < 1e-9
    assert abs(r.match_rate_right - 0.8) < 1e-9
    assert (r.max_mult_left, r.max_mult_right) == (2, 3)
    # exact inner-join size: k1 2x1 + k2 1x3 = 5
    assert r.est_output_rows == 5
    assert r.est_output_rows == left.join(right, "k").count()


def test_sequence_gaps(spark):
    from aws_sdk_pandas_spark.dq import sequence_gaps

    rows = (
        [("p0", i) for i in [1, 2, 3, 7, 8, 12]]      # gaps 4-6 and 9-11
        + [("p1", i) for i in [5, 5, 6, 7]]           # dup seq: no false gap
        + [("p1", 9)]                                  # gap 8-8
        + [("p2", 1)]                                  # single row: no gaps
        + [("p0", None)]
    )
    df = spark.createDataFrame(rows, "part string, seq long")
    got = [(r.part, r.gap_start, r.gap_end, r.n_missing)
           for r in sequence_gaps(df, seq_col="seq", by=["part"]).collect()]
    assert got == [
        ("p0", 4, 6, 3),
        ("p0", 9, 11, 3),
        ("p1", 8, 8, 1),
    ]


def test_dq_column_values_requires_all_to_pass(spark):
    """DQDL semantics regression: the expression constrains the VALUES —
    a column with half its values out of range must FAIL 'between'."""
    df = spark.createDataFrame(
        [(1, 50.0), (2, 500.0), (3, 60.0), (4, 700.0)], "id int, score double"
    )
    got = dq.evaluate_ruleset(
        df,
        [{"rule_type": "ColumnValues", "parameter": "score",
          "expression": "between 0 and 100"}],
    ).first()
    assert got.value == 0.5 and got.passed is False


def test_dq_extended_rule_types(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "alpha", 10.0, 1),
            (2, "beta", 20.0, 2),
            (3, "beta", 30.0, 3),
            (4, "gamma-long-name", 40.0, 4),
            (5, None, 50.0, 5),
        ],
        "id int, name string, score double, rank int",
    )
    got = dq.evaluate_ruleset(
        df,
        [
            {"rule_type": "ColumnLength", "parameter": "name", "expression": "between 1 and 10"},
            {"rule_type": "IsPrimaryKey", "parameter": "id"},
            {"rule_type": "IsPrimaryKey", "parameter": "name"},
            {"rule_type": "Correlation", "parameter": "score rank", "expression": ">= 0.99"},
            {"rule_type": "Entropy", "parameter": "name", "expression": "> 0.5"},
            {"rule_type": "UniqueValueRatio", "parameter": "name", "expression": "between 0.6 and 0.7"},
            {"rule_type": "ColumnDataType", "parameter": "id", "expression": "= \"int\""},
            {"rule_type": "ColumnDataType", "parameter": "score", "expression": "= \"int\""},
        ],
    )
    rows = {(r.rule_type, r.parameter): r for r in got.collect()}
    # one name of length 15 -> not all lengths in [1, 10]
    lr = rows[("ColumnLength", "name")]
    assert lr.value == 0.75 and lr.passed is False
    assert rows[("IsPrimaryKey", "id")].passed is True
    # name: a NULL and a duplicate both break the key
    assert rows[("IsPrimaryKey", "name")].passed is False
    assert rows[("Correlation", "score rank")].passed is True
    # entropy over {alpha:1, beta:2, gamma:1}: ln(4) - (2 ln 2)/4
    want_h = math.log(4) - (2 * math.log(2)) / 4
    assert abs(rows[("Entropy", "name")].value - want_h) < 1e-9
    # 2 of 3 distinct values occur exactly once
    assert abs(rows[("UniqueValueRatio", "name")].value - 2 / 3) < 1e-9
    assert rows[("UniqueValueRatio", "name")].passed is True
    assert rows[("ColumnDataType", "id")].passed is True
    assert rows[("ColumnDataType", "score")].passed is False
