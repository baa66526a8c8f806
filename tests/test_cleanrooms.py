"""Clean Rooms protected-query semantics (cleanrooms.py): analysis-rule
enforcement — LIST column restriction, AGGREGATION plan validation +
k-threshold row suppression, CUSTOM template allow-listing — plus the
reference's params/chunksize/one-of-sql-or-template contracts."""

from __future__ import annotations

import pytest

from aws_sdk_pandas_spark import cleanrooms
from aws_sdk_pandas_spark.exceptions import InvalidArgument, QueryFailed


@pytest.fixture()
def people(spark):
    spark.createDataFrame(
        [
            ("a", "US", 1), ("b", "US", 2), ("c", "US", 3),
            ("d", "DE", 4), ("e", "DE", 5), ("f", "FR", 6),
        ],
        "name string, country string, spend int",
    ).createOrReplaceTempView("cr_people")


def test_aggregation_rule_suppresses_small_groups(spark, people):
    rule = {"type": "AGGREGATION", "k_threshold": 2, "count_column": "n"}
    got = cleanrooms.read_sql_query(
        spark,
        "SELECT country, COUNT(*) AS n, SUM(spend) AS total FROM cr_people GROUP BY country",
        analysis_rule=rule,
    )
    rows = {r.country: (r.n, r.total) for r in got.collect()}
    # FR has one member -> suppressed; US and DE survive
    assert rows == {"US": (3, 6), "DE": (2, 9)}


def test_aggregation_rule_rejects_row_level(spark, people):
    rule = {"type": "AGGREGATION", "k_threshold": 2}
    with pytest.raises(InvalidArgument, match="must aggregate"):
        cleanrooms.read_sql_query(
            spark, "SELECT name, country FROM cr_people", analysis_rule=rule
        )


def test_aggregation_rule_requires_count_column(spark, people):
    rule = {"type": "AGGREGATION", "k_threshold": 2, "count_column": "n"}
    with pytest.raises(InvalidArgument, match="count column"):
        cleanrooms.read_sql_query(
            spark,
            "SELECT country, SUM(spend) AS total FROM cr_people GROUP BY country",
            analysis_rule=rule,
        )


def test_aggregation_rule_restricts_dimensions(spark, people):
    rule = {
        "type": "AGGREGATION", "k_threshold": 1, "count_column": "n",
        "allowed_columns": ["country"],
    }
    with pytest.raises(InvalidArgument, match="allowed_columns"):
        cleanrooms.read_sql_query(
            spark,
            "SELECT country, name, COUNT(*) AS n FROM cr_people GROUP BY country, name",
            analysis_rule=rule,
        )


def test_list_rule(spark, people):
    rule = {"type": "LIST", "allowed_columns": ["name", "country"]}
    got = cleanrooms.read_sql_query(
        spark, "SELECT name, country FROM cr_people", analysis_rule=rule
    )
    assert got.count() == 6
    with pytest.raises(InvalidArgument, match="LIST analysis rule violation"):
        cleanrooms.read_sql_query(
            spark, "SELECT name, spend FROM cr_people", analysis_rule=rule
        )


def test_custom_rule_requires_template(spark, people):
    with pytest.raises(InvalidArgument, match="free SQL is rejected"):
        cleanrooms.read_sql_query(
            spark, "SELECT * FROM cr_people", analysis_rule={"type": "CUSTOM"}
        )
    arn = cleanrooms.create_analysis_template(
        "arn:tpl/spend-by-country",
        "SELECT country, COUNT(*) AS n FROM cr_people WHERE spend >= :min_spend GROUP BY country",
        analysis_rule={"type": "AGGREGATION", "k_threshold": 2, "count_column": "n"},
    )
    try:
        got = cleanrooms.read_sql_query(
            spark, analysis_template_arn=arn, params={"min_spend": 2}
        )
        # US keeps b,c; DE keeps d,e; FR suppressed at k=2
        assert {r.country: r.n for r in got.collect()} == {"US": 2, "DE": 2}
    finally:
        cleanrooms.delete_analysis_template(arn)
    with pytest.raises(InvalidArgument, match="unknown analysis template"):
        cleanrooms.read_sql_query(spark, analysis_template_arn="arn:tpl/nope")


def test_contract_edges(spark, people):
    with pytest.raises(InvalidArgument, match="exactly one"):
        cleanrooms.read_sql_query(spark)
    with pytest.raises(QueryFailed):
        cleanrooms.read_sql_query(spark, "SELECT * FROM nonexistent_xyz")
    chunks = list(
        cleanrooms.read_sql_query(spark, "SELECT name FROM cr_people", chunksize=4)
    )
    assert [len(c) for c in chunks] == [4, 2]
    assert cleanrooms.wait_query("m1", "q1")["status"] == "SUCCESS"
