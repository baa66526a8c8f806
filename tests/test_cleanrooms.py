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


# ---------------------------------------------------------------------------
# secretsmanager / sts / chime local-account helpers (+ connect-from-secret)
# ---------------------------------------------------------------------------


def test_secretsmanager_resolution_chain(monkeypatch, tmp_path):
    from aws_sdk_pandas_spark import secretsmanager as sm

    sm.put_secret("db/creds", {"username": "u", "password": "p"})
    assert sm.get_secret_json("db/creds") == {"username": "u", "password": "p"}
    sm.delete_secret("db/creds")

    monkeypatch.setenv("ASPS_SECRET_DB_CREDS", '{"username": "env"}')
    assert sm.get_secret_json("db/creds")["username"] == "env"
    monkeypatch.delenv("ASPS_SECRET_DB_CREDS")

    f = tmp_path / "secrets.json"
    f.write_text('{"db/creds": {"username": "file"}}')
    monkeypatch.setenv("ASPS_SECRETS_FILE", str(f))
    assert sm.get_secret_json("db/creds")["username"] == "file"
    monkeypatch.delenv("ASPS_SECRETS_FILE")

    with pytest.raises(InvalidArgument, match="not found"):
        sm.get_secret("db/creds")


def test_connect_from_secret(spark):
    from aws_sdk_pandas_spark import secretsmanager as sm
    from aws_sdk_pandas_spark.databases import core

    sm.put_secret(
        "rds/main",
        {"engine": "postgres", "host": "h1", "port": 5433,
         "dbname": "app", "username": "u1", "password": "p1"},
    )
    try:
        con = core.connect(secret_id="rds/main")
        assert con.url == "jdbc:postgresql://h1:5433/app"
        assert con.user == "u1" and con.password == "p1"
        # explicit url wins; creds still from the secret
        con2 = core.connect("jdbc:postgresql://h2:5432/x", secret_id="rds/main")
        assert con2.url.startswith("jdbc:postgresql://h2")
        assert con2.user == "u1"
    finally:
        sm.delete_secret("rds/main")
    sm.put_secret("bad", {"engine": "mongodb", "host": "h"})
    try:
        with pytest.raises(InvalidArgument, match="unsupported engine"):
            core.connect(secret_id="bad")
    finally:
        sm.delete_secret("bad")
    with pytest.raises(InvalidArgument, match="url or a secret_id"):
        core.connect()


def test_sts_and_chime(monkeypatch):
    from aws_sdk_pandas_spark import chime, sts

    monkeypatch.setenv("ASPS_ACCOUNT_ID", "123456789012")
    monkeypatch.setenv("ASPS_IDENTITY_ARN", "arn:aws:iam::123456789012:user/eng")
    assert sts.get_account_id() == "123456789012"
    assert sts.get_current_identity_arn().endswith(":user/eng")
    assert sts.get_current_identity_name() == "eng"
    monkeypatch.delenv("ASPS_IDENTITY_ARN")
    assert sts.get_current_identity_name()  # falls back to the OS user

    before = len(chime.outbox())
    out = chime.post_message("https://hooks.example/x", "job done")
    assert out["Content"] == "Message: job done"
    assert len(chime.outbox()) == before + 1


def test_aggregation_rule_not_bypassable(spark, people):
    """Review findings: a subquery's Aggregate must not launder row-level
    output past the rule, and a constant aliased as the count column
    must not satisfy the k-threshold."""
    rule = {"type": "AGGREGATION", "k_threshold": 2, "count_column": "n"}
    with pytest.raises(InvalidArgument, match="subquery does not qualify"):
        cleanrooms.read_sql_query(
            spark,
            "SELECT name, 5 AS n FROM cr_people "
            "WHERE 3 IN (SELECT COUNT(*) FROM cr_people)",
            analysis_rule=rule,
        )
    with pytest.raises(InvalidArgument, match="genuine COUNT aggregate"):
        cleanrooms.read_sql_query(
            spark,
            "SELECT country, 999 AS n, SUM(spend) AS total FROM cr_people GROUP BY country",
            analysis_rule=rule,
        )
    # ORDER BY / LIMIT shells above the aggregate still qualify
    got = cleanrooms.read_sql_query(
        spark,
        "SELECT country, COUNT(*) AS n FROM cr_people GROUP BY country "
        "ORDER BY country LIMIT 10",
        analysis_rule=rule,
    )
    assert {r.country for r in got.collect()} == {"US", "DE"}


def test_count_column_class_check_and_cte(spark, people):
    """Round-2 review: '999 + 0*COUNT(*)' contains a count but is not a
    count — class-name check, not substring; and a CTE query whose root
    genuinely aggregates must be ACCEPTED (WithCTE descends into the
    main plan, not a CTE definition)."""
    rule = {"type": "AGGREGATION", "k_threshold": 2, "count_column": "n"}
    with pytest.raises(InvalidArgument, match="genuine COUNT aggregate"):
        cleanrooms.read_sql_query(
            spark,
            "SELECT name, 999 + 0*COUNT(*) AS n FROM cr_people GROUP BY name",
            analysis_rule=rule,
        )
    got = cleanrooms.read_sql_query(
        spark,
        "WITH x AS (SELECT country FROM cr_people) "
        "SELECT country, COUNT(*) AS n FROM x GROUP BY country",
        analysis_rule=rule,
    )
    assert {r.country for r in got.collect()} == {"US", "DE"}
