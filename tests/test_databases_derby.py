"""Live JDBC end-to-end tests against embedded Apache Derby.

Derby ships on Spark's own classpath (it backs the Hive metastore), so
``jdbc:derby:memory:`` gives a REAL database engine in-process: these
tests exercise the actual Spark JDBC read/write path — DDL creation,
parallel partitioned range scans, executeBatch inserts, truncate, and
the whole upsert-mode matrix — not just URL/SQL-string logic.
(reference: awswrangler/_databases.py:272-354 read paths,
redshift/_utils.py:173-211 upsert staging dance.)

The MySQL/PostgreSQL/Oracle/SQLServer dialect-specific SQL strings
(REPLACE INTO, ON CONFLICT, MERGE) stay string-asserted in
test_databases.py — Derby can't parse them — but every mode's
*semantics* (source-wins, target-wins, distinct-rebuild, precombine)
run for real here because the engine implements them as Spark-side
merges over plain JDBC reads/writes.
"""

from __future__ import annotations

import uuid

import pytest

from aws_sdk_pandas_spark.databases import core, mysql, postgresql, redshift

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def con():
    # fresh in-memory database per test: no cross-test table state
    name = f"t{uuid.uuid4().hex[:12]}"
    return core.connect(f"jdbc:derby:memory:{name};create=true", driver=DERBY_DRIVER)


def _seed(spark, n=100):
    return spark.range(0, n).selectExpr(
        "id AS k", "id * 10 AS v", "CAST(id % 4 AS STRING) AS g"
    )


def test_roundtrip_append_and_overwrite(spark, con):
    df = _seed(spark)
    core.to_sql(df, con, "t", mode="overwrite")
    back = core.read_sql_table(spark, "t", con)
    assert back.count() == 100
    assert dict(back.dtypes) == {"k": "bigint", "v": "bigint", "g": "string"}
    assert back.agg({"v": "sum"}).first()[0] == sum(i * 10 for i in range(100))

    core.to_sql(df.limit(5), con, "t", mode="append")
    assert core.read_sql_table(spark, "t", con).count() == 105

    core.to_sql(df.limit(7), con, "t", mode="overwrite")
    assert core.read_sql_table(spark, "t", con).count() == 7


def test_truncate_keeps_ddl(spark, con):
    core.to_sql(_seed(spark), con, "t", mode="overwrite")
    core.to_sql(_seed(spark, 3), con, "t", mode="truncate")
    back = core.read_sql_table(spark, "t", con)
    assert back.count() == 3
    assert dict(back.dtypes)["g"] == "string"


def test_partitioned_parallel_read(spark, con):
    core.to_sql(_seed(spark, 1000), con, "t", mode="overwrite")
    # Derby uppercases unquoted identifiers while Spark's JDBC writer
    # creates quoted lowercase columns — hand-written SQL (and the
    # partition column Spark splices into its range WHERE clauses) must
    # quote them, exactly as against a case-sensitive warehouse
    df = core.read_sql_query(
        spark,
        'SELECT "k", "v" FROM t WHERE "v" >= 100',
        con,
        partition_column='"k"',
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    # genuinely fanned out into 4 concurrent range scans
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 990
    # no row lost or duplicated across the range boundaries
    assert df.select("k").distinct().count() == 990


def test_read_sql_query_plain(spark, con):
    core.to_sql(_seed(spark), con, "t", mode="overwrite")
    # Spark's Derby dialect maps StringType -> CLOB, which Derby refuses
    # to GROUP BY; cast inside the pushed-down SQL like any engine quirk
    agg = core.read_sql_query(
        spark,
        'SELECT CAST("g" AS VARCHAR(8)) AS "g", COUNT(*) AS "n" '
        'FROM t GROUP BY CAST("g" AS VARCHAR(8))',
        con,
    )
    assert {r.g: r.n for r in agg.collect()} == {"0": 25, "1": 25, "2": 25, "3": 25}


def test_core_upsert_with_precombine(spark, con):
    initial = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k int, name string, ver int"
    )
    core.to_sql(initial, con, "t", mode="overwrite")
    # source carries a stale (ver=5) and a fresh (ver=20) update for k=2,
    # plus a brand-new k=4; precombine keeps the greatest ver per key
    src = spark.createDataFrame(
        [(2, "b_stale", 5), (2, "b_new", 20), (4, "d", 1)],
        "k int, name string, ver int",
    )
    core.to_sql(src, con, "t", mode="upsert", keys=["k"], precombine_key="ver")
    got = {r.k: (r.name, r.ver) for r in core.read_sql_table(spark, "t", con).collect()}
    assert got == {1: ("a", 10), 2: ("b_new", 20), 3: ("c", 10), 4: ("d", 1)}


def test_upsert_creates_absent_table(spark, con):
    df = spark.createDataFrame([(1, "a")], "k int, name string")
    core.to_sql(df, con, "fresh", mode="upsert", keys=["k"])
    assert core.read_sql_table(spark, "fresh", con).count() == 1


def test_mysql_mode_semantics(spark, con):
    initial = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    src = spark.createDataFrame([(2, "B"), (3, "C")], "k int, name string")

    # upsert_duplicate_key: source wins on match
    core.to_sql(initial, con, "t1", mode="overwrite")
    mysql.to_sql(src, con, "t1", mode="upsert_duplicate_key", keys=["k"])
    got = {r.k: r.name for r in core.read_sql_table(spark, "t1", con).collect()}
    assert got == {1: "a", 2: "B", 3: "C"}

    # ignore: target wins on match, new keys still inserted
    core.to_sql(initial, con, "t2", mode="overwrite")
    mysql.to_sql(src, con, "t2", mode="ignore", keys=["k"])
    got = {r.k: r.name for r in core.read_sql_table(spark, "t2", con).collect()}
    assert got == {1: "a", 2: "b", 3: "C"}

    # upsert_distinct: union + distinct rebuild
    core.to_sql(initial, con, "t3", mode="overwrite")
    mysql.to_sql(
        spark.createDataFrame([(1, "a"), (3, "C")], "k int, name string"),
        con, "t3", mode="upsert_distinct",
    )
    rows = {(r.k, r.name) for r in core.read_sql_table(spark, "t3", con).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "C")}


def test_postgresql_upsert_routing(spark, con):
    initial = spark.createDataFrame([(1, 100)], "k int, v int")
    core.to_sql(initial, con, "t", mode="overwrite")
    postgresql.to_sql(
        spark.createDataFrame([(1, 200), (2, 300)], "k int, v int"),
        con, "t", mode="upsert", keys=["k"],
    )
    got = {r.k: r.v for r in core.read_sql_table(spark, "t", con).collect()}
    assert got == {1: 200, 2: 300}


def test_redshift_unload_and_copy_roundtrip(spark, con, tmp_path):
    core.to_sql(_seed(spark, 50), con, "t", mode="overwrite")
    # unload: JDBC query result landed as a parquet dataset + scanned back
    out = redshift.unload(
        spark, 'SELECT "k", "v", "g" FROM t WHERE "k" < 20', str(tmp_path / "unl"), con,
        partition_cols=["g"],
    )
    assert out.count() == 20
    # copy_from_files: staged parquet loaded into a new table
    redshift.copy_from_files(spark, str(tmp_path / "unl"), con, "t_copy", mode="overwrite")
    back = core.read_sql_table(spark, "t_copy", con)
    assert back.count() == 20
    assert back.agg({"v": "sum"}).first()[0] == sum(i * 10 for i in range(20))


def test_redshift_copy_stages_parquet(spark, con, tmp_path):
    df = _seed(spark, 30)
    redshift.copy(df, str(tmp_path / "stage"), con, "t", mode="overwrite")
    assert core.read_sql_table(spark, "t", con).count() == 30
    # the staging prefix survives as an audit trail
    staged = spark.read.parquet(str(tmp_path / "stage"))
    assert staged.count() == 30


def test_data_api_end_to_end(spark):
    """data_api.rds/redshift over the embedded-Derby transport: connect by
    ARN, to_sql, typed-parameter read_sql_query (reference:
    data_api/rds.py:259 parameter dialect)."""
    import uuid as _uuid

    from aws_sdk_pandas_spark.data_api import rds, redshift as rs_api

    con2 = rds.connect(f"arn:aws:rds:::cluster:{_uuid.uuid4().hex[:10]}", "db1")
    rds.to_sql(_seed(spark, 20), con2, "t", mode="overwrite")
    got = rds.read_sql_query(
        'SELECT "k", CAST("g" AS VARCHAR(8)) AS "g" FROM t '
        'WHERE "v" >= :minv AND CAST("g" AS VARCHAR(8)) = :seg',
        con2,
        parameters=[
            {"name": "minv", "value": {"longValue": 100}},
            {"name": "seg", "value": {"stringValue": "2"}},
        ],
        spark=spark,
    )
    # k in 10..19 have v>=100; of those, g='2' means k%4==2 -> {10, 14, 18}
    assert sorted(r.k for r in got.collect()) == [10, 14, 18]

    # NULL / boolean / double literal rendering
    assert rds._render_typed_param({"isNull": True}) == "NULL"
    assert rds._render_typed_param({"booleanValue": False}) == "FALSE"
    assert rds._render_typed_param({"stringValue": "o'brien"}) == "'o''brien'"

    con3 = rs_api.connect(f"rs-{_uuid.uuid4().hex[:10]}", "dev")
    rds.to_sql(_seed(spark, 5), con3, "t", mode="overwrite")
    assert rs_api.read_sql_query('SELECT COUNT(*) AS "n" FROM t', con3, spark=spark).first().n == 5
