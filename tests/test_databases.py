"""JDBC connector family against embedded Derby (ships with Spark's
classpath) — real JDBC round-trips, no external services."""

from __future__ import annotations

import uuid

import pytest

from aws_sdk_pandas_spark import databases as db
from aws_sdk_pandas_spark.exceptions import InvalidArgument


@pytest.fixture(scope="module")
def con():
    return db.connect(
        "jdbc:derby:memory:aspstest;create=true",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )


def _tbl() -> str:
    return "t_" + uuid.uuid4().hex[:10]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, ver bigint")


def test_write_and_read_roundtrip(spark, con):
    t = _tbl()
    db.to_sql(_df(spark, [(1, "a", 1), (2, "b", 1)]), con, t, mode="overwrite")
    got = db.read_sql_table(spark, t, con)
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_read_sql_query_and_partitioned_read(spark, con):
    t = _tbl()
    db.to_sql(_df(spark, [(i, f"v{i}", 1) for i in range(10)]), con, t, mode="overwrite")
    got = db.read_sql_query(spark, f'SELECT "k", "v" FROM {t} WHERE "k" >= 5', con)
    assert got.count() == 5
    # predicate-partitioned parallel scan (the reference's chunked cursor)
    part = db.read_sql_query(
        spark, f'SELECT "k", "v" FROM {t}', con,
        partition_column='"k"', lower_bound=0, upper_bound=10, num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 10


def test_append_mode(spark, con):
    t = _tbl()
    db.to_sql(_df(spark, [(1, "a", 1)]), con, t, mode="overwrite")
    db.to_sql(_df(spark, [(2, "b", 1)]), con, t, mode="append")
    assert db.read_sql_table(spark, t, con).count() == 2


def test_upsert(spark, con):
    t = _tbl()
    db.to_sql(_df(spark, [(1, "old", 1), (2, "keep", 1)]), con, t, mode="overwrite")
    db.to_sql(_df(spark, [(1, "new", 2), (3, "ins", 2)]), con, t, mode="upsert", keys=["k"])
    got = {r.k: r.v for r in db.read_sql_table(spark, t, con).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_upsert_precombine(spark, con):
    t = _tbl()
    db.redshift.to_sql(_df(spark, [(1, "v5", 5)]), con, t, mode="overwrite")
    db.redshift.to_sql(
        _df(spark, [(1, "v3", 3), (1, "v9", 9)]), con, t,
        mode="upsert", keys=["k"], precombine_key="ver",
    )
    got = {r.k: (r.v, r.ver) for r in db.read_sql_table(spark, t, con).collect()}
    assert got == {1: ("v9", 9)}


def test_mysql_modes(spark, con):
    t = _tbl()
    db.mysql.to_sql(_df(spark, [(1, "a", 1), (2, "b", 1)]), con, t, mode="overwrite")
    # ignore: existing rows win
    db.mysql.to_sql(
        _df(spark, [(2, "B", 2), (3, "c", 2)]), con, t, mode="ignore", keys=["k"]
    )
    got = {r.k: r.v for r in db.read_sql_table(spark, t, con).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # upsert_duplicate_key: source wins
    db.mysql.to_sql(
        _df(spark, [(2, "B2", 3)]), con, t, mode="upsert_duplicate_key", keys=["k"]
    )
    got = {r.k: r.v for r in db.read_sql_table(spark, t, con).collect()}
    assert got[2] == "B2"
    # upsert_distinct: full-row distinct rebuild
    db.mysql.to_sql(
        _df(spark, [(1, "a", 1), (4, "d", 1)]), con, t, mode="upsert_distinct"
    )
    assert db.read_sql_table(spark, t, con).count() == 4


def test_redshift_copy_unload(spark, con, tmp_path):
    t = _tbl()
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "unload")
    db.redshift.copy(_df(spark, [(1, "a", 1), (2, "b", 1)]), stage, con, t, mode="overwrite")
    assert db.read_sql_table(spark, t, con).count() == 2
    got = db.redshift.unload(spark, f'SELECT "k", "v" FROM {t}', out, con)
    assert got.count() == 2
    assert spark.read.parquet(out).count() == 2


def test_invalid_modes(spark, con):
    with pytest.raises(InvalidArgument):
        db.to_sql(_df(spark, [(1, "a", 1)]), con, _tbl(), mode="bogus")
    with pytest.raises(InvalidArgument):
        db.to_sql(_df(spark, [(1, "a", 1)]), con, _tbl(), mode="upsert")
    with pytest.raises(InvalidArgument):
        db.mysql.to_sql(_df(spark, [(1, "a", 1)]), con, _tbl(), mode="upsert_duplicate_key")
