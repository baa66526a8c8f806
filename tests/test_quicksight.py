"""QuickSight local BI catalog (quicksight.py): the engine-content
semantics are real — datasets execute with logical-table rename/cast
transformations applied, SPICE ingestions materialize parquet snapshots
with snapshot isolation from later source changes, lookups follow the
reference's zero-match/ambiguity error contract."""

from __future__ import annotations

import pytest

from aws_sdk_pandas_spark import quicksight as qs
from aws_sdk_pandas_spark.exceptions import InvalidArgument


@pytest.fixture(autouse=True)
def clean_account():
    qs.delete_all_data_sources()
    qs.delete_all_datasets()
    qs.delete_all_dashboards()
    qs.delete_all_templates()
    qs._USERS.clear()
    qs._GROUPS.clear()
    qs._MEMBERSHIPS.clear()
    qs._POLICY_ASSIGNMENTS.clear()
    yield


def test_data_source_lifecycle(spark):
    qs.create_athena_data_source(
        "src", allowed_to_use=["alice"], allowed_to_manage=["bob"], tags={"env": "t"}
    )
    with pytest.raises(InvalidArgument, match="already exists"):
        qs.create_athena_data_source("src")
    ds_id = qs.get_data_source_id("src")
    assert qs.get_data_source_arn("src").endswith(ds_id)
    rec = qs.describe_data_source(name="src")
    assert rec["Workgroup"] == "primary" and rec["Tags"] == {"env": "t"}
    perms = qs.describe_data_source_permissions(name="src")
    assert {(p["Principal"], p["Actions"][0]) for p in perms} == {
        ("alice", "quicksight:UseDataSource"),
        ("bob", "quicksight:ManageDataSource"),
    }
    qs.delete_data_source(name="src")
    assert qs.list_data_sources() == []
    with pytest.raises(InvalidArgument, match="no data source"):
        qs.get_data_source_id("src")


def test_dataset_direct_query_applies_transformations(spark):
    spark.createDataFrame(
        [(1, "a", "10"), (2, "b", "20")], "k int, name string, amount string"
    ).createOrReplaceTempView("qs_src")
    qs.create_athena_dataset(
        "dq",
        sql="SELECT * FROM qs_src",
        rename_columns={"name": "label"},
        cast_columns_types={"amount": "int"},
    )
    df = qs.read_dataset("dq", spark=spark)
    assert set(df.columns) == {"k", "label", "amount"}
    assert dict(df.dtypes)["amount"] == "int"
    assert df.agg({"amount": "sum"}).first()[0] == 30

    with pytest.raises(InvalidArgument, match="not both"):
        qs.create_athena_dataset("bad", table="t", sql="SELECT 1")
    with pytest.raises(InvalidArgument, match="invalid import_mode"):
        qs.create_athena_dataset("bad", sql="SELECT 1", import_mode="NOPE")
    with pytest.raises(InvalidArgument, match="unknown data source"):
        qs.create_athena_dataset("bad", sql="SELECT 1", data_source_name="ghost")


def test_spice_ingestion_snapshot_isolation(spark, tmp_path):
    qs.SPICE_ROOT = str(tmp_path / "spice")
    spark.createDataFrame([(1,), (2,)], "k int").createOrReplaceTempView("qs_live")
    ds_id = qs.create_athena_dataset(
        "sp", sql="SELECT * FROM qs_live", import_mode="SPICE"
    )
    # SPICE read before any import is an error, like the service
    with pytest.raises(InvalidArgument, match="no completed ingestion"):
        qs.read_dataset("sp", spark=spark)
    ing = qs.create_ingestion(dataset_name="sp", spark=spark)
    assert qs.describe_ingestion(ing, dataset_id=ds_id)["RowInfo"]["RowsIngested"] == 2

    # the source grows; the SPICE snapshot must NOT see it
    spark.createDataFrame([(1,), (2,), (3,)], "k int").createOrReplaceTempView("qs_live")
    assert qs.read_dataset("sp", spark=spark).count() == 2
    # a fresh import picks up the new rows
    qs.create_ingestion(dataset_id=ds_id, spark=spark)
    assert qs.read_dataset("sp", spark=spark).count() == 3
    assert len(qs.list_ingestions(dataset_name="sp")) == 2

    with pytest.raises(InvalidArgument, match="already completed"):
        qs.cancel_ingestion(ing, dataset_id=ds_id)
    with pytest.raises(InvalidArgument, match="unknown ingestion"):
        qs.describe_ingestion("nope", dataset_id=ds_id)
    # DIRECT_QUERY datasets cannot ingest
    qs.create_athena_dataset("dq2", sql="SELECT * FROM qs_live")
    with pytest.raises(InvalidArgument, match="SPICE"):
        qs.create_ingestion(dataset_name="dq2", spark=spark)


def test_lookup_ambiguity_contract(spark):
    a = qs.register_dashboard("board")
    b = qs.register_dashboard("board")
    assert sorted(qs.get_dashboard_ids("board")) == sorted([a, b])
    with pytest.raises(InvalidArgument, match="multiple"):
        qs.get_dashboard_id("board")
    qs.delete_dashboard(dashboard_id=a)
    assert qs.get_dashboard_id("board") == b
    assert qs.describe_dashboard(name="board")["DashboardId"] == b

    t = qs.register_template("tpl")
    assert qs.get_template_id("tpl") == t
    qs.delete_template(name="tpl")
    assert qs.list_templates() == []


def test_users_groups_assignments(spark):
    qs.register_user("alice", "a@x", "AUTHOR")
    qs.register_user("bob")
    qs.register_group("analysts", members=["alice"])
    qs.register_group("empty")
    qs.register_iam_policy_assignment("pa1", users=["bob"])
    assert {u["UserName"] for u in qs.list_users()} == {"alice", "bob"}
    assert {g["GroupName"] for g in qs.list_groups()} == {"analysts", "empty"}
    assert qs.list_group_memberships("analysts") == [{"MemberName": "alice"}]
    assert qs.list_user_groups("alice") == [{"GroupName": "analysts"}]
    assert qs.list_iam_policy_assignments_for_user("bob") == [
        {"AssignmentName": "pa1", "Users": ["bob"]}
    ]
    with pytest.raises(InvalidArgument, match="unknown group"):
        qs.list_group_memberships("ghost")


def test_table_backed_dataset(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS qsdb")
    spark.sql("CREATE TABLE IF NOT EXISTS qsdb.tbl (k INT) USING parquet")
    spark.sql("INSERT OVERWRITE qsdb.tbl VALUES (7), (8)")
    try:
        qs.create_athena_dataset("tb", database="qsdb", table="tbl")
        assert qs.read_dataset("tb", spark=spark).count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS qsdb.tbl")
        spark.sql("DROP DATABASE IF EXISTS qsdb")
