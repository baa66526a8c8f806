"""Catalog operations over the Spark session catalog / SQL DDL
(reference: awswrangler/catalog/ — Glue Data Catalog wrappers, ~3.8k LoC;
here every operation maps to ``spark.catalog`` or a DDL statement)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark._types import (
    athena2spark,
    sanitize_column_name,
    sanitize_table_name,
    spark2athena,
)
from aws_sdk_pandas_spark.exceptions import InvalidArgument, TableNotFound

__all__ = [
    "create_database",
    "databases",
    "delete_database",
    "create_parquet_table",
    "create_csv_table",
    "create_json_table",
    "create_orc_table",
    "does_table_exist",
    "delete_table_if_exists",
    "get_table_location",
    "get_table_types",
    "get_partitions",
    "add_partitions",
    "repair_table",
    "sanitize_column_name",
    "sanitize_table_name",
    "table",
    "tables",
]


def _quote(identifier: str) -> str:
    return "`" + identifier.replace("`", "``") + "`"


def _qualified(database: str | None, table: str) -> str:
    return f"{_quote(database)}.{_quote(table)}" if database else _quote(table)


# ---------------------------------------------------------------------------
# databases (reference: catalog/_create.py create_database, _get.py databases)
# ---------------------------------------------------------------------------


def create_database(spark: SparkSession, name: str, exist_ok: bool = False) -> None:
    clause = "IF NOT EXISTS " if exist_ok else ""
    spark.sql(f"CREATE DATABASE {clause}{_quote(name)}")


def delete_database(spark: SparkSession, name: str, cascade: bool = True) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {_quote(name)}{' CASCADE' if cascade else ''}")


def databases(spark: SparkSession) -> list[str]:
    return [db.name for db in spark.catalog.listDatabases()]


def tables(spark: SparkSession, database: str | None = None) -> list[str]:
    return [t.name for t in spark.catalog.listTables(database)]


# ---------------------------------------------------------------------------
# table create / drop (reference: catalog/_create.py:722 create_parquet_table)
# ---------------------------------------------------------------------------


def _create_table(
    spark: SparkSession,
    *,
    file_format: str,
    database: str | None,
    table: str,
    path: str | None,
    columns_types: dict[str, str] | None,
    partitions_types: dict[str, str] | None,
    exist_ok: bool,
    options: dict[str, Any] | None = None,
) -> None:
    name = _qualified(database, sanitize_table_name(table))
    cols_sql = ""
    if columns_types:
        all_cols = {**columns_types, **(partitions_types or {})}
        # validate the type strings through the parser
        for t in all_cols.values():
            athena2spark(t)
        cols_sql = "(" + ", ".join(f"{_quote(c)} {t}" for c, t in all_cols.items()) + ") "
    part_sql = ""
    if partitions_types:
        part_sql = "PARTITIONED BY (" + ", ".join(_quote(c) for c in partitions_types) + ") "
    loc_sql = f"LOCATION '{path}' " if path else ""
    opt_sql = ""
    if options:
        opt_sql = "OPTIONS (" + ", ".join(f"'{k}'='{v}'" for k, v in options.items()) + ") "
    exists = "IF NOT EXISTS " if exist_ok else ""
    spark.sql(
        f"CREATE EXTERNAL TABLE {exists}{name} {cols_sql}USING {file_format} "
        f"{opt_sql}{part_sql}{loc_sql}".strip()
        if path
        else f"CREATE TABLE {exists}{name} {cols_sql}USING {file_format} {opt_sql}{part_sql}".strip()
    )
    if partitions_types and path:
        repair_table(spark, table, database)


def create_parquet_table(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    path: str | None = None,
    columns_types: dict[str, str] | None = None,
    partitions_types: dict[str, str] | None = None,
    exist_ok: bool = False,
    **_compat: Any,
) -> None:
    """(reference: catalog/_create.py:722)"""
    _create_table(
        spark,
        file_format="parquet",
        database=database,
        table=table,
        path=path,
        columns_types=columns_types,
        partitions_types=partitions_types,
        exist_ok=exist_ok,
    )


def create_csv_table(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    path: str | None = None,
    columns_types: dict[str, str] | None = None,
    partitions_types: dict[str, str] | None = None,
    exist_ok: bool = False,
    sep: str = ",",
    skip_header_line_count: int = 0,
    **_compat: Any,
) -> None:
    """(reference: catalog/_create.py:1034; header handling
    s3/_write_text.py:582)"""
    _create_table(
        spark,
        file_format="csv",
        database=database,
        table=table,
        path=path,
        columns_types=columns_types,
        partitions_types=partitions_types,
        exist_ok=exist_ok,
        options={"sep": sep, "header": "true" if skip_header_line_count else "false"},
    )


def create_json_table(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    path: str | None = None,
    columns_types: dict[str, str] | None = None,
    partitions_types: dict[str, str] | None = None,
    exist_ok: bool = False,
    **_compat: Any,
) -> None:
    """(reference: catalog/_create.py:1221)"""
    _create_table(
        spark,
        file_format="json",
        database=database,
        table=table,
        path=path,
        columns_types=columns_types,
        partitions_types=partitions_types,
        exist_ok=exist_ok,
    )


def create_orc_table(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    path: str | None = None,
    columns_types: dict[str, str] | None = None,
    partitions_types: dict[str, str] | None = None,
    exist_ok: bool = False,
    **_compat: Any,
) -> None:
    """(reference: catalog/_create.py:878)"""
    _create_table(
        spark,
        file_format="orc",
        database=database,
        table=table,
        path=path,
        columns_types=columns_types,
        partitions_types=partitions_types,
        exist_ok=exist_ok,
    )


def does_table_exist(spark: SparkSession, table: str, database: str | None = None) -> bool:
    """(reference: catalog/_utils.py does_table_exist)"""
    return spark.catalog.tableExists(table, database)


def delete_table_if_exists(spark: SparkSession, table: str, database: str | None = None) -> bool:
    """(reference: catalog/_delete.py delete_table_if_exists)"""
    existed = does_table_exist(spark, table, database)
    spark.sql(f"DROP TABLE IF EXISTS {_qualified(database, table)}")
    return existed


def table(spark: SparkSession, table: str, database: str | None = None) -> DataFrame:
    """Table metadata as a DataFrame (reference: catalog/_get.py table)."""
    if not does_table_exist(spark, table, database):
        raise TableNotFound(f"{database}.{table}" if database else table)
    return spark.sql(f"DESCRIBE TABLE {_qualified(database, table)}")


def get_table_location(spark: SparkSession, table: str, database: str | None = None) -> str:
    """(reference: catalog/_get.py get_table_location)"""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {_qualified(database, table)}").collect()
    for r in rows:
        if r.col_name == "Location":
            return r.data_type
    raise TableNotFound(f"no location for {table}")


def get_table_types(
    spark: SparkSession, table: str, database: str | None = None
) -> dict[str, str]:
    """Column -> Athena-style type string (reference: catalog/_get.py
    get_table_types)."""
    qualified = f"{database}.{table}" if database else table
    df = spark.table(qualified)
    return {f.name: spark2athena(f.dataType) for f in df.schema.fields}


# ---------------------------------------------------------------------------
# partitions (reference: catalog/_add.py:47-358, _get.py:700)
# ---------------------------------------------------------------------------


def add_partitions(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    partitions_values: dict[str, list[str]] | None = None,
) -> None:
    """``ALTER TABLE ADD PARTITION`` per prefix
    (reference: catalog/_add.py:213 BatchCreatePartition)."""
    if not partitions_values:
        return
    name = _qualified(database, table)
    part_cols = [
        f.name for f in spark.catalog.listColumns(table, database) if f.isPartition
    ]
    if not part_cols:
        raise InvalidArgument(f"table {table} is not partitioned")
    for location, values in partitions_values.items():
        spec = ", ".join(
            f"{_quote(c)}='{v}'" for c, v in zip(part_cols, values)
        )
        spark.sql(
            f"ALTER TABLE {name} ADD IF NOT EXISTS PARTITION ({spec}) LOCATION '{location}'"
        )


def get_partitions(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    expression: str | None = None,
) -> dict[str, list[str]]:
    """Partition spec -> values, optional SQL filter expression evaluated
    on partition columns (reference: catalog/_get.py:700 server-side
    expression filter)."""
    qualified = f"{database}.{table}" if database else table
    part_cols = [
        f.name for f in spark.catalog.listColumns(table, database) if f.isPartition
    ]
    if not part_cols:
        return {}
    df = spark.table(qualified).select(*part_cols).distinct()
    if expression:
        df = df.where(expression)
    location = get_table_location(spark, table, database).rstrip("/")
    out: dict[str, list[str]] = {}
    for r in df.collect():
        values = [str(r[c]) for c in part_cols]
        prefix = location + "/" + "/".join(f"{c}={v}" for c, v in zip(part_cols, values)) + "/"
        out[prefix] = values
    return out


def repair_table(spark: SparkSession, table: str, database: str | None = None) -> None:
    """``MSCK REPAIR TABLE`` — discover partitions on disk
    (reference equivalent: athena.repair_table)."""
    spark.sql(f"MSCK REPAIR TABLE {_qualified(database, table)}")


def store_parquet_metadata(
    spark: SparkSession,
    path: str,
    table: str,
    database: str | None = None,
    *,
    dataset: bool = True,
) -> tuple[dict[str, str], dict[str, str] | None]:
    """Infer a parquet dataset's (columns, partitions) schema from footers
    and register it as a table (reference: awswrangler/s3/_read_parquet.py
    ``store_parquet_metadata`` + catalog create, SURVEY P1)."""
    from aws_sdk_pandas_spark.sources.parquet import read_parquet_metadata

    columns_types, partitions_types = read_parquet_metadata(spark, path, dataset=dataset)
    create_parquet_table(
        spark,
        database=database,
        table=table,
        path=path,
        columns_types=columns_types,
        partitions_types=partitions_types,
        exist_ok=True,
    )
    if partitions_types:
        repair_table(spark, table, database)
    return columns_types, partitions_types
