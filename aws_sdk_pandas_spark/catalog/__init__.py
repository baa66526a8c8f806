"""Catalog operations over the Spark session catalog / SQL DDL
(reference: awswrangler/catalog/ — Glue Data Catalog wrappers, ~3.8k LoC;
here every operation maps to ``spark.catalog`` or a DDL statement)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_sdk_pandas_spark._types import (
    athena2spark,
    sanitize_column_name,
    sanitize_dataframe_columns_names,
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


# ---------------------------------------------------------------------------
# Reference-parity surface (catalog/_add.py, _delete.py, _get.py, _utils.py):
# column DDL, partition deletion, table parameters (TBLPROPERTIES), search,
# duplicate-column repair, and the per-format partition aliases.
# ---------------------------------------------------------------------------


def add_column(
    spark: SparkSession,
    table: str,
    column_name: str,
    column_type: str = "string",
    database: str | None = None,
    column_comment: str | None = None,
) -> None:
    """reference: catalog/_add.py ``add_column`` — ALTER TABLE ADD COLUMNS."""
    comment = f" COMMENT '{column_comment}'" if column_comment else ""
    spark.sql(
        f"ALTER TABLE {_qualified(database, table)} "
        f"ADD COLUMNS ({_quote(column_name)} {column_type}{comment})"
    )
    bump_table_version(spark, table, database)


def delete_column(
    spark: SparkSession, table: str, column_name: str, database: str | None = None
) -> None:
    """reference: catalog/_delete.py ``delete_column``.  Spark file-source
    tables cannot drop columns in place (no Glue-style schema versioning);
    rebuild the table definition without the column, matching the
    reference's observable result."""
    name = _qualified(database, table)
    cols = [
        (f.name, f.dataType, f.isPartition)
        for f in spark.catalog.listColumns(table, database)
    ]
    if column_name not in [c for c, _, _ in cols]:
        raise InvalidArgument(f"column {column_name!r} not found in {name}")
    if any(p and c == column_name for c, _, p in cols):
        raise InvalidArgument("cannot drop a partition column")
    try:
        spark.sql(f"ALTER TABLE {name} DROP COLUMN {_quote(column_name)}")
    except Exception:
        location = get_table_location(spark, table, database)
        columns_types = {c: t for c, t, p in cols if not p and c != column_name}
        partitions_types = {c: t for c, t, p in cols if p}
        provider = _table_provider(spark, table, database)
        spark.sql(f"DROP TABLE {name}")
        _create_table(
            spark,
            file_format=provider,
            database=database,
            table=table,
            path=location,
            columns_types=columns_types,
            partitions_types=partitions_types or None,
            exist_ok=False,
        )
        if partitions_types:
            repair_table(spark, table, database)
    bump_table_version(spark, table, database)


def _table_provider(spark: SparkSession, table: str, database: str | None = None) -> str:
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {_qualified(database, table)}").collect():
        if r.col_name == "Provider":
            return r.data_type
    return "parquet"


def delete_partitions(
    spark: SparkSession,
    table: str,
    partitions_values: list[list[str]],
    database: str | None = None,
) -> None:
    """reference: catalog/_delete.py ``delete_partitions`` — ALTER TABLE
    DROP PARTITION per value tuple (metadata only, files untouched —
    the reference's BatchDeletePartition semantics)."""
    name = _qualified(database, table)
    part_cols = [
        f.name for f in spark.catalog.listColumns(table, database) if f.isPartition
    ]
    if not part_cols:
        raise InvalidArgument(f"table {table} is not partitioned")
    for values in partitions_values:
        spec = ", ".join(f"{_quote(c)}='{v}'" for c, v in zip(part_cols, values))
        spark.sql(f"ALTER TABLE {name} DROP IF EXISTS PARTITION ({spec})")


def delete_all_partitions(
    spark: SparkSession, table: str, database: str | None = None
) -> list[list[str]]:
    """reference: catalog/_delete.py ``delete_all_partitions``; returns the
    deleted partition value tuples."""
    parts = get_partitions(spark, table, database)
    values = list(parts.values())
    delete_partitions(spark, table, values, database)
    return values


def get_table_parameters(
    spark: SparkSession, table: str, database: str | None = None
) -> dict[str, str]:
    """reference: catalog/_get.py ``get_table_parameters`` — TBLPROPERTIES."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {_qualified(database, table)}").collect()
    return {r.key: r.value for r in rows}


def upsert_table_parameters(
    spark: SparkSession,
    table: str,
    parameters: dict[str, str],
    database: str | None = None,
) -> dict[str, str]:
    """reference: catalog/_create.py ``upsert_table_parameters`` — merge
    the given TBLPROPERTIES into the existing set."""
    if parameters:
        props = ", ".join(f"'{k}'='{v}'" for k, v in parameters.items())
        spark.sql(
            f"ALTER TABLE {_qualified(database, table)} SET TBLPROPERTIES ({props})"
        )
    return get_table_parameters(spark, table, database)


def overwrite_table_parameters(
    spark: SparkSession,
    table: str,
    parameters: dict[str, str],
    database: str | None = None,
) -> dict[str, str]:
    """reference: catalog/_create.py ``overwrite_table_parameters`` —
    user-settable properties are replaced wholesale (engine-reserved
    properties are left alone, as Glue does with its system keys)."""
    current = get_table_parameters(spark, table, database)
    reserved = {
        k for k in current
        if k in ("owner", "provider", "location", "comment")
        or k.startswith(("spark.", "transient_", "external", "numFiles", "Statistics"))
    }
    to_unset = [k for k in current if k not in reserved and k not in parameters]
    if to_unset:
        keys = ", ".join(f"'{k}'" for k in to_unset)
        spark.sql(
            f"ALTER TABLE {_qualified(database, table)} "
            f"UNSET TBLPROPERTIES IF EXISTS ({keys})"
        )
    return upsert_table_parameters(spark, table, parameters, database)


def get_table_description(
    spark: SparkSession, table: str, database: str | None = None
) -> str | None:
    """reference: catalog/_get.py ``get_table_description`` — the table
    comment."""
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {_qualified(database, table)}").collect():
        if r.col_name == "Comment":
            return r.data_type
    return None


def get_columns_comments(
    spark: SparkSession, table: str, database: str | None = None
) -> dict[str, str | None]:
    """reference: catalog/_get.py ``get_columns_comments``."""
    out: dict[str, str | None] = {}
    for r in spark.sql(f"DESCRIBE TABLE {_qualified(database, table)}").collect():
        if not r.col_name or r.col_name.startswith("#"):
            continue
        if r.col_name not in out:
            out[r.col_name] = r.comment if r.comment else None
    return out


def search_tables(spark: SparkSession, text: str, database: str | None = None) -> list[str]:
    """reference: catalog/_get.py ``search_tables`` — substring match on
    table names."""
    return [t for t in tables(spark, database) if text.lower() in t.lower()]


def drop_duplicated_columns(df: DataFrame) -> DataFrame:
    """reference: catalog/_utils.py ``drop_duplicated_columns`` — keep the
    FIRST occurrence of each duplicated column name."""
    seen: set[str] = set()
    keep_idx = []
    for i, c in enumerate(df.columns):
        if c not in seen:
            seen.add(c)
            keep_idx.append(i)
    if len(keep_idx) == len(df.columns):
        return df
    all_cols = df.columns
    return df.toDF(*[f"__c{i}" for i in range(len(all_cols))]).select(
        *[F.col(f"__c{i}").alias(all_cols[i]) for i in keep_idx]
    )


def rename_duplicated_columns(df: DataFrame) -> DataFrame:
    """reference: catalog/_utils.py ``rename_duplicated_columns`` — second
    and later occurrences get ``_n`` suffixes."""
    counts: dict[str, int] = {}
    new_names = []
    for c in df.columns:
        n = counts.get(c, 0)
        counts[c] = n + 1
        new_names.append(c if n == 0 else f"{c}_{n}")
    return df.toDF(*new_names)


def extract_athena_types(
    df: DataFrame, partition_cols: list[str] | None = None
) -> tuple[dict[str, str], dict[str, str]]:
    """reference: catalog/_utils.py ``extract_athena_types`` — split a
    DataFrame's schema into (columns, partitions) Athena/Spark DDL type
    strings."""
    from aws_sdk_pandas_spark._types import spark2athena

    partition_cols = partition_cols or []
    cols = {f.name: spark2athena(f.dataType) for f in df.schema.fields
            if f.name not in partition_cols}
    parts = {f.name: spark2athena(f.dataType) for f in df.schema.fields
             if f.name in partition_cols}
    return cols, parts


# reference naming aliases (per-format partition fns share one implementation
# here — Spark's catalog is format-agnostic; get_databases/get_tables mirror
# the reference's names for databases()/tables())
add_parquet_partitions = add_partitions
add_csv_partitions = add_partitions
add_json_partitions = add_partitions
add_orc_partitions = add_partitions
get_parquet_partitions = get_partitions
get_csv_partitions = get_partitions
get_databases = databases
get_tables = tables

__all__ += [
    "add_column",
    "delete_column",
    "delete_partitions",
    "delete_all_partitions",
    "get_table_parameters",
    "upsert_table_parameters",
    "overwrite_table_parameters",
    "get_table_description",
    "get_columns_comments",
    "search_tables",
    "drop_duplicated_columns",
    "rename_duplicated_columns",
    "extract_athena_types",
    "sanitize_dataframe_columns_names",
    "add_parquet_partitions",
    "add_csv_partitions",
    "add_json_partitions",
    "add_orc_partitions",
    "get_parquet_partitions",
    "get_csv_partitions",
    "get_databases",
    "get_tables",
]


# ---------------------------------------------------------------------------
# table versions, column parameters, connections
# ---------------------------------------------------------------------------

_VERSIONS_KEY = "asps.table.versions"


def bump_table_version(
    spark: SparkSession, table: str, database: str | None = None
) -> int:
    """Record a new schema version for the table (Glue bumps VersionId on
    every UpdateTable; Spark's catalog has no version log, so one is kept
    in TBLPROPERTIES).  Called by the schema-changing DDL helpers; safe to
    call directly after external ALTERs."""
    import json
    from datetime import datetime, timezone

    params = get_table_parameters(spark, table, database)
    versions = json.loads(params.get(_VERSIONS_KEY, "[]"))
    vid = len(versions) + 1
    versions.append(
        {
            "VersionId": str(vid),
            "UpdateTime": datetime.now(timezone.utc).isoformat(),
        }
    )
    upsert_table_parameters(
        spark, table, {_VERSIONS_KEY: json.dumps(versions)}, database
    )
    return vid


def get_table_versions(
    spark: SparkSession, table: str, database: str | None = None
) -> list[dict[str, str]]:
    """reference: catalog/_get.py:925 ``get_table_versions`` — the
    recorded version history (newest last), Glue response shape."""
    import json

    params = get_table_parameters(spark, table, database)
    return json.loads(params.get(_VERSIONS_KEY, "[]"))


def get_table_number_of_versions(
    spark: SparkSession, table: str, database: str | None = None
) -> int:
    """reference: catalog/_get.py:964 ``get_table_number_of_versions``."""
    return len(get_table_versions(spark, table, database))


def get_columns_parameters(
    spark: SparkSession, table: str, database: str | None = None
) -> dict[str, dict[str, str]]:
    """reference: catalog/_get.py:883 ``get_columns_parameters`` — per-
    column parameter dicts.  Spark columns carry a comment only; it is
    surfaced under the reference's ``{column: {key: value}}`` shape."""
    cols = spark.catalog.listColumns(
        _qualified(database, table).replace("`", "")
    )
    return {
        c.name: ({"comment": c.description} if c.description else {})
        for c in cols
    }


_CONNECTIONS: dict[str, dict[str, Any]] = {}


def register_connection(name: str, connection: dict[str, Any]) -> None:
    """Register a named connection (the Glue Connections registry the
    reference resolves with catalog/_get.py:516 ``get_connection``).
    ``connection`` holds JDBC url/driver/credentials keys as the caller's
    databases.connect expects them."""
    _CONNECTIONS[name] = dict(connection)


def get_connection(name: str) -> dict[str, Any]:
    """reference: catalog/_get.py:516 ``get_connection`` — resolve a named
    connection registered in this session."""
    if name not in _CONNECTIONS:
        from aws_sdk_pandas_spark.exceptions import InvalidArgument

        raise InvalidArgument(
            f"connection {name!r} is not registered; call "
            "catalog.register_connection(name, {...}) first"
        )
    return dict(_CONNECTIONS[name])
