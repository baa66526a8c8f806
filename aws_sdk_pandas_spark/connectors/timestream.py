"""Time-series store (reference: awswrangler/timestream/_write.py:223
``write``, _read.py:130 ``query``, :177 ``unload``).

Timestream's data model is long-format records: (time, dimensions...,
measure_name, measure_value[s]).  The Spark-native table IS that long
format (partitioned by date for time-range pruning); ``query`` is
``spark.sql``; the reference's ≤100-record WriteRecords batching and
version-based upsert map to dataset append + precombine merge.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def write(
    df: DataFrame,
    path: str,
    *,
    time_col: str,
    dimensions_cols: list[str],
    measure_cols: list[str],
    measure_name_col: str | None = None,
    version_col: str | None = None,
    mode: str = "append",
) -> dict[str, Any]:
    """reference: timestream/_write.py:223 — multi-measure long-format
    write.  Rejected-records semantics become schema validation errors at
    plan time; ``version_col`` implements version-based upsert (greatest
    version per (time, dims) wins) via precombine before the write."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    missing = [
        c
        for c in [time_col, *dimensions_cols, *measure_cols]
        if c not in df.columns
    ]
    if missing:
        raise InvalidArgument(f"columns not in DataFrame: {missing}")
    out = df.withColumn("__date", F.to_date(F.col(time_col)))
    if version_col is not None:
        from aws_sdk_pandas_spark.operators.merge import _precombine_latest

        out = _precombine_latest(out, [time_col, *dimensions_cols], version_col)
    if measure_name_col is None:
        out = out.withColumn("measure_name", F.lit(",".join(measure_cols)))
    else:
        out = out.withColumn("measure_name", F.col(measure_name_col))
    return write_dataset(
        out,
        path,
        "parquet",
        mode=mode,
        partition_cols=["__date"],  # time-range pruning at scale
    )


def query(spark: SparkSession, sql: str, *, chunked: bool = False):
    """reference: timestream/_read.py:130 — SQL passthrough; ``chunked``
    returns the reference's iterator-of-pandas contract."""
    df = spark.sql(sql)
    if chunked:
        from aws_sdk_pandas_spark.sql import _iter_pandas_chunks

        return _iter_pandas_chunks(df, 10_000)
    return df


def unload(
    spark: SparkSession,
    sql: str,
    path: str,
    *,
    unload_format: str = "PARQUET",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """reference: timestream/_read.py:177 ``unload`` — run, land, re-scan."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    fmt = unload_format.lower()
    if fmt not in ("parquet", "csv"):
        raise InvalidArgument("unload_format must be PARQUET or CSV")
    df = spark.sql(sql)
    write_dataset(
        df, path, fmt, mode="overwrite", partition_cols=partition_cols,
        options={"header": "true"} if fmt == "csv" else None,
    )
    if fmt == "parquet":
        return spark.read.parquet(path)
    return spark.read.option("header", "true").csv(path)


def batch_load(
    df: DataFrame,
    staging_path: str,
    table_path: str,
    *,
    time_col: str,
    dimensions_cols: list[str],
    measure_cols: list[str],
) -> dict[str, Any]:
    """reference: timestream/_write.py:438 ``batch_load`` — stage CSV,
    then server-side load; here stage then long-format write."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    write_dataset(
        df, staging_path, "csv", mode="overwrite", options={"header": "true"}
    )
    staged = df.sparkSession.read.option("header", "true").option("inferSchema", "true").csv(
        staging_path
    )
    return write(
        staged,
        table_path,
        time_col=time_col,
        dimensions_cols=dimensions_cols,
        measure_cols=measure_cols,
        mode="overwrite",
    )


def unload_to_files(
    spark: SparkSession,
    sql: str,
    path: str,
    *,
    unload_format: str = "PARQUET",
    partition_cols: list[str] | None = None,
) -> None:
    """reference: timestream/_read.py:334 ``unload_to_files`` — land the
    query result WITHOUT reading it back."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    fmt = unload_format.lower()
    if fmt not in ("parquet", "csv"):
        raise InvalidArgument("unload_format must be PARQUET or CSV")
    write_dataset(
        spark.sql(sql), path, fmt, mode="overwrite", partition_cols=partition_cols,
        options={"header": "true"} if fmt == "csv" else None,
    )


def create_database(spark: SparkSession, database: str) -> str:
    """reference: timestream/_manage.py ``create_database``."""
    from aws_sdk_pandas_spark import catalog as _catalog

    _catalog.create_database(spark, database, exist_ok=True)
    return database


def delete_database(spark: SparkSession, database: str) -> None:
    """reference: timestream/_manage.py ``delete_database``."""
    from aws_sdk_pandas_spark import catalog as _catalog

    _catalog.delete_database(spark, database)


def create_table(
    spark: SparkSession,
    database: str,
    table: str,
    *,
    path: str | None = None,
    columns_types: dict[str, str] | None = None,
) -> str:
    """reference: timestream/_manage.py ``create_table`` — a long-format
    time-series table.  Timestream tables are schemaless at creation; a
    Spark table needs columns, so the minimal long-format spine
    ``(time timestamp)`` is registered unless ``columns_types`` given —
    dims/measures evolve on first write (mergeSchema)."""
    from aws_sdk_pandas_spark import catalog as _catalog

    _catalog.create_parquet_table(
        spark, table, database=database, path=path,
        columns_types=columns_types or {"time": "timestamp"},
        exist_ok=True,
    )
    return table


def delete_table(spark: SparkSession, database: str, table: str) -> None:
    """reference: timestream/_manage.py ``delete_table``."""
    from aws_sdk_pandas_spark import catalog as _catalog

    _catalog.delete_table_if_exists(spark, table, database)


def list_databases(spark: SparkSession) -> list[str]:
    """reference: timestream/_manage.py ``list_databases``."""
    from aws_sdk_pandas_spark import catalog as _catalog

    return _catalog.databases(spark)


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """reference: timestream/_manage.py ``list_tables``."""
    from aws_sdk_pandas_spark import catalog as _catalog

    return _catalog.tables(spark, database)


def batch_load_from_files(
    spark: SparkSession,
    staging_path: str,
    table_path: str,
    *,
    time_col: str,
    dimensions_cols: list[str],
    measure_cols: list[str],
) -> dict[str, Any]:
    """reference: timestream/_write.py:570 ``batch_load_from_files`` —
    load CSV already staged by another job."""
    staged = (
        spark.read.option("header", "true").option("inferSchema", "true").csv(staging_path)
    )
    return write(
        staged, table_path,
        time_col=time_col, dimensions_cols=dimensions_cols,
        measure_cols=measure_cols, mode="overwrite",
    )


def wait_batch_load_task(spark: SparkSession, task_id: str) -> dict[str, Any]:
    """reference: timestream/_write.py ``wait_batch_load_task`` — loads are
    synchronous here; already complete."""
    return {"TaskId": task_id, "TaskStatus": "SUCCEEDED"}
