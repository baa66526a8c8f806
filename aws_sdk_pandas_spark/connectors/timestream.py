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
