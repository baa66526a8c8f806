"""ORC read/write (reference: awswrangler/s3/_read_orc.py:165,343,472 and
s3/_write_orc.py:313 — same trio/machinery as parquet)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark import _types
from aws_sdk_pandas_spark.sources._write import write_dataset
from aws_sdk_pandas_spark.sources.layout import PartitionFilter, apply_partition_filter


def read_orc(
    spark: SparkSession,
    path: str | list[str],
    *,
    dataset: bool = False,
    columns: list[str] | None = None,
    partition_filter: PartitionFilter | None = None,
    dtype: dict[str, str] | None = None,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    reader = spark.read.format("orc")
    if dataset and isinstance(path, str):
        reader = reader.option("basePath", path)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load([path] if isinstance(path, str) else list(path))
    if dataset and partition_filter is not None and isinstance(path, str):
        df = apply_partition_filter(spark, path, df, partition_filter)
    df = _types.cast_columns(df, dtype)
    if columns:
        df = df.select(*columns)
    return df


def read_orc_metadata(
    spark: SparkSession, path: str | list[str], *, dataset: bool = False
) -> tuple[dict[str, str], dict[str, str] | None]:
    df = read_orc(spark, path, dataset=dataset)
    part_names: set[str] = set()
    if dataset and isinstance(path, str):
        from aws_sdk_pandas_spark.sources.layout import discover_partitions

        for vals in discover_partitions(spark, path).values():
            part_names.update(vals.keys())
    columns: dict[str, str] = {}
    partitions: dict[str, str] = {}
    for field in df.schema.fields:
        (partitions if field.name in part_names else columns)[field.name] = _types.spark2athena(
            field.dataType
        )
    return columns, (partitions or None) if dataset else None


def to_orc(
    df: DataFrame,
    path: str,
    *,
    dataset: bool = False,
    mode: str = "append",
    partition_cols: list[str] | None = None,
    bucketing_info: tuple[list[str], int] | None = None,
    compression: str | None = "snappy",
    max_rows_by_file: int = 0,
    dtype: dict[str, str] | None = None,
    sanitize_columns: bool = False,
    options: dict[str, Any] | None = None,
    files_per_partition: int = 1,
) -> dict[str, Any]:
    return write_dataset(
        df,
        path,
        "orc",
        mode=mode,
        partition_cols=partition_cols,
        bucketing_info=bucketing_info,
        max_rows_by_file=max_rows_by_file,
        compression=compression,
        dtype=dtype,
        options=options,
        sanitize_columns=sanitize_columns,
        dataset=dataset,
        files_per_partition=files_per_partition,
    )


def read_orc_table(spark, table: str, database: str | None = None):
    """reference: s3/_read_orc.py:343 ``read_orc_table`` — scan by catalog
    table name (format-agnostic in Spark's catalog)."""
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    return spark.table(qualified)
