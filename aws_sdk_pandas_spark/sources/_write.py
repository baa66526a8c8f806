"""Shared dataset-write machinery (reference: awswrangler/s3/_write_dataset.py,
s3/_write.py).

One code path serves parquet/orc/csv/json. The reference's write modes:

- ``append``               -> ``DataFrameWriter.mode("append")``
- ``overwrite``            -> static overwrite (whole prefix replaced)
- ``overwrite_partitions`` -> dynamic partition overwrite: only partitions
  present in the incoming frame are replaced
  (reference deletes matching prefixes by hand,
  awswrangler/s3/_write_dataset.py:80-99; Spark's
  ``partitionOverwriteMode=dynamic`` is the engine-native equivalent).

Bucketing: the reference computes Hive-compatible bucket numbers
client-side (awswrangler/s3/_write_dataset.py:34-72, Java
``String.hashCode`` semantics with 31-multiplier and 32-bit overflow) and
suffixes files ``_bucket-NNNNN``.  Spark's ``bucketBy`` uses Murmur3 and
table metadata, which is NOT Hive-compatible — so we port the Hive hash as
a JVM-side Column expression (see ``functions.hive_hash``) and materialize
the bucket id as a trailing partition directory ``bucket=N/``.  Files are
then one-bucket-per-file and bucket-prunable by Catalyst; the directory
(rather than filename-suffix) encoding is the documented divergence.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_sdk_pandas_spark import _types
from aws_sdk_pandas_spark.exceptions import (
    EmptyDataFrame,
    InvalidArgument,
    InvalidArgumentCombination,
)
from aws_sdk_pandas_spark.sources import fs as _fs
from aws_sdk_pandas_spark.sources.layout import _parse_partition_segments

_BUCKET_COL = "bucket"

_MODES = ("append", "overwrite", "overwrite_partitions")


def write_dataset(
    df: DataFrame,
    path: str,
    file_format: str,
    *,
    mode: str = "append",
    partition_cols: list[str] | None = None,
    bucketing_info: tuple[list[str], int] | None = None,
    max_rows_by_file: int = 0,
    compression: str | None = None,
    dtype: dict[str, str] | None = None,
    options: dict[str, Any] | None = None,
    sanitize_columns: bool = False,
    dataset: bool = True,
    files_per_partition: int = 1,
) -> dict[str, Any]:
    """Write a DataFrame as a (possibly partitioned/bucketed) dataset.

    Returns ``{"paths": [...], "partitions_values": {prefix: [values]}}``
    matching the reference's contract (awswrangler/typing.py:255).

    ``files_per_partition``: partitioned writes are repartitioned on the
    partition columns first — without this every task writes a file into
    every partition it touches, i.e. O(tasks x partitions) small files
    at cluster scale.  Default 1 = one file per partition value; raise it
    for hot partitions (adds a hash salt so each partition spreads over N
    tasks/files).  ``max_rows_by_file`` still splits oversized files.
    """
    if mode not in _MODES:
        raise InvalidArgument(f"mode must be one of {_MODES}, got {mode!r}")
    if not dataset and (partition_cols or bucketing_info or mode != "append"):
        raise InvalidArgumentCombination(
            "partition_cols/bucketing_info/mode require dataset=True "
            "(reference: awswrangler/s3/_write.py:61-109)"
        )
    if not df.columns:
        raise EmptyDataFrame("DataFrame has no columns")
    _types.ensure_no_duplicate_columns(df.columns)

    if sanitize_columns:
        df = _types.sanitize_dataframe_columns_names(df)
    df = _types.cast_columns(df, dtype)

    partition_cols = list(partition_cols or [])
    missing = [c for c in partition_cols if c not in df.columns]
    if missing:
        raise InvalidArgument(f"partition_cols not in DataFrame: {missing}")

    spark = df.sparkSession
    writer_partitions = partition_cols

    if bucketing_info:
        from aws_sdk_pandas_spark.functions.hashing import hive_bucket

        bucket_cols, n_buckets = bucketing_info
        if not bucket_cols or n_buckets < 1:
            raise InvalidArgument("bucketing_info must be (non-empty cols, n>=1)")
        df = df.withColumn(_BUCKET_COL, hive_bucket(n_buckets, *bucket_cols, df=df))
        writer_partitions = partition_cols + [_BUCKET_COL]
        # co-locate each (partition, bucket) group into one task → one file
        # per bucket per partition, matching the reference's physical layout
        df = df.repartition(*[F.col(c) for c in writer_partitions])
    elif writer_partitions and files_per_partition >= 1:
        keys: list[F.Column] = [F.col(c) for c in writer_partitions]
        if files_per_partition > 1:
            keys.append(
                F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), files_per_partition)
            )
        df = df.repartition(*keys)

    writer = df.write.format(file_format)
    if compression is not None:
        writer = writer.option("compression", compression)
    if max_rows_by_file and max_rows_by_file > 0:
        # reference: max_rows_by_file file splitting
        # (awswrangler/s3/_write_parquet.py:131-163)
        writer = writer.option("maxRecordsPerFile", max_rows_by_file)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if writer_partitions:
        writer = writer.partitionBy(*writer_partitions)

    if mode == "append":
        writer = writer.mode("append")
    elif mode == "overwrite":
        writer = writer.mode("overwrite").option("partitionOverwriteMode", "static")
    else:  # overwrite_partitions
        if not writer_partitions:
            raise InvalidArgumentCombination("overwrite_partitions requires partition_cols")
        writer = writer.mode("overwrite").option("partitionOverwriteMode", "dynamic")

    writer.save(path)
    return _written_metadata(spark, path, writer_partitions)


def _written_metadata(
    spark: SparkSession, path: str, partition_cols: list[str]
) -> dict[str, Any]:
    """Post-write listing to honor the reference's returned metadata
    (paths + partitions_values; SURVEY §7 hard part 7)."""
    files = _fs.list_objects(spark, path, ignore_empty=True, ignore_suffix=["_SUCCESS", ".crc"])
    files = [f for f in files if not f.rsplit("/", 1)[-1].startswith((".", "_"))]
    partitions_values: dict[str, list[str]] = {}
    if partition_cols:
        root = path.rstrip("/")
        for f in files:
            prefix = f.rsplit("/", 1)[0] + "/"
            rel = prefix[len(root) :].strip("/")
            vals = _parse_partition_segments(rel)
            if vals:
                partitions_values[prefix] = [vals.get(c, "") for c in partition_cols]
    return {"paths": files, "partitions_values": partitions_values}
