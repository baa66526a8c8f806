"""Parquet read/write (reference: awswrangler/s3/_read_parquet.py:330
``read_parquet``, awswrangler/s3/_write_parquet.py:340 ``to_parquet``).

The reference hand-builds: listing, wildcard matching, partition pruning,
footer schema merging, a thread/Ray fan-out, ranged-GET block caching, and
Arrow concatenation (lifecycle SURVEY §3.1).  In Spark those are the
built-in InMemoryFileIndex + PartitionPruning + vectorized parquet reader
+ Tungsten, so the operators here only translate the API surface and keep
the plan declarative so Catalyst sees everything.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark import _types
from aws_sdk_pandas_spark.exceptions import InvalidArgument, NoFilesFound
from aws_sdk_pandas_spark.sources._write import write_dataset
from aws_sdk_pandas_spark.sources.layout import PartitionFilter, apply_partition_filter


def read_parquet(
    spark: SparkSession,
    path: str | list[str],
    *,
    dataset: bool = False,
    columns: list[str] | None = None,
    partition_filter: PartitionFilter | None = None,
    schema: Any = None,
    dtype: dict[str, str] | None = None,
    validate_schema: bool = False,
    chunked: bool | int = False,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    """Scan one or many parquet files/prefixes into a DataFrame.

    - ``columns``          -> ``select`` (Catalyst column pruning reaches the
                              scan: check ``ReadSchema`` in ``.explain``).
    - ``partition_filter`` -> callable compiled to a partition-column
                              predicate (Catalyst partition pruning); see
                              ``sources.layout``.
    - ``validate_schema``  -> per-file footer merge with conflict detection
                              (``mergeSchema``; reference merges footers by
                              hand, awswrangler/s3/_read.py:186-307).
    - chunked iteration    -> inherent: the returned DataFrame is lazy; use
                              ``toLocalIterator()`` for the iterator form.
    """
    def _build_reader():
        reader = spark.read.format("parquet")
        if schema is not None:
            reader = reader.schema(schema)
        if validate_schema:
            reader = reader.option("mergeSchema", "true")
        if dataset and isinstance(path, str):
            reader = reader.option("basePath", path)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return reader

    paths = [path] if isinstance(path, str) else list(path)
    if not paths:
        raise NoFilesFound("empty path list")
    try:
        df = _build_reader().load(paths)
        df.schema  # force footer/schema resolution now so fallbacks trigger here
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true":
            # conf is sticky session-wide: a previous nanos fallback leaves
            # ns columns reading as longs — rebuild them here too
            df = _convert_nanos_columns(spark, df, paths)
    except Exception as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            raise NoFilesFound(msg) from exc
        if "PARQUET_TYPE_ILLEGAL" in msg and "NANOS" in msg:
            df = _read_with_nanos(spark, paths, _build_reader)
        else:
            raise
    if dataset and partition_filter is not None and isinstance(path, str):
        df = apply_partition_filter(spark, path, df, partition_filter)
    df = _types.cast_columns(df, dtype)
    if columns:
        df = df.select(*columns)
    if chunked:
        # reference contract: chunked=True -> stream of pandas frames,
        # chunked=int -> exact-row chunks (s3/_read_parquet.py:217-282)
        from aws_sdk_pandas_spark.sql import _iter_pandas_chunks

        return _iter_pandas_chunks(df, 65_536 if chunked is True else int(chunked))
    return df


def _read_with_nanos(spark: SparkSession, paths: list[str], build_reader) -> DataFrame:
    """Nanosecond-timestamp fallback: Spark's parquet reader rejects
    TIMESTAMP(NANOS) (PARQUET_TYPE_ILLEGAL).  Re-read with
    ``spark.sql.legacy.parquet.nanosAsLong`` and rebuild the timestamp
    columns with exact integer ``div 1000`` (micros), identified from the
    parquet footer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    sample = _first_parquet_file(spark, paths)
    ns_cols: list[str] = []
    if sample is not None:
        try:
            footer = pq.read_schema(sample)
            ns_cols = [
                f.name
                for f in footer
                if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
            ]
        except Exception:
            ns_cols = []
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = build_reader().load(paths)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def _convert_nanos_columns(spark: SparkSession, df: DataFrame, paths: list[str]) -> DataFrame:
    """Rebuild timestamp columns that the nanosAsLong conf turned into
    longs (footer says ns, Spark type is long)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    sample = _first_parquet_file(spark, paths)
    if sample is None:
        return df
    try:
        footer = pq.read_schema(sample)
    except Exception:
        return df
    spark_types = {f.name: f.dataType for f in df.schema.fields}
    for f in footer:
        if (
            pa.types.is_timestamp(f.type)
            and f.type.unit == "ns"
            and isinstance(spark_types.get(f.name), T.LongType)
        ):
            df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000")))
    return df


def _first_parquet_file(spark: SparkSession, paths: list[str]) -> str | None:
    """A local sample file for footer inspection (None if not local)."""
    from aws_sdk_pandas_spark.sources import fs as _fs

    for p in paths:
        candidates = [p] if p.endswith(".parquet") and _fs._is_file(spark, p) else _fs.list_objects(
            spark, p, suffix=".parquet"
        )
        for c in candidates:
            local = c.removeprefix("file:")
            if local.startswith("/"):
                return local
    return None


def read_parquet_table(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    *,
    columns: list[str] | None = None,
    partition_filter: PartitionFilter | None = None,
) -> DataFrame:
    """Scan by catalog table name (reference: s3/_read_parquet.py:591 —
    resolves location+partitions from Glue; here ``spark.table`` resolves
    through the session catalog)."""
    qualified = f"{database}.{table}" if database else table
    df = spark.table(qualified)
    if partition_filter is not None:
        # evaluate the callable against the table's partition values
        from pyspark.sql import functions as F

        part_cols = [
            f.name
            for f in spark.catalog.listColumns(table, database)
            if f.isPartition
        ]
        if part_cols:
            tuples = [
                {c: str(r[c]) for c in part_cols}
                for r in df.select(*part_cols).distinct().collect()
            ]
            surviving = [t for t in tuples if partition_filter(t)]
            pred = F.lit(False)
            for t in surviving:
                clause = F.lit(True)
                for c in part_cols:
                    clause = clause & (F.col(c).cast("string") == F.lit(t[c]))
                pred = pred | clause
            df = df.where(pred)
    if columns:
        df = df.select(*columns)
    return df


def to_parquet_table(
    df: DataFrame,
    table: str,
    database: str | None = None,
    *,
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
    bucketing_info: tuple[list[str], int] | None = None,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Catalog-table writer with SPARK-NATIVE bucketing (reference:
    s3/_write_parquet.py ``to_parquet(table=..., bucketing_info=...)``
    + catalog registration).

    The dataset writer reproduces the reference's Hive-hash FILE layout
    (sources/_write.py:97); this writer instead registers bucket
    metadata in the session catalog via ``bucketBy``, which is the
    100 TB co-location path: joining two tables bucketed on the join key
    with the same bucket count needs NO Exchange at all — Catalyst
    proves the partitioning and skips the shuffle (pinned in
    tests/test_plan_quality.py).  Data is pre-repartitioned onto the
    bucket columns so each bucket lands as one file per partition
    rather than n_buckets files per task."""
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    out = df
    writer_df = out
    if bucketing_info:
        bucket_cols, n_buckets = bucketing_info
        if not bucket_cols or n_buckets < 1:
            raise InvalidArgument("bucketing_info must be (non-empty cols, n>=1)")
        writer_df = out.repartition(n_buckets, *bucket_cols)
    writer = writer_df.write.format("parquet").mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if bucketing_info:
        bucket_cols, n_buckets = bucketing_info
        writer = writer.bucketBy(n_buckets, *bucket_cols).sortBy(
            *(sort_cols or bucket_cols)
        )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(qualified)


def read_parquet_metadata(
    spark: SparkSession,
    path: str | list[str],
    *,
    dataset: bool = False,
) -> tuple[dict[str, str], dict[str, str] | None]:
    """Infer (columns_types, partitions_types) as Athena-style type strings
    (reference: s3/_read_parquet.py:765).  Footer-only — Spark resolves the
    schema without scanning data."""
    df = read_parquet(spark, path, dataset=dataset)
    partitions: dict[str, str] = {}
    columns: dict[str, str] = {}
    part_names: set[str] = set()
    if dataset and isinstance(path, str):
        from aws_sdk_pandas_spark.sources.layout import discover_partitions

        for vals in discover_partitions(spark, path).values():
            part_names.update(vals.keys())
    for field in df.schema.fields:
        target = partitions if field.name in part_names else columns
        target[field.name] = _types.spark2athena(field.dataType)
    return columns, (partitions or None) if dataset else None


def to_parquet(
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
    database: str | None = None,
    table: str | None = None,
    files_per_partition: int = 1,
) -> dict[str, Any]:
    """Write a DataFrame as parquet file(s)/dataset
    (reference: awswrangler/s3/_write_parquet.py:340).

    Modes append/overwrite/overwrite_partitions per the reference
    (s3/_write_dataset.py); catalog registration when ``table`` given.
    """
    result = write_dataset(
        df,
        path,
        "parquet",
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
    if table:
        from aws_sdk_pandas_spark import catalog as _catalog

        _catalog.create_parquet_table(
            df.sparkSession,
            database=database,
            table=table,
            path=path,
            partitions_types=None if not partition_cols else {c: "string" for c in partition_cols},
            columns_types=None,
            exist_ok=True,
        )
    return result
