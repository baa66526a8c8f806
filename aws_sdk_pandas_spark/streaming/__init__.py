"""Structured Streaming over the dataset layout.

The reference has no streaming operators (SURVEY §2.8) — its closest
artifact is ``to_deltalake_streaming`` (micro-batch writes from an
iterator of DataFrames, awswrangler/s3/_write_deltalake.py:182) and the
``chunked=`` iterators.  Structured Streaming is the additive capability:
``read_stream`` over the same partition layout, ``write_stream`` via
``foreachBatch`` into the same dataset writers, plus watermarked windowed
aggregation helpers.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream(
    spark: SparkSession,
    path: str,
    file_format: str = "parquet",
    *,
    schema: Any = None,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    """``readStream`` over a dataset prefix.  File sources require a
    schema; infer it from the existing data when not supplied."""
    if schema is None:
        schema = spark.read.format(file_format).load(path).schema
    reader = spark.readStream.format(file_format).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_stream_dataset(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    *,
    checkpoint: str,
    mode: str = "append",
    partition_cols: list[str] | None = None,
    trigger_once: bool = True,
):
    """Micro-batch the stream into the dataset writers via ``foreachBatch``
    (the Spark-native ``to_deltalake_streaming``)."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        write_dataset(
            batch_df,
            path,
            file_format,
            mode="append" if mode == "append" else mode,
            partition_cols=partition_cols,
        )

    writer = df.writeStream.foreachBatch(_sink).option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    df: DataFrame,
    *,
    time_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window counts — the canonical
    late-data-tolerant streaming aggregate."""
    w = (
        F.window(F.col(time_col), window_duration, slide)
        if slide
        else F.window(F.col(time_col), window_duration)
    )
    keys = [w] + [F.col(c) for c in (group_cols or [])]
    return df.withWatermark(time_col, watermark).groupBy(*keys).agg(F.count("*").alias("n"))


def run_batch_as_stream(
    spark: SparkSession,
    path: str,
    transform: Callable[[DataFrame], DataFrame],
    out_path: str,
    checkpoint: str,
    file_format: str = "parquet",
) -> None:
    """Replay existing files through a streaming query once
    (``availableNow``) — used by tests to validate streaming parity with
    batch semantics."""
    stream = read_stream(spark, path, file_format)
    query = (
        transform(stream)
        .writeStream.format(file_format)
        .outputMode("append")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
