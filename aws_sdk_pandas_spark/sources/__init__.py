"""Dataset-oriented readers and writers (the reference's ``wr.s3`` surface,
re-expressed over Spark's file sources + Hadoop FS so the same code runs on
local paths, HDFS, or s3a:// at cluster scale)."""

from __future__ import annotations

from aws_sdk_pandas_spark.sources.fs import (
    delete_objects,
    describe_objects,
    does_object_exist,
    download,
    get_bucket_region,
    list_buckets,
    list_directories,
    list_objects,
    size_objects,
    upload,
    wait_objects_exist,
    wait_objects_not_exist,
)
from aws_sdk_pandas_spark.sources.layout import (
    apply_partition_filter,
    discover_partitions,
)
from aws_sdk_pandas_spark.sources.copy import copy_objects, merge_datasets
from aws_sdk_pandas_spark.sources.avro import read_avro, to_avro
from aws_sdk_pandas_spark.sources.excel import read_excel, to_excel
from aws_sdk_pandas_spark.sources.megatron import read_megatron, to_megatron
from aws_sdk_pandas_spark.sources.webdataset import read_webdataset, to_webdataset
from aws_sdk_pandas_spark.sources.orc import (
    read_orc,
    read_orc_metadata,
    read_orc_table,
    to_orc,
)
from aws_sdk_pandas_spark.sources.select import select_query
from aws_sdk_pandas_spark.sources.parquet import (
    read_parquet,
    read_parquet_metadata,
    read_parquet_table,
    to_parquet,
    to_parquet_table,
)
from aws_sdk_pandas_spark.sources.stats import (
    collect_file_stats,
    prune_files,
    read_parquet_pruned,
)
from aws_sdk_pandas_spark.sources.text import (
    read_csv,
    read_fwf,
    read_json,
    to_csv,
    to_json,
)

__all__ = [
    "apply_partition_filter",
    "collect_file_stats",
    "download",
    "get_bucket_region",
    "list_buckets",
    "read_orc_table",
    "upload",
    "prune_files",
    "read_parquet_pruned",
    "copy_objects",
    "merge_datasets",
    "read_avro",
    "to_avro",
    "read_excel",
    "read_megatron",
    "read_webdataset",
    "to_megatron",
    "to_webdataset",
    "select_query",
    "to_excel",
    "wait_objects_exist",
    "wait_objects_not_exist",
    "delete_objects",
    "describe_objects",
    "discover_partitions",
    "does_object_exist",
    "list_directories",
    "list_objects",
    "read_csv",
    "read_fwf",
    "read_json",
    "read_orc",
    "read_orc_metadata",
    "read_parquet",
    "read_parquet_metadata",
    "read_parquet_table",
    "size_objects",
    "to_csv",
    "to_json",
    "to_orc",
    "to_parquet",
    "to_parquet_table",
]

from aws_sdk_pandas_spark.catalog import store_parquet_metadata  # noqa: E402  (reference: wr.s3.store_parquet_metadata)
