"""Hive-style dataset layout: partition discovery and partition-filter
pushdown.

Reference semantics: a "dataset" is a prefix with ``k=v/`` sub-prefixes
(awswrangler/s3/_write_dataset.py:75-77 writes them,
awswrangler/_arrow.py:18-30 parses them back) and ``partition_filter`` is a
user callable ``dict[str,str] -> bool`` evaluated against the partition
values of each path *before any byte is read*
(awswrangler/s3/_read.py:57-95).

Spark-first design: partition *columns* are discovered natively by the
parquet/orc/csv sources; the callable filter is honored by (1) listing the
partition directory tree (driver-side, metadata-only — the same listing
Spark itself performs), (2) evaluating the callable per partition tuple,
(3) compiling the surviving tuples into a Column predicate on partition
columns so Catalyst still does the actual file pruning.  At 100 TB the
predicate form keeps pruning inside the optimizer instead of enumerating
files by hand.
"""

from __future__ import annotations

import urllib.parse
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.sources.fs import _jvm_fs

PartitionFilter = Callable[[dict[str, str]], bool]


def _parse_partition_segments(rel_path: str) -> dict[str, str]:
    """Parse ``k=v`` segments of a relative path (awswrangler/_arrow.py:18-30)."""
    out: dict[str, str] = {}
    for seg in rel_path.split("/"):
        if "=" in seg:
            k, _, v = seg.partition("=")
            out[k] = urllib.parse.unquote(v)
    return out


def discover_partitions(spark: SparkSession, path: str) -> dict[str, dict[str, str]]:
    """Walk the dataset root and return ``{partition_prefix: {k: v}}``.

    Directory-only traversal (no file stats) — equivalent cost to the
    listing Spark's InMemoryFileIndex does anyway.
    """
    root = path.rstrip("/")
    fs, jroot, _ = _jvm_fs(spark, root)
    if not fs.exists(jroot):
        return {}
    root_str = jroot.toString()
    results: dict[str, dict[str, str]] = {}
    stack = [jroot]
    while stack:
        current = stack.pop()
        children = [st for st in fs.listStatus(current) if st.isDirectory()]
        part_children = [
            st for st in children if "=" in st.getPath().getName()
        ]
        if not part_children and current.toString() != root_str:
            rel = current.toString()[len(root_str) :].strip("/")
            values = _parse_partition_segments(rel)
            if values:
                results[current.toString() + "/"] = values
        stack.extend(st.getPath() for st in part_children)
    return results


def compile_partition_filter(
    partitions: dict[str, dict[str, str]],
    partition_filter: PartitionFilter,
) -> tuple[Column | None, list[str]]:
    """Evaluate the callable per partition tuple and compile survivors into
    a Column predicate (None if nothing survives → caller returns empty)."""
    surviving = [vals for vals in partitions.values() if partition_filter(vals)]
    if not surviving:
        return None, []
    keys = list(surviving[0].keys())
    # one OR-of-ANDs predicate over partition columns; partition values are
    # strings at the layout level (reference reads them back as
    # dictionary-encoded strings, awswrangler/_arrow.py:39-49) but Spark
    # infers typed partition columns — compare on the string form.
    pred = None
    for vals in surviving:
        clause = None
        for k in keys:
            c = F.col(k).cast("string") == F.lit(vals[k])
            clause = c if clause is None else (clause & c)
        pred = clause if pred is None else (pred | clause)
    return pred, keys


def apply_partition_filter(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_filter: PartitionFilter | None,
) -> DataFrame:
    """Apply a callable partition filter to a dataset-read DataFrame as a
    Catalyst predicate on partition columns."""
    if partition_filter is None:
        return df
    partitions = discover_partitions(spark, path)
    if not partitions:
        return df
    pred, keys = compile_partition_filter(partitions, partition_filter)
    if pred is None:
        # nothing survives: empty frame with same schema
        return df.where(F.lit(False))
    return df.where(pred)


def partition_prefix(partition_cols: list[str], values: list[str]) -> str:
    """Build the ``k=v/`` prefix (awswrangler/s3/_write_dataset.py:75-77)."""
    return "/".join(f"{k}={urllib.parse.quote(str(v), safe='')}" for k, v in zip(partition_cols, values)) + "/"
