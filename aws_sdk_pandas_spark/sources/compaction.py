"""Small-file compaction for dataset prefixes.

The many-small-files problem is the canonical 100 TB operational task (the
reference benchmarks exactly this pathology: 10,000 one-row parquet
objects, tests/load/test_s3.py:66-97, and works around it with a
``bulk_read`` fast path).  Spark-first the durable fix is to rewrite the
prefix into ~``target_file_bytes`` files: size the rewrite from the *file
listing* (driver metadata only — no data read), then let AQE coalesce the
shuffle-free pass-through plan into the computed file count.

Partitioned datasets are compacted per partition (each ``k=v`` leaf is
sized and rewritten independently, preserving the layout), so one oversized
partition cannot force a global shuffle of the whole dataset.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from aws_sdk_pandas_spark.sources.fs import _jvm_fs, _recursive_files
from aws_sdk_pandas_spark.sources.layout import discover_partitions

_DATA_SUFFIXES = (".parquet", ".orc", ".snappy.parquet", ".zstd.parquet")


def _leaf_stats(spark: SparkSession, prefix: str) -> tuple[int, int]:
    """(file_count, total_bytes) of data files directly under ``prefix``."""
    files = [
        st
        for st in _recursive_files(spark, prefix)
        if not st.getPath().getName().startswith(("_", "."))
    ]
    return len(files), sum(st.getLen() for st in files)


def compact_dataset(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict[str, dict[str, int]]:
    """Rewrite every leaf of a (possibly partitioned) dataset into
    ``ceil(bytes / target_file_bytes)`` files.

    Returns ``{leaf_prefix: {"files_before": n, "files_after": m,
    "bytes": b}}`` for the leaves that were rewritten.  Leaves already at
    or below the target file count are left untouched (no read, no write).

    The rewrite stages into ``<leaf>/__compact_tmp`` and swaps only after
    a successful write, so a failed job never leaves a partial leaf.
    """
    root = path.rstrip("/")
    partitions = discover_partitions(spark, root)
    leaves = list(partitions) if partitions else [root + "/"]

    report: dict[str, dict[str, int]] = {}
    for leaf in leaves:
        n_files, n_bytes = _leaf_stats(spark, leaf)
        target = max(1, -(-n_bytes // target_file_bytes))
        if n_files < min_files_to_compact or n_files <= target:
            continue
        df = spark.read.format(fmt).load(leaf)
        tmp = leaf.rstrip("/") + "__compact_tmp"
        # coalesce, not repartition: a narrow (shuffle-free) rewrite — each
        # output task streams several input files; fine because target
        # counts derive from byte sizes, so tasks stay ~target_file_bytes
        df.coalesce(target).write.mode("overwrite").format(fmt).save(tmp)

        fs, jleaf, _ = _jvm_fs(spark, leaf.rstrip("/"))
        _, jtmp, _ = _jvm_fs(spark, tmp)
        fs.delete(jleaf, True)
        fs.rename(jtmp, jleaf)
        after, _ = _leaf_stats(spark, leaf)
        report[leaf] = {
            "files_before": n_files,
            "files_after": after,
            "bytes": n_bytes,
        }
    return report
