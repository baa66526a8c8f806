"""Object copy / dataset merge (reference: awswrangler/s3/_copy.py:189
``copy_objects``, :75 ``merge_datasets``).

The reference fans out server-side CopyObject calls; here the Hadoop
FileSystem API does the copy (which on s3a:// is the same server-side
copy), so the operators work on any Spark-reachable filesystem.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from aws_sdk_pandas_spark.exceptions import InvalidArgument
from aws_sdk_pandas_spark.sources import fs as _fs


def copy_objects(
    spark: SparkSession,
    paths: list[str],
    source_path: str,
    target_path: str,
    *,
    replace_filenames: dict[str, str] | None = None,
) -> list[str]:
    """Copy each object under ``source_path`` to ``target_path``
    preserving relative keys (reference: s3/_copy.py:189)."""
    def _schemeless(p: str) -> str:
        # listing returns qualified URIs (file:/..., s3a://bucket/...);
        # compare on the scheme-stripped form
        return p.split(":", 1)[1].lstrip("/") if ":" in p.split("/", 1)[0] else p.lstrip("/")

    src_root = source_path.rstrip("/")
    tgt_root = target_path.rstrip("/")
    src_cmp = _schemeless(src_root)
    out: list[str] = []
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for p in paths:
        p_cmp = _schemeless(p)
        if not p_cmp.startswith(src_cmp):
            raise InvalidArgument(f"{p} is not under source_path {source_path}")
        rel = p_cmp[len(src_cmp) :].lstrip("/")
        name = rel.rsplit("/", 1)[-1]
        if replace_filenames and name in replace_filenames:
            rel = (rel.rsplit("/", 1)[0] + "/" if "/" in rel else "") + replace_filenames[name]
        target = f"{tgt_root}/{rel}"
        src = jvm.org.apache.hadoop.fs.Path(p)
        dst = jvm.org.apache.hadoop.fs.Path(target)
        dst_fs = dst.getFileSystem(conf)
        parent = dst.getParent()
        if parent is not None:
            dst_fs.mkdirs(parent)
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            src.getFileSystem(conf), src, dst_fs, dst, False, True, conf
        )
        out.append(target)
    return out


def merge_datasets(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    *,
    mode: str = "append",
) -> list[str]:
    """Merge one dataset prefix into another (reference: s3/_copy.py:75):
    ``append`` copies alongside, ``overwrite`` replaces the target,
    ``overwrite_partitions`` replaces only the partition prefixes present
    in the source."""
    if mode not in ("append", "overwrite", "overwrite_partitions"):
        raise InvalidArgument(f"unsupported mode {mode!r}")
    src_files = [
        f
        for f in _fs.list_objects(spark, source_path, ignore_empty=True)
        if not f.rsplit("/", 1)[-1].startswith(("_", "."))
    ]
    if not src_files:
        return []
    if mode == "overwrite":
        _fs.delete_objects(spark, target_path)
    elif mode == "overwrite_partitions":
        def _schemeless(p: str) -> str:
            return p.split(":", 1)[1].lstrip("/") if ":" in p.split("/", 1)[0] else p.lstrip("/")

        src_cmp = _schemeless(source_path.rstrip("/"))
        tgt_root = target_path.rstrip("/")
        prefixes = {
            _schemeless(f)[len(src_cmp) :].lstrip("/").rsplit("/", 1)[0] for f in src_files
        }
        for prefix in prefixes:
            if prefix:
                _fs.delete_objects(spark, f"{tgt_root}/{prefix}")
    return copy_objects(spark, src_files, source_path, target_path)
