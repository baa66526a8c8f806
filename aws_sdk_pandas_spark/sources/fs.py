"""Filesystem helpers over the Hadoop FileSystem API.

The reference implements listing/delete/describe against the S3 API
(awswrangler/s3/_list.py, _delete.py, _describe.py).  Going through
Hadoop's FileSystem via the JVM gateway gives the same operations on
file://, hdfs:// and s3a:// uniformly — and it is the *same* file index
Spark's readers use, so listing semantics match scan semantics.
"""

from __future__ import annotations

import fnmatch
from typing import Any

from pyspark.sql import SparkSession


def _jvm_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hadoop_conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hadoop_conf), jpath, jvm


def _glob_status(spark: SparkSession, path: str):
    fs, jpath, jvm = _jvm_fs(spark, path)
    statuses = fs.globStatus(jpath)
    return list(statuses) if statuses is not None else []


def _recursive_files(spark: SparkSession, root: str) -> list[Any]:
    """All file statuses under ``root`` (recursive)."""
    fs, jpath, _ = _jvm_fs(spark, root)
    if not fs.exists(jpath):
        return []
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        out.append(it.next())
    return out


def list_objects(
    spark: SparkSession,
    path: str,
    suffix: str | list[str] | None = None,
    ignore_suffix: str | list[str] | None = None,
    ignore_empty: bool = False,
    last_modified_begin: Any = None,
    last_modified_end: Any = None,
) -> list[str]:
    """List file paths under a prefix/glob with the reference's pruning
    options (awswrangler/s3/_list.py:98-180,313)."""
    if any(ch in path for ch in "*?["):
        statuses = []
        for st in _glob_status(spark, path):
            if st.isDirectory():
                statuses.extend(_recursive_files(spark, st.getPath().toString()))
            else:
                statuses.append(st)
    else:
        statuses = _recursive_files(spark, path)

    suffixes = [suffix] if isinstance(suffix, str) else suffix
    ignores = [ignore_suffix] if isinstance(ignore_suffix, str) else ignore_suffix
    paths: list[str] = []
    for st in statuses:
        p = st.getPath().toString()
        if suffixes and not any(p.endswith(s) for s in suffixes):
            continue
        if ignores and any(p.endswith(s) for s in ignores):
            continue
        if ignore_empty and st.getLen() == 0:
            continue
        mtime = st.getModificationTime()  # epoch millis
        if last_modified_begin is not None and mtime < _to_millis(last_modified_begin):
            continue
        if last_modified_end is not None and mtime > _to_millis(last_modified_end):
            continue
        paths.append(p)
    return sorted(paths)


def _to_millis(value: Any) -> int:
    import datetime as dt

    if isinstance(value, (int, float)):
        return int(value)
    if isinstance(value, dt.datetime):
        return int(value.timestamp() * 1000)
    raise TypeError(f"unsupported last_modified bound: {value!r}")


def list_directories(spark: SparkSession, path: str) -> list[str]:
    """Immediate child directories (awswrangler/s3/_list.py:252)."""
    fs, jpath, _ = _jvm_fs(spark, path.rstrip("/"))
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().toString() + "/"
        for st in fs.listStatus(jpath)
        if st.isDirectory()
    )


def does_object_exist(spark: SparkSession, path: str) -> bool:
    """(awswrangler/s3/_list.py:184)"""
    fs, jpath, _ = _jvm_fs(spark, path)
    return bool(fs.exists(jpath))


def delete_objects(spark: SparkSession, path: str | list[str]) -> None:
    """Delete files/prefixes (awswrangler/s3/_delete.py:69 — batched there,
    a recursive FS delete here)."""
    paths = [path] if isinstance(path, str) else path
    for p in paths:
        fs, jpath, _ = _jvm_fs(spark, p)
        if any(ch in p for ch in "*?["):
            for st in _glob_status(spark, p):
                fs.delete(st.getPath(), True)
        elif fs.exists(jpath):
            fs.delete(jpath, True)


def describe_objects(spark: SparkSession, path: str | list[str]) -> dict[str, dict[str, Any]]:
    """Per-file metadata (awswrangler/s3/_describe.py:52)."""
    paths = [path] if isinstance(path, str) else path
    out: dict[str, dict[str, Any]] = {}
    for p in paths:
        for f in list_objects(spark, p) if not _is_file(spark, p) else [p]:
            fs, jpath, _ = _jvm_fs(spark, f)
            st = fs.getFileStatus(jpath)
            out[f] = {
                "ContentLength": st.getLen(),
                "LastModified": st.getModificationTime(),
                "IsDirectory": st.isDirectory(),
            }
    return out


def size_objects(spark: SparkSession, path: str | list[str]) -> dict[str, int]:
    """(awswrangler/s3/_describe.py:147)"""
    return {k: v["ContentLength"] for k, v in describe_objects(spark, path).items()}


def _is_file(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _jvm_fs(spark, path)
    return fs.exists(jpath) and fs.getFileStatus(jpath).isFile()


def wildcard_filter(paths: list[str], pattern: str) -> list[str]:
    """Unix-wildcard filter, fnmatch semantics (awswrangler/s3/_list.py:174)."""
    return [p for p in paths if fnmatch.fnmatch(p, pattern)]


def wait_objects_exist(
    spark: SparkSession,
    paths: list[str],
    *,
    delay: float = 0.25,
    max_attempts: int = 20,
) -> None:
    """Poll until every path exists (reference: awswrangler/s3/_wait.py:81).
    Local/HDFS listings are strongly consistent so this returns fast; kept
    for API parity with eventually-consistent stores."""
    import time

    for _ in range(max_attempts):
        if all(does_object_exist(spark, p) for p in paths):
            return
        time.sleep(delay)
    missing = [p for p in paths if not does_object_exist(spark, p)]
    raise TimeoutError(f"objects still missing after {max_attempts} attempts: {missing}")


def wait_objects_not_exist(
    spark: SparkSession,
    paths: list[str],
    *,
    delay: float = 0.25,
    max_attempts: int = 20,
) -> None:
    """reference: awswrangler/s3/_wait.py:138."""
    import time

    for _ in range(max_attempts):
        if not any(does_object_exist(spark, p) for p in paths):
            return
        time.sleep(delay)
    present = [p for p in paths if does_object_exist(spark, p)]
    raise TimeoutError(f"objects still present after {max_attempts} attempts: {present}")


def upload(spark: SparkSession, local_file: str, path: str) -> None:
    """reference: awswrangler/s3/_upload.py:15 — raw object transfer from
    a local file into the dataset filesystem (Hadoop FS copyFromLocal,
    so the same call works for s3a://, hdfs://, file://)."""
    fs, jpath, jvm = _jvm_fs(spark, path)
    src = jvm.org.apache.hadoop.fs.Path(f"file://{local_file}")
    fs.copyFromLocalFile(False, True, src, jpath)


def download(spark: SparkSession, path: str, local_file: str) -> None:
    """reference: awswrangler/s3/_download.py:15 — raw object transfer to
    a local file."""
    fs, jpath, jvm = _jvm_fs(spark, path)
    dst = jvm.org.apache.hadoop.fs.Path(f"file://{local_file}")
    fs.copyToLocalFile(False, jpath, dst, True)


def list_buckets(spark: SparkSession, root: str = "file:///") -> list[str]:
    """reference: awswrangler/s3/_list.py:403 ``list_buckets`` — top-level
    containers of the filesystem root (buckets on s3a://, directories on
    file:// and hdfs://)."""
    return list_directories(spark, root)


def get_bucket_region(spark: SparkSession, bucket: str) -> str:
    """reference: s3/_describe.py:206 ``get_bucket_region``.  Against a local /
    HDFS filesystem there is no region; returns the filesystem scheme's
    authority (bucket host) or ``"local"`` — callers that branch on
    region get a stable, truthful token."""
    jvm_fs, jpath, _ = _jvm_fs(spark, bucket if "://" in bucket else f"file:///{bucket}")
    uri = jvm_fs.getUri()
    return uri.getAuthority() or "local"
