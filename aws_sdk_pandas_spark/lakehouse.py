"""Lakehouse table formats (reference: awswrangler/s3/_write_deltalake.py
``to_deltalake``/``to_deltalake_streaming``, s3/_read_deltalake.py:38
``read_deltalake``, athena/_write_iceberg.py:411 ``to_iceberg``,
s3/_s3_tables_iceberg.py:29,160).

Delta/Iceberg need their runtime jars on the Spark classpath (delta-spark
/ iceberg-spark-runtime).  When the probe finds them, every entry point
here is a plain native Spark write/read.  When they are absent (as in
this container), the entry points FALL BACK to ``lakehouse_shim`` — an
in-repo versioned parquet+manifest format with file-level copy-on-write
— so append/overwrite/time-travel/MERGE/DELETE semantics are executable
and tested rather than a classpath-probe error branch.  Pass
``require_native=True`` (or set ``lakehouse.ALLOW_SHIM = False``) to get
the old raise-if-no-jar behavior.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_PROBED: dict[str, bool] = {}


def _format_available(spark: SparkSession, fmt: str) -> bool:
    if fmt in _PROBED:
        return _PROBED[fmt]
    cls = {
        "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
        "iceberg": "org.apache.iceberg.spark.SparkCatalog",
    }[fmt]
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)
        ok = True
    except Exception:
        ok = False
    _PROBED[fmt] = ok
    return ok


# module knob: set False to forbid the shim fallback globally
ALLOW_SHIM = True


def _require(spark: SparkSession, fmt: str) -> None:
    if not _format_available(spark, fmt):
        jar = "delta-spark" if fmt == "delta" else "iceberg-spark-runtime"
        raise InvalidArgument(
            f"{fmt} support requires the {jar} package on the Spark classpath "
            f"(spark.jars.packages); not present in this environment"
        )


def _use_native(spark: SparkSession, fmt: str, require_native: bool) -> bool:
    """True -> native jar path; False -> lakehouse_shim fallback.
    Raises (the old behavior) when the jar is missing and the shim is
    disallowed."""
    if _format_available(spark, fmt):
        return True
    if require_native or not ALLOW_SHIM:
        _require(spark, fmt)
    return False


def _iceberg_table_path(spark: SparkSession, table: str) -> str:
    """Map a catalog table name to a shim directory under the warehouse
    (the shim has no catalog; dots become path segments)."""
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        import urllib.parse

        wh = urllib.parse.urlparse(wh).path
    return os.path.join(wh, "_lakelite_tables", *table.split("."))


def to_deltalake(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_cols: list[str] | None = None,
    schema_mode: str | None = None,
    options: dict[str, Any] | None = None,
    require_native: bool = False,
) -> None:
    """reference: s3/_write_deltalake.py:51 — modes error/append/overwrite/
    ignore; ``schema_mode='overwrite'`` -> overwriteSchema.  Shim fallback
    (no delta jar): lakehouse_shim.write, same mode/schema_mode contract."""
    if not _use_native(df.sparkSession, "delta", require_native):
        from aws_sdk_pandas_spark import lakehouse_shim

        lakehouse_shim.write(
            df, path, mode=mode, partition_cols=partition_cols, schema_mode=schema_mode
        )
        return
    spark_mode = {"error": "errorifexists", "ignore": "ignore"}.get(mode, mode)
    writer = df.write.format("delta").mode(spark_mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if schema_mode == "overwrite":
        writer = writer.option("overwriteSchema", "true")
    elif schema_mode == "merge":
        writer = writer.option("mergeSchema", "true")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)


def read_deltalake(
    spark: SparkSession,
    path: str,
    *,
    version: int | None = None,
    columns: list[str] | None = None,
    require_native: bool = False,
) -> DataFrame:
    """reference: s3/_read_deltalake.py:38 — ``version`` = time travel.

    Without the delta jar, a ``_delta_log/`` on disk is preferred (the
    jar-free replay reader handles tables written HERE by the lakelite
    exporter AND tables written elsewhere by delta-rs / Delta Spark);
    lakelite manifests are the fallback for pre-export tables."""
    if not _use_native(spark, "delta", require_native):
        from aws_sdk_pandas_spark import delta_log, lakehouse_shim

        if delta_log.has_delta_log(path):
            return delta_log.read_delta_log(
                spark, path, version=version, columns=columns
            )
        return lakehouse_shim.read(spark, path, version=version, columns=columns)
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", str(version))
    df = reader.load(path)
    return df.select(*columns) if columns else df


def convert_to_delta(path: str) -> int:
    """Backfill a protocol-valid Delta transaction log for an existing
    lakelite table (tables written from this round on carry one
    automatically) — the ``deltalake.convert_to_deltalake`` analog,
    jar-free.  Returns the number of commit files written.  After this,
    the table is readable by delta-rs / Delta Spark AND by
    :func:`read_deltalake`'s log-replay path."""
    from aws_sdk_pandas_spark import delta_log

    return delta_log.export_table(path)


def convert_to_iceberg(path: str) -> int:
    """Backfill spec-valid Iceberg v2 metadata (metadata.json + Avro
    manifests, jar-free) for an existing lakelite table — the
    ``add_files``/migrate analog of :func:`convert_to_delta`.  Returns
    the number of snapshots written.  After this, every subsequent
    lakelite commit keeps the Iceberg metadata current (sticky sidecar)
    and :func:`read_iceberg` reads through it.

    There is deliberately no ``convert_FROM_iceberg`` adoption
    counterpart to :func:`delta_log.convert_from_delta`: foreign Delta
    tables are path-addressed (continuing their ``_delta_log`` chain in
    place is the correct contract, and this repo does), but foreign
    Iceberg tables are CATALOG-managed — their current-metadata pointer
    lives in the catalog, not the directory, so directory-level
    adoption either orphans the catalog's view or silently races it.
    Foreign Iceberg tables are fully READABLE
    (:func:`iceberg_meta.read_iceberg_meta` walks metadata.json ->
    manifest lists -> manifests, incl. v2 positional and equality
    deletes); migrating one to lakelite ownership is an explicit
    read + write, not an in-place adoption."""
    from aws_sdk_pandas_spark import iceberg_meta

    return iceberg_meta.export_table(path)


def to_deltalake_streaming(
    batches: Iterator[DataFrame],
    path: str,
    *,
    partition_cols: list[str] | None = None,
) -> None:
    """reference: s3/_write_deltalake.py:182 — iterator of DataFrames as
    micro-batch appends (Structured Streaming's foreachBatch contract)."""
    first = True
    for batch in batches:
        to_deltalake(
            batch, path,
            mode="overwrite" if first else "append",
            partition_cols=partition_cols,
        )
        first = False


def to_iceberg(
    df: DataFrame,
    table: str,
    *,
    mode: str = "append",
    merge_cols: list[str] | None = None,
    merge_condition: str = "update",
    merge_match_nulls: bool = False,
    precombine_key: str | None = None,
    require_native: bool = False,
) -> None:
    """reference: athena/_write_iceberg.py:411 — append / overwrite /
    MERGE INTO when ``merge_cols`` given (null-safe via <=>).  Shim
    fallback (no iceberg jar): the table name maps to a warehouse
    directory and lakehouse_shim.merge runs the same matched/unmatched
    contract with file-level copy-on-write."""
    spark = df.sparkSession
    if not _use_native(spark, "iceberg", require_native):
        from aws_sdk_pandas_spark import iceberg_meta, lakehouse_shim

        path = _iceberg_table_path(spark, table)
        if merge_cols:
            # shim.merge handles the not-yet-existing table itself (and
            # still applies the precombine dedup on first write)
            lakehouse_shim.merge(
                spark, df, path, merge_cols,
                merge_condition=merge_condition,
                match_nulls=merge_match_nulls,
                precombine_key=precombine_key,
            )
        else:
            lakehouse_shim.write(df, path, mode=mode)
        # an "Iceberg" table should carry real Iceberg metadata: backfill
        # any unexported snapshots (idempotent; later commits stay
        # exported via the shim's sticky sidecar)
        iceberg_meta.export_table(path)
        return
    if merge_cols:
        from aws_sdk_pandas_spark.operators.merge import merge_upsert

        merge_upsert(
            df.sparkSession, df, table, merge_cols,
            merge_condition=merge_condition, merge_match_nulls=merge_match_nulls,
            precombine_key=precombine_key,
        )
        return
    if mode == "append":
        df.writeTo(table).append()
    elif mode == "overwrite":
        df.writeTo(table).createOrReplace()
    elif mode == "overwrite_partitions":
        df.writeTo(table).overwritePartitions()
    else:
        raise InvalidArgument(f"unsupported iceberg mode {mode!r}")


def read_iceberg(
    spark: SparkSession,
    table: str,
    *,
    columns: list[str] | None = None,
    row_filter: str | None = None,
    snapshot_id: int | None = None,
    limit: int | None = None,
    require_native: bool = False,
) -> DataFrame:
    """reference: s3/_s3_tables_iceberg.py:29 ``from_iceberg`` — catalog
    scan with column pruning, row filter, snapshot pin and limit (all
    pushed into the Iceberg scan by Catalyst).  Shim fallback: reads
    through the table's REAL Iceberg metadata when present (jar-free
    manifest reader — tables written here carry it, and tables written
    elsewhere with v1/v2 data scans work too); ``snapshot_id`` accepts a
    real Iceberg snapshot-id or, back-compat, a small lakelite version
    index.  Lakelite manifests are the fallback for pre-export tables."""
    if not _use_native(spark, "iceberg", require_native):
        from aws_sdk_pandas_spark import iceberg_meta, lakehouse_shim

        path = _iceberg_table_path(spark, table)
        if iceberg_meta.has_iceberg_meta(path):
            snap = snapshot_id
            if snap is not None and 0 <= snap < 1_000_000:
                snaps = iceberg_meta._load_metadata(path)["snapshots"]
                if snap >= len(snaps):
                    raise InvalidArgument(
                        f"lakelite version {snap} has no Iceberg snapshot "
                        f"(table has {len(snaps)})"
                    )
                snap = snaps[snap]["snapshot-id"]
            df = iceberg_meta.read_iceberg_meta(spark, path, snapshot_id=snap)
        else:
            df = lakehouse_shim.read(spark, path, version=snapshot_id)
        if row_filter:
            df = df.where(row_filter)
        if columns:
            df = df.select(*columns)
        if limit is not None:
            df = df.limit(limit)
        return df
    if snapshot_id is not None:
        df = spark.read.option("snapshot-id", str(snapshot_id)).table(table)
    else:
        df = spark.table(table)
    if row_filter:
        df = df.where(row_filter)
    if columns:
        df = df.select(*columns)
    if limit is not None:
        df = df.limit(limit)
    return df


# reference naming alias (s3/_s3_tables_iceberg.py ``from_iceberg``)
from_iceberg = read_iceberg


def delete_from_iceberg_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    merge_cols: list[str],
    *,
    require_native: bool = False,
    use_deletion_vectors: bool = False,
) -> None:
    """reference: athena/_write_iceberg.py:715 ``delete_from_iceberg_table``.

    ``use_deletion_vectors=True`` (lakelite path) deletes merge-on-read:
    row-level deletion vectors instead of a copy-on-write rewrite; the
    Iceberg sidecar exports them as v2 positional-delete files — the
    shape Athena row-level DELETE writes."""
    from aws_sdk_pandas_spark.operators.merge import delete_from_table

    if not _use_native(spark, "iceberg", require_native):
        from aws_sdk_pandas_spark import lakehouse_shim

        lakehouse_shim.delete(
            spark, df, _iceberg_table_path(spark, table), merge_cols,
            use_deletion_vectors=use_deletion_vectors,
        )
        return
    delete_from_table(spark, df, table, merge_cols)


# ---------------------------------------------------------------------------
# S3 Tables management (reference: s3/_s3_tables_mgmt.py) — in Spark the
# "table bucket" is a catalog namespace root: bucket -> database prefix,
# namespace -> database, table -> catalog table.
# ---------------------------------------------------------------------------


def create_table_bucket(spark: SparkSession, name: str) -> str:
    """reference: s3/_s3_tables_mgmt.py:14 ``create_table_bucket``.  The
    bucket becomes a database-name prefix; returns its 'ARN' (the prefix
    token used by the other helpers)."""
    return f"tablebucket:{name}"


def _bucket_db(table_bucket_arn: str, namespace: str) -> str:
    bucket = table_bucket_arn.split(":", 1)[1] if ":" in table_bucket_arn else table_bucket_arn
    return f"{bucket}__{namespace}"


def create_namespace(spark: SparkSession, table_bucket_arn: str, namespace: str) -> str:
    """reference: s3/_s3_tables_mgmt.py:44 ``create_namespace`` — a
    database scoped by the bucket prefix."""
    from aws_sdk_pandas_spark import catalog

    db = _bucket_db(table_bucket_arn, namespace)
    catalog.create_database(spark, db, exist_ok=True)
    return db


def create_table(
    spark: SparkSession,
    table_bucket_arn: str,
    namespace: str,
    table_name: str,
    columns_types: dict[str, str],
    *,
    file_format: str = "parquet",
) -> str:
    """reference: s3/_s3_tables_mgmt.py:82 ``create_table`` (format
    'ICEBERG' there; any Spark provider here — iceberg requires the
    runtime jars, see to_iceberg)."""
    from aws_sdk_pandas_spark import catalog

    db = _bucket_db(table_bucket_arn, namespace)
    catalog._create_table(
        spark,
        file_format=file_format,
        database=db,
        table=table_name,
        path=None,
        columns_types=columns_types,
        partitions_types=None,
        exist_ok=False,
    )
    return f"{db}.{table_name}"


def delete_table(
    spark: SparkSession, table_bucket_arn: str, namespace: str, table_name: str
) -> None:
    """reference: s3/_s3_tables_mgmt.py:187 ``delete_table``."""
    db = _bucket_db(table_bucket_arn, namespace)
    spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{table_name}`")


def delete_namespace(spark: SparkSession, table_bucket_arn: str, namespace: str) -> None:
    """reference: s3/_s3_tables_mgmt.py:155 ``delete_namespace``."""
    from aws_sdk_pandas_spark import catalog

    catalog.delete_database(spark, _bucket_db(table_bucket_arn, namespace))


def delete_table_bucket(spark: SparkSession, table_bucket_arn: str) -> None:
    """reference: s3/_s3_tables_mgmt.py:130 ``delete_table_bucket`` —
    drops every namespace database carrying the bucket prefix."""
    bucket = table_bucket_arn.split(":", 1)[1] if ":" in table_bucket_arn else table_bucket_arn
    for db in spark.catalog.listDatabases():
        if db.name.startswith(f"{bucket}__"):
            spark.sql(f"DROP DATABASE IF EXISTS `{db.name}` CASCADE")
