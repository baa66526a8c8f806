"""Redshift connector surface (reference: awswrangler/redshift/).

- ``copy``:   the reference stages parquet on S3 then issues server-side
  ``COPY`` (redshift/_write.py:544).  Spark-first: a parquet dataset
  staging write + JDBC load — here expressed as stage-to-path then
  ``to_sql`` of the staged scan (the S3->warehouse hop is the engine's
  parallel JDBC write).
- ``unload``: server-side ``UNLOAD ... TO s3 FORMAT PARQUET``
  (redshift/_read.py:392) -> read via JDBC then parquet dataset write.
- ``to_sql`` upsert: DELETE USING staging ON pk + INSERT SELECT with
  optional ``precombine_key`` greatest-version dedup
  (redshift/_utils.py:173-211) -> core upsert merge with precombine.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.databases import core
from aws_sdk_pandas_spark.exceptions import InvalidArgument

connect = core.connect
read_sql_query = core.read_sql_query
read_sql_table = core.read_sql_table

_MODES = ("append", "overwrite", "upsert")


def to_sql(
    df: DataFrame,
    con: core.ConnectionConfig,
    table: str,
    *,
    mode: str = "append",
    schema: str | None = None,
    keys: list[str] | None = None,
    precombine_key: str | None = None,
) -> None:
    """reference: redshift/_write.py:94."""
    if mode not in _MODES:
        raise InvalidArgument(f"mode must be one of {_MODES}, got {mode!r}")
    if mode == "upsert":
        if not keys:
            raise InvalidArgument("mode='upsert' requires keys (primary_keys)")
        core.to_sql(
            df, con, table, mode="upsert", schema=schema, keys=keys,
            precombine_key=precombine_key,
        )
    else:
        core.to_sql(df, con, table, mode=mode, schema=schema)


def copy(
    df: DataFrame,
    path: str,
    con: core.ConnectionConfig,
    table: str,
    *,
    schema: str | None = None,
    mode: str = "append",
    keys: list[str] | None = None,
    precombine_key: str | None = None,
) -> None:
    """Stage as parquet dataset then load (reference: redshift/_write.py:544
    ``copy`` = to_parquet + COPY; the staged files survive as an audit
    trail exactly like the reference's S3 staging prefix)."""
    from aws_sdk_pandas_spark.sources import read_parquet, to_parquet

    to_parquet(df, path, dataset=True, mode="overwrite")
    staged = read_parquet(df.sparkSession, path, dataset=True)
    to_sql(
        staged, con, table, schema=schema, mode=mode, keys=keys,
        precombine_key=precombine_key,
    )


def unload(
    spark: SparkSession,
    sql: str,
    path: str,
    con: core.ConnectionConfig,
    *,
    partition_cols: list[str] | None = None,
    max_file_size_rows: int = 0,
    **read_kwargs: Any,
) -> DataFrame:
    """reference: redshift/_read.py:392 ``unload`` — run SQL, land parquet
    at ``path``, return the scan of the landed data."""
    from aws_sdk_pandas_spark.sources import read_parquet

    unload_to_files(
        spark, sql, path, con,
        partition_cols=partition_cols,
        max_file_size_rows=max_file_size_rows,
        **read_kwargs,
    )
    return read_parquet(spark, path, dataset=True)


def unload_to_files(
    spark: SparkSession,
    sql: str,
    path: str,
    con: core.ConnectionConfig,
    *,
    partition_cols: list[str] | None = None,
    max_file_size_rows: int = 0,
    **read_kwargs: Any,
) -> None:
    """reference: redshift/_read.py:230 ``unload_to_files`` — land the
    query result as parquet files WITHOUT reading them back."""
    from aws_sdk_pandas_spark.sources import to_parquet

    df = core.read_sql_query(spark, sql, con, **read_kwargs)
    to_parquet(
        df, path, dataset=True, mode="overwrite",
        partition_cols=partition_cols, max_rows_by_file=max_file_size_rows,
    )


def copy_from_files(
    spark: SparkSession,
    path: str,
    con: core.ConnectionConfig,
    table: str,
    *,
    schema: str | None = None,
    mode: str = "append",
    keys: list[str] | None = None,
    precombine_key: str | None = None,
) -> None:
    """reference: redshift/_write.py:278 ``copy_from_files`` — load an
    already-staged parquet dataset into the target table (the second half
    of ``copy``, for files staged by another job)."""
    from aws_sdk_pandas_spark.sources import read_parquet

    staged = read_parquet(spark, path, dataset=True)
    to_sql(
        staged, con, table, schema=schema, mode=mode, keys=keys,
        precombine_key=precombine_key,
    )


def connect_temp(
    url: str,
    user: str,
    *,
    duration_seconds: int = 900,
    auto_create: bool = False,
    db_groups: list[str] | None = None,
    **properties: Any,
) -> core.ConnectionConfig:
    """reference: redshift/_connect.py:141 ``connect_temp`` — GetClusterCredentials
    issues a short-lived password for ``user``.  Without the service there
    is no credential issuer: the descriptor carries the user plus the
    requested-credential metadata so a cluster-side deployment can swap in
    the issued secret; execution paths treat it exactly like connect()."""
    props = {k: str(v) for k, v in properties.items()}
    props["asps.temp_credentials"] = "true"
    props["asps.temp_duration_seconds"] = str(duration_seconds)
    if auto_create:
        props["asps.temp_auto_create"] = "true"
    if db_groups:
        props["asps.temp_db_groups"] = ",".join(db_groups)
    return core.ConnectionConfig(url=url, user=user, properties=props)
