"""MySQL connector surface (reference: awswrangler/mysql.py).

The reference's write modes (mysql.py:434,516-560): ``append``,
``overwrite``, ``upsert_replace_into`` (REPLACE INTO — delete+insert on
pk), ``upsert_duplicate_key`` (ON DUPLICATE KEY UPDATE — update matched),
``upsert_distinct`` (insert then rebuild SELECT DISTINCT), ``ignore``
(INSERT IGNORE).  All four upsert flavors collapse onto the core
read-merge-write plan with different conflict policies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.databases import core
from aws_sdk_pandas_spark.exceptions import InvalidArgument

connect = core.connect
read_sql_query = core.read_sql_query
read_sql_table = core.read_sql_table

_MODES = (
    "append",
    "overwrite",
    "upsert_replace_into",
    "upsert_duplicate_key",
    "upsert_distinct",
    "ignore",
)


def to_sql(
    df: DataFrame,
    con: core.ConnectionConfig,
    table: str,
    *,
    mode: str = "append",
    schema: str | None = None,
    keys: list[str] | None = None,
) -> None:
    """reference: mysql.py:440 ``to_sql`` with the six-mode matrix."""
    if mode not in _MODES:
        raise InvalidArgument(f"mode must be one of {_MODES}, got {mode!r}")
    if mode in ("append", "overwrite"):
        core.to_sql(df, con, table, mode=mode, schema=schema)
        return
    spark = df.sparkSession
    if mode == "upsert_distinct":
        # insert-then-SELECT DISTINCT-rebuild (mysql.py:545-560): union +
        # distinct as one plan
        try:
            target = core.read_sql_table(spark, table, con, schema=schema)
            merged = target.select(*df.columns).unionByName(df).distinct()
        except Exception:
            merged = df.distinct()
        merged = merged.localCheckpoint(eager=True)
        core.to_sql(merged, con, table, mode="overwrite", schema=schema)
        return
    if not keys:
        raise InvalidArgument(f"mode={mode!r} requires keys (primary key columns)")
    if mode == "ignore":
        # INSERT IGNORE: existing rows win, new keys inserted
        _keep_target_merge(df, con, table, schema, keys)
        return
    # upsert_replace_into / upsert_duplicate_key: source wins on match
    core.to_sql(df, con, table, mode="upsert", schema=schema, keys=keys)


def _keep_target_merge(
    df: DataFrame, con: core.ConnectionConfig, table: str, schema: str | None, keys: list[str]
) -> None:
    spark = df.sparkSession
    try:
        target = core.read_sql_table(spark, table, con, schema=schema).select(*df.columns)
    except Exception:
        core.to_sql(df, con, table, mode="overwrite", schema=schema)
        return
    new_rows = df.join(target.select(*keys), on=keys, how="left_anti")
    merged = target.unionByName(new_rows).localCheckpoint(eager=True)
    core.to_sql(merged, con, table, mode="overwrite", schema=schema)
