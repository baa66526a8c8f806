"""PostgreSQL connector surface (reference: awswrangler/postgresql.py).

Modes (postgresql.py:508,597): append/overwrite/upsert (``INSERT ... ON
CONFLICT DO UPDATE`` -> source-wins merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
) -> None:
    """reference: postgresql.py:508 ``to_sql``."""
    if mode not in _MODES:
        raise InvalidArgument(f"mode must be one of {_MODES}, got {mode!r}")
    if mode == "upsert":
        if not keys:
            raise InvalidArgument("mode='upsert' requires keys")
        core.to_sql(df, con, table, mode="upsert", schema=schema, keys=keys)
    else:
        core.to_sql(df, con, table, mode=mode, schema=schema)
