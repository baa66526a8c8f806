"""Data API for RDS (reference: awswrangler/data_api/rds.py:234
``connect``, :259 ``read_sql_query``, :417 ``to_sql``)."""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.databases import core
from aws_sdk_pandas_spark.exceptions import InvalidArgument

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def connect(
    resource_arn: str,
    database: str,
    secret_arn: str = "",
    boto3_session: Any = None,
    **kwargs: Any,
) -> core.ConnectionConfig:
    """reference: data_api/rds.py:234 — a ``jdbc:`` resource_arn connects
    directly; any other ARN maps deterministically to an embedded
    in-memory Derby database so the connection is REAL.  ``secret_arn``/
    ``boto3_session`` accepted for call-site parity."""
    if resource_arn.startswith("jdbc:"):
        return core.connect(resource_arn, **kwargs)
    slug = re.sub(r"\W+", "_", f"{resource_arn}_{database}")[-120:]
    kwargs.setdefault("driver", _DERBY_DRIVER)
    return core.connect(f"jdbc:derby:memory:{slug};create=true", **kwargs)


def _render_typed_param(value: dict[str, Any]) -> str:
    """Data-API typed value dict -> SQL literal."""
    if value.get("isNull"):
        return "NULL"
    if "stringValue" in value:
        return "'" + str(value["stringValue"]).replace("'", "''") + "'"
    if "longValue" in value:
        return str(int(value["longValue"]))
    if "doubleValue" in value:
        return repr(float(value["doubleValue"]))
    if "booleanValue" in value:
        return "TRUE" if value["booleanValue"] else "FALSE"
    raise InvalidArgument(f"unsupported Data API value dict {value!r}")


def _substitute(sql: str, parameters: list[dict[str, Any]] | None) -> str:
    """``:name`` substitution with the Data-API typed-parameter dialect
    (reference: data_api/rds.py:259 examples)."""
    if not parameters:
        return sql
    out = sql
    for p in sorted(parameters, key=lambda p: len(p["name"]), reverse=True):
        out = re.sub(
            rf":{re.escape(p['name'])}\b", _render_typed_param(p["value"]), out
        )
    return out


def read_sql_query(
    sql: str,
    con: core.ConnectionConfig,
    database: str | None = None,
    parameters: list[dict[str, Any]] | None = None,
    *,
    spark: SparkSession | None = None,
) -> DataFrame:
    """reference: data_api/rds.py:259 — parameterized SQL over the
    connection; executes as a Spark JDBC pushdown query."""
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise InvalidArgument("no active SparkSession; pass spark=")
    return core.read_sql_query(s, _substitute(sql, parameters), con)


def to_sql(
    df: DataFrame,
    con: core.ConnectionConfig,
    table: str,
    database: str | None = None,
    mode: str = "append",
    index: bool = False,
    **kwargs: Any,
) -> None:
    """reference: data_api/rds.py:417 — same mode contract as the
    `databases` family (append/overwrite/truncate/upsert)."""
    core.to_sql(df, con, table, mode=mode, **kwargs)
