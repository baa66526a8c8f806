"""Data API for Redshift (reference: awswrangler/data_api/redshift.py:240
``connect``, :288 ``read_sql_query``) — same local transport as
``data_api.rds``: jdbc: ARNs connect directly, other ARNs map to an
embedded Derby database.  Redshift's SQL dialect specifics live in
``databases/redshift.py``; the Data API layer is the connection +
typed-parameter surface."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.data_api import rds as _rds
from aws_sdk_pandas_spark.databases import core


def connect(
    cluster_id: str = "",
    database: str = "",
    secret_arn: str = "",
    db_user: str = "",
    boto3_session: Any = None,
    **kwargs: Any,
) -> core.ConnectionConfig:
    """reference: data_api/redshift.py:240 (``cluster_id`` is the
    resource handle)."""
    return _rds.connect(cluster_id or "redshift", database or "dev", secret_arn, **kwargs)


def read_sql_query(
    sql: str,
    con: core.ConnectionConfig,
    database: str | None = None,
    parameters: list[dict[str, Any]] | None = None,
    *,
    spark: SparkSession | None = None,
) -> DataFrame:
    """reference: data_api/redshift.py:288."""
    return _rds.read_sql_query(sql, con, database, parameters, spark=spark)
