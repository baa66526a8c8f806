"""Engine-agnostic JDBC read/write core (reference: awswrangler/
_databases.py — cursor streaming, `_records2df`, `_iterate_results`,
batched INSERT `_db_utils`).

Design notes for scale:

- Reads parallelize with ``partition_column/lower_bound/upper_bound/
  num_partitions`` (maps to Spark JDBC predicate partitioning) — the
  reference's ``chunksize`` cursor iteration becomes N concurrent range
  scans instead of one serial cursor.
- Writes parallelize per partition with JDBC ``batchsize``; the
  reference's row-placeholder batching (`_databases.py:356`) is the JDBC
  driver's addBatch/executeBatch underneath — same wire behavior, many
  writers.
- Upsert family: read target, merge in Spark, overwrite back —
  one declarative plan replacing the reference's staging-table dance.
  ``precombine_key`` keeps the greatest-version source row per key first
  (redshift/_utils.py:186-199).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.exceptions import InvalidArgument


@dataclass
class ConnectionConfig:
    """JDBC connection descriptor (the reference's ``con`` object /
    Glue-connection name resolves to exactly this: url + props)."""

    url: str
    driver: str | None = None
    user: str | None = None
    password: str | None = None
    properties: dict[str, str] = field(default_factory=dict)

    def jdbc_properties(self) -> dict[str, str]:
        props = dict(self.properties)
        if self.driver:
            props["driver"] = self.driver
        if self.user:
            props["user"] = self.user
        if self.password:
            props["password"] = self.password
        return props


_SECRET_JDBC_SCHEME = {
    "mysql": ("mysql", 3306),
    "postgres": ("postgresql", 5432),
    "postgresql": ("postgresql", 5432),
    "redshift": ("redshift", 5439),
    "oracle": ("oracle:thin", 1521),
    "sqlserver": ("sqlserver", 1433),
    "derby": ("derby", 0),
}


def connect(
    url: str | None = None,
    *,
    secret_id: str | None = None,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    **properties: str,
) -> ConnectionConfig:
    """(reference: each engine's ``connect()`` returning a DB-API
    connection; here a declarative descriptor Spark executors use.)

    ``secret_id`` resolves the standard RDS/Redshift secret shape
    (``{engine, host, port, dbname, username, password}``) via
    ``secretsmanager.get_secret_json`` and builds the JDBC URL from it —
    the reference's connect-from-secret flow (redshift/_connect.py:32).
    An explicit ``url`` wins; a ``jdbcUrl`` key in the secret is used
    verbatim."""
    if secret_id is not None:
        from aws_sdk_pandas_spark import secretsmanager

        sec = secretsmanager.get_secret_json(secret_id)
        user = user or sec.get("username")
        password = password or sec.get("password")
        if url is None:
            if "jdbcUrl" in sec:
                url = sec["jdbcUrl"]
            else:
                engine = str(sec.get("engine", "")).lower()
                if engine not in _SECRET_JDBC_SCHEME:
                    raise InvalidArgument(
                        f"secret {secret_id!r} has unsupported engine {engine!r}"
                    )
                scheme, default_port = _SECRET_JDBC_SCHEME[engine]
                host = sec["host"]
                port = int(sec.get("port", default_port))
                dbname = sec.get("dbname", "")
                url = f"jdbc:{scheme}://{host}:{port}/{dbname}"
    if url is None:
        raise InvalidArgument("connect requires a url or a secret_id")
    return ConnectionConfig(url=url, driver=driver, user=user, password=password, properties=properties)


def read_sql_query(
    spark: SparkSession,
    sql: str,
    con: ConnectionConfig,
    *,
    partition_column: str | None = None,
    lower_bound: Any = None,
    upper_bound: Any = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    dtype: dict[str, str] | None = None,
) -> DataFrame:
    """Arbitrary SQL against the database (reference:
    `_databases.py:272` ``read_sql_query``).  With ``partition_column``
    the scan fans out to ``num_partitions`` concurrent range queries."""
    reader = (
        spark.read.format("jdbc")
        .option("url", con.url)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in con.jdbc_properties().items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise InvalidArgument(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("dbtable", f"({sql}) spark_q")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    else:
        reader = reader.option("query", sql)
    df = reader.load()
    if dtype:
        from aws_sdk_pandas_spark import _types

        df = _types.cast_columns(df, dtype)
    return df


def read_sql_table(
    spark: SparkSession,
    table: str,
    con: ConnectionConfig,
    *,
    schema: str | None = None,
    **kwargs: Any,
) -> DataFrame:
    """(reference: `_databases.py` ``read_sql_table`` — SELECT *)."""
    qualified = f"{schema}.{table}" if schema else table
    return read_sql_query(spark, f"SELECT * FROM {qualified}", con, **kwargs)


_MODES = ("append", "overwrite", "truncate", "upsert")


def to_sql(
    df: DataFrame,
    con: ConnectionConfig,
    table: str,
    *,
    mode: str = "append",
    schema: str | None = None,
    keys: list[str] | None = None,
    precombine_key: str | None = None,
    batchsize: int = 10_000,
) -> None:
    """Write a DataFrame to a database table (reference: each engine's
    ``to_sql``; shared INSERT machinery `_databases.py:356`).

    - ``append``    -> INSERT (parallel executeBatch per partition)
    - ``overwrite`` -> DROP + CREATE + INSERT
    - ``truncate``  -> TRUNCATE (keep DDL) + INSERT
    - ``upsert``    -> read target, Spark-side merge on ``keys`` (new rows
      win; ``precombine_key`` picks greatest version per key), overwrite.
    """
    if mode not in _MODES:
        raise InvalidArgument(f"mode must be one of {_MODES}, got {mode!r}")
    qualified = f"{schema}.{table}" if schema else table
    props = con.jdbc_properties()
    spark = df.sparkSession

    if mode == "upsert":
        if not keys:
            raise InvalidArgument("mode='upsert' requires keys")
        from aws_sdk_pandas_spark.operators.merge import upsert_dataframe

        try:
            target = read_sql_table(spark, table, con, schema=schema)
            merged = upsert_dataframe(
                target.select(*df.columns), df, keys, precombine_key=precombine_key
            )
        except Exception:
            merged = df  # table absent -> plain create
        # cut lineage BEFORE overwriting the table the plan reads from
        # (distributed materialization — no driver collect; with a real
        # warehouse target prefer a staging table + server-side swap)
        merged = merged.localCheckpoint(eager=True)
        _write_jdbc(merged, con.url, qualified, "overwrite", props, batchsize, truncate=False)
        return

    _write_jdbc(
        df,
        con.url,
        qualified,
        "overwrite" if mode in ("overwrite", "truncate") else "append",
        props,
        batchsize,
        truncate=(mode == "truncate"),
    )


def _write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str,
    props: dict[str, str],
    batchsize: int,
    *,
    truncate: bool,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if truncate:
        writer = writer.option("truncate", "true")
    for k, v in props.items():
        writer = writer.option(k, v)
    writer.save()
