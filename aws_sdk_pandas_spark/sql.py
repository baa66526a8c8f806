"""The SQL front door (reference: awswrangler/athena/_read.py:951
``read_sql_query`` — 1.6k LoC of CTAS/UNLOAD/CSV dispatch, polling and
result fetch that collapse onto ``spark.sql``).

Preserved semantics beyond the bare ``spark.sql`` call:

- parameterized SQL: ``params`` with ``paramstyle='named'|'qmark'``
  (reference: athena/_utils.py:353-402) -> Spark's native parameterized
  SQL (args=dict | list).
- the query-result cache: normalized-SQL keyed reuse within
  ``max_cache_seconds`` (reference: athena/_cache.py:95-196).  Here a hit
  returns the cached (persisted) DataFrame instead of re-running.
- ``unload``: run a query and write its result as a dataset
  (reference: athena/_read.py:1556).
- ``create_ctas_table``: CREATE TABLE AS SELECT
  (reference: athena/_utils.py:686).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark._config import apply_configs
from aws_sdk_pandas_spark.exceptions import InvalidArgument, QueryFailed

# ---------------------------------------------------------------------------
# result cache (reference: awswrangler/athena/_cache.py)
# ---------------------------------------------------------------------------


def _normalize_sql(sql: str) -> str:
    """Comparison form of a query string: strip comments/whitespace/
    trailing ';', lower-case (reference: athena/_cache.py:121-130)."""
    s = re.sub(r"--.*?$", " ", sql, flags=re.MULTILINE)
    s = re.sub(r"/\*.*?\*/", " ", s, flags=re.DOTALL)
    s = re.sub(r"\s+", " ", s).strip().rstrip(";").strip().lower()
    return s


@dataclass
class _CacheEntry:
    df: DataFrame
    created_at: float


@dataclass
class _QueryCache:
    """LRU-ish normalized-SQL -> persisted DataFrame cache
    (reference: _LocalMetadataCacheManager, athena/_cache.py:29-92)."""

    max_entries: int = 50
    _entries: dict[str, _CacheEntry] = field(default_factory=dict)

    def get(self, sql: str, max_cache_seconds: int) -> DataFrame | None:
        if max_cache_seconds <= 0:
            return None
        key = _normalize_sql(sql)
        entry = self._entries.get(key)
        if entry is None:
            return None
        if time.monotonic() - entry.created_at > max_cache_seconds:
            entry.df.unpersist()
            del self._entries[key]
            return None
        return entry.df

    def put(self, sql: str, df: DataFrame) -> DataFrame:
        key = _normalize_sql(sql)
        if len(self._entries) >= self.max_entries:
            oldest = min(self._entries, key=lambda k: self._entries[k].created_at)
            self._entries[oldest].df.unpersist()
            del self._entries[oldest]
        df = df.persist()
        self._entries[key] = _CacheEntry(df=df, created_at=time.monotonic())
        return df

    def clear(self) -> None:
        for entry in self._entries.values():
            entry.df.unpersist()
        self._entries.clear()


_cache = _QueryCache()


def clear_query_cache() -> None:
    _cache.clear()


# ---------------------------------------------------------------------------
# parameter handling (reference: athena/_utils.py:353-402 _apply_formatter)
# ---------------------------------------------------------------------------


def _prepare_args(
    sql: str, params: dict[str, Any] | list[Any] | None, paramstyle: str
) -> tuple[str, Any]:
    if params is None:
        return sql, None
    if paramstyle == "named":
        if not isinstance(params, dict):
            raise InvalidArgument("paramstyle='named' requires dict params")
        # reference substitutes ``:name`` client-side; Spark's parameterized
        # SQL uses the same ``:name`` markers natively.
        return sql, params
    if paramstyle == "qmark":
        if not isinstance(params, (list, tuple)):
            raise InvalidArgument("paramstyle='qmark' requires list params")
        return sql, list(params)
    raise InvalidArgument(f"unknown paramstyle {paramstyle!r}")


# ---------------------------------------------------------------------------
# front door
# ---------------------------------------------------------------------------


@apply_configs
def read_sql_query(
    spark: SparkSession,
    sql: str,
    *,
    params: dict[str, Any] | list[Any] | None = None,
    paramstyle: str = "named",
    max_cache_seconds: int = 0,
    chunksize: int = 0,
    dialect: str = "spark",
) -> DataFrame | Any:
    """Run SQL on the engine (reference: athena/_read.py:951 — the whole
    CTAS/UNLOAD/CSV strategy dispatch is ``spark.sql``).

    ``chunksize`` returns an iterator of pandas DataFrames (the
    reference's ``chunksize`` contract) via ``toPandas`` batching.

    ``dialect="trino"`` (alias ``"athena"``) translates the Trino-only
    constructs the reference's Athena engine accepts — double-quoted
    identifiers, ``date_diff('unit', ..)``, ``approx_distinct``,
    ``TRY(CAST(..))``, ``CROSS JOIN UNNEST`` and friends — to Spark SQL
    before execution (see ``sql_dialect.trino_to_spark_sql``).  Opt-in
    per call because Trino's double-quoted *identifiers* are valid
    Spark *string literals*: sniffing would silently change meaning.
    """
    if dialect in ("trino", "athena", "presto"):
        from aws_sdk_pandas_spark.sql_dialect import trino_to_spark_sql

        sql = trino_to_spark_sql(sql)
    elif dialect != "spark":
        raise InvalidArgument("dialect must be 'spark', 'trino', 'athena', or 'presto'")
    cached = _cache.get(sql, max_cache_seconds)
    if cached is not None:
        df = cached
    else:
        sql2, args = _prepare_args(sql, params, paramstyle)
        try:
            df = spark.sql(sql2, args=args) if args is not None else spark.sql(sql2)
        except Exception as exc:
            raise QueryFailed(str(exc)) from exc
        if max_cache_seconds > 0:
            df = _cache.put(sql, df)
    if chunksize and chunksize > 0:
        return _iter_pandas_chunks(df, chunksize)
    return df


def _iter_pandas_chunks(df: DataFrame, chunksize: int):
    """Exact-row chunk iterator (reference: s3/_read_parquet.py:259-282
    carry-over slicing) over ``toLocalIterator`` Arrow batches."""
    import pandas as pd

    rows: list[Any] = []
    cols = df.columns
    for row in df.toLocalIterator(prefetchPartitions=True):
        rows.append(row)
        if len(rows) == chunksize:
            yield pd.DataFrame(rows, columns=cols)
            rows = []
    if rows:
        yield pd.DataFrame(rows, columns=cols)


def unload(
    spark: SparkSession,
    sql: str,
    path: str,
    *,
    file_format: str = "parquet",
    compression: str | None = "snappy",
    partitioned_by: list[str] | None = None,
    params: dict[str, Any] | list[Any] | None = None,
    paramstyle: str = "named",
    dialect: str = "spark",
) -> dict[str, Any]:
    """Run a query and write the result as a dataset
    (reference: athena/_read.py:1556 ``UNLOAD (sql) TO path WITH (...)``);
    ``dialect="trino"`` accepts the Athena dialect like read_sql_query."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    df = read_sql_query(spark, sql, params=params, paramstyle=paramstyle, dialect=dialect)
    return write_dataset(
        df,
        path,
        file_format,
        mode="overwrite",
        partition_cols=partitioned_by,
        compression=compression,
    )


def create_ctas_table(
    spark: SparkSession,
    sql: str,
    table: str,
    database: str | None = None,
    *,
    file_format: str = "parquet",
    path: str | None = None,
    partitioned_by: list[str] | None = None,
) -> str:
    """CREATE TABLE AS SELECT (reference: athena/_utils.py:686)."""
    name = f"`{database}`.`{table}`" if database else f"`{table}`"
    part = f"PARTITIONED BY ({', '.join(partitioned_by)}) " if partitioned_by else ""
    loc = f"LOCATION '{path}' " if path else ""
    spark.sql(f"CREATE TABLE {name} USING {file_format} {part}{loc}AS {sql}")
    return table


_EXECUTIONS: dict[str, DataFrame] = {}


def start_query_execution(spark: SparkSession, sql: str, **kwargs: Any) -> DataFrame:
    """Compatibility alias: execution is synchronous and local
    (reference: athena/_executions.py start_query_execution/wait_query).
    The returned DataFrame carries ``query_execution_id`` in
    ``df.query_execution_id`` so ``get_query_results`` can re-fetch it —
    the reference's id-based result retrieval (athena/_read.py:843)."""
    import uuid

    df = read_sql_query(spark, sql, **kwargs)
    exec_id = str(uuid.uuid4())
    _EXECUTIONS[exec_id] = df
    try:
        df.query_execution_id = exec_id  # type: ignore[attr-defined]
    except AttributeError:  # chunked iterators
        pass
    return df


def get_query_results(spark: SparkSession, query_execution_id: str) -> DataFrame:
    """Fetch the result of a previous ``start_query_execution`` by id
    (reference: athena/_read.py:843 ``get_query_results``).  Executions
    are session-local; lazy plans re-run on collection exactly like the
    reference re-reads the S3 result objects."""
    try:
        return _EXECUTIONS[query_execution_id]
    except KeyError:
        raise InvalidArgument(
            f"unknown query_execution_id {query_execution_id!r} "
            "(executions are registered by start_query_execution in this session)"
        ) from None


def read_sql_table(
    spark: SparkSession,
    table: str,
    database: str | None = None,
    **kwargs: Any,
) -> DataFrame | Any:
    """``SELECT * FROM table`` convenience (reference: athena/_read.py:1313)."""
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    return read_sql_query(spark, f"SELECT * FROM {qualified}", **kwargs)


# ---------------------------------------------------------------------------
# Execution-introspection + prepared-statement surface
# (reference: athena/_executions.py, athena/_statements.py, athena/_utils.py)
# ---------------------------------------------------------------------------


def get_query_execution(spark: SparkSession, query_execution_id: str) -> dict[str, Any]:
    """reference: athena/_executions.py ``get_query_execution`` — status
    metadata for an execution id (local executions are synchronous, so
    state is always SUCCEEDED once registered)."""
    df = get_query_results(spark, query_execution_id)
    return {
        "QueryExecutionId": query_execution_id,
        "Status": {"State": "SUCCEEDED"},
        "ResultSchema": dict(df.dtypes),
    }


def get_query_executions(
    spark: SparkSession, query_execution_ids: list[str]
) -> list[dict[str, Any]]:
    """reference: athena/_utils.py ``get_query_executions``."""
    return [get_query_execution(spark, i) for i in query_execution_ids]


def list_query_executions(spark: SparkSession) -> list[str]:
    """reference: athena/_executions.py ``list_query_executions``."""
    return list(_EXECUTIONS)


def stop_query_execution(spark: SparkSession, query_execution_id: str) -> None:
    """reference: athena/_executions.py ``stop_query_execution`` — local
    executions are synchronous; stopping drops the registered result."""
    _EXECUTIONS.pop(query_execution_id, None)


def wait_query(spark: SparkSession, query_execution_id: str) -> dict[str, Any]:
    """reference: athena/_executions.py:201 ``wait_query`` — synchronous
    engine: already complete."""
    return get_query_execution(spark, query_execution_id)


def get_query_columns_types(spark: SparkSession, query_execution_id: str) -> dict[str, str]:
    """reference: athena/_utils.py ``get_query_columns_types`` — column ->
    Athena type string of a result."""
    from aws_sdk_pandas_spark._types import spark2athena

    df = get_query_results(spark, query_execution_id)
    return {f.name: spark2athena(f.dataType) for f in df.schema.fields}


_PREPARED: dict[str, str] = {}


def create_prepared_statement(spark: SparkSession, sql: str, statement_name: str) -> None:
    """reference: athena/_statements.py ``create_prepared_statement`` —
    register a named parameterized statement (executed later with
    ``read_sql_query(params=..., paramstyle='qmark')``)."""
    _PREPARED[statement_name] = sql


def get_prepared_statement(spark: SparkSession, statement_name: str) -> str:
    try:
        return _PREPARED[statement_name]
    except KeyError:
        raise InvalidArgument(f"unknown prepared statement {statement_name!r}") from None


def list_prepared_statements(spark: SparkSession) -> list[str]:
    """reference: athena/_statements.py ``list_prepared_statements``."""
    return sorted(_PREPARED)


def delete_prepared_statement(spark: SparkSession, statement_name: str) -> None:
    """reference: athena/_statements.py ``delete_prepared_statement``."""
    _PREPARED.pop(statement_name, None)


def get_named_query_statement(spark: SparkSession, named_query_id: str) -> str:
    """reference: athena/_utils.py ``get_named_query_statement`` — same
    registry as prepared statements in the local engine."""
    return get_prepared_statement(spark, named_query_id)


def describe_table(spark: SparkSession, table: str, database: str | None = None) -> DataFrame:
    """reference: athena/_utils.py ``describe_table`` — DESCRIBE as a
    DataFrame."""
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    return spark.sql(f"DESCRIBE TABLE {qualified}")


def show_create_table(spark: SparkSession, table: str, database: str | None = None) -> str:
    """reference: athena/_utils.py ``show_create_table``."""
    qualified = f"`{database}`.`{table}`" if database else f"`{table}`"
    return spark.sql(f"SHOW CREATE TABLE {qualified}").collect()[0][0]


def generate_create_query(spark: SparkSession, table: str, database: str | None = None) -> str:
    """reference: athena/_utils.py ``generate_create_query`` — alias of
    show_create_table in a DDL-native engine."""
    return show_create_table(spark, table, database)


def create_athena_bucket(spark: SparkSession, path: str | None = None) -> str:
    """reference: athena/_utils.py:461 ``create_athena_bucket`` — ensure
    the default query-results staging location exists and return it.
    Spark's equivalent is the warehouse-adjacent staging dir."""
    from aws_sdk_pandas_spark.sources import fs as _fs

    if path is None:
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        path = warehouse.rstrip("/") + "/_query_results"
    jvm_fs, jpath, _ = _fs._jvm_fs(spark, path)
    jvm_fs.mkdirs(jpath)
    return path


def get_work_group(spark: SparkSession, workgroup: str = "primary") -> dict[str, Any]:
    """reference: athena/_utils.py:1099 ``get_work_group`` — workgroup
    description.  Spark has no workgroups; returns the session's
    equivalent execution profile (result staging dir, engine version,
    shuffle partitions) in the reference's response shape."""
    return {
        "WorkGroup": {
            "Name": workgroup,
            "State": "ENABLED",
            "Configuration": {
                "ResultConfiguration": {
                    "OutputLocation": spark.conf.get(
                        "spark.sql.warehouse.dir", "spark-warehouse"
                    ).rstrip("/")
                    + "/_query_results"
                },
                "EngineVersion": {
                    "SelectedEngineVersion": f"Spark {spark.version}",
                    "EffectiveEngineVersion": f"Spark {spark.version}",
                },
            },
            "AdditionalConfiguration": {
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions")
            },
        }
    }


def repair_table(spark: SparkSession, table: str, database: str | None = None) -> None:
    """reference: athena/_utils.py:526 ``repair_table`` — MSCK REPAIR
    (partition discovery); delegates to catalog.repair_table."""
    from aws_sdk_pandas_spark import catalog as _catalog

    _catalog.repair_table(spark, table, database)
