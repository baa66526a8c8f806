"""DynamoDB-shaped key-value reads (reference: awswrangler/dynamodb/
_read.py:459 ``read_items``, :51 ``read_partiql_query``; writes
_write.py:146 ``put_df``, _delete.py:20 ``delete_items``).

The reference's ``read_items`` unifies get_item/batch_get/query/parallel
scan with KeyConditionExpression + FilterExpression + Projection.  Here a
"table" is a dataset (path or catalog table) with declared key columns;
the expression mini-language compiles to Column predicates so Catalyst
pushes them into the scan — the moral equivalent of DynamoDB evaluating
KeyConditions server-side while the parallel-scan Segments fan-out is
Spark's file-split parallelism.

Expression grammar (the DynamoDB subset the reference forwards):
``=``, ``<``, ``<=``, ``>``, ``>=``, ``BETWEEN x AND y``,
``begins_with(col, x)``, ``attribute_exists(col)``,
``attribute_not_exists(col)``, ``contains(col, x)``, ``IN (...)``,
combined with AND/OR/NOT; value placeholders ``:name`` and name
placeholders ``#name``.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def _sql_literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, bytes):
        return "X'" + v.hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _compile_expression(
    expr: str,
    values: dict[str, Any] | None,
    names: dict[str, str] | None,
) -> str:
    """DynamoDB condition expression -> Spark SQL boolean expression."""
    s = expr
    for ph, col in (names or {}).items():
        s = s.replace(ph, f"`{col}`")
    # functions first (before generic comparator rewrite)
    s = re.sub(
        r"begins_with\s*\(\s*([^,]+?)\s*,\s*(:\w+)\s*\)",
        r"startswith(\1, \2)",
        s,
        flags=re.IGNORECASE,
    )
    s = re.sub(
        r"attribute_exists\s*\(\s*([^)]+?)\s*\)", r"\1 IS NOT NULL", s, flags=re.IGNORECASE
    )
    s = re.sub(
        r"attribute_not_exists\s*\(\s*([^)]+?)\s*\)", r"\1 IS NULL", s, flags=re.IGNORECASE
    )
    s = re.sub(
        r"\bcontains\s*\(\s*([^,]+?)\s*,\s*(:\w+)\s*\)",
        r"contains(\1, \2)",
        s,
        flags=re.IGNORECASE,
    )
    for name, val in sorted((values or {}).items(), key=lambda kv: -len(kv[0])):
        ph = name if name.startswith(":") else ":" + name
        s = s.replace(ph, _sql_literal(val))
    if ":" in re.sub(r"'[^']*'", "", s):
        raise InvalidArgument(f"unresolved placeholder in expression: {expr!r}")
    return s


def read_items(
    spark: SparkSession,
    table: str | DataFrame,
    *,
    partition_key: str | None = None,
    sort_key: str | None = None,
    partition_values: list[Any] | None = None,
    sort_values: list[Any] | None = None,
    key_condition_expression: str | None = None,
    filter_expression: str | None = None,
    expression_attribute_values: dict[str, Any] | None = None,
    expression_attribute_names: dict[str, str] | None = None,
    columns: list[str] | None = None,
    max_items_evaluated: int | None = None,
    allow_full_scan: bool = False,
) -> DataFrame:
    """reference: dynamodb/_read.py:459 — the unified read entry point."""
    df = spark.table(table) if isinstance(table, str) else table
    has_selector = any(
        [partition_values, key_condition_expression, filter_expression]
    )
    if not has_selector and not allow_full_scan:
        raise InvalidArgument(
            "no key condition/filter given: pass allow_full_scan=True for a "
            "full scan (reference: dynamodb/_read.py allow_full_scan)"
        )
    if partition_values:
        if not partition_key:
            raise InvalidArgument("partition_values requires partition_key")
        cond = F.col(partition_key).isin(partition_values)
        if sort_values:
            if not sort_key:
                raise InvalidArgument("sort_values requires sort_key")
            cond = cond & F.col(sort_key).isin(sort_values)
        df = df.where(cond)
    if key_condition_expression:
        df = df.where(
            F.expr(
                _compile_expression(
                    key_condition_expression,
                    expression_attribute_values,
                    expression_attribute_names,
                )
            )
        )
    if filter_expression:
        df = df.where(
            F.expr(
                _compile_expression(
                    filter_expression,
                    expression_attribute_values,
                    expression_attribute_names,
                )
            )
        )
    if columns:
        df = df.select(*columns)
    if max_items_evaluated:
        df = df.limit(max_items_evaluated)
    return df


def read_partiql_query(
    spark: SparkSession,
    query: str,
    *,
    parameters: list[Any] | None = None,
) -> DataFrame:
    """reference: dynamodb/_read.py:51 — PartiQL SELECT is SQL; ``?``
    placeholders are positional parameters."""
    if parameters:
        df = spark.sql(query, args=[p for p in parameters])
    else:
        df = spark.sql(query)
    return df


def put_df(
    df: DataFrame,
    path: str,
    *,
    overwrite_by_pkeys: list[str] | None = None,
    mode: str = "append",
) -> None:
    """reference: dynamodb/_write.py:146 — batch put; ``overwrite_by_pkeys``
    dedups the batch keeping the last occurrence per key."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    if overwrite_by_pkeys:
        df = df.dropDuplicates(overwrite_by_pkeys)
    write_dataset(df, path, "parquet", mode=mode)


def put_items(
    spark: SparkSession,
    items: list[dict[str, Any]],
    path: str,
    *,
    overwrite_by_pkeys: list[str] | None = None,
    mode: str = "append",
) -> None:
    """reference: dynamodb/_write.py:221 ``put_items`` — literal items
    (list of dicts) batched through the same writer as ``put_df``."""
    if not items:
        return
    put_df(
        spark.createDataFrame(items),
        path,
        overwrite_by_pkeys=overwrite_by_pkeys,
        mode=mode,
    )


def put_csv(
    spark: SparkSession,
    csv_path: str,
    path: str,
    *,
    overwrite_by_pkeys: list[str] | None = None,
    mode: str = "append",
    **pandas_kwargs: Any,
) -> None:
    """reference: dynamodb/_write.py:76 ``put_csv`` — read the CSV with
    the full pandas-kwargs surface, then ``put_df``."""
    from aws_sdk_pandas_spark.sources.text import read_csv

    put_df(
        read_csv(spark, csv_path, **pandas_kwargs),
        path,
        overwrite_by_pkeys=overwrite_by_pkeys,
        mode=mode,
    )


def put_json(
    spark: SparkSession,
    json_path: str,
    path: str,
    *,
    overwrite_by_pkeys: list[str] | None = None,
    mode: str = "append",
    **kwargs: Any,
) -> None:
    """reference: dynamodb/_write.py:32 ``put_json``."""
    from aws_sdk_pandas_spark.sources.text import read_json

    put_df(
        read_json(spark, json_path, **kwargs),
        path,
        overwrite_by_pkeys=overwrite_by_pkeys,
        mode=mode,
    )


def delete_items(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    key_cols: list[str],
) -> None:
    """reference: dynamodb/_delete.py:20 — anti-join delete + rewrite."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    current = spark.read.parquet(path)
    remaining = current.join(
        keys_df.select(*key_cols).dropDuplicates(), on=key_cols, how="left_anti"
    ).localCheckpoint(eager=True)
    write_dataset(remaining, path, "parquet", mode="overwrite")


def execute_statement(
    spark: SparkSession,
    statement: str,
    *,
    parameters: list[Any] | None = None,
) -> DataFrame | None:
    """reference: dynamodb/_utils.py:116 ``execute_statement`` — PartiQL.
    SELECT statements return a DataFrame (positional ``?`` parameters);
    INSERT/UPDATE/DELETE against path-backed tables are expressed with
    ``put_df``/``delete_items`` (documented divergence: Spark file tables
    have no row-level PartiQL DML)."""
    head = statement.lstrip().split(None, 1)[0].upper() if statement.strip() else ""
    if head == "SELECT":
        return read_partiql_query(spark, statement, parameters=parameters)
    raise InvalidArgument(
        "only PartiQL SELECT is executable against path-backed tables; "
        "use put_df/put_items for INSERT and delete_items for DELETE"
    )


def get_table(spark: SparkSession, table_path: str) -> DataFrame:
    """reference: dynamodb/_utils.py ``get_table`` — the table handle is
    its DataFrame scan here."""
    return spark.read.parquet(table_path)
