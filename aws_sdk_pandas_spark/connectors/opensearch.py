"""Search-store connector (reference: awswrangler/opensearch/_read.py:65
``search``, :157 ``search_by_sql``; _write.py:432 ``index_df``).

The Query-DSL subset the reference forwards compiles to Column
predicates: ``match`` (token containment), ``term``/``terms`` (exact),
``range`` (gt/gte/lt/lte), ``exists``, ``wildcard``, ``prefix``, and
``bool`` with must/filter/should/must_not.  ``search_by_sql`` is
``spark.sql``.  Index writes are dataset writes keyed by ``id_keys``
(last write per id wins, mirroring _id-based overwrite).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def compile_query_dsl(query: dict[str, Any]) -> Column:
    """OpenSearch query DSL dict -> Column predicate."""
    if not isinstance(query, dict) or len(query) != 1:
        raise InvalidArgument(f"expected a single-key DSL clause, got {query!r}")
    kind, body = next(iter(query.items()))
    if kind == "match_all":
        return F.lit(True)
    if kind == "match":
        field, text = next(iter(body.items()))
        if isinstance(text, dict):
            text = text["query"]
        toks = [t for t in str(text).split() if t]
        cond = F.lit(False)
        for t in toks:  # OR of token containment (analyzer-lite semantics)
            cond = cond | F.col(field).rlike(f"(?i)\\b{t}\\b")
        return cond
    if kind == "term":
        field, val = next(iter(body.items()))
        if isinstance(val, dict):
            val = val["value"]
        return F.col(field) == F.lit(val)
    if kind == "terms":
        field, vals = next(iter(body.items()))
        return F.col(field).isin(list(vals))
    if kind == "range":
        field, ops = next(iter(body.items()))
        cond = F.lit(True)
        for op, v in ops.items():
            col = F.col(field)
            cond = cond & {
                "gt": col > v, "gte": col >= v, "lt": col < v, "lte": col <= v
            }[op]
        return cond
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "prefix":
        field, val = next(iter(body.items()))
        return F.col(field).startswith(str(val))
    if kind == "wildcard":
        field, val = next(iter(body.items()))
        pattern = str(val if not isinstance(val, dict) else val["value"])
        rx = "^" + "".join(
            ".*" if ch == "*" else "." if ch == "?" else ("\\" + ch if not ch.isalnum() else ch)
            for ch in pattern
        ) + "$"
        return F.col(field).rlike(rx)
    if kind == "bool":
        cond = F.lit(True)
        for clause in body.get("must", []) + body.get("filter", []):
            cond = cond & compile_query_dsl(clause)
        shoulds = body.get("should", [])
        if shoulds:
            any_c = F.lit(False)
            for clause in shoulds:
                any_c = any_c | compile_query_dsl(clause)
            cond = cond & any_c
        for clause in body.get("must_not", []):
            cond = cond & ~compile_query_dsl(clause)
        return cond
    raise InvalidArgument(f"unsupported DSL clause: {kind!r}")


def search(
    df: DataFrame,
    *,
    search_body: dict[str, Any] | None = None,
    filter_path: list[str] | None = None,
    size: int | None = None,
) -> DataFrame:
    """reference: opensearch/_read.py:65 — query-DSL search over the
    index table; ``filter_path`` ≈ projection, ``size`` ≈ limit."""
    out = df
    if search_body and "query" in search_body:
        out = out.where(compile_query_dsl(search_body["query"]))
    if filter_path:
        out = out.select(*filter_path)
    if size is not None:
        out = out.limit(size)
    return out


def search_by_sql(spark: SparkSession, sql: str) -> DataFrame:
    """reference: opensearch/_read.py:157 — the SQL plugin is spark.sql."""
    return spark.sql(sql)


def index_df(
    df: DataFrame,
    path: str,
    *,
    id_keys: list[str] | None = None,
    mode: str = "append",
) -> dict[str, Any]:
    """reference: opensearch/_write.py:432 — bulk index; ``id_keys``
    dedups (last wins) like _id overwrite."""
    from aws_sdk_pandas_spark.sources._write import write_dataset

    out = df.dropDuplicates(id_keys) if id_keys else df
    return write_dataset(out, path, "parquet", mode=mode)


def index_documents(
    spark: SparkSession,
    documents: list[dict[str, Any]],
    path: str,
    *,
    id_keys: list[str] | None = None,
    mode: str = "append",
) -> dict[str, Any]:
    """reference: opensearch/_write.py:489 ``index_documents`` — literal
    document dicts through the same bulk path as ``index_df``."""
    if not documents:
        return {"paths": [], "partitions_values": {}}
    return index_df(spark.createDataFrame(documents), path, id_keys=id_keys, mode=mode)


def index_csv(
    spark: SparkSession,
    csv_path: str,
    path: str,
    *,
    id_keys: list[str] | None = None,
    mode: str = "append",
    **pandas_kwargs: Any,
) -> dict[str, Any]:
    """reference: opensearch/_write.py:356 ``index_csv``."""
    from aws_sdk_pandas_spark.sources.text import read_csv

    return index_df(
        read_csv(spark, csv_path, **pandas_kwargs), path, id_keys=id_keys, mode=mode
    )


def index_json(
    spark: SparkSession,
    json_path: str,
    path: str,
    *,
    id_keys: list[str] | None = None,
    mode: str = "append",
    **kwargs: Any,
) -> dict[str, Any]:
    """reference: opensearch/_write.py:278 ``index_json`` (JSON-lines or
    array-of-objects, matching read_json's surface)."""
    from aws_sdk_pandas_spark.sources.text import read_json

    return index_df(
        read_json(spark, json_path, **kwargs), path, id_keys=id_keys, mode=mode
    )


class OpenSearchConnection:
    """Connection handle (reference: opensearch/_utils.py ``connect`` —
    the client object).  Here an 'index' is a dataset prefix under
    ``root``; the handle just carries that root."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def index_path(self, index: str) -> str:
        return f"{self.root}/{index}"


def connect(root: str, **_ignored: Any) -> OpenSearchConnection:
    """reference: opensearch/_utils.py ``connect`` — host/auth kwargs are
    deployment concerns; accepted and ignored."""
    return OpenSearchConnection(root)


def create_index(
    spark: SparkSession,
    client: OpenSearchConnection,
    index: str,
    *,
    mappings: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """reference: opensearch/_write.py ``create_index`` — the index is its
    dataset prefix; mappings (if any) are recorded as a sidecar-free
    no-op (Spark infers schema from data)."""
    from aws_sdk_pandas_spark.sources import fs as _fs

    path = client.index_path(index)
    jvm_fs, jpath, _ = _fs._jvm_fs(spark, path)
    jvm_fs.mkdirs(jpath)
    return {"acknowledged": True, "index": index}


def delete_index(
    spark: SparkSession, client: OpenSearchConnection, index: str
) -> dict[str, Any]:
    """reference: opensearch/_delete.py ``delete_index``."""
    from aws_sdk_pandas_spark.sources import fs as _fs

    _fs.delete_objects(spark, client.index_path(index))
    return {"acknowledged": True, "index": index}


def create_collection(
    spark: SparkSession,
    name: str,
    *,
    root: str,
    collection_type: str = "SEARCH",
    **_ignored: Any,
) -> dict[str, Any]:
    """reference: opensearch/_utils.py:288 ``create_collection``
    (OpenSearch Serverless).  A collection is the prefix that holds its
    indexes: materialized as a directory; policies/VPC kwargs are
    service-deployment concerns, accepted and ignored."""
    from aws_sdk_pandas_spark.sources import fs as _fs

    path = f"{root.rstrip('/')}/{name}"
    jvm_fs, jpath, _ = _fs._jvm_fs(spark, path)
    jvm_fs.mkdirs(jpath)
    return {
        "name": name,
        "type": collection_type,
        "status": "ACTIVE",
        "collectionEndpoint": path,
    }
