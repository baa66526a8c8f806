"""Avro file source/sink built on the in-repo stdlib OCF codec
(``avro_ocf`` — the same one validated against the Apache Avro Java
implementation for the Iceberg metadata layer).

``read_avro`` is DISTRIBUTED: Spark's ``binaryFile`` source lists and
ships one task per .avro file, and an Arrow-batched kernel decodes each
container on the executors — so a directory of N event-dump files reads
with N-way parallelism and no driver bottleneck (the common shape of
Kafka-archive / event-log exports).  The Spark schema derives from the
first file's embedded writer schema (primitives, [null, X] unions,
arrays, maps, nested records).

``to_avro`` writes ONE container file driver-side, bounded like
``to_excel`` — single-object exports; for datasets keep parquet (the
repo's scale format).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from aws_sdk_pandas_spark import avro_ocf
from aws_sdk_pandas_spark.exceptions import InvalidArgument

_PRIM = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def _spark_type(avro: Any) -> tuple[T.DataType, bool]:
    """Avro schema node -> (spark type, nullable)."""
    if isinstance(avro, str):
        if avro == "null":
            return T.NullType(), True
        if avro in _PRIM:
            return _PRIM[avro], False
        raise InvalidArgument(f"unsupported Avro type {avro!r}")
    if isinstance(avro, list):  # union: [null, X] (or [X, null])
        non_null = [a for a in avro if a != "null"]
        if len(non_null) != 1:
            raise InvalidArgument(
                f"only [null, X] Avro unions map to Spark, got {avro!r}"
            )
        dt, _ = _spark_type(non_null[0])
        return dt, True
    t = avro.get("type")
    if t == "record":
        return (
            T.StructType(
                [
                    T.StructField(f["name"], *_spark_type(f["type"]))
                    for f in avro["fields"]
                ]
            ),
            False,
        )
    if t == "array":
        dt, nullable = _spark_type(avro["items"])
        return T.ArrayType(dt, nullable), False
    if t == "map":
        dt, nullable = _spark_type(avro["values"])
        return T.MapType(T.StringType(), dt, nullable), False
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    if t in _PRIM or t == "null":
        return _spark_type(t)
    raise InvalidArgument(f"unsupported Avro type {avro!r}")


def read_avro(spark: SparkSession, path: str, **_ignored: Any) -> DataFrame:
    """Distributed Avro read: one task per container file."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise InvalidArgument(f"no files under {path!r}")
    schema_json, _meta, _ = _head_container(bytes(first[0][0]))
    if not (isinstance(schema_json, dict) and schema_json.get("type") == "record"):
        raise InvalidArgument("read_avro needs a record-typed writer schema")
    st = T.StructType(
        [
            T.StructField(f["name"], *_spark_type(f["type"]))
            for f in schema_json["fields"]
        ]
    )
    names = [f["name"] for f in schema_json["fields"]]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                _s, _m, recs = avro_ocf.read_container_bytes(bytes(blob))
                rows.extend(recs)
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names}
            ) if rows else pd.DataFrame({n: [] for n in names})

    return files.select("content").mapInPandas(_decode, schema=st)


def _head_container(blob: bytes):
    return avro_ocf.read_container_bytes(blob, header_only=True)


def to_avro(
    df: DataFrame,
    path: str,
    *,
    codec: str = "deflate",
    max_rows: int = 5_000_000,
) -> str:
    """Driver-side single-container write (bounded — dataset-scale data
    belongs in parquet)."""
    n = df.count()
    if n > max_rows:
        raise InvalidArgument(
            f"DataFrame has {n} rows > max_rows={max_rows}; to_avro writes "
            "ONE driver-side container — use parquet for datasets"
        )

    def _avro_type(dt: T.DataType) -> Any:
        for k, v in _PRIM.items():
            if type(v) is type(dt):
                return k
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": _opt(dt.elementType, dt.containsNull)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": _opt(dt.valueType, dt.valueContainsNull)}
        if isinstance(dt, T.StructType):
            import hashlib as _hl

            # stable name: python hash() is process-salted and would
            # make output bytes differ between runs
            stem = _hl.md5(dt.simpleString().encode()).hexdigest()[:8]
            return {
                "type": "record",
                "name": f"r{stem}",
                "fields": [
                    {"name": f.name, "type": _opt(f.dataType, f.nullable),
                     "default": None} if f.nullable else
                    {"name": f.name, "type": _avro_type(f.dataType)}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType,
                           T.DecimalType)):
            return "string"  # honest lowering, documented
        raise InvalidArgument(f"no Avro mapping for Spark type {dt!r}")

    def _opt(dt: T.DataType, nullable: bool) -> Any:
        at = _avro_type(dt)
        return ["null", at] if nullable else at

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": f.name, "type": _opt(f.dataType, True), "default": None}
            for f in df.schema.fields
        ],
    }

    def _plain(v: Any) -> Any:
        if v is None or isinstance(v, (bool, int, float, str, bytes)):
            return v
        if isinstance(v, bytearray):
            return bytes(v)
        if isinstance(v, list):
            return [_plain(x) for x in v]
        if isinstance(v, dict):
            return {k: _plain(x) for k, x in v.items()}
        if hasattr(v, "asDict"):
            return {k: _plain(x) for k, x in v.asDict().items()}
        return str(v)

    records = [
        {f.name: _plain(row[f.name]) for f in df.schema.fields}
        for row in df.collect()
    ]
    avro_ocf.write_container(path, schema, records, codec=codec)
    return path
