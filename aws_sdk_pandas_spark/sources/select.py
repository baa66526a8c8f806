"""S3 Select semantics (reference: awswrangler/s3/_select.py:156
``select_query``).

S3 Select ran ``SELECT ... FROM s3object WHERE ...`` *inside S3* per
object over CSV/JSON/Parquet, fanned out over byte ranges.  AWS
deprecated the service; semantically it is filter+projection pushdown at
the scan, which is exactly what Catalyst does when the same SQL runs over
a Spark file source — predicate pushdown to parquet row groups, column
pruning to the reader, per-file task fan-out replacing scan ranges.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_S3OBJECT = re.compile(r"\bs3object(\[\*\])?(\.\w+)?\b", re.IGNORECASE)


def select_query(
    spark: SparkSession,
    sql: str,
    path: str | list[str],
    input_serialization: str = "Parquet",
    input_serialization_params: dict[str, Any] | None = None,
    *,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    """Run an S3-Select-style query over objects at ``path``.

    ``input_serialization``: ``Parquet`` | ``CSV`` | ``JSON`` (the
    reference's three, s3/_select.py signature); CSV params honor
    ``FileHeaderInfo=Use`` (header row -> column names) and
    ``FieldDelimiter``.
    """
    params = input_serialization_params or {}
    fmt = input_serialization.lower()
    if fmt == "parquet":
        from aws_sdk_pandas_spark.sources.parquet import read_parquet

        df = read_parquet(spark, path)
    elif fmt == "csv":
        from aws_sdk_pandas_spark.sources.text import read_csv

        df = read_csv(
            spark,
            path,
            header=(params.get("FileHeaderInfo", "Use") == "Use"),
            sep=params.get("FieldDelimiter", ","),
            options=options,
        )
    elif fmt == "json":
        from aws_sdk_pandas_spark.sources.text import read_json

        df = read_json(spark, path, lines=(params.get("Type", "LINES") == "LINES"))
    else:
        raise InvalidArgument(
            "input_serialization must be Parquet, CSV or JSON "
            "(reference: s3/_select.py input_serialization)"
        )
    view = "s3object_view"
    df.createOrReplaceTempView(view)
    # `FROM s3object` / `FROM s3object[*] s` / `s3object.col` -> the view
    rewritten = _S3OBJECT.sub(lambda m: view + (m.group(2) or ""), sql)
    return spark.sql(rewritten)
