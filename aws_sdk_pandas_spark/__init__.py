"""aws_sdk_pandas_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of aws/aws-sdk-pandas (awswrangler).

The reference (awswrangler 3.17.1) is a pandas-centric data-movement and
query-dispatch library; everything relational is delegated to engines
(Athena/Presto, Redshift, JDBC). This package re-expresses that surface
Spark-first:

- ``sources``   — dataset-oriented readers/writers (parquet/orc/csv/json/
                  fwf/excel/delta/iceberg) with Hive-style partition layout,
                  write modes, bucketing, and partition-filter pushdown.
                  (reference: awswrangler/s3/_read_parquet.py,
                  _write_parquet.py, _write_dataset.py)
- ``sql``       — the SQL front door: ``read_sql_query`` == ``spark.sql``
                  plus the reference's normalized-SQL result cache.
                  (reference: awswrangler/athena/_read.py, _cache.py)
- ``catalog``   — table/partition DDL helpers over ``spark.catalog``.
                  (reference: awswrangler/catalog/)
- ``operators`` — merge/upsert family, dedup (exact/minhash/simhash/
                  ngram-jaccard/embedding), similarity search (brute-force
                  + LSH ANN), multimodal column plumbing.
- ``functions`` — text analysis (language-id, quality, tokens,
                  fingerprints) and vector column expressions.
- ``streaming`` — Structured Streaming over the same dataset layout.

Everything is declarative DataFrame/SQL so Catalyst handles pruning,
pushdown, join strategy and AQE; Python UDFs appear only as Arrow-batched
pandas UDFs where built-ins cannot express the semantics.
"""

from __future__ import annotations

from aws_sdk_pandas_spark import (
    catalog,
    connectors,
    databases,
    dq,
    functions,
    lakehouse,
    logs,
    operators,
    sources,
    sql,
    streaming,
    vectors,
)

# awswrangler-shaped namespaces: every ``wr.<module>.<fn>`` name from the
# reference resolves under the same path here (``asps.s3.read_parquet``,
# ``asps.athena.read_sql_query``, ...) so reference call-sites port by
# swapping the import; each is pure re-export wiring over the modules above
from aws_sdk_pandas_spark import (  # noqa: E402  (grouped for readability)
    athena,
    chime,
    cleanrooms,
    cloudwatch,
    data_api,
    data_quality,
    dynamodb,
    emr,
    emr_serverless,
    mysql,
    neptune,
    opensearch,
    oracle,
    postgresql,
    quicksight,
    redshift,
    s3,
    secretsmanager,
    sqlserver,
    sts,
    timestream,
)
from aws_sdk_pandas_spark._config import config
from aws_sdk_pandas_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = [
    "catalog",
    "connectors",
    "databases",
    "dq",
    "lakehouse",
    "logs",
    "config",
    "functions",
    "get_spark",
    "operators",
    "sources",
    "sql",
    "streaming",
    "vectors",
    "stop_spark",
    # awswrangler-compatible namespaces
    "s3",
    "athena",
    "catalog",
    "cleanrooms",
    "cloudwatch",
    "data_api",
    "quicksight",
    "secretsmanager",
    "sts",
    "chime",
    "emr",
    "emr_serverless",
    "dynamodb",
    "timestream",
    "opensearch",
    "neptune",
    "redshift",
    "mysql",
    "postgresql",
    "oracle",
    "sqlserver",
    "data_quality",
    "__version__",
]
