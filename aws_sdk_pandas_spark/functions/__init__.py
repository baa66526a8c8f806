"""Column-expression library: Hive-compatible hashing, text analysis,
vector math.  Everything here returns Column expressions built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen — no
Python UDFs in these hot paths."""

from __future__ import annotations

from aws_sdk_pandas_spark.functions.hashing import hive_hash, hive_hash_string
from aws_sdk_pandas_spark.functions.text import (
    document_fingerprint,
    extract_emails,
    extract_urls,
    language_id,
    ngrams,
    quality_score,
    redact_pii,
    shingles,
    token_count,
    tokens,
)
from aws_sdk_pandas_spark.functions.zorder import (
    write_zordered,
    zorder_key,
    zorder_key_sql,
)
from aws_sdk_pandas_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
    vector_literal,
)

__all__ = [
    "cosine_similarity",
    "document_fingerprint",
    "dot_product",
    "euclidean_distance",
    "extract_emails",
    "extract_urls",
    "hive_hash",
    "hive_hash_string",
    "l2_norm",
    "language_id",
    "ngrams",
    "quality_score",
    "redact_pii",
    "shingles",
    "token_count",
    "tokens",
    "vector_literal",
    "write_zordered",
    "zorder_key",
    "zorder_key_sql",
]
