"""Property-based tests (hypothesis) for the type-system hub — the
round-trip/idempotence laws the reference never property-tested
(SURVEY §5: no property corpus anywhere in the reference repo).

The laws are pure, so hypothesis runs hundreds of cases per second —
but nested type strings route through Spark's DDL parser, which needs
an active SparkContext (hence the session fixture).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_sdk_pandas_spark._types import (
    athena2spark,
    sanitize_column_name,
    sanitize_table_name,
    spark2athena,
)

# -- generator for Athena/Spark-shared type strings -------------------------

_scalars = st.sampled_from(
    [
        "tinyint",
        "smallint",
        "int",
        "bigint",
        "float",
        "double",
        "boolean",
        "string",
        "date",
        "timestamp",
        "binary",
        "decimal(10,2)",
        "decimal(38,18)",
    ]
)


def _types(depth: int = 2) -> st.SearchStrategy[str]:
    if depth == 0:
        return _scalars
    inner = _types(depth - 1)
    field_name = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
    return st.one_of(
        _scalars,
        inner.map(lambda t: f"array<{t}>"),
        st.tuples(inner, inner).map(lambda p: f"map<{p[0]},{p[1]}>"),
        st.lists(
            st.tuples(field_name, inner), min_size=1, max_size=3,
            unique_by=lambda p: p[0],
        ).map(lambda fs: "struct<" + ",".join(f"{n}:{t}" for n, t in fs) + ">"),
    )


@settings(max_examples=300, deadline=None)
@given(_types())
def test_athena_spark_round_trip(spark, type_string: str):
    """athena -> spark -> athena is the identity on canonical strings."""
    spark_type = athena2spark(type_string)
    assert spark2athena(spark_type) == type_string


@settings(max_examples=300, deadline=None)
@given(_types())
def test_athena2spark_idempotent_on_own_output(spark, type_string: str):
    """Parsing the emitted string again yields the same DataType."""
    t1 = athena2spark(type_string)
    t2 = athena2spark(spark2athena(t1))
    assert t1 == t2


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=1, max_size=40))
def test_sanitize_idempotent(name: str):
    """Sanitizing twice equals sanitizing once (reference sanitize
    contract: catalog/_utils.py lowercase + non-alnum -> _)."""
    once = sanitize_column_name(name)
    assert sanitize_column_name(once) == once
    assert sanitize_table_name(sanitize_table_name(name)) == sanitize_table_name(name)


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=1, max_size=40))
def test_sanitize_output_is_safe(name: str):
    out = sanitize_column_name(name)
    assert out == out.lower()
    assert all(c.isalnum() or c == "_" for c in out)
