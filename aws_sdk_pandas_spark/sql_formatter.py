"""SQL literal formatter (reference: awswrangler/_sql_formatter.py:18-192).

The reference formats python values into engine-dialect SQL literals for
client-side ``:name`` substitution (presto/hive/partiql dialects).  For
*query parameters* this engine uses Spark's native parameterized SQL
(``sql.read_sql_query(params=...)``) — injection-safe, no string
interpolation.  This module keeps the literal grammar for the places
that still assemble SQL TEXT (generated DDL, MERGE templates, audit
logs), emitting the Spark SQL dialect:

  None -> NULL, bool -> TRUE/FALSE, Decimal -> ``123.45BD``,
  datetime -> ``TIMESTAMP '...'``, date -> ``DATE '...'``,
  bytes -> ``X'hex'``, str -> ``'escaped'`` (``'`` doubled),
  list/tuple -> ``ARRAY(...)``, dict -> ``MAP(k1, v1, ...)``
  (the reference's presto ``MAP(ARRAY[...], ARRAY[...])`` spelling is
  dialect-specific; Spark's ``MAP`` is variadic).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import re
from typing import Any

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def format_literal(value: Any) -> str:
    """Python value -> Spark SQL literal text."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return repr(value)
    if isinstance(value, _decimal.Decimal):
        return f"{value}BD"
    if isinstance(value, _dt.datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (bytes, bytearray)):
        return "X'" + bytes(value).hex().upper() + "'"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, (list, tuple)):
        return "ARRAY(" + ", ".join(format_literal(v) for v in value) + ")"
    if isinstance(value, dict):
        parts: list[str] = []
        for k, v in value.items():
            parts.append(format_literal(k))
            parts.append(format_literal(v))
        return "MAP(" + ", ".join(parts) + ")"
    raise InvalidArgument(f"cannot format {type(value).__name__} as a SQL literal")


_NAME_RE = re.compile(r"(?<![:\w]):([A-Za-z_]\w*)")


def format_sql(sql: str, params: dict[str, Any] | None = None) -> str:
    """Substitute ``:name`` markers with formatted literals
    (reference: _sql_formatter.py ``_process_sql_params``).  Prefer
    Spark parameterized SQL for queries; use this only when SQL text
    itself is the product.  Unknown markers raise; string contents are
    untouched."""
    if not params:
        return sql
    # protect string literals from substitution
    chunks = re.split(r"('(?:[^']|'')*')", sql)
    out: list[str] = []
    for i, chunk in enumerate(chunks):
        if i % 2 == 1:
            out.append(chunk)
            continue

        def repl(m: re.Match[str]) -> str:
            name = m.group(1)
            if name not in params:
                raise InvalidArgument(f"missing parameter {name!r}")
            return format_literal(params[name])

        out.append(_NAME_RE.sub(repl, chunk))
    return "".join(out)
