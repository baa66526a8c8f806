"""DuckDB-oracle parity: every ``queries()`` entry with an ``oracle_sql()``
must match the oracle's result (row count, column names, values) at
sf0.001.  This mirrors the driver's t2 correctness gate so regressions
are caught locally before a round boundary.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry

_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    """Sort columns by name, stringify values (dates/floats normalized) and
    sort rows — the same spirit as the driver's value-hash compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


_ORACLES = entry.oracle_sql()
_QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    spark_df = _QUERIES[name](spark, sf_dir)
    got_cols = spark_df.columns
    got = [tuple(r) for r in spark_df.collect()]

    con = _duck(sf_dir)
    res = con.execute(_ORACLES[name])
    want_cols = [d[0] for d in res.description]
    want = res.fetchall()
    con.close()

    assert sorted(got_cols) == sorted(want_cols), (
        f"{name}: column mismatch {got_cols} vs {want_cols}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = _normalize(got, got_cols), _normalize(want, want_cols)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:5]
    assert g == w, f"{name}: first mismatching rows {[(g[i], w[i]) for i in mism]}"


def test_all_queries_run(spark, sf_dir):
    """Rows-only check for entries without an oracle (LSH, ANN, multimodal)."""
    for name, fn in _QUERIES.items():
        if name in _ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
        assert df.schema is not None, name
