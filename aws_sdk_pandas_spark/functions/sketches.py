"""Approximate/sketch aggregates — the bounded-memory scale path.

At 100 TB an exact COUNT(DISTINCT) is a full shuffle of every distinct
key and an exact percentile a global sort; the sketch forms are one-pass,
bounded-memory, map-side-combinable (HyperLogLog++ / Greenwald-Khanna
inside Spark).  The reference delegates these to Athena/Presto
(``approx_distinct``, ``approx_percentile`` pass-through,
awswrangler/athena/_read.py:951); here they're first-class wrappers with
accuracy-tested defaults.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count (relative standard deviation ``rsd``).
    Memory is O(1/rsd^2) per group regardless of cardinality."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    relative_error: float = 0.01,
) -> list[float]:
    """Greenwald-Khanna approximate quantiles — one pass, no global sort.
    ``relative_error=0`` degenerates to the exact (sort-based) algorithm."""
    return df.approxQuantile(col, list(probabilities), relative_error)


def approx_percentile_col(
    col: Column | str, percentage: float | list[float], accuracy: int = 10_000
) -> Column:
    """``approx_percentile`` as a Column aggregate (usable inside
    ``groupBy().agg``, unlike ``approxQuantile``)."""
    if isinstance(percentage, list):
        pct = F.array(*[F.lit(p) for p in percentage])
    else:
        pct = F.lit(percentage)
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, pct, F.lit(accuracy))


def frequent_items(
    df: DataFrame, cols: list[str], support: float = 0.01
) -> DataFrame:
    """Items more frequent than ``support`` (single-pass heavy-hitters;
    may contain false positives, never false negatives)."""
    return df.stat.freqItems(cols, support)
