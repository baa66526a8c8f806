"""Exact distributed aggregation helpers beyond the built-in surface.

``weighted_quantile``: the lower weighted quantile per group — the exact
form of "what value covers q of the total weight" (quality-weighted
score cutoffs, token-weighted length percentiles).  Built-in
``percentile``/``percentile_approx`` cannot weight rows; the standard
formulation is one sort-window pass:

  sort rows by value within the group, accumulate weight, return the
  first value whose cumulative weight reaches q * total.

One shuffle (the window partitioning), no Python, deterministic given a
deterministic value order (ties broken by value only — all tied rows
share the value, so the answer is unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def weighted_quantile(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
    q: float,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group lower weighted ``q``-quantile of ``value_col`` under
    ``weight_col``.  Returns ``keys..., out_col`` (one row per group).
    Rows with non-positive or null weight are ignored.
    """
    if not 0.0 < q <= 1.0:
        raise InvalidArgument("q must be in (0, 1]")
    out_col = out_col or f"wq_{value_col}"
    rows = df.select(*keys, value_col, weight_col).where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = F.sum(weight_col).over(w_cum)
    total = F.sum(weight_col).over(w_all)
    hit = rows.withColumn("__reach", cum >= total * F.lit(q)).where(F.col("__reach"))
    return (
        hit.groupBy(*keys)
        .agg(F.min(value_col).alias(out_col))
    )
