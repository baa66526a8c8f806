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


_MERGEABLE = ("sum", "count", "min", "max", "avg", "approx_distinct")


def partial_aggregate(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, list[str]],
) -> DataFrame:
    """Decomposable aggregation STATE for incremental rollups: per key,
    emit the mergeable components (sum/count/min/max; avg rides on
    sum+count) instead of final values.

    This is the map-side-combine algebra made durable: at 100 TB you
    aggregate each arriving partition/day ONCE, store the tiny state
    table, and answer the running rollup by merging states — never
    re-scanning history.  ``merge_aggregates`` folds states; 
    ``finalize_aggregates`` produces the user-facing values.

    State columns: ``<col>__sum, <col>__min, <col>__max`` per requested
    family plus the shared row count ``__n`` (sum/avg also add
    ``<col>__cnt`` — non-null count, the avg denominator).

    ``approx_distinct`` stores a MERGEABLE HyperLogLog sketch
    (``<col>__hll``, Datasketches binary): register-wise max under
    union means the merged estimate is IDENTICAL to aggregating the
    raw history directly — incremental distinct users/keys across
    days/backfills without re-scanning, the aggregate plain COUNT
    DISTINCT state can never provide.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for col, fns in metrics.items():
        bad = set(fns) - set(_MERGEABLE)
        if bad:
            raise ValueError(f"non-mergeable aggregates for {col}: {sorted(bad)}")
        if "sum" in fns or "avg" in fns:
            aggs.append(F.sum(col).alias(f"{col}__sum"))
        if "sum" in fns or "avg" in fns or "count" in fns:
            aggs.append(F.count(col).alias(f"{col}__cnt"))
        if "min" in fns:
            aggs.append(F.min(col).alias(f"{col}__min"))
        if "max" in fns:
            aggs.append(F.max(col).alias(f"{col}__max"))
        if "approx_distinct" in fns:
            aggs.append(F.hll_sketch_agg(col).alias(f"{col}__hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregates(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of partial-aggregate states into one: union (no
    shuffle) + a single re-aggregate on the keys.  Sums/counts add,
    mins/maxes fold — the algebra that makes the state mergeable across
    days, backfills and late partitions."""
    from functools import reduce

    if not states:
        raise ValueError("states must be non-empty")
    u = reduce(lambda a, b: a.unionByName(b), states)
    aggs = []
    for c in u.columns:
        if c in keys:
            continue
        if c.endswith("__min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("__max"):
            aggs.append(F.max(c).alias(c))
        elif c.endswith("__hll"):
            aggs.append(F.hll_union_agg(c).alias(c))
        else:  # __sum, __cnt, __n
            aggs.append(F.sum(c).alias(c))
    return u.groupBy(*keys).agg(*aggs)


def finalize_aggregates(
    state: DataFrame,
    metrics: dict[str, list[str]],
    keys: list[str],
) -> DataFrame:
    """State -> user-facing values: ``<col>_sum/_min/_max/_count/_avg``
    (avg = stored sum / stored non-null count) plus row count ``n``."""
    cols: list = [F.col(k) for k in keys] + [F.col("__n").alias("n")]
    for col, fns in metrics.items():
        if "sum" in fns:
            cols.append(F.col(f"{col}__sum").alias(f"{col}_sum"))
        if "count" in fns:
            cols.append(F.col(f"{col}__cnt").alias(f"{col}_count"))
        if "min" in fns:
            cols.append(F.col(f"{col}__min").alias(f"{col}_min"))
        if "max" in fns:
            cols.append(F.col(f"{col}__max").alias(f"{col}_max"))
        if "avg" in fns:
            cols.append(
                (F.col(f"{col}__sum") / F.col(f"{col}__cnt")).alias(f"{col}_avg")
            )
        if "approx_distinct" in fns:
            cols.append(
                F.hll_sketch_estimate(F.col(f"{col}__hll")).alias(
                    f"{col}_approx_distinct"
                )
            )
    return state.select(*cols)
