"""Experiment statistics: distributed two-sample comparisons.

The "did the treatment move the metric?" query — every variant compared
against the baseline with Welch's unequal-variance z statistic, computed
from ONE aggregation over the metric table (count/mean/variance per
group are map-side-combinable; the test arithmetic runs on the
groups-sized result).  At experiment scale (millions of users per
variant) the normal approximation is exact for practical purposes; the
z threshold |z| > 1.96 is the usual 5% two-sided gate.

Reference parity: aws-sdk-pandas users run this through Athena SQL
aggregates; this packages the statistics with engine-checkable
arithmetic (the DuckDB oracle recomputes the same formulas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_test(
    df: DataFrame,
    *,
    group_col: str,
    metric_col: str,
    baseline: str,
) -> DataFrame:
    """Welch two-sample comparison of every group against ``baseline``:
    returns one row per non-baseline group with ``group, n_base,
    n_treat, mean_base, mean_treat, diff, se, z_score`` (rounded for
    cross-engine reproducibility).

    Scale shape: one groupBy computes (n, mean, variance) for every
    group simultaneously; the baseline row broadcasts onto the
    groups-sized frame for the test arithmetic — the metric table is
    scanned exactly once regardless of variant count.
    """
    stats = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(metric_col).alias("n"),
        F.avg(metric_col).alias("m"),
        F.var_samp(metric_col).alias("v"),
    )
    base = stats.where(F.col("grp") == baseline).select(
        F.col("n").alias("n_base"), F.col("m").alias("m_base"), F.col("v").alias("v_base")
    )
    if not base.head(1):
        raise ValueError(
            f"baseline group {baseline!r} not present in {group_col!r} — "
            "an empty comparison would silently read as 'nothing significant'"
        )
    treat = stats.where(F.col("grp") != baseline)
    j = treat.crossJoin(F.broadcast(base))  # base is ONE row
    se = F.sqrt(F.col("v_base") / F.col("n_base") + F.col("v") / F.col("n"))
    return j.select(
        F.col("grp").alias("group"),
        "n_base",
        F.col("n").alias("n_treat"),
        F.round("m_base", 6).alias("mean_base"),
        F.round("m", 6).alias("mean_treat"),
        F.round(F.col("m") - F.col("m_base"), 6).alias("diff"),
        F.round(se, 6).alias("se"),
        F.round((F.col("m") - F.col("m_base")) / se, 4).alias("z_score"),
    )


def linear_fit(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares line ``y = slope*x + intercept``
    — the distributed trend estimator (per-series drift, per-segment
    elasticity) as ONE aggregation of sufficient statistics: Spark's
    ``regr_slope``/``regr_intercept``/``regr_r2``/``regr_count`` are
    moment aggregates (map-side combinable), so a billion-row group
    costs one pass and O(1) state.

    Returns ``by..., slope, intercept, r2, n``.  Groups with fewer than
    two points or zero x-spread return NULL slope/intercept (r2 NULL on
    zero y- or x-spread), matching SQL ``REGR_*`` semantics.

    If the trend should be removed rather than reported, join the
    result back and subtract — or use ``seasonal_decompose`` whose
    moving-average trend handles nonlinearity.
    """
    keys = list(by or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    return df.groupBy(*keys).agg(
        F.round(F.regr_slope(y, x), round_to).alias("slope"),
        F.round(F.regr_intercept(y, x), round_to).alias("intercept"),
        F.round(F.regr_r2(y, x), round_to).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )
