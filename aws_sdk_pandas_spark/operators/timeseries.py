"""Time-series resample / gap-fill — the hypertable-rollup pattern.

The reference ships Timestream SQL through to the service, which owns
interpolation fns (SURVEY §2.5: timestream/_read.py:130).  Spark-first,
the same capability is a composition: bucket-aggregate, per-group dense
time grid (``sequence`` — generated distributed, never on the driver),
left join observations onto the grid, forward-fill with an
ignore-nulls window.

Scale: one shuffle for the bucket aggregate, one for the grid join (both
keyed by the group), one window partitioned by group.  Grid size is
bounded by (span/step) per group, not by input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_locf(
    df: DataFrame,
    *,
    time_col: str = "ts",
    value_col: str = "value",
    by: list[str] | None = None,
    step: str = "1 hour",
    agg: str = "avg",
) -> DataFrame:
    """Regularize an irregular series to ``step`` buckets per group and
    forward-fill (last observation carried forward) the empty buckets.

    Returns ``by..., bucket (timestamp), value`` — ``value`` is the
    bucket aggregate where observations exist, else the previous bucket's
    filled value (null until the first observation).
    """
    from aws_sdk_pandas_spark.operators.rangejoin import _parse_duration_seconds

    step_s = int(_parse_duration_seconds(step))
    by = list(by or [])

    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(time_col)) / step_s) * step_s).cast("long")
    )
    if agg == "avg":
        # decimal-exact mean: IEEE double summation order differs across
        # engines/partitions; decimal sums do not
        val = (
            F.sum(F.col(value_col).cast("decimal(18,6)")) / F.count(F.lit(1))
        ).cast("double")
    elif agg in ("sum", "min", "max", "count"):
        val = getattr(F, agg)(F.col(value_col)).cast("double")
    else:
        raise ValueError(f"unsupported agg {agg!r}")

    buckets = (
        df.withColumn("__b", bucket)
        .groupBy(*by, "__b")
        .agg(val.alias("__v"))
    )
    bounds = buckets.groupBy(*by).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step_s} SECONDS"))
        ).alias("__b"),
    )
    joined = grid.join(buckets, by + ["__b"], "left")
    w = (
        Window.partitionBy(*by)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *by,
        F.col("__b").alias("bucket"),
        F.last("__v", ignorenulls=True).over(w).alias("value"),
    )


def resample_interpolate(
    df: DataFrame,
    *,
    time_col: str = "ts",
    value_col: str = "value",
    by: list[str] | None = None,
    step: str = "1 hour",
    agg: str = "avg",
    round_to: int = 6,
) -> DataFrame:
    """Regularize to ``step`` buckets and LINEARLY interpolate empty
    buckets between observations (Timestream's INTERPOLATE_LINEAR,
    SURVEY §2.5 time-series interpolation fns).  Buckets before the first
    or after the last observation stay NULL.

    Same scale shape as ``resample_locf`` plus one more window pass (the
    forward-looking neighbor); everything stays keyed by the group.
    """
    from aws_sdk_pandas_spark.operators.rangejoin import _parse_duration_seconds

    step_s = int(_parse_duration_seconds(step))
    by = list(by or [])

    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(time_col)) / step_s) * step_s).cast("long")
    )
    if agg == "avg":
        val = (
            F.sum(F.col(value_col).cast("decimal(18,6)")) / F.count(F.lit(1))
        ).cast("double")
    elif agg in ("sum", "min", "max", "count"):
        val = getattr(F, agg)(F.col(value_col)).cast("double")
    else:
        raise ValueError(f"unsupported agg {agg!r}")

    buckets = df.withColumn("__b", bucket).groupBy(*by, "__b").agg(val.alias("__v"))
    bounds = buckets.groupBy(*by).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step_s} SECONDS"))
        ).alias("__b"),
    )
    joined = grid.join(buckets, by + ["__b"], "left")

    w_back = (
        Window.partitionBy(*by).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by).orderBy("__b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_timestamp("__b").cast("double")
    known_t = F.when(F.col("__v").isNotNull(), t)
    tp = F.last(known_t, ignorenulls=True).over(w_back)
    vp = F.last("__v", ignorenulls=True).over(w_back)
    tn = F.first(known_t, ignorenulls=True).over(w_fwd)
    vn = F.first("__v", ignorenulls=True).over(w_fwd)
    interp = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
        F.when(
            tp.isNotNull() & tn.isNotNull(),
            vp + (vn - vp) * (t - tp) / (tn - tp),
        )
    )
    return joined.select(
        *by,
        F.col("__b").alias("bucket"),
        F.round(interp, round_to).alias("value"),
    )


def detect_anomalies_rolling(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    window_seconds: int = 3600,
    z: float = 3.0,
    min_points: int = 5,
    out_prefix: str = "anomaly",
) -> DataFrame:
    """Trailing-window anomaly detection: flag points whose value sits
    more than ``z`` sample standard deviations from the mean of the
    trailing ``window_seconds`` within each ``by`` group — the baseline
    excludes ONLY the current row itself, so an anomaly cannot damp its
    own threshold, while points sharing its exact timestamp DO count
    (a dense same-instant burst forms its own baseline instead of
    reading NULL z-scores).  Points with fewer than ``min_points``
    baseline neighbours (cold start) or a degenerate (zero/NULL)
    baseline spread are never flagged.

    Adds ``<prefix>_n_prior``, ``<prefix>_zscore`` (rounded, NULL when
    undefined), ``<prefix>_flag``.

    Scale shape: ONE range-frame window over (group, epoch) — the same
    single-shuffle shape as the sliding-time-window features; state per
    task is bounded by the window span, never the series length.  The
    self-exclusion is algebraic (inclusive-frame sums minus the row's
    own contribution) because no frame bound can express "all rows in
    range except me"; values are centered on the group mean first so
    the sum-of-squares identity never cancels catastrophically
    (the repo-wide two-pass-moments discipline, see fit_mahalanobis).
    """
    # order by exact epoch MICROseconds: a whole-second epoch would
    # exclude every preceding row inside the same truncated second (not
    # just the current row) on sub-second series; TIMESTAMP_NTZ also
    # refuses a straight numeric cast in Spark 4
    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype.startswith("timestamp") or dtype == "date":
        epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    else:
        epoch_us = (F.col(ts_col).cast("double") * 1_000_000).cast("long")
    grp = list(by or [])
    wg = Window.partitionBy(*grp)
    w = (
        Window.partitionBy(*grp)
        .orderBy(epoch_us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    # center on the group mean: variance is shift-invariant and the
    # centered sums sit near zero, so s2 - s1^2/n cannot cancel
    xc = F.col(value_col) - F.avg(value_col).over(wg)
    has_v = F.col(value_col).isNotNull()
    n = F.count(xc).over(w) - F.when(has_v, F.lit(1)).otherwise(F.lit(0))
    s1 = F.sum(xc).over(w) - F.coalesce(xc, F.lit(0.0))
    s2 = F.sum(xc * xc).over(w) - F.coalesce(xc * xc, F.lit(0.0))
    var = F.when(n >= 2, (s2 - (s1 * s1) / n) / (n - 1))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    zscore = F.when(
        (n >= min_points) & std.isNotNull() & (std > 0),
        (xc - s1 / n) / std,
    )
    return (
        df.withColumn(f"{out_prefix}_n_prior", n)
        .withColumn(f"{out_prefix}_zscore", F.round(zscore, 4))
        .withColumn(
            f"{out_prefix}_flag",
            F.coalesce(F.abs(zscore) > F.lit(z), F.lit(False)),
        )
    )


def page_hinkley(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    delta: float = 0.0,
    threshold: float | None = None,
    out_prefix: str = "ph",
) -> DataFrame:
    """Page-Hinkley change-point statistic per group: detects a sustained
    upward shift in the mean of a series (the drift alarm for metrics and
    data-quality monitors).  ``PH_t = M_t - min(M_0..M_t)`` where
    ``M_t = cumsum(x - mean - delta)`` — a small dip is forgiven, a
    sustained shift accumulates until ``PH`` crosses ``threshold``.

    Unlike clamped CUSUM (a non-linear recursion that cannot distribute),
    Page-Hinkley is exactly two window functions — a running sum and a
    running min over the same (group, time) order — so it rides ONE
    shuffle.  The reference mean is each group's own series mean
    (retrospective monitoring); subtract a known baseline from
    ``value_col`` upstream for a fixed reference.

    Adds ``<prefix>_stat`` (rounded) and, when ``threshold`` is given,
    ``<prefix>_alarm``.
    """
    from pyspark.sql.window import Window

    keys = list(by or [])
    grand = Window.partitionBy(*keys)
    order = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.col(value_col) - F.avg(value_col).over(grand) - F.lit(delta)
    m = F.sum(dev).over(order)
    # the running min includes M_0 = 0 (the pre-series state): a series
    # that starts ABOVE its mean must accumulate from 0, not from M_1
    out = df.withColumn("__m", m).withColumn(
        f"{out_prefix}_stat",
        F.round(F.col("__m") - F.least(F.lit(0.0), F.min("__m").over(order)), 6),
    ).drop("__m")
    if threshold is not None:
        out = out.withColumn(
            f"{out_prefix}_alarm", F.col(f"{out_prefix}_stat") > threshold
        )
    return out


def ewma(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    alpha: float = 0.3,
    lookback: int | None = None,
    tie_breakers: list[str] | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per series:
    ``s_t = (1-alpha) * s_{t-1} + alpha * x_t`` seeded with the first
    value (pandas ``ewm(alpha=..., adjust=False)``).

    The recursion is non-associative, so it cannot ride a plain window
    aggregate — but its memory decays geometrically: terms older than
    ``lookback`` rows carry weight ``(1-alpha)^lookback``, which is
    below double-precision noise once ``(1-alpha)^L < 1e-16``.  That L
    (derived from ``alpha`` when ``lookback`` is None, capped at 1024)
    makes a BOUNDED rows-frame exact in double precision: each row
    folds the frame's values oldest-to-newest through the recursion
    with ``aggregate`` — pure JVM, no Python.  One window shuffle on
    (group, time); per-row work is O(L), independent of series length,
    so a 10-billion-row series costs the same per row as a small one.

    ``tie_breakers`` orders equal timestamps deterministically (required
    for a reproducible fold).
    """
    import math

    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    if lookback is None:
        lookback = min(1024, int(math.ceil(-16 * math.log(10) / math.log(1.0 - alpha))))
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_breakers or [])]
    w = (
        Window.partitionBy(*(by or []))
        .orderBy(*order)
        .rowsBetween(-lookback, Window.currentRow)
    )
    # collect (ts, ties..., value) structs so the fold order is pinned by
    # an explicit sort, not by frame-accumulation order
    skey = F.struct(
        F.col(ts_col).alias("_t"),
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(tie_breakers or [])],
        F.col(value_col).cast("double").alias("_v"),
    )
    frame = F.array_sort(F.collect_list(skey).over(w))
    # NULL observations are SKIPPED (state carries over) — otherwise one
    # null would poison every later row in its lookback
    folded = F.aggregate(
        frame,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(x["_v"].isNull(), acc).otherwise(
            F.when(acc.isNull(), x["_v"]).otherwise(
                acc * F.lit(1.0 - alpha) + x["_v"] * F.lit(alpha)
            )
        ),
    )
    return df.withColumn(out_col, folded)


def autocorr(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    lags: list[int] | None = None,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Sample autocorrelation function per series: for each lag ``k``,
    the Pearson correlation between ``x_t`` and ``x_{t-k}`` over the
    aligned pairs within each group.  Returns
    ``by..., lag, acf, n_pairs`` (``acf`` NULL when fewer than two
    pairs or a degenerate spread makes it undefined).

    The seasonality probe for the resample/gap-fill family: a daily
    cycle shows as a peak at the daily lag.  ONE window shuffle
    computes every lag column (same (group, time) order), then one
    aggregate per (group, lag) after an inline stack — lags never
    cause extra passes over the data.
    """
    keys = list(by or [])
    lags = lags or [1]
    if any(k <= 0 for k in lags):
        raise ValueError("lags must be positive")
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    x = df.select(
        *keys, F.col(value_col).cast("double").alias("__x"),
        *[
            F.lag(F.col(value_col).cast("double"), k).over(w).alias(f"__l{k}")
            for k in lags
        ],
    )
    stacked = x.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("__x").alias("cur"),
                        F.col(f"__l{k}").alias("prev"),
                    )
                    for k in lags
                ]
            )
        ).alias("p"),
    ).select(*keys, "p.lag", "p.cur", "p.prev")
    # corr from guarded moments: ANSI mode turns the zero-variance case
    # into DIVIDE_BY_ZERO inside corr(); this yields NULL instead
    s_cur = F.stddev_samp("cur")
    s_prev = F.stddev_samp("prev")
    cc = F.when(
        (s_cur > 0) & (s_prev > 0), F.covar_samp("cur", "prev") / (s_cur * s_prev)
    )
    acf = F.round(cc, 6)
    return (
        stacked.where(F.col("prev").isNotNull() & F.col("cur").isNotNull())
        .groupBy(*keys, "lag")
        .agg(acf.alias("acf"), F.count("*").alias("n_pairs"))
    )


def seasonal_decompose(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    period: int,
    by: list[str] | None = None,
    tie_breakers: list[str] | None = None,
    out_prefix: str = "sd",
) -> DataFrame:
    """Classical additive decomposition ``x = trend + seasonal +
    residual`` per series (the statsmodels ``seasonal_decompose``
    recipe): trend = centered moving average over one period (the
    standard 2x``period`` MA with half-weight endpoints when the period
    is even), seasonal = per-phase mean of the detrended series
    normalized to sum zero over the period, residual = the rest.

    Adds ``<prefix>_phase``, ``<prefix>_trend``, ``<prefix>_seasonal``,
    ``<prefix>_residual``.  Trend (and so residual) is NULL within half
    a period of each series edge — exactly statsmodels' behavior.

    Scale shape: ONE (group, time) window shuffle carries the row
    number, the centered sum and the edge lag/lead; phase means are a
    <= |groups| x period aggregate joined back broadcast-size.  Nothing
    is driver-side, and per-row state is bounded by the period.
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    keys = list(by or [])
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    h = period // 2
    frame = w.rowsBetween(-h, h)
    x = F.col(value_col).cast("double")

    out = df.withColumn("__rn", F.row_number().over(w) - 1)
    out = out.withColumn(f"{out_prefix}_phase", (F.col("__rn") % period).cast("int"))
    n_in_frame = F.count(x).over(frame)
    if period % 2 == 1:
        trend = F.when(n_in_frame == period, F.avg(x).over(frame))
    else:
        # 2 x m centered MA: endpoints carry half weight
        s = F.sum(x).over(frame)
        ends = F.lag(x, h).over(w) + F.lead(x, h).over(w)
        trend = F.when(
            n_in_frame == period + 1, (s - F.lit(0.5) * ends) / F.lit(float(period))
        )
    out = out.withColumn("__trend", trend).withColumn(
        "__detr", x - F.col("__trend")
    )

    phase_means = (
        out.groupBy(*keys, f"{out_prefix}_phase")
        .agg(F.avg("__detr").alias("__m_raw"))
        .withColumn(
            "__m",
            F.col("__m_raw")
            - F.avg("__m_raw").over(Window.partitionBy(*keys)),
        )
        .drop("__m_raw")
    )
    out = out.join(phase_means, keys + [f"{out_prefix}_phase"], "left")
    return (
        out.withColumn(f"{out_prefix}_trend", F.round(F.col("__trend"), 6))
        .withColumn(f"{out_prefix}_seasonal", F.round(F.col("__m"), 6))
        .withColumn(
            f"{out_prefix}_residual",
            F.round(x - F.col("__trend") - F.col("__m"), 6),
        )
        .drop("__rn", "__trend", "__detr", "__m")
    )


def holt_smoothing(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 0,
    lookback: int = 512,
    tie_breakers: list[str] | None = None,
    out_prefix: str = "holt",
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per series:
    ``level_t = a*x_t + (1-a)*(level + trend)``,
    ``trend_t = b*(level_t - level) + (1-b)*trend`` seeded
    ``level_1 = x_1, trend_1 = 0``.  Adds ``<prefix>_level``,
    ``<prefix>_trend`` and, when ``horizon`` > 0, ``<prefix>_forecast``
    = level + horizon * trend (the h-step-ahead point forecast).

    Same distribution trick as ``ewma``: the coupled recursion folds a
    BOUNDED rows-frame through a struct accumulator (pure JVM
    ``aggregate``); initial-condition influence decays geometrically
    (spectral radius < 1 for 0 < a,b < 1), so ``lookback`` rows back the
    seed is noise.  One window shuffle, O(lookback) per row regardless
    of series length.  Unlike EWMA there is no tidy closed-form cutoff,
    so ``lookback`` is explicit — 512 covers any practical (a, b).
    """
    if not (0 < alpha < 1 and 0 < beta < 1):
        raise ValueError("alpha and beta must be in (0, 1)")
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_breakers or [])]
    w = (
        Window.partitionBy(*(by or []))
        .orderBy(*order)
        .rowsBetween(-lookback, Window.currentRow)
    )
    skey = F.struct(
        F.col(ts_col).alias("_t"),
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(tie_breakers or [])],
        F.col(value_col).cast("double").alias("_v"),
    )
    frame = F.array_sort(F.collect_list(skey).over(w))
    zero = F.struct(
        F.lit(None).cast("double").alias("l"), F.lit(None).cast("double").alias("b")
    )

    def _step(acc, x):
        lnew = F.lit(alpha) * x["_v"] + F.lit(1.0 - alpha) * (acc["l"] + acc["b"])
        bnew = F.lit(beta) * (lnew - acc["l"]) + F.lit(1.0 - beta) * acc["b"]
        # NULL observations skipped: state carries over (same policy as ewma)
        return F.when(x["_v"].isNull(), acc).otherwise(
            F.when(
                acc["l"].isNull(),
                F.struct(x["_v"].alias("l"), F.lit(0.0).alias("b")),
            ).otherwise(F.struct(lnew.alias("l"), bnew.alias("b")))
        )

    state = F.aggregate(frame, zero, _step)
    out = df.withColumn(f"{out_prefix}_level", state["l"]).withColumn(
        f"{out_prefix}_trend", state["b"]
    )
    if horizon > 0:
        out = out.withColumn(
            f"{out_prefix}_forecast",
            F.col(f"{out_prefix}_level")
            + F.lit(float(horizon)) * F.col(f"{out_prefix}_trend"),
        )
    return out


def cross_corr(
    df: DataFrame,
    *,
    ts_col: str,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    lags: list[int] | None = None,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Lagged cross-correlation between two metrics of the same series:
    for each lag ``k >= 0``, ``corr(x_t, y_{t-k})`` — does yesterday's
    y predict today's x?  Returns ``by..., lag, xcorr, n_pairs``.
    Lag 0 is the plain contemporaneous correlation.

    Same single-window-shuffle shape as ``autocorr``; corr from guarded
    moments so degenerate spreads yield NULL rather than ANSI errors.
    """
    keys = list(by or [])
    lags = lags if lags is not None else [0, 1]
    if any(k < 0 for k in lags):
        raise ValueError("lags must be >= 0 (swap x and y for leads)")
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    base = df.select(
        *keys,
        F.col(x_col).cast("double").alias("__x"),
        *[
            F.lag(F.col(y_col).cast("double"), k).over(w).alias(f"__y{k}")
            for k in lags
        ],
    )
    stacked = base.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("__x").alias("cur"),
                        F.col(f"__y{k}").alias("prev"),
                    )
                    for k in lags
                ]
            )
        ).alias("p"),
    ).select(*keys, "p.lag", "p.cur", "p.prev")
    s_cur = F.stddev_samp("cur")
    s_prev = F.stddev_samp("prev")
    cc = F.when(
        (s_cur > 0) & (s_prev > 0), F.covar_samp("cur", "prev") / (s_cur * s_prev)
    )
    return (
        stacked.where(F.col("prev").isNotNull() & F.col("cur").isNotNull())
        .groupBy(*keys, "lag")
        .agg(F.round(cc, 6).alias("xcorr"), F.count("*").alias("n_pairs"))
    )


def rolling_quantile(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    q: float = 0.5,
    by: list[str] | None = None,
    window_seconds: int = 3600,
    include_current: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Exact interpolated quantile of the trailing ``window_seconds``
    per group — the robust rolling baseline (a trailing MEDIAN shrugs
    off the spikes that drag a trailing mean, so it pairs with
    ``detect_anomalies_rolling`` for heavy-tailed metrics).

    ONE range-frame window over (group, epoch-microseconds) — the same
    single-shuffle shape as the anomaly detector; per-task state is
    bounded by the window span.  ``include_current=False`` excludes the
    row from its own baseline.
    """
    if not 0 <= q <= 1:
        raise ValueError("q must be in [0, 1]")
    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype.startswith("timestamp") or dtype == "date":
        epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    else:
        epoch_us = (F.col(ts_col).cast("double") * 1_000_000).cast("long")
    hi = 0 if include_current else -1
    w = (
        Window.partitionBy(*(by or []))
        .orderBy(epoch_us)
        .rangeBetween(-window_seconds * 1_000_000, hi)
    )
    name = out_col or f"rq_{str(q).replace('.', '_')}"
    return df.withColumn(
        name, F.round(F.expr(f"percentile(`{value_col}`, {q!r})").over(w), 6)
    )


def time_weighted_avg(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    tie_breakers: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Time-weighted average per series (Timestream's
    ``avg(time_weight())`` / TWA family — the reference ships that SQL
    to the service, timestream/_read.py): each observation holds until
    the next one (LOCF step function), so the mean weights every value
    by HOW LONG it was current, not how often it was sampled — the
    correct aggregate for irregularly sampled gauges, where a plain AVG
    over-weights chatty periods.

    ``TWA = sum(value_i * (t_{i+1} - t_i)) / (t_last - t_first)`` per
    group (the last observation carries no weight; a single-observation
    series returns its value).  Returns ``by..., twa, n_obs,
    span_seconds``.

    ONE (group, time) window shuffle for the lead, one keyed aggregate.
    """
    keys = list(by or [])
    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype.startswith("timestamp") or dtype == "date":
        t = F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).cast("double") / 1e6
    else:
        t = F.col(ts_col).cast("double")
    order = [t] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(t).over(w)
    x = df.select(
        *keys,
        F.col(value_col).cast("double").alias("__v"),
        t.alias("__t"),
        (nxt - t).alias("__dt"),
    )
    span = F.max("__t") - F.min("__t")
    twa = F.when(
        span > 0, F.sum(F.col("__v") * F.col("__dt")) / span
    ).otherwise(F.avg("__v"))
    return x.groupBy(*keys).agg(
        F.round(twa, round_to).alias("twa"),
        F.count("*").alias("n_obs"),
        F.round(span, round_to).alias("span_seconds"),
    )


def resample_ohlc(
    df: DataFrame,
    *,
    time_col: str = "ts",
    value_col: str = "value",
    by: list[str] | None = None,
    step: str = "1 hour",
    tie_breakers: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Open/high/low/close resampling per bucket — the candlestick
    aggregate (Timestream/financial rollup): first and last observation
    by time (ties broken by ``tie_breakers`` so the answer is
    partitioning-invariant), min and max, per ``step`` bucket per
    group.  Returns ``by..., bucket, open, high, low, close, n_obs``.

    ONE keyed aggregation — first/last ride ``min_by``/``max_by`` on
    the (time, tie...) struct, so no window pass and no second shuffle.
    """
    from aws_sdk_pandas_spark.operators.rangejoin import _parse_duration_seconds

    step_s = int(_parse_duration_seconds(step))
    keys = list(by or [])
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(time_col)) / step_s) * step_s).cast("long")
    )
    order_key = F.struct(
        F.col(time_col).alias("_t"),
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(tie_breakers or [])],
    )
    v = F.col(value_col).cast("double")
    return (
        df.withColumn("__b", bucket)
        .groupBy(*keys, F.col("__b").alias("bucket"))
        .agg(
            F.round(F.min_by(v, order_key), round_to).alias("open"),
            F.round(F.max(v), round_to).alias("high"),
            F.round(F.min(v), round_to).alias("low"),
            F.round(F.max_by(v, order_key), round_to).alias("close"),
            F.count("*").alias("n_obs"),
        )
    )


def rate_of_change(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    tie_breakers: list[str] | None = None,
    per_seconds: float = 1.0,
    monotonic: bool = False,
    out_col: str = "rate",
    round_to: int = 6,
) -> DataFrame:
    """Discrete derivative per series (Timestream's ``rate``/
    ``derivative``): ``(value - prev_value) / (t - prev_t) *
    per_seconds`` — per second by default, ``per_seconds=60`` for
    per-minute.  ``monotonic=True`` treats the input as a monotone
    counter (Prometheus ``rate`` semantics): negative deltas are
    counter RESETS and yield NULL instead of a huge negative rate.
    First row per series is NULL (no predecessor); equal-timestamp
    pairs yield NULL rather than dividing by zero.

    ONE (group, time) window shuffle — the same exchange every op in
    this family rides.
    """
    keys = list(by or [])
    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype.startswith("timestamp") or dtype == "date":
        t = F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).cast("double") / 1e6
    else:
        t = F.col(ts_col).cast("double")
    order = [t] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    v = F.col(value_col).cast("double")
    dv = v - F.lag(v).over(w)
    dt = t - F.lag(t).over(w)
    rate = F.when(dt > 0, dv / dt * F.lit(float(per_seconds)))
    if monotonic:
        rate = F.when(dv >= 0, rate)
    return df.withColumn(out_col, F.round(rate, round_to))


def holt_winters(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    period: int,
    by: list[str] | None = None,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.1,
    horizon: int = 0,
    lookback: int = 1024,
    tie_breakers: list[str] | None = None,
    out_prefix: str = "hw",
) -> DataFrame:
    """Holt–Winters additive triple smoothing per series — `holt_
    smoothing` plus a ``period``-slot seasonal state, the
    level/trend/seasonality forecaster for daily-with-weekly-cycle or
    hourly-with-daily-cycle metrics:

    ``level_t = α(x_t − s_{t−m}) + (1−α)(level + trend)``
    ``trend_t = β(level_t − level) + (1−β)trend``
    ``s_t     = γ(x_t − level_t) + (1−γ)s_{t−m}``

    seeded from the FIRST observed season (level = its mean, trend = 0,
    s_i = x_i − mean — the classical textbook init).  Adds
    ``<prefix>_level``, ``<prefix>_trend``, ``<prefix>_seasonal`` (the
    just-updated component for the current row's phase) and, when
    ``horizon`` > 0, ``<prefix>_forecast`` = level + h·trend +
    s[phase(t+h)].

    Distribution: the same bounded rows-frame JVM struct fold as
    `holt_smoothing`, with the seasonal slots carried as an
    array<double> in the accumulator (state is O(period), per-row cost
    O(lookback·period) array rebuilds in codegen — no Python).  Level
    and trend forget the frame edge geometrically; each seasonal slot
    is updated once per period, so its memory is (1−γ)^(L/m) —
    ``lookback`` should be ≥ ~35·period for edge-exactness (series
    shorter than ``lookback`` are EXACT vs the serial recursion).
    NULL observations are skipped (state and PHASE hold — the series'
    own observed cadence defines the season, so gaps should be
    gap-filled first via `resample_locf` if calendar phase matters).
    Rows before the first full season yield NULL outputs.
    """
    if not (0 < alpha < 1 and 0 < beta < 1 and 0 < gamma < 1):
        raise ValueError("alpha, beta, gamma must be in (0, 1)")
    if period < 2:
        raise ValueError("period must be >= 2 (use holt_smoothing for m=1)")
    m = int(period)
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_breakers or [])]
    w = (
        Window.partitionBy(*(by or []))
        .orderBy(*order)
        .rowsBetween(-lookback, Window.currentRow)
    )
    skey = F.struct(
        F.col(ts_col).alias("_t"),
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(tie_breakers or [])],
        F.col(value_col).cast("double").alias("_v"),
    )
    frame = F.array_sort(F.collect_list(skey).over(w))
    zero = F.struct(
        F.lit(None).cast("double").alias("l"),
        F.lit(None).cast("double").alias("b"),
        F.lit(0).alias("cnt"),
        F.array().cast("array<double>").alias("s"),
    )

    def _step(acc, x):
        v = x["_v"]
        # warm-up: collect the first season's raw values
        collecting = F.struct(
            acc["l"].alias("l"),
            acc["b"].alias("b"),
            (acc["cnt"] + 1).alias("cnt"),
            F.concat(acc["s"], F.array(v)).alias("s"),
        )
        raw = F.concat(acc["s"], F.array(v))
        mean = F.aggregate(raw, F.lit(0.0), lambda a, e: a + e) / F.lit(float(m))
        finalize = F.struct(
            mean.alias("l"),
            F.lit(0.0).alias("b"),
            (acc["cnt"] + 1).alias("cnt"),
            F.transform(raw, lambda e: e - mean).alias("s"),
        )
        idx = (acc["cnt"] % F.lit(m)).cast("int")
        sidx = F.element_at(acc["s"], idx + 1)
        lnew = F.lit(alpha) * (v - sidx) + F.lit(1.0 - alpha) * (acc["l"] + acc["b"])
        bnew = F.lit(beta) * (lnew - acc["l"]) + F.lit(1.0 - beta) * acc["b"]
        recurse = F.struct(
            lnew.alias("l"),
            bnew.alias("b"),
            (acc["cnt"] + 1).alias("cnt"),
            F.transform(
                acc["s"],
                lambda e, i: F.when(
                    i == idx, F.lit(gamma) * (v - lnew) + F.lit(1.0 - gamma) * e
                ).otherwise(e),
            ).alias("s"),
        )
        return F.when(v.isNull(), acc).otherwise(
            F.when(acc["cnt"] < m - 1, collecting).otherwise(
                F.when(acc["cnt"] == m - 1, finalize).otherwise(recurse)
            )
        )

    state = F.aggregate(frame, zero, _step)
    # phase of the CURRENT row (last consumed observation) = cnt-1 mod m
    cur_idx = ((state["cnt"] - 1) % F.lit(m)).cast("int")
    seasonal = F.when(
        state["cnt"] >= m, F.element_at(state["s"], cur_idx + 1)
    )
    level = F.when(state["cnt"] >= m, state["l"])
    trend = F.when(state["cnt"] >= m, state["b"])
    out = (
        df.withColumn(f"{out_prefix}_level", level)
        .withColumn(f"{out_prefix}_trend", trend)
        .withColumn(f"{out_prefix}_seasonal", seasonal)
    )
    if horizon > 0:
        h_idx = ((state["cnt"] - 1 + horizon) % F.lit(m)).cast("int")
        fc = F.when(
            state["cnt"] >= m,
            state["l"]
            + F.lit(float(horizon)) * state["b"]
            + F.element_at(state["s"], h_idx + 1),
        )
        out = out.withColumn(f"{out_prefix}_forecast", fc)
    return out


def p_chart(
    df: DataFrame,
    *,
    time_col: str,
    flag_col: str,
    by: list[str] | None = None,
    sigma: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Attribute control chart for a rate (p-chart): per period, the
    observed failure/positive rate against ``sigma``-limit binomial
    bands around the overall rate — the SPC answer to "is today's
    error rate noise or a real shift", with limits that WIDEN for
    small-sample periods instead of flagging them spuriously.

    ``flag_col`` is the 0/1 outcome; periods come pre-bucketed in
    ``time_col`` (cast dates/hours upstream).  Returns ``by...,
    period, n, rate, p_bar, ucl, lcl, out_of_control``; limits are
    p̄ ± σ·√(p̄(1−p̄)/n_period), LCL floored at 0, UCL capped at 1.

    ONE aggregation to the per-period table (bounded by periods), the
    one-row-per-group overall rate broadcast back.  NULL flags are
    excluded.
    """
    keys = list(by or [])
    f = F.col(flag_col).cast("int")
    base = df.where(f.isNotNull())
    per = base.groupBy(*keys, F.col(time_col).alias("period")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(f).alias("__pos")
    )
    overall = base.groupBy(*keys).agg(
        (F.sum(f) / F.count(F.lit(1))).alias("__pbar")
    )
    if keys:
        # eqNullSafe: a NULL-keyed group is a real group out of groupBy,
        # and a plain equi-join (NULL != NULL) would silently drop its
        # entire control chart
        ov = overall
        for k in keys:
            ov = ov.withColumnRenamed(k, f"__o_{k}")
        cond = None
        for k in keys:
            c = per[k].eqNullSafe(ov[f"__o_{k}"])
            cond = c if cond is None else (cond & c)
        j = per.join(F.broadcast(ov), cond).drop(*[f"__o_{k}" for k in keys])
    else:
        j = per.crossJoin(F.broadcast(overall))
    rate = F.col("__pos") / F.col("n")
    pbar = F.col("__pbar")
    half = F.lit(float(sigma)) * F.sqrt(pbar * (1 - pbar) / F.col("n"))
    ucl = F.least(pbar + half, F.lit(1.0))
    lcl = F.greatest(pbar - half, F.lit(0.0))
    return j.select(
        *keys,
        "period",
        "n",
        F.round(rate, round_to).alias("rate"),
        F.round(pbar, round_to).alias("p_bar"),
        F.round(ucl, round_to).alias("ucl"),
        F.round(lcl, round_to).alias("lcl"),
        ((rate > ucl) | (rate < lcl)).alias("out_of_control"),
    ).orderBy(*keys, "period")


def forecast_accuracy(
    df: DataFrame,
    *,
    actual_col: str,
    forecast_col: str,
    by: list[str] | None = None,
    ts_col: str | None = None,
    season: int = 1,
    tie_breakers: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Forecast evaluation per series: ``by..., n, mae, rmse, smape,
    mase`` — the metric set that survives scale differences between
    series (sMAPE is unit-free; MASE scales each series' error by its
    own in-sample seasonal-naive error, so MASE < 1 means "beats the
    naive repeat-last-season forecast", comparable across series of
    any magnitude — the M-competition standard).

    ``mase`` needs the naive benchmark: provide ``ts_col`` so the
    seasonal-naive error |y_t − y_{t−season}| comes from one keyed lag
    window; without ``ts_col`` mase is NULL.  sMAPE uses the
    2|e|/(|y|+|ŷ|) form with 0/0 terms skipped.  One window (when
    mase) + one aggregation; NULL actual/forecast rows are excluded.
    """
    keys = list(by or [])
    y = F.col(actual_col).cast("double")
    f = F.col(forecast_col).cast("double")
    err = y - f
    sm_den = F.abs(y) + F.abs(f)
    sm_term = F.when(sm_den > 0, F.lit(2.0) * F.abs(err) / sm_den)
    scored = df.where(y.isNotNull() & f.isNotNull())
    agg = scored.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.abs(err)).alias("__mae"),
        F.sqrt(F.avg(err * err)).alias("__rmse"),
        F.avg(sm_term).alias("__smape"),
    )
    if ts_col is not None:
        # the naive benchmark runs over ALL actuals (filtered only on
        # y), BEFORE the forecast filter: dropping forecast-less rows
        # first would stretch the "seasonal" lag across gaps and score
        # MASE against a corrupted benchmark
        order = [F.col(ts_col).asc()] + [
            F.col(c).asc() for c in (tie_breakers or [])
        ]
        w = Window.partitionBy(*keys).orderBy(*order)
        actuals = df.where(y.isNotNull()).withColumn(
            "__naive", F.abs(y - F.lag(y, season).over(w))
        )
        nmae = actuals.groupBy(*keys).agg(F.avg("__naive").alias("__naive_mae"))
        agg = (
            agg.join(nmae, keys)
            if keys
            else agg.crossJoin(nmae)
        )
    else:
        agg = agg.withColumn("__naive_mae", F.lit(None).cast("double"))
    return agg.select(
        *keys,
        "n",
        F.round("__mae", round_to).alias("mae"),
        F.round("__rmse", round_to).alias("rmse"),
        F.round("__smape", round_to).alias("smape"),
        F.round(F.try_divide(F.col("__mae"), F.col("__naive_mae")), round_to).alias(
            "mase"
        ),
    ).orderBy(*keys)


def burst_detect(
    df: DataFrame,
    *,
    ts_col: str,
    by: list[str] | None = None,
    window: str = "60 seconds",
    threshold: int | None = None,
) -> DataFrame:
    """Per-entity burst profile: the maximum number of events falling
    in ANY trailing time window (exact scan statistic, not bucketed —
    a burst straddling a bucket boundary can't hide), plus when it
    peaked — the bot/DDoS/scraper screen rate-limiting decisions need.
    Returns ``by..., n_events, max_in_window, peak_ts, burst`` (burst
    only when ``threshold`` given).

    ONE keyed range-frame window (state bounded by events inside the
    window span, never the series) + one aggregation; `max_by` picks
    the earliest peak deterministically via a (count, -ts) struct.
    """
    from aws_sdk_pandas_spark.operators.rangejoin import _parse_duration_seconds

    secs = int(round(_parse_duration_seconds(window)))
    if secs < 1:
        raise ValueError("window must be at least 1 second")
    keys = list(by or [])
    t = F.col(ts_col).cast("timestamp")
    base = df.where(t.isNotNull()).withColumn(
        "__sec", F.unix_micros(t) / F.lit(1e6)
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__sec").asc())
        .rangeBetween(-secs, 0)
    )
    counted = base.withColumn("__inw", F.count(F.lit(1)).over(w))
    agg = counted.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("__inw").alias("max_in_window"),
        # earliest timestamp achieving the max: max_by on (count, -sec)
        F.max_by(t, F.struct(F.col("__inw"), (-F.col("__sec")))).alias("peak_ts"),
    )
    out = agg
    if threshold is not None:
        out = out.withColumn("burst", F.col("max_in_window") >= threshold)
    return out.orderBy(*keys)


def burstiness(
    df: DataFrame,
    *,
    ts_col: str,
    by: list[str] | None = None,
    tie_breakers: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Goh–Barabási burstiness index per entity: B = (σ−μ)/(σ+μ) over
    inter-event times — −1 = metronome-regular (machine heartbeat),
    0 = Poisson-random (organic), →1 = heavy-tailed bursts (human
    sessions, incident storms).  The single number that separates
    scripted traffic from people when rates alone look identical.
    Returns ``by..., n_gaps, mean_gap_s, std_gap_s, burstiness``.
    Entities with <2 events have no gaps and are OMITTED (left-join
    this report back to an entity list if you need them as NULL rows);
    a perfectly constant gap gives B = −1 exactly (σ=0).

    One keyed lag window + one aggregation.
    """
    keys = list(by or [])
    t = F.col(ts_col).cast("timestamp")
    order = [t.asc()] + [F.col(c).asc() for c in (tie_breakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    base = df.where(t.isNotNull()).withColumn(
        "__gap",
        (F.unix_micros(t) - F.unix_micros(F.lag(t).over(w))) / F.lit(1e6),
    )
    gaps = base.where(F.col("__gap").isNotNull())
    agg = gaps.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("__gap").alias("__mu"),
        F.coalesce(F.stddev_pop("__gap"), F.lit(0.0)).alias("__sigma"),
    )
    b = F.try_divide(
        F.col("__sigma") - F.col("__mu"), F.col("__sigma") + F.col("__mu")
    )
    return agg.select(
        *keys,
        "n_gaps",
        F.round("__mu", round_to).alias("mean_gap_s"),
        F.round("__sigma", round_to).alias("std_gap_s"),
        F.round(b, round_to).alias("burstiness"),
    ).orderBy(*keys)


def rolling_corr(
    df: DataFrame,
    *,
    ts_col: str,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    window_seconds: float = 3600.0,
    min_points: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Trailing-window Pearson correlation between two metrics of the
    same series — the coupling-drift monitor ("latency used to track
    load; since the deploy it doesn't"): adds ``rolling_corr`` per row
    from the co-moments of the trailing window.  Windows with fewer
    than ``min_points`` rows or zero spread yield NULL.

    The metrics are CENTERED by their per-group means first (one
    aggregation, broadcast back — corr is shift-invariant): the
    textbook one-pass Σx² − (Σx)²/n loses ~12 digits on epoch-scale
    magnitudes, enough to report decoupling on perfectly coupled
    series (the same cancellation fit_mahalanobis/fit_ols guard
    against).  Then ONE keyed range-frame window — at MICROSECOND
    resolution, so sub-second windows work — carries the five centered
    co-moment sums; corr from guarded moments, no further pass.  Rows
    with NULL in either metric are excluded.
    """
    keys = list(by or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    t = F.col(ts_col).cast("timestamp")
    base = df.where(x.isNotNull() & y.isNotNull() & t.isNotNull()).withColumn(
        "__us", F.unix_micros(t)
    )
    means = base.groupBy(*keys).agg(
        F.avg(x).alias("__mx"), F.avg(y).alias("__my")
    )
    base = (
        base.join(F.broadcast(means), keys)
        if keys
        else base.crossJoin(F.broadcast(means))
    )
    cx = x - F.col("__mx")
    cy = y - F.col("__my")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__us").asc())
        .rangeBetween(-int(window_seconds * 1_000_000), 0)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(cx).over(w)
    sy = F.sum(cy).over(w)
    sxx = F.sum(cx * cx).over(w)
    syy = F.sum(cy * cy).over(w)
    sxy = F.sum(cx * cy).over(w)
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    corr = F.when(
        (n >= min_points) & (vx > 0) & (vy > 0),
        cov / F.sqrt(vx * vy),
    )
    return base.withColumn("rolling_corr", F.round(corr, round_to)).drop(
        "__us", "__mx", "__my"
    )
