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



def _group_value_counts(
    df: DataFrame, value_col: str, group_col: str, group_a, group_b
) -> DataFrame:
    """Shared reduction for the two-sample rank/CDF tests: raw rows ->
    distinct-value table with per-cohort counts (__val, __ca, __cb).
    One edit point so ks_test and mann_whitney_u can never disagree on
    filtering/casting for the same cohort column."""
    v = F.col(value_col).cast("double")
    g = F.col(group_col)
    s = df.where(g.isin([group_a, group_b]) & v.isNotNull()).select(
        v.alias("__val"),
        F.when(g == F.lit(group_a), 1).otherwise(0).alias("__ia"),
        F.when(g == F.lit(group_b), 1).otherwise(0).alias("__ib"),
    )
    return s.groupBy("__val").agg(
        F.sum("__ia").alias("__ca"), F.sum("__ib").alias("__cb")
    )


def _contingency(df: DataFrame, col_a: str, col_b: str):
    """Shared contingency reduction for the categorical-association
    tests: (obs(__a,__b,__o), row_marginals, col_marginals) with NULL
    categories excluded."""
    a, b = F.col(col_a), F.col(col_b)
    # localCheckpoint: obs feeds marginals, totals, AND the expected-
    # count join — without pinning, each consumer's job re-scans the
    # raw lineage to rebuild a table bounded by category-product
    # cardinality (one-raw-scan discipline; exchange reuse alone is
    # conditional on the shuffle surviving).
    obs = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__o"))
        .localCheckpoint(eager=True)
    )
    row_m = obs.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    col_m = obs.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    return obs, row_m, col_m


def ks_test(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: did the distribution of
    ``value_col`` shift between two cohorts?  Returns ONE row
    ``(d_stat, p_value, n_a, n_b)`` where ``d_stat`` is the exact
    supremum |F_a(x) − F_b(x)| over the empirical CDFs and ``p_value``
    the Smirnov asymptotic approximation ``min(1, 2·exp(−2λ²))`` with
    ``λ = (√n_eff + 0.12 + 0.11/√n_eff)·D`` (one-term; exact enough for
    the "is this drift real" decision at data-pipeline sample sizes).

    Scale shape: the raw rows reduce to a DISTINCT-VALUE count table
    first (groupBy value → (count_a, count_b)), so everything after the
    first aggregation is bounded by value cardinality, not row volume;
    the two cumulative counts ride ONE range-partitioned two-phase
    prefix sum (`global_prefix_sum` — no single-partition window).

    Complements `corpus_divergence` (JS/PSI over binned histograms):
    KS is binning-free and comes with a significance level.  Groups
    absent from the data yield NULL d_stat rather than raising — the
    caller sees (NULL, NULL, 0, n) and can decide.
    """
    counts = _group_value_counts(df, value_col, group_col, group_a, group_b)
    from .sampling import global_prefix_sum

    cum = global_prefix_sum(
        counts,
        ["__ca", "__cb"],
        [F.col("__val").asc()],
        out_col=["__cum_a", "__cum_b"],
        num_partitions=num_partitions,
    )
    tot = counts.agg(F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b"))
    j = cum.crossJoin(F.broadcast(tot))  # tot is ONE row
    # try_divide: an absent cohort (count 0) must yield NULL, not an
    # ANSI divide-by-zero, so the caller sees (NULL, NULL, 0, n)
    res = j.agg(
        F.max(
            F.abs(
                F.try_divide(F.col("__cum_a"), F.col("n_a"))
                - F.try_divide(F.col("__cum_b"), F.col("n_b"))
            )
        ).alias("__d"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    n_eff = F.try_divide(F.col("n_a") * F.col("n_b"), F.col("n_a") + F.col("n_b"))
    lam = (F.sqrt(n_eff) + F.lit(0.12) + F.try_divide(F.lit(0.11), F.sqrt(n_eff))) * F.col(
        "__d"
    )
    p = F.least(F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * lam * lam))
    return res.select(
        F.round("__d", round_to).alias("d_stat"),
        F.round(p, round_to).alias("p_value"),
        "n_a",
        "n_b",
    )


def mann_whitney_u(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum): the nonparametric "is cohort
    A stochastically larger than cohort B" test — robust where the
    Welch `ab_test` is distorted by heavy tails.  Returns ONE row
    ``(u_a, u_b, z_score, n_a, n_b)``; z uses the normal approximation
    with the standard tie correction (valid for n ≳ 20 per side — i.e.
    always, at pipeline scale).  Sign convention: positive z means
    group_a's values rank higher.

    Scale shape: identical to `ks_test` — reduce to the distinct-value
    count table, ONE two-phase prefix sum for the cumulative combined
    count (average rank of a tied run = preceding count + (run+1)/2),
    then rank sums and tie terms are plain aggregates over the
    value-cardinality-sized table.
    """
    counts = _group_value_counts(
        df, value_col, group_col, group_a, group_b
    ).withColumn("__c", F.col("__ca") + F.col("__cb"))
    from .sampling import global_prefix_sum

    cum = global_prefix_sum(
        counts, "__c", [F.col("__val").asc()], out_col="__cum", num_partitions=num_partitions
    )
    # average rank of the tied run ending at cumulative count __cum:
    # ranks (__cum-__c+1 .. __cum) average to __cum - __c + (__c+1)/2
    avg_rank = F.col("__cum") - F.col("__c") + (F.col("__c") + F.lit(1.0)) / F.lit(2.0)
    agg = cum.agg(
        F.sum(F.col("__ca") * avg_rank).alias("__ra"),
        F.sum("__ca").alias("n_a"),
        F.sum("__cb").alias("n_b"),
        F.sum(
            F.pow(F.col("__c").cast("double"), F.lit(3.0)) - F.col("__c")
        ).alias("__ties"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    u_a = F.col("__ra") - na * (na + F.lit(1)) / F.lit(2.0)
    u_b = na.cast("double") * nb - u_a
    mu = na * nb / F.lit(2.0)
    # try_divide twice: n<2 (tie term) and sigma=0 (ALL values tied)
    # both mean "no test", which must read as NULL z, not an ANSI error
    sigma = F.sqrt(
        na * nb / F.lit(12.0)
        * ((n + F.lit(1)) - F.try_divide(F.col("__ties"), n * (n - F.lit(1))))
    )
    return agg.select(
        F.round(u_a, round_to).alias("u_a"),
        F.round(u_b, round_to).alias("u_b"),
        F.round(F.try_divide(u_a - mu, sigma), round_to).alias("z_score"),
        "n_a",
        "n_b",
    )


def chi_square_test(
    df: DataFrame,
    *,
    col_a: str,
    col_b: str,
    round_to: int = 4,
) -> DataFrame:
    """Chi-square test of independence between two categorical columns,
    plus Cramér's V effect size — the "did the label mix shift per
    segment" drift check for categorical features.  Returns ONE row
    ``(chi2, dof, n, cramers_v)``.

    Scale shape: the raw table reduces to the contingency table in one
    map-side-combinable aggregation; marginals are aggregations OF the
    contingency table (bounded by category-product cardinality, never
    row volume) broadcast back onto it.  NULL categories are excluded
    (a NULL level is a completeness question — `profile_table`'s job).
    """
    obs, row_m, col_m = _contingency(df, col_a, col_b)
    tot = obs.agg(
        F.sum("__o").alias("__n"),
        F.countDistinct("__a").alias("__r"),
        F.countDistinct("__b").alias("__c"),
    )
    j = (
        obs.join(F.broadcast(row_m), "__a")
        .join(F.broadcast(col_m), "__b")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("__ra").cast("double") * F.col("__cb") / F.col("__n")
    cell = F.pow(F.col("__o") - e, F.lit(2.0)) / e
    res = j.agg(
        F.sum(cell).alias("__chi2"),
        F.max("__n").alias("n"),
        F.max("__r").alias("__r"),
        F.max("__c").alias("__c"),
    )
    dof = (F.col("__r") - F.lit(1)) * (F.col("__c") - F.lit(1))
    vmin = F.least(F.col("__r") - F.lit(1), F.col("__c") - F.lit(1))
    cramers = F.sqrt(F.col("__chi2") / (F.col("n") * vmin))
    return res.select(
        F.round("__chi2", round_to).alias("chi2"),
        dof.alias("dof"),
        "n",
        F.round(cramers, round_to).alias("cramers_v"),
    )


def benford_test(
    df: DataFrame,
    *,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated/synthetic-numbers screen for ingested financial
    or measurement columns.  Returns one row per OBSERVED leading digit
    ``(digit, n, observed_p, expected_p, chi2_contrib)``; sum
    ``chi2_contrib`` and compare against χ²₈ (15.51 at 5%) for the
    verdict, or eyeball the per-digit deviations to see WHERE the
    distribution bends (the diagnostic the single number hides).

    Zero, NULL, and NaN values are excluded (they have no leading
    digit); sign is ignored.  One aggregation over the raw rows; the
    digit extraction ``floor(|x| / 10^floor(log10 |x|))`` is pure
    codegen.
    """
    x = F.abs(F.col(value_col).cast("double"))
    ok = x.isNotNull() & (x > 0) & ~F.isnan(x)
    raw_digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    # doubles a hair below a power of ten (9.999...e-301) make log10
    # round UP to the integer exponent, so the quotient lands just
    # under 1 and floors to 0 — the true leading digit there is 9, and
    # an unguarded 0 would divide-by-zero in expected_p under ANSI
    digit = F.when(raw_digit < 1, F.lit(9)).otherwise(raw_digit)
    obs = (
        df.where(ok)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("__t"))
    j = obs.crossJoin(F.broadcast(tot))
    obs_p = F.col("n") / F.col("__t")
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    e_cnt = exp_p * F.col("__t")
    return j.select(
        "digit",
        "n",
        F.round(obs_p, round_to).alias("observed_p"),
        F.round(exp_p, round_to).alias("expected_p"),
        F.round(F.pow(F.col("n") - e_cnt, F.lit(2.0)) / e_cnt, round_to).alias(
            "chi2_contrib"
        ),
    ).orderBy("digit")


def gini_coefficient(
    df: DataFrame,
    *,
    value_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Gini concentration coefficient of ``value_col`` (0 = perfectly
    even, →1 = one row holds everything) — the "is 1% of domains 90% of
    the corpus / 1% of customers 90% of revenue" inequality measure,
    via the exact sorted formulation G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n.

    Grouped (``by=``): ranks come from ONE keyed window shuffle (state
    bounded by group size).  Ungrouped: rank = two-phase global prefix
    sum of ones — no single-partition window at corpus scale.  Within a
    run of equal values Σ i·xᵢ is tie-order invariant (consecutive
    ranks × the same x), so no tie-break column is needed.  NULLs are
    excluded; negative values make G ill-defined and are the caller's
    responsibility to filter.

    Returns ``by..., gini, n``.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    keys = list(by or [])
    s = df.where(v.isNotNull())
    if keys:
        ranked = s.select(*keys, v.alias("__x")).withColumn(
            "__i", F.row_number().over(Window.partitionBy(*keys).orderBy(F.col("__x").asc()))
        )
    else:
        from .sampling import global_prefix_sum

        ranked = global_prefix_sum(
            s.select(v.alias("__x"), F.lit(1).alias("__one")),
            "__one",
            [F.col("__x").asc()],
            out_col="__i",
            num_partitions=num_partitions,
        )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__i") * F.col("__x")).alias("__six"),
    )
    n_, sx = F.col("n"), F.col("__sx")
    # try_divide: an empty input (ungrouped agg still emits one row with
    # n=0) or an all-zero column reads as NULL gini, not an ANSI error
    g = F.try_divide(F.lit(2.0) * F.col("__six"), n_ * sx) - F.try_divide(
        n_ + F.lit(1.0), n_
    )
    return agg.select(*keys, F.round(g, round_to).alias("gini"), "n")


def fit_ols(
    df: DataFrame,
    *,
    x_cols: list[str],
    y_col: str,
) -> dict:
    """Multiple linear regression by distributed normal equations —
    `linear_fit` generalized to d features: TWO schema-bounded
    aggregations (means first, then CENTERED second moments — the same
    cancellation discipline as `fit_mahalanobis`: the one-pass
    E[xy]−mx·my form loses ~9 digits on large-magnitude features),
    then a driver-side d×d solve.  Everything row-wise is pure JVM
    codegen (d²/2+d sum expressions, map-side combinable); no Python
    touches the data path.

    Returns ``{"x_cols", "coef", "intercept", "r2", "n"}`` for
    `apply_ols`.  Rows with any NULL feature or label are excluded.
    Raises on n ≤ d (underdetermined) or a singular Gram matrix
    (collinear features — drop one).
    """
    import numpy as np

    d = len(x_cols)
    xs = [F.col(c).cast("double") for c in x_cols]
    y = F.col(y_col).cast("double")
    ok = y.isNotNull()
    for x in xs:
        ok = ok & x.isNotNull()
    base = df.where(ok)

    means = base.agg(
        *[F.avg(x).alias(f"mx{i}") for i, x in enumerate(xs)],
        F.avg(y).alias("my"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = means["n"]
    if n <= d:
        raise ValueError(f"fit_ols: n={n} rows cannot determine {d} coefficients")
    mx = [means[f"mx{i}"] for i in range(d)]
    my = means["my"]

    cx = [x - F.lit(m) for x, m in zip(xs, mx)]
    cy = y - F.lit(my)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(cx[i] * cx[j]).alias(f"g{i}_{j}"))
        aggs.append(F.sum(cx[i] * cy).alias(f"c{i}"))
    aggs.append(F.sum(cy * cy).alias("sst"))
    row = base.agg(*aggs).collect()[0]

    g = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            g[i, j] = g[j, i] = row[f"g{i}_{j}"]
    c = np.array([row[f"c{i}"] for i in range(d)])
    sst = row["sst"]
    # condition number, not |det|: a determinant threshold is scale-
    # dependent (huge-magnitude near-collinear features pass it and
    # solve() emits garbage; tiny well-conditioned ones fail it).
    # cond > ~1e12 leaves < 4 significant digits in double precision.
    cond = np.linalg.cond(g)
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            f"fit_ols: singular/ill-conditioned Gram matrix (cond={cond:.3g}) "
            "— features are (near-)collinear; drop or combine one"
        )
    coef = np.linalg.solve(g, c)
    intercept = my - float(coef @ np.array(mx))
    sse = sst - float(coef @ c)
    r2 = 1.0 - sse / sst if sst > 0 else None
    return {
        "x_cols": list(x_cols),
        "coef": coef.tolist(),
        "intercept": intercept,
        "r2": r2,
        "n": n,
    }


def apply_ols(
    df: DataFrame,
    model: dict,
    *,
    out_col: str = "prediction",
    residual_col: str | None = None,
    y_col: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Apply a `fit_ols` model: adds the fitted value (pure-codegen
    linear combination — scan-speed at any scale) and optionally the
    residual against ``y_col`` (the de-trending / anomaly input).  NULL
    features yield NULL predictions."""
    pred = F.lit(model["intercept"])
    for c, b in zip(model["x_cols"], model["coef"]):
        pred = pred + F.lit(b) * F.col(c).cast("double")
    if round_to is not None:
        pred = F.round(pred, round_to)
    out = df.withColumn(out_col, pred)
    if residual_col is not None:
        if y_col is None:
            raise ValueError("residual_col requires y_col")
        res = F.col(y_col).cast("double") - F.col(out_col)
        if round_to is not None:
            res = F.round(res, round_to)
        out = out.withColumn(residual_col, res)
    return out


# Poisson(1) inverse-CDF thresholds (cumulative e^{-1}/k! sums, k=0..8);
# mass beyond 9 is < 1.2e-6 — the draw clamps there
_POISSON1_CUM = [
    0.36787944117144233,
    0.7357588823428847,
    0.919698602928606,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988747278268,
]


def bootstrap_ci(
    df: DataFrame,
    *,
    value_col: str,
    id_col: str,
    stat: str = "mean",
    n_replicates: int = 200,
    conf: float = 0.95,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Bootstrap confidence interval for a corpus-level statistic via
    the POISSON bootstrap — the one-pass distributed formulation:
    instead of resampling n rows with replacement (which needs n known
    up front and a global shuffle per replicate), each row draws an
    independent Poisson(1) weight per replicate, which converges to
    multinomial resampling at corpus n.  Returns ONE row ``(estimate,
    se, ci_lo, ci_hi, n, n_replicates)`` — the percentile interval
    over replicate statistics plus the bootstrap standard error.

    Weights are md5-derived from ``(id, replicate, seed)`` — fully
    deterministic and re-derivable by any engine (the DuckDB oracle
    reproduces the exact interval).  ``stat``: "mean" (weighted mean
    per replicate) or "sum" (weighted sum — for totals, each replicate
    sum is comparable because E[w]=1).

    Scale shape: each row expands to ``n_replicates`` (replicate,
    weighted-value) pairs MAP-SIDE, but partial aggregation combines
    them to ``n_replicates`` rows per partition before the shuffle —
    shuffle volume is replicates × partitions, never replicates × rows;
    the replicate table (B rows) reduces on the driver side of one
    final aggregation.  ``id_col`` must be unique per row.
    """
    if stat not in ("mean", "sum"):
        raise ValueError("stat must be 'mean' or 'sum'")
    if not (0 < conf < 1):
        raise ValueError("conf must be in (0, 1)")
    B = int(n_replicates)
    x = F.col(value_col).cast("double")
    rid = F.col(id_col)
    base = df.where(x.isNotNull() & rid.isNotNull())

    def _w(b, rid_col):
        from .sampling import _md5_uniform

        # md5("rid:b:seed") via the ONE canonical hash-to-uniform
        u = _md5_uniform(
            F.concat_ws(":", rid_col.cast("string"), b.cast("string")), seed
        )
        w = F.lit(9)
        for k in range(len(_POISSON1_CUM) - 1, -1, -1):
            w = F.when(u < F.lit(_POISSON1_CUM[k]), F.lit(k)).otherwise(w)
        return w.cast("double")

    # the replicate expansion is B md5 evaluations PER ROW — compute-
    # dense map work that must not serialize on a handful of input
    # splits (guide §2.5 input skew: a single compacted file would run
    # the whole expansion on one core; at real scale the scan already
    # exceeds default parallelism and this is a no-op)
    from .dedup import _ensure_parallelism

    rep = (
        _ensure_parallelism(base.select(x.alias("__x"), rid.alias("__rid")))
        .select(
            "__x",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(B - 1)),
                    lambda b: F.struct(b.alias("b"), _w(b, F.col("__rid")).alias("w")),
                )
            ).alias("e"),
        )
        .select(
            F.col("e.b").alias("__b"),
            (F.col("e.w") * F.col("__x")).alias("__wx"),
            F.col("e.w").alias("__w"),
        )
        .groupBy("__b")
        .agg(F.sum("__wx").alias("__swx"), F.sum("__w").alias("__sw"))
    )
    rstat = (
        F.try_divide(F.col("__swx"), F.col("__sw"))
        if stat == "mean"
        else F.col("__swx")
    )
    lo, hi = (1 - conf) / 2, 1 - (1 - conf) / 2
    reps = rep.select(rstat.alias("__r")).agg(
        F.percentile(F.col("__r"), F.lit(lo)).alias("__lo"),
        F.percentile(F.col("__r"), F.lit(hi)).alias("__hi"),
        F.stddev_samp("__r").alias("__se"),
    )
    point = base.agg(
        (F.avg(x) if stat == "mean" else F.sum(x)).alias("__est"),
        F.count(F.lit(1)).alias("n"),
    )
    return point.crossJoin(F.broadcast(reps)).select(  # both ONE row
        F.round("__est", round_to).alias("estimate"),
        F.round("__se", round_to).alias("se"),
        F.round("__lo", round_to).alias("ci_lo"),
        F.round("__hi", round_to).alias("ci_hi"),
        "n",
        F.lit(B).alias("n_replicates"),
    )


def diff_in_diff(
    df: DataFrame,
    *,
    group_col: str,
    period_col: str,
    metric_col: str,
    treat_value,
    post_value,
    control_value=None,
    round_to: int = 6,
) -> DataFrame:
    """Two-group two-period difference-in-differences: the treatment
    effect estimate when you COULDN'T randomize — subtracting the
    control group's pre→post drift removes the shared time trend a
    naive before/after comparison absorbs.  Returns ONE row
    ``mean_treat_pre, mean_treat_post, mean_ctrl_pre, mean_ctrl_post,
    att, se, z_score, n`` where att = (T_post−T_pre) − (C_post−C_pre)
    and se pools the four cell variances (unequal-variance normal
    approximation, same convention as `ab_test`).

    ONE conditional aggregation over the metric table — every cell's
    n/mean/variance in a single map-side-combinable pass.  Control is
    every non-treat group, or exactly ``control_value`` when given
    (other groups then excluded); ``period_col`` is binarized against
    ``post_value``.
    """
    g = F.col(group_col)
    y = F.col(metric_col).cast("double")
    is_post = F.col(period_col) == F.lit(post_value)
    is_treat = g == F.lit(treat_value)
    base = df.where(y.isNotNull())
    if control_value is not None:
        base = base.where(is_treat | (g == F.lit(control_value)))

    def cell(t: bool, p: bool):
        cond = (is_treat if t else ~is_treat) & (is_post if p else ~is_post)
        return F.when(cond, y)

    agg = base.agg(
        *[
            a
            for t, p, tag in (
                (True, False, "tp"),
                (True, True, "tq"),
                (False, False, "cp"),
                (False, True, "cq"),
            )
            for a in (
                F.avg(cell(t, p)).alias(f"m_{tag}"),
                F.var_samp(cell(t, p)).alias(f"v_{tag}"),
                F.count(cell(t, p)).alias(f"n_{tag}"),
            )
        ]
    )
    att = (F.col("m_tq") - F.col("m_tp")) - (F.col("m_cq") - F.col("m_cp"))
    se = F.sqrt(
        F.col("v_tp") / F.col("n_tp")
        + F.col("v_tq") / F.col("n_tq")
        + F.col("v_cp") / F.col("n_cp")
        + F.col("v_cq") / F.col("n_cq")
    )
    return agg.select(
        F.round("m_tp", round_to).alias("mean_treat_pre"),
        F.round("m_tq", round_to).alias("mean_treat_post"),
        F.round("m_cp", round_to).alias("mean_ctrl_pre"),
        F.round("m_cq", round_to).alias("mean_ctrl_post"),
        F.round(att, round_to).alias("att"),
        F.round(se, round_to).alias("se"),
        F.round(F.try_divide(att, se), 4).alias("z_score"),
        (F.col("n_tp") + F.col("n_tq") + F.col("n_cp") + F.col("n_cq")).alias("n"),
    )


def cuped_adjust(
    df: DataFrame,
    *,
    metric_col: str,
    covariate_col: str,
    out_col: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13): replaces the
    experiment metric with ``y − θ(x − E[x])`` where x is a
    PRE-experiment covariate (last month's spend, historical CTR) and
    θ = cov(x,y)/var(x) — the regression adjustment that shrinks
    metric variance by the covariate's r², so `ab_test` on the
    adjusted column detects the same effect with ~1/(1−r²) fewer
    users.  Group means shift identically (θ and E[x] are GLOBAL
    constants), so treatment-effect estimates are unbiased as long as
    the covariate predates assignment.

    ONE moment aggregation (covar/var/mean, map-side combinable)
    broadcast as a one-row join; the adjustment itself is a codegen
    projection.  Rows with NULL covariate keep ``y`` unadjusted
    (θ·0 correction) rather than dropping.
    """
    out = out_col or f"{metric_col}_cuped"
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    stats = df.where(y.isNotNull() & x.isNotNull()).agg(
        F.try_divide(F.covar_samp(x, y), F.var_samp(x)).alias("__theta"),
        F.avg(x).alias("__mx"),
    )
    j = df.crossJoin(F.broadcast(stats))  # ONE row
    adj = F.when(
        x.isNotNull(),
        y - F.coalesce(F.col("__theta"), F.lit(0.0)) * (x - F.col("__mx")),
    ).otherwise(y)
    if round_to is not None:
        adj = F.round(adj, round_to)
    return j.withColumn(out, adj).drop("__theta", "__mx")


def fit_conformal(
    df: DataFrame,
    *,
    x_cols: list[str],
    y_col: str,
    id_col: str,
    alpha: float = 0.1,
    calib_frac: float = 0.3,
    seed: int = 42,
    num_partitions: int | None = None,
) -> dict:
    """Split-conformal prediction intervals over an OLS point model —
    DISTRIBUTION-FREE uncertainty: ``ŷ ± q`` covers the true y with
    probability ≥ 1−α on exchangeable data, no Gaussian-residual
    assumption (the OLS ±1.96σ̂ band has no such guarantee).

    Split: rows hash to calibration with probability ``calib_frac``
    (md5-deterministic on ``id_col`` — auditable, engine-rederivable);
    the model fits on the REST (using calibration residuals for both
    jobs voids the guarantee).  q is the ⌈(n_cal+1)(1−α)⌉-th order
    statistic of calibration |residuals| — found EXACTLY by two-phase
    prefix-sum rank + a rank-k filter, never a driver-side sort of 30%
    of the corpus.  Returns ``{"ols", "q", "alpha", "n_train",
    "n_calib"}`` for `apply_conformal`.
    """
    import math

    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    if not (0 < calib_frac < 1):
        raise ValueError("calib_frac must be in (0, 1)")
    from .sampling import _md5_uniform, global_prefix_sum

    is_calib = _md5_uniform(id_col, seed) < F.lit(calib_frac)
    train = df.where(~is_calib)
    calib = df.where(is_calib)
    model = fit_ols(train, x_cols=x_cols, y_col=y_col)

    res = apply_ols(
        calib, model, out_col="__pred", residual_col="__res", y_col=y_col
    ).select(F.abs(F.col("__res")).alias("__ares"), F.col(id_col).alias("__id"))
    res = res.where(F.col("__ares").isNotNull())
    n_cal = res.count()
    if n_cal == 0:
        raise ValueError("fit_conformal: empty calibration split")
    k = min(n_cal, math.ceil((n_cal + 1) * (1 - alpha)))
    ranked = global_prefix_sum(
        res.withColumn("__one", F.lit(1)),
        "__one",
        [F.col("__ares").asc(), F.col("__id").asc()],
        out_col="__rank",
        num_partitions=num_partitions,
    )
    q = ranked.where(F.col("__rank") == k).select("__ares").collect()[0][0]
    return {
        "ols": model,
        "q": float(q),
        "alpha": float(alpha),
        "n_train": model["n"],
        "n_calib": n_cal,
    }


def apply_conformal(
    df: DataFrame,
    model: dict,
    *,
    out_prefix: str = "pred",
    round_to: int | None = None,
) -> DataFrame:
    """Apply a `fit_conformal` model: adds ``<prefix>`` (the OLS point
    prediction), ``<prefix>_lo`` and ``<prefix>_hi`` (the 1−α
    conformal band) — a pure-codegen projection, scan-speed at any
    scale.  NULL features yield NULL intervals."""
    out = apply_ols(df, model["ols"], out_col=out_prefix, round_to=round_to)
    q = F.lit(model["q"])
    lo = F.col(out_prefix) - q
    hi = F.col(out_prefix) + q
    if round_to is not None:
        lo, hi = F.round(lo, round_to), F.round(hi, round_to)
    return out.withColumn(f"{out_prefix}_lo", lo).withColumn(
        f"{out_prefix}_hi", hi
    )


def mutual_information(
    df: DataFrame,
    *,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information between two categorical columns (nats), with
    the normalized variant: ONE row ``(mi, nmi, h_a, h_b, n)`` where
    nmi = MI/min(H(a),H(b)) ∈ [0,1].  The association measure that —
    unlike `chi_square_test`'s p-value — doesn't saturate at corpus n
    (everything is "significant" at 10⁹ rows; MI measures HOW MUCH
    structure, in bits' worth of nats).

    Same contingency-table shape as chi-square: raw rows reduce once,
    marginals aggregate the bounded table and broadcast back; entropies
    fold as Σ −p ln p.  NULL categories are excluded.
    """
    obs, row_m, col_m = _contingency(df, col_a, col_b)
    tot = obs.agg(F.sum("__o").alias("__n"))
    j = (
        obs.join(F.broadcast(row_m), "__a")
        .join(F.broadcast(col_m), "__b")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("__n").cast("double")
    pij = F.col("__o") / n
    pi = F.col("__ra") / n
    pj = F.col("__cb") / n
    agg = j.agg(
        F.sum(pij * F.log(pij / (pi * pj))).alias("__mi"),
        F.max("__n").alias("n"),
    )
    ha = (
        row_m.crossJoin(F.broadcast(tot))
        .agg(F.sum(-(F.col("__ra") / n) * F.log(F.col("__ra") / n)).alias("__ha"))
    )
    hb = (
        col_m.crossJoin(F.broadcast(tot))
        .agg(F.sum(-(F.col("__cb") / n) * F.log(F.col("__cb") / n)).alias("__hb"))
    )
    out = agg.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    nmi = F.try_divide(F.col("__mi"), F.least(F.col("__ha"), F.col("__hb")))
    return out.select(
        F.round("__mi", round_to).alias("mi"),
        F.round(nmi, round_to).alias("nmi"),
        F.round("__ha", round_to).alias("h_a"),
        F.round("__hb", round_to).alias("h_b"),
        "n",
    )


def fdr_correct(
    df: DataFrame,
    *,
    p_col: str,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Benjamini–Hochberg false-discovery-rate correction over a table
    of test results — the fix for "we ran `ab_test`/`ks_test` on 500
    metrics and 25 came up significant by luck".  Adds ``rank``
    (ascending p), ``q_value`` (the BH adjusted p: monotone suffix-min
    of p·m/rank) and ``rejected`` (q ≤ alpha ⟺ the classic step-up
    rule).  Expected false-discovery fraction among rejections ≤ alpha
    under independence/PRDS.

    The input is one row per TEST (experiments, features, segments) —
    bounded by the number of tests, not data volume, so the two
    ordered windows run on a table of at most thousands of rows; the
    heavy lifting happened upstream in the per-test operators.  NULL
    p-values are excluded.
    """
    from pyspark.sql import Window

    p = F.col(p_col).cast("double")
    base = df.where(p.isNotNull())
    w_rank = Window.orderBy(p.asc())
    m = base.count()
    ranked = base.withColumn("rank", F.row_number().over(w_rank))
    # suffix-min scans by RANK desc (a total order), not p desc: tied
    # p-values share adj only through rank, and a p-ordered scan frame
    # is nondeterministic among ties — BH would reject one of two
    # identical p-values and flip which between runs
    w_suffix = Window.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adj = F.least(F.lit(1.0), p * F.lit(float(m)) / F.col("rank"))
    out = ranked.withColumn("__adj", adj).withColumn(
        "q_value", F.round(F.min("__adj").over(w_suffix), round_to)
    )
    return out.drop("__adj").withColumn(
        "rejected", F.col("q_value") <= F.lit(float(alpha))
    )


def ratio_ab_test(
    df: DataFrame,
    *,
    group_col: str,
    num_col: str,
    den_col: str,
    baseline,
    round_to: int = 6,
) -> DataFrame:
    """A/B test for RATIO metrics (CTR = Σclicks/Σviews, revenue per
    session) with the delta-method variance — the correct math where
    `ab_test` on per-row ratios is wrong twice over: row-level ratios
    weight every unit equally regardless of exposure, and the ratio of
    sums is a ratio of two CORRELATED random totals whose variance the
    naive per-unit σ²/n ignores.  Input is one row per randomization
    UNIT (user: clicks, views); returns one row per non-baseline group
    with ``group, n_base, n_treat, ratio_base, ratio_treat, diff, se,
    z_score``.

    Var(R) ≈ (σ_n² − 2R·σ_nd + R²·σ_d²) / (k·μ_d²) per group (Deng et
    al.'s standard delta method); the se pools both groups.  ONE
    moment aggregation per group (all map-side-combinable), baseline
    broadcast as one row.  Units with NULL or zero denominator still
    count (a user shown nothing IS part of the experiment) — drop them
    upstream only if that's the intended estimand.
    """
    g = F.col(group_col)
    n_ = F.coalesce(F.col(num_col).cast("double"), F.lit(0.0))
    d_ = F.coalesce(F.col(den_col).cast("double"), F.lit(0.0))
    stats = df.groupBy(g.alias("grp")).agg(
        F.count(F.lit(1)).alias("k"),
        F.avg(n_).alias("mn"),
        F.avg(d_).alias("md"),
        F.var_samp(n_).alias("vn"),
        F.var_samp(d_).alias("vd"),
        F.covar_samp(n_, d_).alias("vnd"),
    )
    ratio = F.try_divide(F.col("mn"), F.col("md"))
    var_r = F.try_divide(
        F.col("vn")
        - F.lit(2.0) * ratio * F.col("vnd")
        + ratio * ratio * F.col("vd"),
        F.col("k") * F.col("md") * F.col("md"),
    )
    enriched = stats.select(
        "grp", "k", ratio.alias("r"), var_r.alias("vr")
    )
    base = enriched.where(F.col("grp") == F.lit(baseline)).select(
        F.col("k").alias("n_base"),
        F.col("r").alias("r_base"),
        F.col("vr").alias("vr_base"),
    )
    if not base.head(1):
        raise ValueError(f"baseline group {baseline!r} not present")
    treat = enriched.where(F.col("grp") != F.lit(baseline))
    j = treat.crossJoin(F.broadcast(base))  # ONE row
    se = F.sqrt(F.col("vr") + F.col("vr_base"))
    return j.select(
        F.col("grp").alias("group"),
        "n_base",
        F.col("k").alias("n_treat"),
        F.round("r_base", round_to).alias("ratio_base"),
        F.round("r", round_to).alias("ratio_treat"),
        F.round(F.col("r") - F.col("r_base"), round_to).alias("diff"),
        F.round(se, round_to).alias("se"),
        F.round(F.try_divide(F.col("r") - F.col("r_base"), se), 4).alias("z_score"),
    ).orderBy("group")


def effective_sample_size(
    df: DataFrame,
    *,
    weight_col: str,
    by: list[str] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Kish effective sample size for weighted data: ESS = (Σw)²/Σw² —
    the honest n after importance weighting (`dsir_importance_weights`,
    survey calibration, inverse-propensity).  A 10M-row corpus whose
    DSIR weights concentrate on 40k rows has ESS ≈ 40k: that's the
    sample size your variance actually reflects, and reading anything
    downstream as if n were 10M is self-deception.  Returns ``by...,
    n, ess, ess_ratio`` (ratio = ESS/n; < 0.1 means the weighting has
    effectively discarded 90%+ of the data — reconsider the target).

    ONE map-side-combinable aggregation; non-positive and NULL weights
    are excluded (they carry no sampling mass).
    """
    keys = list(by or [])
    w = F.col(weight_col).cast("double")
    base = df.where(w.isNotNull() & (w > 0))
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("__sw"),
        F.sum(w * w).alias("__sw2"),
    )
    ess = F.try_divide(F.col("__sw") * F.col("__sw"), F.col("__sw2"))
    return agg.select(
        *keys,
        "n",
        F.round(ess, round_to).alias("ess"),
        F.round(F.try_divide(ess, F.col("n")), round_to).alias("ess_ratio"),
    ).orderBy(*keys)


def apdex(
    df: DataFrame,
    *,
    latency_col: str,
    threshold: float,
    by: list[str] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Apdex score + SLO compliance per group: satisfied (≤ T),
    tolerating (≤ 4T, weight ½), frustrated (> 4T, weight 0) — the
    industry-standard user-satisfaction collapse of a latency
    distribution, reported alongside the raw compliance percentiles it
    summarizes: ``by..., n, pct_satisfied, pct_tolerating,
    pct_frustrated, apdex, p50, p95, p99``.

    ONE aggregation (conditional counts + exact percentiles share the
    pass).  NULL and negative latencies are excluded (a negative
    latency is a clock bug, not a fast request).
    """
    keys = list(by or [])
    v = F.col(latency_col).cast("double")
    base = df.where(v.isNotNull() & (v >= 0))
    t = float(threshold)
    sat = (v <= t).cast("int")
    tol = ((v > t) & (v <= 4 * t)).cast("int")
    fru = (v > 4 * t).cast("int")
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sat).alias("__s"),
        F.sum(tol).alias("__t"),
        F.sum(fru).alias("__f"),
        F.round(F.percentile(v, F.lit(0.5)), round_to).alias("p50"),
        F.round(F.percentile(v, F.lit(0.95)), round_to).alias("p95"),
        F.round(F.percentile(v, F.lit(0.99)), round_to).alias("p99"),
    )
    n_ = F.col("n")
    return agg.select(
        *keys,
        "n",
        F.round(F.try_divide(F.col("__s"), n_), round_to).alias("pct_satisfied"),
        F.round(F.try_divide(F.col("__t"), n_), round_to).alias("pct_tolerating"),
        F.round(F.try_divide(F.col("__f"), n_), round_to).alias("pct_frustrated"),
        F.round(
            F.try_divide(F.col("__s") + F.col("__t") / F.lit(2.0), n_), round_to
        ).alias("apdex"),
        "p50",
        "p95",
        "p99",
    ).orderBy(*keys)


def anova_oneway(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    round_to: int = 4,
) -> DataFrame:
    """One-way ANOVA: the k-group generalization of `ab_test` — "does
    the metric's MEAN differ across ANY of these variants/segments", the
    first screen before pairwise drill-down (which, run naively across k
    groups, is exactly the multiplicity trap `fdr_correct` exists for).
    Returns ONE row ``(f_stat, eta_sq, df_between, df_within, n, k)``;
    eta² = SSB/(SSB+SSW) is the variance-explained effect size.

    Scale shape: ONE map-side-combinable aggregation reduces the raw
    table to k rows of (n, mean, var_samp) — Spark's var_samp is the
    stable central-moment form, so no sum-of-squares cancellation.  SSB
    is computed from means CENTERED on the broadcast grand mean (never
    Σn·m² − N·gm², which loses digits at epoch-scale magnitudes); all
    further arithmetic runs on the k-row table.  Singleton groups
    contribute 0 to SSW (their var_samp is NULL), staying in N and k.
    Reference analog: the hypothesis-testing tier of
    awswrangler-style exploratory stats (no direct reference fn).
    """
    v = F.col(value_col).cast("double")
    base = df.where(
        F.col(group_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
    )
    g = base.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(v).alias("__m"),
        F.var_samp(v).alias("__v"),
    )
    # NOTE: Spark resolution is case-insensitive — the total-row columns
    # must not collide with g's (__n vs __N reads as ambiguous).
    tot = g.agg(
        F.sum("__n").alias("__ntot"),
        F.sum(F.col("__m") * F.col("__n")).alias("__msum"),
        F.count(F.lit(1)).alias("__kgrp"),
    )
    j = g.crossJoin(F.broadcast(tot))
    gm = F.col("__msum") / F.col("__ntot")
    a = j.agg(
        F.sum(
            F.col("__n") * F.pow(F.col("__m") - gm, F.lit(2.0))
        ).alias("__ssb"),
        F.sum(
            F.coalesce(F.col("__v"), F.lit(0.0)) * (F.col("__n") - F.lit(1))
        ).alias("__ssw"),
        F.max("__ntot").alias("n"),
        F.max("__kgrp").alias("k"),
    )
    dfb = (F.col("k") - F.lit(1)).cast("long")
    dfw = (F.col("n") - F.col("k")).cast("long")
    # try_divide twice: k=1 (no between-variance) and N=k (all-singleton
    # groups, no within-variance) are "no test", not ANSI errors; a
    # zero-SSW constant-within-groups table likewise reads NULL f.
    f_stat = F.try_divide(
        F.try_divide(F.col("__ssb"), dfb.cast("double")),
        F.try_divide(F.col("__ssw"), dfw.cast("double")),
    )
    eta = F.try_divide(F.col("__ssb"), F.col("__ssb") + F.col("__ssw"))
    return a.select(
        F.round(f_stat, round_to).alias("f_stat"),
        F.round(eta, round_to + 2).alias("eta_sq"),
        dfb.alias("df_between"),
        dfw.alias("df_within"),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
    )


def kruskal_wallis(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
    round_to: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Kruskal–Wallis H: the k-group rank test — `mann_whitney_u` for
    more than two cohorts, robust where `anova_oneway` is distorted by
    heavy tails.  Returns ONE row ``(h_stat, dof, n, k)`` with the
    standard tie correction already applied to h_stat.

    Scale shape: raw rows reduce to the (value, group) count table,
    per-value totals get ONE two-phase `global_prefix_sum` for the
    cumulative count (average rank of a tied run = preceding count +
    (run+1)/2 — same identity as mann_whitney_u), ranks join back to
    the count table on the value key (shuffle bounded by distinct-value
    × group cardinality, never row volume), and H is plain aggregates
    of the k-row rank-sum table.  All-tied input (tie correction → 0)
    and n<2 read as NULL h, not an ANSI error.
    """
    v = F.col(value_col).cast("double")
    base = df.where(
        F.col(group_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
    )
    # localCheckpoint: the rank join-back below reads `counts` AGAIN
    # after the prefix-sum pass — without pinning, that second job
    # re-scans the raw (possibly-100TB) lineage to rebuild a table
    # bounded by distinct-value x group cardinality.  One raw scan.
    counts = (
        base.groupBy(v.alias("__val"), F.col(group_col).alias("__g"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=True)
    )
    per_val = counts.groupBy("__val").agg(F.sum("__c").alias("__t"))
    from .sampling import global_prefix_sum

    cum = global_prefix_sum(
        per_val, "__t", [F.col("__val").asc()],
        out_col="__cum", num_partitions=num_partitions,
    )
    avg_rank = F.col("__cum") - F.col("__t") + (F.col("__t") + F.lit(1.0)) / F.lit(2.0)
    ranked = counts.join(
        cum.select("__val", avg_rank.alias("__r")), "__val"
    )
    gs = ranked.groupBy("__g").agg(
        F.sum(F.col("__c") * F.col("__r")).alias("__R"),
        F.sum("__c").alias("__n"),
    )
    ties = cum.agg(
        F.sum(
            F.pow(F.col("__t").cast("double"), F.lit(3.0)) - F.col("__t")
        ).alias("__ties")
    )
    a = gs.crossJoin(F.broadcast(ties)).agg(
        F.sum(F.col("__R") * F.col("__R") / F.col("__n")).alias("__s"),
        F.sum("__n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.max("__ties").alias("__ties"),
    )
    nn = F.col("n").cast("double")
    h_raw = (
        F.lit(12.0) / (nn * (nn + F.lit(1.0))) * F.col("__s")
        - F.lit(3.0) * (nn + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.try_divide(
        F.col("__ties"), nn * nn * nn - nn
    )
    return a.select(
        F.round(F.try_divide(h_raw, corr), round_to).alias("h_stat"),
        (F.col("k") - F.lit(1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
    )


def spearman_corr(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Spearman rank correlation: Pearson on average ranks — the
    monotone-association measure that survives the outliers and
    nonlinearity that flip `stats_summary`'s Pearson corr.  Returns ONE
    row ``(spearman_rho, n)`` over complete cases (both columns
    non-NULL, non-NaN — ranks are computed over the SAME row set the
    correlation runs on).

    Scale shape: the raw table is read EXACTLY once, reducing to the
    pinned (x, y) pair-count table; each axis's midranks come from a
    distinct-value count + ONE two-phase `global_prefix_sum` (fractional
    midrank for ties, same identity as the other rank tests) joined
    back onto the bounded pairs table, and the correlation is a
    weighted Pearson whose moments are CENTERED analytically on the
    exact mean rank (n+1)/2 — no single-task global sort, no one-pass
    cancellation.  Zero-variance ranks (a constant column) read NULL,
    not NaN, matching SQL semantics.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.where(
        x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    ).select(x.alias("__x"), y.alias("__y"))
    from .sampling import global_prefix_sum

    # ONE raw scan: reduce to the (x, y) pair-count table and pin it —
    # both rank tables, the join-back, and the final moments all derive
    # from this bounded table, so the raw lineage is read exactly once
    # (the eager-checkpoint job itself).
    pairs = (
        base.groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=True)
    )

    def _ranks(col: str, out: str) -> DataFrame:
        pv = pairs.groupBy(col).agg(F.sum("__c").alias("__t"))
        cum = global_prefix_sum(
            pv, "__t", [F.col(col).asc()],
            out_col="__cum", num_partitions=num_partitions,
        )
        r = F.col("__cum") - F.col("__t") + (F.col("__t") + F.lit(1.0)) / F.lit(2.0)
        return cum.select(col, r.alias(out))

    ranked = pairs.join(_ranks("__x", "__rx"), "__x").join(
        _ranks("__y", "__ry"), "__y"
    )
    # Weighted Pearson on midranks, CENTERED analytically: the mean of
    # average ranks over all rows is EXACTLY (n+1)/2, so the moments
    # below are true centered sums — no one-pass E[xy]-mx*my
    # cancellation (repo discipline), and no NaN path: try_divide reads
    # a zero-spread (constant) column as NULL, where F.corr would raise
    # DIVIDE_BY_ZERO under ANSI.
    tot = pairs.agg(F.sum("__c").alias("__ntot"))
    mu = (F.col("__ntot") + F.lit(1.0)) / F.lit(2.0)
    dx = F.col("__rx") - mu
    dy = F.col("__ry") - mu
    c = F.col("__c")
    a = ranked.crossJoin(F.broadcast(tot)).agg(
        F.sum(c * dx * dy).alias("__sxy"),
        F.sum(c * dx * dx).alias("__sxx"),
        F.sum(c * dy * dy).alias("__syy"),
        F.max("__ntot").alias("n"),
    )
    rho = F.try_divide(
        F.col("__sxy"), F.sqrt(F.col("__sxx") * F.col("__syy"))
    )
    return a.select(
        F.round(rho, round_to).alias("spearman_rho"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )
