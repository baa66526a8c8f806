"""Feature-column conditioning: scalar normalization and embedding PCA.

Both follow the same scale discipline: ONE distributed pass reduces the
corpus to a statistics object whose size depends only on the schema
(per-column moments; a d x d Gram matrix), the driver does O(d^3)-at-
most work on that object, and the result is applied JVM-side (or one
Arrow pass for vectors) with the statistics riding broadcast.  No stage
ever holds data proportional to the corpus on the driver.

Reference parity: aws-sdk-pandas ships no feature conditioning; these
back the embedding pipeline (similarity/IVF/PQ in
`operators/similarity.py`) the way OPQ-style rotations and feature
scaling precede ANN indexing in FAISS (Jégou 2011; Ge 2013).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_columns(
    df: DataFrame,
    cols: list[str],
    *,
    method: str = "zscore",
    suffix: str = "_norm",
    by: list[str] | None = None,
) -> DataFrame:
    """Normalize numeric columns: ``zscore`` ((x-mean)/stddev),
    ``minmax`` ((x-min)/(max-min)), or ``robust``
    ((x-median)/(p75-p25) — the scikit-learn RobustScaler recipe, immune
    to the outliers z-score absorbs).  Adds ``<col><suffix>`` per input.

    ``by`` switches to PER-GROUP statistics (one window shuffle keyed on
    the group columns — no driver stats): the curation use case is
    normalizing quality scores per language/domain before a GLOBAL
    budget selection, so no group dominates just because its scorer runs
    hot.

    One aggregation computes every column's statistics together
    (map-side combinable; exact percentiles for ``robust`` via Spark's
    ``percentile`` — swap in ``approx_percentile`` at extreme scale);
    the constants fold into the projection, so the apply stage is pure
    whole-stage-codegen arithmetic with no second shuffle.  Degenerate
    columns (zero spread) normalize to 0.0, not NaN.
    """
    if by:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*by)
        out = df
        for c in cols:
            if method == "zscore":
                center, spread = F.avg(c).over(w), F.stddev_samp(c).over(w)
            elif method == "minmax":
                center = F.min(c).over(w)
                spread = F.max(c).over(w) - F.min(c).over(w)
            elif method == "robust":
                center = F.expr(f"percentile(`{c}`, 0.5)").over(w)
                spread = (
                    F.expr(f"percentile(`{c}`, 0.75)").over(w)
                    - F.expr(f"percentile(`{c}`, 0.25)").over(w)
                )
            else:
                raise ValueError(f"unknown method {method!r} (zscore|minmax|robust)")
            expr = F.when(
                spread.isNull() | (spread == 0),
                F.when(F.col(c).isNotNull(), F.lit(0.0)),
            ).otherwise((F.col(c) - center) / spread)
            out = out.withColumn(f"{c}{suffix}", expr.cast("double"))
        return out
    aggs = []
    for c in cols:
        if method == "zscore":
            aggs += [F.avg(c).alias(f"{c}__a"), F.stddev_samp(c).alias(f"{c}__b")]
        elif method == "minmax":
            aggs += [F.min(c).alias(f"{c}__a"), F.max(c).alias(f"{c}__b")]
        elif method == "robust":
            aggs += [
                F.expr(f"percentile(`{c}`, 0.5)").alias(f"{c}__a"),
                F.expr(f"percentile(`{c}`, 0.75) - percentile(`{c}`, 0.25)").alias(f"{c}__b"),
            ]
        else:
            raise ValueError(f"unknown method {method!r} (zscore|minmax|robust)")
    stats = df.agg(*aggs).first()
    out = df
    for c in cols:
        a, b = stats[f"{c}__a"], stats[f"{c}__b"]
        if method == "minmax":
            spread = (b - a) if (a is not None and b is not None) else None
            center = a
        else:
            spread, center = b, a
        if spread is None or center is None or spread == 0:
            expr = F.when(F.col(c).isNotNull(), F.lit(0.0))
        else:
            expr = (F.col(c) - F.lit(float(center))) / F.lit(float(spread))
        out = out.withColumn(f"{c}{suffix}", expr.cast("double"))
    return out


def fit_pca(
    df: DataFrame,
    *,
    vector_col: str = "embedding",
    k: int = 16,
) -> dict:
    """Principal components of an ``array<float>`` column in TWO
    schema-bounded distributed passes (mean first, then the CENTERED
    Gram): each partition reduces its Arrow batches to ``(count, sum)``
    then ``(X-mu)^T (X-mu)`` partial sums (d x d each — for d=1024 that
    is 8 MB per partition, independent of row count), the driver
    combines them and eigendecomposes the d x d covariance.  Centering
    INSIDE the second pass is the same two-pass-moments discipline as
    `fit_mahalanobis`/`fit_ols`: the one-pass ``G - mu s' - s mu' +
    n mu mu'`` form cancels catastrophically (~9 lost digits) on
    large-magnitude, low-variance coordinates.

    Returns ``{"mean": [d], "components": [k][d], "explained_variance":
    [k]}`` with components sign-fixed (largest-|coef| entry positive) so
    the model is deterministic across partitionings.
    """
    df = df.select(vector_col).where(F.col(vector_col).isNotNull())
    first = df.first()
    if first is None or first[0] is None:
        raise ValueError("no non-null vectors to fit PCA on")
    d = len(first[0])

    def _mean_partials(batches):
        n = 0
        s = np.zeros(d)
        for pdf in batches:
            x = np.stack(pdf[vector_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
        yield pd.DataFrame({"n": [n], "s": [s.tolist()]})

    mparts = df.select(vector_col).mapInPandas(
        _mean_partials, "n long, s array<double>"
    ).collect()
    n = sum(p["n"] for p in mparts)
    if n < 2:
        raise ValueError("need at least 2 vectors")
    mean = np.sum([np.array(p["s"]) for p in mparts], axis=0) / n

    def _gram_partials(batches):
        g = np.zeros((d, d))
        for pdf in batches:
            x = np.stack(pdf[vector_col].to_numpy()).astype(np.float64) - mean
            g += x.T @ x
        yield pd.DataFrame({"g": [g.reshape(-1).tolist()]})

    gparts = df.select(vector_col).mapInPandas(
        _gram_partials, "g array<double>"
    ).collect()
    g = np.sum([np.array(p["g"]).reshape(d, d) for p in gparts], axis=0)
    cov = g / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": vals[order].tolist(),
    }


def apply_pca(
    df: DataFrame,
    model: dict,
    *,
    vector_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vector_col`` onto the fitted components (center then
    matmul) in one Arrow-batched pass; the (k x d) model broadcasts with
    the task binary.  Output is ``array<float>`` of length k."""
    mean = np.array(model["mean"])
    comps = np.array(model["components"])

    @F.pandas_udf("array<float>")
    def _proj(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mask = vecs.notna().to_numpy()
        if mask.any():
            x = np.stack(vecs[mask].to_numpy()).astype(np.float64) - mean
            y = iter((x @ comps.T).astype(np.float32))
        else:
            y = iter(())
        # null vectors project to null, not a crash
        return pd.Series([next(y) if ok else None for ok in mask], dtype=object)

    return df.withColumn(out_col, _proj(F.col(vector_col)))


def discretize_quantiles(
    df: DataFrame,
    col: str,
    n_buckets: int,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Exact-quantile discretization: assign each row the bucket
    ``0..n_buckets-1`` delimited by the column's exact interpolated
    quantile cut points (bucket i holds values in [q_i, q_{i+1})) —
    equal-POPULATION bins for feature binning and stratified reporting,
    where fixed-width histograms collapse under skew.

    One aggregation computes all n-1 cut points together; assignment
    folds the cut array into a codegen-only comparison sum (no second
    shuffle, no UDF).  Nulls stay null.  Unlike ``ntile`` the boundary
    is a VALUE property, so equal values always share a bucket and the
    assignment is reproducible on any engine from the cut points.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    fracs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    cuts = df.agg(F.expr(f"percentile(`{col}`, array({fracs}))")).first()[0]
    if cuts is None:
        raise ValueError(f"no non-null values in {col!r}")
    b = F.aggregate(
        F.lit([float(c) for c in cuts]),
        F.lit(0),
        lambda acc, cut: acc + F.when(F.col(col) >= cut, 1).otherwise(0),
    )
    return df.withColumn(
        out_col or f"{col}_bucket",
        F.when(F.col(col).isNotNull(), b).cast("int"),
    )


def winsorize(
    df: DataFrame,
    cols: list[str],
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    by: list[str] | None = None,
    suffix: str = "_w",
) -> DataFrame:
    """Clip each column to its [``lower``, ``upper``] exact interpolated
    quantiles — the outlier guard that keeps extreme rows (unlike a
    filter) while bounding their leverage; standard before z-scoring
    quality signals whose tails are garbage-in artifacts.  Adds
    ``<col><suffix>``; NULLs pass through.

    Same shape as ``normalize_columns``: one aggregation computes every
    cut point (``by=`` switches to one window shuffle for per-group
    cuts), and the clip itself folds into a codegen
    ``least``/``greatest`` projection — no second shuffle, no UDF.
    """
    if not 0 <= lower < upper <= 1:
        raise ValueError("need 0 <= lower < upper <= 1")
    if by:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*by)
        out = df
        for c in cols:
            lo = F.expr(f"percentile(`{c}`, {lower!r})").over(w)
            hi = F.expr(f"percentile(`{c}`, {upper!r})").over(w)
            clipped = F.least(F.greatest(F.col(c).cast("double"), lo), hi)
            # least/greatest skip NULLs, which would clip a NULL to the
            # cut point — pass NULLs through explicitly
            out = out.withColumn(
                f"{c}{suffix}", F.when(F.col(c).isNotNull(), clipped)
            )
        return out
    aggs = []
    for c in cols:
        aggs += [
            F.expr(f"percentile(`{c}`, {lower!r})").alias(f"{c}__lo"),
            F.expr(f"percentile(`{c}`, {upper!r})").alias(f"{c}__hi"),
        ]
    stats = df.agg(*aggs).first()
    out = df
    for c in cols:
        lo, hi = stats[f"{c}__lo"], stats[f"{c}__hi"]
        if lo is None:
            out = out.withColumn(f"{c}{suffix}", F.col(c).cast("double"))
        else:
            clipped = F.least(
                F.greatest(F.col(c).cast("double"), F.lit(float(lo))),
                F.lit(float(hi)),
            )
            out = out.withColumn(
                f"{c}{suffix}", F.when(F.col(c).isNotNull(), clipped)
            )
    return out


def fit_mahalanobis(
    df: DataFrame,
    cols: list[str],
    *,
    regularization: float = 1e-9,
) -> dict:
    """Fit the multivariate outlier model: mean vector and inverse
    covariance over ``cols`` — the correlation-aware distance that
    flags rows NO per-column z-score can (each coordinate typical, the
    COMBINATION impossible).

    TWO schema-bounded aggregations (means first, then CENTERED second
    moments): the textbook one-pass ``E[xy] - mx*my`` form loses ~9
    digits to catastrophic cancellation on large-magnitude features
    (epoch timestamps: E[y^2] ~ 1e18 vs variance ~ 1e13), which is
    enough to flip rounded distances; centering first keeps every sum
    at the variance's own scale.  O(d^2) state either way, row-count
    independent; the d x d inversion is driver-side numpy on a
    schema-bounded matrix.  Returns ``{cols, mean, inv_cov}`` for
    ``apply_mahalanobis``.
    """
    import numpy as np

    d = len(cols)
    m_row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.avg(F.col(c).cast("double")).alias(f"__m{i}") for i, c in enumerate(cols)],
    ).first()
    mean = np.array([m_row[f"__m{i}"] for i in range(d)])
    centered = [
        (F.col(c).cast("double") - F.lit(float(mean[i]))) for i, c in enumerate(cols)
    ]
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.avg(centered[i] * centered[j]).alias(f"__s{i}_{j}"))
    row = df.agg(*aggs).first()
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            cov[i, j] = cov[j, i] = row[f"__s{i}_{j}"]
    n = m_row["__n"]
    if n > 1:
        cov *= n / (n - 1)  # sample covariance
    cov += np.eye(d) * regularization
    return {"cols": list(cols), "mean": mean.tolist(), "inv_cov": np.linalg.inv(cov).tolist()}


def apply_mahalanobis(
    df: DataFrame,
    model: dict,
    *,
    out_col: str = "mahalanobis",
    threshold: float | None = None,
    flag_col: str = "mahalanobis_flag",
) -> DataFrame:
    """Mahalanobis distance per row from a ``fit_mahalanobis`` model:
    the d x d inverse covariance folds into LITERALS, so the quadratic
    form ``sqrt((x-mu)' S^-1 (x-mu))`` is pure whole-stage-codegen
    arithmetic — no UDF, no broadcast, no second shuffle.  Rows with
    any NULL coordinate get NULL distance.  With ``threshold`` (in
    distance units; sqrt of the chi-square quantile at d dof is the
    classical choice) a boolean flag is added."""
    cols = model["cols"]
    mean = model["mean"]
    inv = model["inv_cov"]
    centered = [F.col(c).cast("double") - F.lit(float(mean[i])) for i, c in enumerate(cols)]
    quad = F.lit(0.0)
    for i in range(len(cols)):
        for j in range(len(cols)):
            if inv[i][j] != 0.0:
                quad = quad + F.lit(float(inv[i][j])) * centered[i] * centered[j]
    # greatest() skips NULLs, which would turn a NULL-coordinate row
    # into distance 0 — require every coordinate explicitly
    all_present = F.lit(True)
    for c in cols:
        all_present = all_present & F.col(c).isNotNull()
    dist = F.when(all_present, F.round(F.sqrt(F.greatest(quad, F.lit(0.0))), 6))
    out = df.withColumn(out_col, dist)
    if threshold is not None:
        out = out.withColumn(
            flag_col, F.coalesce(F.col(out_col) > threshold, F.lit(False))
        )
    return out


def target_encode(
    df: DataFrame,
    *,
    cat_col: str,
    label_col: str,
    smoothing: float = 20.0,
    leave_one_out: bool = False,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Smoothed target (mean-label) encoding of a categorical column —
    the standard high-cardinality alternative to one-hot: each category
    maps to ``(sum_label + m·prior) / (n + m)`` where prior is the
    global label mean and ``m = smoothing`` (an m-row pseudo-sample of
    the prior, so rare categories shrink toward it instead of
    memorizing noise).

    ``leave_one_out=True`` excludes each row's OWN label from its
    encoding — ``((sum − y_i) + m·prior) / (n − 1 + m)`` — the
    train-time variant that blocks single-row target leakage; use the
    plain variant at serve time.

    Scale shape: one category-bounded aggregation, broadcast-joined
    back on the category key; the one-row prior crossJoins.  NULL
    categories encode as the prior (their own group would be a leak of
    the NULL pattern); NULL labels are excluded from the statistics and
    encode non-LOO.
    """
    out = out_col or f"{cat_col}_te"
    c = F.col(cat_col)
    y = F.col(label_col).cast("double")
    m = float(smoothing)
    stats = (
        df.where(c.isNotNull() & y.isNotNull())
        .groupBy(c.alias("__cat"))
        .agg(F.sum(y).alias("__sum"), F.count(F.lit(1)).alias("__n"))
    )
    prior = df.where(y.isNotNull()).agg(F.avg(y).alias("__prior"))
    j = (
        df.join(F.broadcast(stats), c == F.col("__cat"), "left")
        .crossJoin(F.broadcast(prior))  # ONE row
    )
    s_ = F.coalesce(F.col("__sum"), F.lit(0.0))
    n_ = F.coalesce(F.col("__n"), F.lit(0))
    if leave_one_out:
        own = F.when(y.isNotNull() & c.isNotNull(), y).otherwise(F.lit(0.0))
        dec = F.when(y.isNotNull() & c.isNotNull(), F.lit(1)).otherwise(F.lit(0))
        enc = F.try_divide(
            (s_ - own) + F.lit(m) * F.col("__prior"), (n_ - dec) + F.lit(m)
        )
    else:
        enc = F.try_divide(s_ + F.lit(m) * F.col("__prior"), n_ + F.lit(m))
    return j.withColumn(out, F.round(enc, round_to)).drop(
        "__cat", "__sum", "__n", "__prior"
    )


def frequency_encode(
    df: DataFrame,
    *,
    cat_col: str,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Frequency encoding: each category maps to its share of rows —
    the zero-leakage ordinal stand-in that preserves popularity
    information.  One category-bounded aggregation broadcast back;
    NULL categories get NULL (their share is a completeness question).
    """
    out = out_col or f"{cat_col}_freq"
    c = F.col(cat_col)
    # stats is category-bounded; persist it and derive the total as the
    # EXACT integer sum of the per-category counts instead of a second
    # full aggregation pass over the input (same filtered rows, so
    # Σ __n ≡ the direct count; integer addition has no ordering hazard).
    # Input scans 3 -> 2 (tools/scan_count_audit.py).  Lifetime
    # caller-owned.
    stats = (
        df.where(c.isNotNull())
        .groupBy(c.alias("__cat"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .persist()
    )
    tot = stats.agg(F.sum("__n").alias("__t"))
    j = df.join(F.broadcast(stats), c == F.col("__cat"), "left").crossJoin(
        F.broadcast(tot)
    )
    return j.withColumn(
        out, F.round(F.try_divide(F.col("__n"), F.col("__t")), round_to)
    ).drop("__cat", "__n", "__t")


def woe_iv(
    df: DataFrame,
    *,
    cat_col: str,
    label_col: str,
    smoothing: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Weight of evidence + information value per category — the
    scorecard-modeling diagnostic for how much a categorical feature
    separates a binary label: WOE = ln(share-of-positives /
    share-of-negatives) per category (positive WOE → category
    over-represents positives), and IV = Σ (p_pos − p_neg)·WOE (rule
    of thumb: < 0.02 useless, 0.1–0.3 medium, > 0.5 suspicious —
    probably leakage).  Returns per-category rows ``category, n_pos,
    n_neg, woe, iv_contrib``; sum ``iv_contrib`` for the feature's IV.

    Laplace ``smoothing`` is added to each cell so a pure category
    yields a large-but-finite WOE instead of ±∞.  ONE
    category-bounded aggregation + a one-row totals broadcast.  NULL
    categories form their own row (their skew is signal); NULL labels
    are excluded.
    """
    s = float(smoothing)
    c = F.col(cat_col)
    y = F.col(label_col).cast("int")
    base = df.where(y.isNotNull())
    per = base.groupBy(c.alias("category")).agg(
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    tot = base.agg(
        F.sum(y).alias("__tp"), F.sum(F.lit(1) - y).alias("__tn")
    )
    j = per.crossJoin(F.broadcast(tot))  # ONE row
    p_pos = (F.col("n_pos") + F.lit(s)) / (F.col("__tp") + F.lit(2 * s))
    p_neg = (F.col("n_neg") + F.lit(s)) / (F.col("__tn") + F.lit(2 * s))
    woe = F.log(p_pos / p_neg)
    return j.select(
        "category",
        "n_pos",
        "n_neg",
        F.round(woe, round_to).alias("woe"),
        F.round((p_pos - p_neg) * woe, round_to).alias("iv_contrib"),
    ).orderBy("category")
