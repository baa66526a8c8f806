"""Classifier evaluation at corpus scale: AUC, ROC/PR points,
calibration, lift/gains, confusion — the measurement side of
score-driven data curation (`fit_hashed_ngram_classifier`,
`doc_classifier_score`, DSIR weights all produce scores; these
operators tell you whether to TRUST them before filtering 100 TB
on a threshold).

Scale shapes: every curve reduces the raw rows to a distinct-score
count table first (cost bounded by score cardinality), cumulative
counts ride the two-phase `global_prefix_sum` (no single-partition
window), and scalar metrics are single map-side-combinable
aggregations.  AUC uses the rank-sum identity
AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) with average ranks
for ties — the exact trapezoidal ROC area, no binning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _score_counts(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    return (
        df.where(s.isNotNull() & y.isNotNull())
        .select(
            s.alias("__s"),
            y.alias("__y"),
        )
        .groupBy("__s")
        .agg(
            F.sum("__y").alias("__cp"),
            F.sum(F.lit(1) - F.col("__y")).alias("__cn"),
        )
    )


def binary_metrics(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """One-row summary ``(auc, log_loss, brier, n_pos, n_neg)`` of a
    probabilistic binary classifier.  AUC is the exact tie-aware
    rank-sum form; log-loss clips scores to [1e-15, 1−1e-15] (the
    sklearn convention) so a confident-and-wrong 0/1 score costs ~34.5
    nats instead of infinity; Brier is mean squared error against the
    0/1 label.

    Scale: log-loss/Brier are ONE aggregation over raw rows; AUC runs
    on the distinct-score count table + one two-phase prefix sum.
    Degenerate inputs (no positives or no negatives) yield NULL auc.
    """
    from .sampling import global_prefix_sum

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull())

    eps = 1e-15
    p = F.least(F.greatest(s, F.lit(eps)), F.lit(1.0 - eps))
    ll = -(y * F.log(p) + (F.lit(1) - y) * F.log(F.lit(1.0) - p))
    losses = base.agg(
        F.avg(ll).alias("__ll"),
        F.avg(F.pow(s - y, F.lit(2.0))).alias("__brier"),
    )

    counts = _score_counts(df, score_col, label_col).withColumn(
        "__c", F.col("__cp") + F.col("__cn")
    )
    cum = global_prefix_sum(
        counts, "__c", [F.col("__s").asc()], out_col="__cum",
        num_partitions=num_partitions,
    )
    avg_rank = F.col("__cum") - F.col("__c") + (F.col("__c") + F.lit(1.0)) / F.lit(2.0)
    agg = cum.agg(
        F.sum(F.col("__cp") * avg_rank).alias("__rp"),
        F.sum("__cp").alias("n_pos"),
        F.sum("__cn").alias("n_neg"),
    )
    np_, nn_ = F.col("n_pos"), F.col("n_neg")
    auc = F.try_divide(
        F.col("__rp") - np_ * (np_ + F.lit(1)) / F.lit(2.0),
        np_.cast("double") * nn_,
    )
    return (
        agg.crossJoin(F.broadcast(losses))  # both are ONE row
        .select(
            F.round(auc, round_to).alias("auc"),
            F.round("__ll", round_to).alias("log_loss"),
            F.round("__brier", round_to).alias("brier"),
            "n_pos",
            "n_neg",
        )
    )


def roc_curve(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """ROC + PR operating points: one row per DISTINCT score with
    ``threshold, tpr, fpr, precision, n_predicted`` for the classifier
    "predict positive iff score ≥ threshold".  recall ≡ tpr.  This is
    the threshold-picking table for corpus filtering: find the point
    where precision holds and read the kept-volume (n_predicted) off
    the same row.

    Scale: distinct-score count table + ONE two-phase prefix sum in
    DESCENDING score order (cumulative counts = predicted-positive
    set); totals broadcast back as a one-row join.
    """
    from .sampling import global_prefix_sum

    counts = _score_counts(df, score_col, label_col)
    cum = global_prefix_sum(
        counts,
        ["__cp", "__cn"],
        [F.col("__s").desc()],
        out_col=["__cum_p", "__cum_n"],
        num_partitions=num_partitions,
    )
    tot = counts.agg(F.sum("__cp").alias("__np"), F.sum("__cn").alias("__nn"))
    j = cum.crossJoin(F.broadcast(tot))  # tot is ONE row
    return (
        j.select(
            F.col("__s").alias("threshold"),
            F.round(F.try_divide(F.col("__cum_p"), F.col("__np")), round_to).alias("tpr"),
            F.round(F.try_divide(F.col("__cum_n"), F.col("__nn")), round_to).alias("fpr"),
            F.round(
                F.try_divide(F.col("__cum_p"), F.col("__cum_p") + F.col("__cum_n")),
                round_to,
            ).alias("precision"),
            (F.col("__cum_p") + F.col("__cum_n")).alias("n_predicted"),
        )
        .orderBy(F.col("threshold").desc())
    )


def calibration_curve(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability diagram: scores binned into ``n_bins`` fixed-width
    buckets over [0, 1]; per OBSERVED bin ``bin, n, mean_score,
    frac_positive``.  A calibrated classifier tracks the diagonal
    (mean_score ≈ frac_positive); systematic bowing means the scores
    are rankings, not probabilities — threshold accordingly.  ONE
    map-side-combinable aggregation; scores outside [0, 1] clamp into
    the edge bins.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    b = F.least(
        F.greatest(F.floor(s * n_bins), F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.where(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(s), round_to).alias("mean_score"),
            F.round(F.avg(y), round_to).alias("frac_positive"),
        )
        .orderBy("bin")
    )


def lift_curve(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Lift / gains table: rows ranked best-score-first and cut into
    ``n_buckets`` equal-population buckets; per bucket ``bucket, n,
    n_pos, pos_rate, lift, cum_capture`` where lift = bucket positive
    rate / overall rate and cum_capture = fraction of ALL positives
    found in buckets 1..k — the "how deep must I dig" answer for
    review/labeling budgets.

    Scale: per-row global rank via the two-phase prefix sum ordered
    (score desc, id asc) — ``id_col`` must be unique for a
    deterministic cut; totals broadcast as a one-row join; the final
    cumulative runs over the n_buckets-sized result.
    """
    from .sampling import global_prefix_sum

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull()).select(
        s.alias("__s"), y.alias("__y"), F.col(id_col).alias("__id"), F.lit(1).alias("__one")
    )
    ranked = global_prefix_sum(
        base,
        "__one",
        [F.col("__s").desc(), F.col("__id").asc()],
        out_col="__rank",
        num_partitions=num_partitions,
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__npos")
    )
    j = ranked.crossJoin(F.broadcast(tot))  # tot is ONE row
    bucket = (
        F.floor((F.col("__rank") - 1) * F.lit(n_buckets) / F.col("__n")) + 1
    ).cast("int")
    per = (
        j.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("n_pos"),
            F.max("__n").alias("__n"),
            F.max("__npos").alias("__npos"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rate = F.try_divide(F.col("n_pos"), F.col("n"))
    overall = F.try_divide(F.col("__npos"), F.col("__n"))
    return (
        per.select(
            "bucket",
            "n",
            "n_pos",
            F.round(rate, round_to).alias("pos_rate"),
            F.round(F.try_divide(rate, overall), round_to).alias("lift"),
            F.round(
                F.try_divide(F.sum("n_pos").over(w), F.col("__npos")), round_to
            ).alias("cum_capture"),
        )
        .orderBy("bucket")
    )


def confusion_at(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    """Confusion matrix + headline rates at one threshold (predict
    positive iff score ≥ threshold): one row ``tp, fp, tn, fn,
    precision, recall, f1, accuracy``.  ONE aggregation over raw rows;
    degenerate denominators (no predicted positives, no actual
    positives) yield NULL rates rather than errors.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    pred = (s >= F.lit(float(threshold))).cast("int")
    base = df.where(s.isNotNull() & y.isNotNull())
    agg = base.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (F.lit(1) - y)).alias("fp"),
        F.sum((F.lit(1) - pred) * (F.lit(1) - y)).alias("tn"),
        F.sum((F.lit(1) - pred) * y).alias("fn"),
    )
    tp, fp, tn, fn = F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn")
    prec = F.try_divide(tp, tp + fp)
    rec = F.try_divide(tp, tp + fn)
    f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
    acc = F.try_divide(tp + tn, tp + fp + tn + fn)
    return agg.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
        F.round(acc, round_to).alias("accuracy"),
    )


def fit_isotonic(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
) -> dict:
    """Fit an isotonic (monotone non-decreasing) calibration map from
    raw scores to empirical positive rates — the non-parametric fix
    when `calibration_curve` shows the classifier ranks well but its
    probabilities bow off the diagonal.  Distributed PAVA via MLlib's
    IsotonicRegression (ties aggregate per distinct score BEFORE the
    pooling pass, so cost is bounded by score cardinality).

    Returns ``{"model", "boundaries", "predictions"}``; feed to
    `apply_isotonic`.  Boundaries/predictions are the pooled piecewise
    points (driver-sized after violator pooling), useful for export.
    """
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.regression import IsotonicRegression

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.where(s.isNotNull() & y.isNotNull()).select(
        array_to_vector(F.array(s)).alias("__features"), y.alias("__label")
    )
    iso = IsotonicRegression(
        featuresCol="__features", labelCol="__label", predictionCol="__cal"
    )
    model = iso.fit(base)
    return {
        "model": model,
        "boundaries": list(model.boundaries),
        "predictions": list(model.predictions),
    }


def apply_isotonic(
    df: DataFrame,
    model: dict,
    *,
    score_col: str,
    out_col: str = "calibrated",
    round_to: int = 6,
) -> DataFrame:
    """Apply a `fit_isotonic` map: adds ``out_col`` with the calibrated
    probability (linear interpolation between pooled boundary points,
    clamped at the ends — MLlib model semantics, JVM-side transform,
    no Python in the row path).  NULL scores yield NULL."""
    from pyspark.ml.functions import array_to_vector

    s = F.col(score_col).cast("double")
    # the JVM transform NPEs on a NULL vector, so NULL scores ride a
    # dummy 0.0 feature and the OUTPUT is nulled instead
    withf = df.withColumn(
        "__features", array_to_vector(F.array(F.coalesce(s, F.lit(0.0))))
    )
    out = model["model"].setPredictionCol("__cal").transform(withf)
    return out.withColumn(
        out_col, F.when(s.isNotNull(), F.round(F.col("__cal"), round_to))
    ).drop("__features", "__cal")


def cohen_kappa(
    df: DataFrame,
    *,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's kappa: chance-corrected agreement between two categorical
    labelings of the same rows — the honest score for annotator pairs,
    weak-label vs gold, or model vs heuristic, where raw percent
    agreement flatters any skewed label distribution (two raters who
    both say 'en' 95% of the time agree 90%+ by luck alone).  Returns
    ONE row ``(kappa, po, pe, n)``: observed agreement, expected-by-
    chance agreement, and kappa = (po − pe)/(1 − pe).

    Scale shape: one map-side-combinable pass reduces the raw rows to
    the label-pair confusion table; marginals and the diagonal are
    aggregations OF that bounded table (label-cardinality-sized, never
    row volume).  Rows with a NULL on either side are excluded (a NULL
    label is a completeness question, not a disagreement).  Degenerate
    perfect-chance inputs (pe = 1, e.g. both raters emit one constant
    label) read NULL kappa via try_divide — the statistic is undefined
    there, and po = 1 already tells the story.

    All arithmetic is exact-integer-count ratios, so the DuckDB oracle
    reproduces it digit-for-digit.
    """
    from aws_sdk_pandas_spark.operators.stats import _contingency

    obs, row_m, col_m = _contingency(df, col_a, col_b)
    tot = obs.agg(
        F.sum("__o").alias("__ntot"),
        F.sum(
            F.when(F.col("__a") == F.col("__b"), F.col("__o")).otherwise(
                F.lit(0)
            )
        ).alias("__diag"),
    )
    # labels missing on one side contribute 0 to pe — inner join drops
    # exactly those zero products; both marginals are bounded tables
    # marginal products and n*n in DOUBLE, not bigint: at 100TB row
    # counts the bigint squares overflow (ANSI error); double is exact
    # below 2^53 so the oracle still matches digit-for-digit at gate SF
    pe_num = row_m.join(
        F.broadcast(col_m), F.col("__a") == F.col("__b")
    ).agg(
        F.sum(F.col("__ra").cast("double") * F.col("__cb")).alias("__pesum")
    )
    j = tot.crossJoin(F.broadcast(pe_num))
    n = F.col("__ntot")
    nd = n.cast("double")
    po = F.try_divide(F.coalesce(F.col("__diag"), F.lit(0)), n)
    pe = F.try_divide(F.coalesce(F.col("__pesum"), F.lit(0.0)), nd * nd)
    kappa = F.try_divide(po - pe, F.lit(1.0) - pe)
    return j.select(
        F.round(kappa, round_to).alias("kappa"),
        F.round(po, round_to).alias("po"),
        F.round(pe, round_to).alias("pe"),
        F.coalesce(n, F.lit(0)).cast("long").alias("n"),
    )


def krippendorff_alpha(
    df: DataFrame,
    *,
    unit_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric): chance-corrected agreement
    over units rated any number of times — the generalization of
    `cohen_kappa` past two fixed raters, tolerant of missing ratings.
    Also reads as a label-homogeneity index: unit = source / duplicate
    cluster, value = lang / quality bucket answers "are this group's
    labels consistent beyond what the corpus mix predicts".  Returns
    ONE row ``(alpha, d_o, d_e, n, units)``: observed and expected
    disagreement, pairable-rating count, pairable-unit count.

    alpha = 1 − D_o/D_e with, for nominal data,
    D_o = (1/n)·Σ_u Σ_c n_uc(m_u − n_uc)/(m_u − 1) and
    D_e = (1/(n(n−1)))·Σ_c n_c(n − n_c), over units with m_u ≥ 2
    (singly-rated units are unpairable and excluded from BOTH terms).

    Scale shape: raw rows reduce in ONE map-side-combinable pass to the
    (unit, value) count table; per-unit totals join back on the unit
    key (both sides bounded by unit × value cardinality); D_o, the
    value margins, and D_e are aggregations of those bounded tables —
    row volume is touched exactly once.  Products run in DOUBLE (the
    bigint squares overflow under ANSI at 100TB counts; exact below
    2^53 so gate hashes are unaffected).  D_e = 0 (every pairable
    rating is one value) reads NULL alpha via try_divide — agreement
    with no variation is undefined, and d_o = 0 already tells the
    story.
    """
    u = F.col(unit_col)
    v = F.col(value_col)
    # localCheckpoint: cnt feeds per-unit totals AND the join-back, and
    # j feeds both disagreement terms — pinning the bounded reduction
    # makes the one-raw-scan guarantee unconditional (not dependent on
    # exchange reuse surviving stage retries).
    cnt = (
        df.where(u.isNotNull() & v.isNotNull())
        .groupBy(u.alias("__u"), v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=True)
    )
    per_u = cnt.groupBy("__u").agg(F.sum("__c").alias("__m"))
    j = cnt.join(per_u, "__u").where(F.col("__m") >= 2)
    c = F.col("__c").cast("double")
    m = F.col("__m").cast("double")
    a1 = j.agg(
        F.sum(c * (m - c) / (m - F.lit(1.0))).alias("__donum"),
        F.sum("__c").alias("__ntot"),
        F.count_distinct(F.col("__u")).alias("__units"),
    )
    vt = j.groupBy("__v").agg(F.sum("__c").alias("__nc"))
    nd = F.col("__ntot").cast("double")
    a2 = vt.crossJoin(F.broadcast(a1)).agg(
        F.sum(F.col("__nc").cast("double") * (nd - F.col("__nc"))).alias(
            "__denum"
        ),
        F.max("__donum").alias("__donum"),
        F.max("__ntot").alias("__ntot"),
        F.max("__units").alias("__units"),
    )
    nd2 = F.col("__ntot").cast("double")
    d_o = F.try_divide(F.col("__donum"), nd2)
    d_e = F.try_divide(F.col("__denum"), nd2 * (nd2 - F.lit(1.0)))
    alpha = F.lit(1.0) - F.try_divide(d_o, d_e)
    return a2.select(
        F.round(alpha, round_to).alias("alpha"),
        F.round(d_o, round_to).alias("d_o"),
        F.round(d_e, round_to).alias("d_e"),
        F.coalesce(F.col("__ntot"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.col("__units"), F.lit(0)).cast("long").alias("units"),
    )
