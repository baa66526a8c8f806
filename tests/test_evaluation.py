"""Classifier-evaluation operators vs independent numpy recomputes:
tie-aware AUC, clipped log-loss, ROC/PR points, calibration bins,
lift/gains, confusion rates."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.evaluation import (
    binary_metrics,
    calibration_curve,
    confusion_at,
    lift_curve,
    roc_curve,
)


def _mk(spark, seed=41, n=600, ties=True):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.4).astype(int)
    # informative but noisy scores; quantize to force ties
    s = np.clip(0.55 * y + 0.35 * rng.random(n) + 0.05, 0, 1)
    if ties:
        s = np.round(s, 2)
    df = spark.createDataFrame(
        [(int(i), float(a), int(b)) for i, (a, b) in enumerate(zip(s, y))],
        "id long, score double, label int",
    )
    return df, s, y


def _np_auc(s, y):
    """Tie-aware rank-sum AUC."""
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    sv = s[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    r_pos = ranks[y == 1].sum()
    return (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_binary_metrics_match_numpy(spark):
    df, s, y = _mk(spark)
    r = binary_metrics(df, score_col="score", label_col="label",
                       num_partitions=8).collect()[0]
    auc = _np_auc(s, y)
    assert abs(r.auc - round(auc, 6)) < 1e-9
    assert r.auc > 0.8                      # informative scores
    eps = 1e-15
    p = np.clip(s, eps, 1 - eps)
    ll = float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())
    assert abs(r.log_loss - round(ll, 6)) < 1e-9
    assert abs(r.brier - round(float(((s - y) ** 2).mean()), 6)) < 1e-9
    assert r.n_pos == int(y.sum()) and r.n_neg == int((1 - y).sum())

    # degenerate: single class -> NULL auc, losses still defined
    one = df.where("label = 1")
    r1 = binary_metrics(one, score_col="score", label_col="label").collect()[0]
    assert r1.auc is None and r1.log_loss is not None


def test_roc_curve_matches_numpy(spark):
    df, s, y = _mk(spark, seed=43, n=400)
    rows = roc_curve(df, score_col="score", label_col="label",
                     num_partitions=8).collect()
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    thresholds = sorted(set(s), reverse=True)
    assert [r.threshold for r in rows] == thresholds
    for r in rows:
        pred = s >= r.threshold
        tp, fp = int((pred & (y == 1)).sum()), int((pred & (y == 0)).sum())
        assert abs(r.tpr - round(tp / n_pos, 6)) < 1e-9
        assert abs(r.fpr - round(fp / n_neg, 6)) < 1e-9
        assert abs(r.precision - round(tp / (tp + fp), 6)) < 1e-9
        assert r.n_predicted == tp + fp
    # monotone cumulative structure
    tprs = [r.tpr for r in rows]
    assert tprs == sorted(tprs)


def test_calibration_curve_bins(spark):
    df, s, y = _mk(spark, seed=47)
    rows = calibration_curve(df, score_col="score", label_col="label",
                             n_bins=10).collect()
    got = {r.bin: r for r in rows}
    bins = np.minimum(np.maximum(np.floor(s * 10), 0), 9).astype(int)
    for b in np.unique(bins):
        m = bins == b
        r = got[int(b)]
        assert r.n == int(m.sum())
        assert abs(r.mean_score - round(float(s[m].mean()), 6)) < 1e-9
        assert abs(r.frac_positive - round(float(y[m].mean()), 6)) < 1e-9
    assert set(got) == set(int(b) for b in np.unique(bins))


def test_lift_curve_matches_serial(spark):
    df, s, y = _mk(spark, seed=53, n=500)
    rows = lift_curve(df, score_col="score", label_col="label", id_col="id",
                      n_buckets=10, num_partitions=8).collect()
    order = sorted(range(len(s)), key=lambda i: (-s[i], i))
    n = len(s)
    buckets = {}
    for rank0, i in enumerate(order):
        b = (rank0 * 10) // n + 1
        bb = buckets.setdefault(b, [0, 0])
        bb[0] += 1
        bb[1] += int(y[i])
    overall = y.sum() / n
    cum = 0
    for r in rows:
        nb, pb = buckets[r.bucket]
        cum += pb
        assert (r.n, r.n_pos) == (nb, pb)
        assert abs(r.pos_rate - round(pb / nb, 6)) < 1e-9
        assert abs(r.lift - round(pb / nb / overall, 6)) < 1e-9
        assert abs(r.cum_capture - round(cum / int(y.sum()), 6)) < 1e-9
    # informative scores: top bucket beats base rate, capture ends at 1
    assert rows[0].lift > 1.5 and rows[-1].cum_capture == 1.0


def test_confusion_at_threshold(spark):
    df, s, y = _mk(spark, seed=59, n=300)
    r = confusion_at(df, score_col="score", label_col="label",
                     threshold=0.5).collect()[0]
    pred = (s >= 0.5).astype(int)
    tp = int((pred & y).sum()); fp = int((pred & (1 - y)).sum())
    tn = int(((1 - pred) & (1 - y)).sum()); fn = int(((1 - pred) & y).sum())
    assert (r.tp, r.fp, r.tn, r.fn) == (tp, fp, tn, fn)
    assert abs(r.precision - round(tp / (tp + fp), 6)) < 1e-9
    assert abs(r.recall - round(tp / (tp + fn), 6)) < 1e-9
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    assert abs(r.f1 - round(2 * prec * rec / (prec + rec), 6)) < 1e-9
    assert abs(r.accuracy - round((tp + tn) / 300, 6)) < 1e-9
    # threshold above every score -> no predicted positives -> NULL precision
    r2 = confusion_at(df, score_col="score", label_col="label",
                      threshold=2.0).collect()[0]
    assert r2.tp == 0 and r2.precision is None and r2.recall == 0.0


def _np_pava(scores, labels):
    """Numpy PAVA: aggregate per distinct score, pool adjacent
    violators (weighted), return {score: fitted}."""
    import collections

    agg = collections.OrderedDict()
    for s, y in sorted(zip(scores, labels)):
        w, t = agg.get(s, (0, 0.0))
        agg[s] = (w + 1, t + y)
    xs = list(agg)
    blocks = [[x, agg[x][0], agg[x][1] / agg[x][0]] for x in xs]  # [x, w, mean]
    # pool adjacent violators
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][2] >= out[-1][2] + 1e-15:
            x2, w2, m2 = out.pop()
            x1, w1, m1 = out.pop()
            out.append([x2, w1 + w2, (w1 * m1 + w2 * m2) / (w1 + w2)])
    # reconstruct membership by walking xs and consuming block weights
    fitted = {}
    xi = 0
    for bx, bw, bm in out:
        consumed = 0
        while consumed < bw:
            x = xs[xi]
            fitted[x] = bm
            consumed += agg[x][0]
            xi += 1
    return fitted


def test_isotonic_calibration_matches_pava(spark):
    from aws_sdk_pandas_spark.operators.evaluation import (
        apply_isotonic,
        binary_metrics,
        fit_isotonic,
    )

    rng = np.random.default_rng(61)
    n = 800
    true_p = rng.random(n)
    y = (rng.random(n) < true_p).astype(int)
    # miscalibrated but monotone scores: sqrt warps the probabilities
    s = np.round(np.sqrt(true_p), 2)
    df = spark.createDataFrame(
        [(int(i), float(a), int(b)) for i, (a, b) in enumerate(zip(s, y))],
        "id long, score double, label int",
    )
    model = fit_isotonic(df, score_col="score", label_col="label")
    out = apply_isotonic(df, model, score_col="score").collect()
    cal = {r.id: r.calibrated for r in out}

    fitted = _np_pava(s.tolist(), y.tolist())
    for r in out:
        assert abs(cal[r.id] - round(fitted[s[r.id]], 6)) < 1e-6

    # calibrated output is monotone in the raw score
    pts = sorted(set((float(s[i]), cal[i]) for i in range(n)))
    vals = [v for _, v in pts]
    assert vals == sorted(vals)

    # calibration improves the proper scores on held-in data
    cal_df = apply_isotonic(df, model, score_col="score")
    before = binary_metrics(df, score_col="score", label_col="label").collect()[0]
    after = binary_metrics(
        cal_df.select("id", F.col("calibrated").alias("score"), "label"),
        score_col="score",
        label_col="label",
    ).collect()[0]
    assert after.brier < before.brier
    assert after.log_loss < before.log_loss

    # NULL score passes through as NULL
    null_df = spark.createDataFrame([(99, None, 1)], "id long, score double, label int")
    rn = apply_isotonic(null_df, model, score_col="score").collect()[0]
    assert rn.calibrated is None


def test_cohen_kappa_hand_case(spark):
    from aws_sdk_pandas_spark.operators.evaluation import cohen_kappa

    # classic textbook confusion: raters A/B over 50 items
    #         B:yes  B:no
    # A:yes     20     5
    # A:no      10    15
    rows = (
        [("yes", "yes")] * 20 + [("yes", "no")] * 5
        + [("no", "yes")] * 10 + [("no", "no")] * 15
    )
    rows += [(None, "yes"), ("no", None)]          # NULLs excluded
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, col_a="a", col_b="b").collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    kappa = (po - pe) / (1 - pe)
    assert abs(r.po - round(po, 6)) < 1e-12
    assert abs(r.pe - round(pe, 6)) < 1e-12
    assert abs(r.kappa - round(kappa, 6)) < 1e-12
    assert r.n == 50


def test_cohen_kappa_degenerate(spark):
    from aws_sdk_pandas_spark.operators.evaluation import cohen_kappa

    # both raters constant and equal: po=1, pe=1 -> kappa undefined
    const = spark.createDataFrame([("x", "x")] * 8, "a string, b string")
    r = cohen_kappa(const, col_a="a", col_b="b").collect()[0]
    assert r.kappa is None and r.po == 1.0 and r.n == 8
    # disjoint label sets: po=0, pe=0 -> kappa=0
    disj = spark.createDataFrame([("x", "y")] * 8, "a string, b string")
    r = cohen_kappa(disj, col_a="a", col_b="b").collect()[0]
    assert r.kappa == 0.0 and r.po == 0.0 and r.pe == 0.0
    # empty input: no rows -> n=0, NULL stats (no ANSI error)
    empty = spark.createDataFrame([], "a string, b string")
    r = cohen_kappa(empty, col_a="a", col_b="b").collect()[0]
    assert r.kappa is None and r.n == 0


def test_krippendorff_alpha_matches_serial(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.evaluation import krippendorff_alpha

    rng = np.random.default_rng(37)
    labels = ["a", "b", "c"]
    rows = []
    units = {}
    for uid in range(120):
        # mostly-consistent units with noise; variable rater counts 1..5
        true = labels[int(rng.integers(0, 3))]
        k = int(rng.integers(1, 6))
        vals = [
            true if rng.random() < 0.8 else labels[int(rng.integers(0, 3))]
            for _ in range(k)
        ]
        units[uid] = vals
        rows += [(f"u{uid}", val) for val in vals]
    rows += [(None, "a"), ("u0", None)]            # NULLs excluded
    df = spark.createDataFrame(rows, "unit string, val string")
    r = krippendorff_alpha(df, unit_col="unit", value_col="val").collect()[0]

    # serial recompute over pairable units only
    pair = {u: vs for u, vs in units.items() if len(vs) >= 2}
    n = sum(len(vs) for vs in pair.values())
    do_num = 0.0
    from collections import Counter
    margin = Counter()
    for vs in pair.values():
        m = len(vs)
        cc = Counter(vs)
        margin.update(cc)
        do_num += sum(c * (m - c) / (m - 1) for c in cc.values())
    de_num = sum(c * (n - c) for c in margin.values())
    d_o = do_num / n
    d_e = de_num / (n * (n - 1))
    alpha = 1 - d_o / d_e
    assert abs(r.alpha - round(alpha, 6)) < 1e-9
    assert abs(r.d_o - round(d_o, 6)) < 1e-9
    assert abs(r.d_e - round(d_e, 6)) < 1e-9
    assert r.n == n and r.units == len(pair)
    assert r.alpha > 0.4                  # planted consistency detected


def test_krippendorff_alpha_degenerate(spark):
    from aws_sdk_pandas_spark.operators.evaluation import krippendorff_alpha

    # perfect agreement, >1 value globally -> alpha = 1
    perfect = spark.createDataFrame(
        [("u1", "a")] * 3 + [("u2", "b")] * 3, "unit string, val string"
    )
    r = krippendorff_alpha(perfect, unit_col="unit", value_col="val").collect()[0]
    assert r.alpha == 1.0 and r.d_o == 0.0 and r.units == 2
    # one value everywhere: D_e = 0 -> alpha undefined (NULL), d_o = 0
    const = spark.createDataFrame(
        [("u1", "a")] * 3 + [("u2", "a")] * 2, "unit string, val string"
    )
    r = krippendorff_alpha(const, unit_col="unit", value_col="val").collect()[0]
    assert r.alpha is None and r.d_o == 0.0
    # only singly-rated units: nothing pairable -> NULLs, n = 0
    single = spark.createDataFrame(
        [("u1", "a"), ("u2", "b")], "unit string, val string"
    )
    r = krippendorff_alpha(single, unit_col="unit", value_col="val").collect()[0]
    assert r.alpha is None and r.n == 0 and r.units == 0
