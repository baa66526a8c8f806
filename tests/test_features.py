"""Feature conditioning: normalization matches numpy/duckdb formulas,
PCA matches numpy's full-data eigendecomposition regardless of
partitioning, and projection preserves pairwise geometry."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.features import apply_pca, fit_pca, normalize_columns


def test_normalize_zscore_minmax_robust(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, x double")
    a = np.array(vals)

    z = {r.id: r.x_norm for r in normalize_columns(df, ["x"]).collect()}
    want_z = (a - a.mean()) / a.std(ddof=1)
    for i in range(5):
        assert abs(z[i] - want_z[i]) < 1e-9

    m = {r.id: r.x_norm for r in normalize_columns(df, ["x"], method="minmax").collect()}
    want_m = (a - a.min()) / (a.max() - a.min())
    for i in range(5):
        assert abs(m[i] - want_m[i]) < 1e-9

    r_ = {r.id: r.x_norm for r in normalize_columns(df, ["x"], method="robust").collect()}
    med = np.percentile(a, 50, method="linear")
    iqr = np.percentile(a, 75, method="linear") - np.percentile(a, 25, method="linear")
    want_r = (a - med) / iqr
    for i in range(5):
        assert abs(r_[i] - want_r[i]) < 1e-9
    # robust is outlier-immune: the inliers stay within ~2 IQRs
    assert all(abs(r_[i]) < 2 for i in range(4)) and r_[4] > 10


def test_normalize_degenerate_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, 5.0, 1.0), (1, 5.0, None), (2, 5.0, 3.0)], "id int, c double, x double"
    )
    out = {r.id: (r.c_norm, r.x_norm) for r in normalize_columns(df, ["c", "x"]).collect()}
    assert out[0][0] == 0.0 and out[2][0] == 0.0  # zero-spread -> 0, not NaN
    assert out[1][1] is None  # nulls stay null


def _random_vectors(spark, n=300, d=12, seed=5, partitions=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so PCA has a well-separated spectrum
    scales = np.linspace(5.0, 0.2, d)
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d)
    rows = [(i, x[i].astype(float).tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id int, embedding array<double>").repartition(partitions),
        x,
    )


def test_pca_matches_numpy_any_partitioning(spark):
    df, x = _random_vectors(spark)
    model = fit_pca(df, k=4)
    want_mean = x.mean(axis=0)
    assert np.allclose(model["mean"], want_mean, atol=1e-9)

    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    assert np.allclose(model["explained_variance"], vals[order], rtol=1e-9)
    for i, j in enumerate(order):
        got = np.array(model["components"][i])
        want = vecs[:, j]
        # eigenvectors match up to sign
        assert min(np.abs(got - want).max(), np.abs(got + want).max()) < 1e-8

    # partitioning invariance: same model from a different layout
    model2 = fit_pca(df.repartition(3), k=4)
    assert np.allclose(model["components"], model2["components"], atol=1e-8)


def test_apply_pca_projection_geometry(spark):
    df, x = _random_vectors(spark, n=200, d=10)
    model = fit_pca(df, k=10)  # full rank: projection is an isometry
    out = apply_pca(df, model).select("vec_id", "pca").collect()
    got = {r.vec_id: np.array(r.pca) for r in out}
    centered = x - x.mean(axis=0)
    # full-rank projection preserves pairwise distances (rotation)
    for a, b in [(0, 1), (5, 17), (42, 99)]:
        want = np.linalg.norm(centered[a] - centered[b])
        have = np.linalg.norm(got[a] - got[b])
        assert abs(want - have) < 1e-3

    # truncated projection: variance concentrates in the first axes
    m4 = fit_pca(df, k=4)
    o4 = np.stack([np.array(r.pca) for r in apply_pca(df, m4).select("pca").collect()])
    v = o4.var(axis=0, ddof=1)
    assert v[0] > v[1] > v[2] > v[3]
    assert np.allclose(v, m4["explained_variance"], rtol=5e-3)


def test_pca_null_vectors(spark):
    rows = [(0, [1.0, 2.0, 3.0]), (1, None), (2, [2.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    model = fit_pca(df, k=2)  # nulls ignored in the fit
    out = {r.vec_id: r.pca for r in apply_pca(df, model).collect()}
    assert out[1] is None  # null in -> null out
    assert all(out[i] is not None and len(out[i]) == 2 for i in (0, 2, 3))


def test_discretize_quantiles_equal_population(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.features import discretize_quantiles

    vals = [float(v) for v in range(100)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)] + [(100, None)], "id int, x double"
    )
    out = {r.id: r.x_bucket for r in discretize_quantiles(df, "x", 4).collect()}
    assert out[100] is None
    counts = {}
    for i, v in enumerate(vals):
        counts[out[i]] = counts.get(out[i], 0) + 1
    assert set(counts) == {0, 1, 2, 3}
    assert all(20 <= c <= 30 for c in counts.values())  # equal-population-ish
    # assignment consistent with numpy cutpoints
    cuts = [np.percentile(vals, q, method="linear") for q in (25, 50, 75)]
    for i, v in enumerate(vals):
        assert out[i] == sum(v >= c for c in cuts)
    # equal values share a bucket
    df2 = spark.createDataFrame([(i, 5.0) for i in range(8)], "id int, x double")
    assert {r.x_bucket for r in discretize_quantiles(df2, "x", 4).collect()} == {3}


def test_normalize_per_group(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 100.0), ("b", 200.0), ("b", 300.0)]
    df = spark.createDataFrame([(i, g, v) for i, (g, v) in enumerate(rows)], "id int, g string, x double")
    out = {r.id: r.x_norm for r in normalize_columns(df, ["x"], by=["g"]).collect()}
    # per-group z-scores are identical across the two groups despite 100x scale
    assert abs(out[0] - out[3]) < 1e-9 and abs(out[2] - out[5]) < 1e-9
    assert abs(out[0] + 1.0) < 1e-9 and abs(out[1]) < 1e-9  # (1-2)/1

    mm = {r.id: r.x_norm for r in normalize_columns(df, ["x"], method="minmax", by=["g"]).collect()}
    assert mm[0] == 0.0 and mm[2] == 1.0 and mm[3] == 0.0 and mm[5] == 1.0

    rb = {r.id: r.x_norm for r in normalize_columns(df, ["x"], method="robust", by=["g"]).collect()}
    assert abs(rb[1]) < 1e-9  # median of its group -> 0

    # degenerate group -> 0.0 not NaN
    dg = spark.createDataFrame([(0, "c", 5.0), (1, "c", 5.0)], "id int, g string, x double")
    z = {r.id: r.x_norm for r in normalize_columns(dg, ["x"], by=["g"]).collect()}
    assert z == {0: 0.0, 1: 0.0}


def test_winsorize_matches_numpy(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.features import winsorize

    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(50, 5, 200), [1000.0, -1000.0]])
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = winsorize(df, ["x"], lower=0.05, upper=0.95).toPandas()
    lo, hi = np.quantile(vals, [0.05, 0.95])  # linear interpolation == Spark percentile
    np.testing.assert_allclose(
        np.sort(got["x_w"]), np.sort(np.clip(vals, lo, hi)), rtol=1e-12
    )
    assert got["x_w"].max() <= hi + 1e-9 and got["x_w"].min() >= lo - 1e-9


def test_winsorize_per_group_and_nulls(spark):
    from aws_sdk_pandas_spark.operators.features import winsorize

    rows = [("a", float(i)) for i in range(11)] + [("b", float(100 + i)) for i in range(11)]
    rows.append(("a", None))
    df = spark.createDataFrame(rows, "g string, x double")
    got = winsorize(df, ["x"], lower=0.1, upper=0.9, by=["g"]).collect()
    a = sorted(r.x_w for r in got if r.g == "a" and r.x_w is not None)
    b = sorted(r.x_w for r in got if r.g == "b")
    assert a[0] == 1.0 and a[-1] == 9.0  # group-local cut points
    assert b[0] == 101.0 and b[-1] == 109.0
    assert any(r.x_w is None for r in got if r.g == "a")  # NULL passes through


def test_mahalanobis_flags_combination_outliers(spark):
    """A row typical in each coordinate but impossible in combination
    (against a strong correlation) scores far above aligned rows;
    distances match a numpy recompute; NULL coordinates -> NULL."""
    import numpy as np

    from aws_sdk_pandas_spark.operators.features import (
        apply_mahalanobis,
        fit_mahalanobis,
    )

    rng = np.random.default_rng(41)
    x = rng.normal(0, 1, 300)
    y = x * 2 + rng.normal(0, 0.1, 300)   # strong correlation
    rows = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(x, y))]
    rows.append((1000, 2.0, -4.0))        # each coord ~2 sigma, combo impossible
    rows.append((1001, None, 1.0))
    df = spark.createDataFrame(rows, "i int, a double, b double")
    model = fit_mahalanobis(df.where("i < 1000"), ["a", "b"])
    got = {r.i: r for r in apply_mahalanobis(df, model, threshold=5.0).collect()}
    assert got[1000].mahalanobis > 20 and got[1000].mahalanobis_flag
    typical = [got[i].mahalanobis for i in range(300)]
    assert sum(1 for t in typical if t > 5.0) < 5
    assert got[1001].mahalanobis is None and not got[1001].mahalanobis_flag

    mu = np.array(model["mean"]); inv = np.array(model["inv_cov"])
    v = np.array([2.0, -4.0]) - mu
    expect = float(np.sqrt(v @ inv @ v))
    assert abs(got[1000].mahalanobis - round(expect, 6)) < 1e-6


def test_target_encode_smoothing_and_loo(spark):
    from aws_sdk_pandas_spark.operators.features import target_encode

    rows = [
        (1, "a", 1.0), (2, "a", 0.0), (3, "a", 1.0), (4, "a", 1.0),  # a: 3/4
        (5, "b", 0.0), (6, "b", 0.0),                                 # b: 0/2
        (7, "c", 1.0),                                                # singleton
        (8, None, 1.0),                                               # NULL cat
        (9, "a", None),                                               # NULL label
    ]
    df = spark.createDataFrame(rows, "id int, cat string, y double")
    prior = (1 + 0 + 1 + 1 + 0 + 0 + 1 + 1) / 8  # NULL label excluded
    m = 2.0
    got = {r.id: r for r in target_encode(
        df, cat_col="cat", label_col="y", smoothing=m).collect()}
    exp = {
        "a": (3 + m * prior) / (4 + m),
        "b": (0 + m * prior) / (2 + m),
        "c": (1 + m * prior) / (1 + m),
    }
    for i, cat, y in rows:
        want = exp[cat] if cat else (0 + m * prior) / (0 + m)  # NULL -> prior
        assert abs(got[i].cat_te - round(want, 6)) < 1e-9, i
    assert abs(got[8].cat_te - round(prior, 6)) < 1e-9

    # LOO: own label excluded; singleton shrinks fully to the prior term
    loo = {r.id: r for r in target_encode(
        df, cat_col="cat", label_col="y", smoothing=m, leave_one_out=True
    ).collect()}
    assert abs(loo[1].cat_te - round((3 - 1 + m * prior) / (3 + m), 6)) < 1e-9
    assert abs(loo[2].cat_te - round((3 - 0 + m * prior) / (3 + m), 6)) < 1e-9
    assert abs(loo[7].cat_te - round((0 + m * prior) / (0 + m), 6)) < 1e-9
    # NULL-label row in a known category: no own-label to remove
    assert abs(loo[9].cat_te - round((3 + m * prior) / (4 + m), 6)) < 1e-9

    # m=0, LOO, singleton -> 0/0 -> NULL, not an ANSI error
    z = {r.id: r for r in target_encode(
        df, cat_col="cat", label_col="y", smoothing=0.0, leave_one_out=True
    ).collect()}
    assert z[7].cat_te is None


def test_frequency_encode(spark):
    from aws_sdk_pandas_spark.operators.features import frequency_encode

    rows = [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, None)]
    df = spark.createDataFrame(rows, "id int, cat string")
    got = {r.id: r.cat_freq for r in frequency_encode(df, cat_col="cat").collect()}
    assert abs(got[1] - 0.75) < 1e-9 and abs(got[4] - 0.25) < 1e-9
    assert got[5] is None


def test_woe_iv_matches_serial(spark):
    import math

    from aws_sdk_pandas_spark.operators.features import woe_iv

    rows = (
        [("a", 1)] * 30 + [("a", 0)] * 10      # positive-heavy
        + [("b", 1)] * 10 + [("b", 0)] * 30    # negative-heavy
        + [("c", 1)] * 20 + [("c", 0)] * 20    # neutral
        + [("d", 1)] * 5                        # pure category: smoothing kicks in
        + [(None, 0)] * 5                       # NULL category keeps its row
        + [("a", None)]                         # NULL label excluded
    )
    df = spark.createDataFrame(rows, "cat string, y int")
    got = {r.category: r for r in woe_iv(df, cat_col="cat", label_col="y").collect()}

    tp = 30 + 10 + 20 + 5
    tn = 10 + 30 + 20 + 5
    s = 0.5
    for cat, (np_, nn_) in {
        "a": (30, 10), "b": (10, 30), "c": (20, 20), "d": (5, 0), None: (0, 5)
    }.items():
        pp = (np_ + s) / (tp + 2 * s)
        pn = (nn_ + s) / (tn + 2 * s)
        woe = math.log(pp / pn)
        r = got[cat]
        assert (r.n_pos, r.n_neg) == (np_, nn_)
        assert abs(r.woe - round(woe, 6)) < 1e-9
        assert abs(r.iv_contrib - round((pp - pn) * woe, 6)) < 1e-9
    assert got["a"].woe > 0 > got["b"].woe
    assert abs(got["c"].woe) < 0.1
    assert got["d"].woe > 1.5        # pure but finite
