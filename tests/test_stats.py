"""A/B statistics: Welch arithmetic vs a numpy recompute, and a
detectable synthetic effect."""

from __future__ import annotations

import numpy as np

from aws_sdk_pandas_spark.operators.stats import ab_test


def test_ab_test_matches_numpy(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(10.0, 2.0, 400)
    b = rng.normal(10.5, 2.5, 350)   # real effect
    c = rng.normal(10.0, 2.0, 300)   # null effect
    rows = (
        [("control", float(v)) for v in a]
        + [("variant_b", float(v)) for v in b]
        + [("variant_c", float(v)) for v in c]
    )
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r.group: r for r in ab_test(
        df, group_col="grp", metric_col="value", baseline="control").collect()}
    assert set(out) == {"variant_b", "variant_c"}

    for name, arr in (("variant_b", b), ("variant_c", c)):
        se = np.sqrt(a.var(ddof=1) / len(a) + arr.var(ddof=1) / len(arr))
        z = (arr.mean() - a.mean()) / se
        r = out[name]
        assert r.n_base == 400 and r.n_treat == len(arr)
        assert abs(r.z_score - round(z, 4)) < 1e-9
        assert abs(r.diff - round(arr.mean() - a.mean(), 6)) < 1e-9
    assert abs(out["variant_b"].z_score) > 1.96   # the real effect is detected
    assert abs(out["variant_c"].z_score) < 1.96   # the null effect is not


def test_linear_fit_matches_numpy(spark):
    """Per-group OLS equals numpy polyfit; degenerate groups yield
    NULLs, not errors."""
    import numpy as np

    from aws_sdk_pandas_spark.operators.stats import linear_fit

    rng = np.random.default_rng(31)
    rows = []
    truth = {"a": (2.5, 7.0), "b": (-0.75, 100.0)}
    for g, (m, c) in truth.items():
        for i in range(60):
            x = float(i)
            rows.append((g, x, m * x + c + float(rng.normal(0, 0.5))))
    rows.append(("single", 1.0, 5.0))     # n=1 -> NULL fit
    rows.append(("flatx", 3.0, 1.0))      # zero x-spread
    rows.append(("flatx", 3.0, 9.0))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in linear_fit(df, x_col="x", y_col="y", by=["g"]).collect()}
    for g, (m, c) in truth.items():
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(got[g].slope - round(float(slope), 6)) < 1e-6
        assert abs(got[g].intercept - round(float(intercept), 6)) < 1e-6
        assert got[g].r2 > 0.99 and got[g].n == 60
    assert got["single"].slope is None
    assert got["flatx"].slope is None


def _np_ks(a, b):
    """Independent two-sample KS recompute (numpy only)."""
    xs = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def test_ks_test_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import ks_test

    rng = np.random.default_rng(8)
    a = rng.normal(0.0, 1.0, 500)
    b = rng.normal(0.4, 1.3, 450)          # shifted + widened: real drift
    c = rng.normal(0.0, 1.0, 480)          # same distribution: no drift
    rows = (
        [("a", float(v)) for v in a]
        + [("b", float(v)) for v in b]
        + [("c", float(v)) for v in c]
    )
    df = spark.createDataFrame(rows, "grp string, value double")

    r = ks_test(df, value_col="value", group_col="grp",
                group_a="a", group_b="b", num_partitions=8).collect()[0]
    d = _np_ks(a, b)
    assert abs(r.d_stat - round(d, 6)) < 1e-9
    assert r.n_a == 500 and r.n_b == 450
    n_eff = 500 * 450 / 950
    lam = (np.sqrt(n_eff) + 0.12 + 0.11 / np.sqrt(n_eff)) * d
    assert abs(r.p_value - round(min(1.0, 2 * np.exp(-2 * lam * lam)), 6)) < 1e-9
    assert r.p_value < 0.01                 # the real shift is significant

    r0 = ks_test(df, value_col="value", group_col="grp",
                 group_a="a", group_b="c", num_partitions=8).collect()[0]
    assert r0.p_value > 0.05                # the null pair is not


def test_ks_test_ties_and_missing_group(spark):
    from aws_sdk_pandas_spark.operators.stats import ks_test

    # heavy ties: integer-valued samples exercise the distinct-value path
    rows = [("a", float(v % 5)) for v in range(100)] + [
        ("b", float(v % 7)) for v in range(70)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    a = np.array([v % 5 for v in range(100)], dtype=float)
    b = np.array([v % 7 for v in range(70)], dtype=float)
    r = ks_test(df, value_col="value", group_col="grp",
                group_a="a", group_b="b", num_partitions=4).collect()[0]
    assert abs(r.d_stat - round(_np_ks(a, b), 6)) < 1e-9
    # absent cohort -> NULL stat, zero count (no exception)
    r2 = ks_test(df, value_col="value", group_col="grp",
                 group_a="a", group_b="nope").collect()[0]
    assert r2.d_stat is None and r2.n_b == 0


def _np_mwu(a, b):
    """Rank-sum U + tie-corrected z, numpy only."""
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0   # average rank of the tied run
        i = j
    na, nb = len(a), len(b)
    ra = ranks[:na].sum()
    u_a = ra - na * (na + 1) / 2.0
    n = na + nb
    _, cnt = np.unique(allv, return_counts=True)
    ties = float((cnt.astype(float) ** 3 - cnt).sum())
    sigma = np.sqrt(na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1))))
    z = (u_a - na * nb / 2.0) / sigma
    return u_a, z


def test_mann_whitney_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import mann_whitney_u

    rng = np.random.default_rng(13)
    # lognormal: exactly the heavy-tail case where Welch misleads
    a = np.round(rng.lognormal(0.0, 1.0, 300), 2)   # rounding forces ties
    b = np.round(rng.lognormal(0.35, 1.0, 280), 2)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "grp string, value double")
    r = mann_whitney_u(df, value_col="value", group_col="grp",
                       group_a="a", group_b="b", num_partitions=8).collect()[0]
    u_a, z = _np_mwu(a, b)
    assert abs(r.u_a - round(u_a, 4)) < 1e-9
    assert abs(r.u_b - round(300 * 280 - u_a, 4)) < 1e-9
    assert abs(r.z_score - round(z, 4)) < 1e-9
    assert r.z_score < -1.96                # b ranks higher -> a's z negative
    assert r.n_a == 300 and r.n_b == 280


def test_chi_square_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import chi_square_test

    rng = np.random.default_rng(17)
    # dependent pair: y's distribution depends on x
    rows = []
    for _ in range(2000):
        x = int(rng.integers(0, 3))
        p = [[0.6, 0.3, 0.1], [0.2, 0.5, 0.3], [0.1, 0.2, 0.7]][x]
        y = int(rng.choice(3, p=p))
        rows.append((f"x{x}", f"y{y}"))
    rows.append((None, "y0"))               # NULLs are excluded
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square_test(df, col_a="a", col_b="b").collect()[0]

    obs = np.zeros((3, 3))
    for a, b in rows:
        if a is not None:
            obs[int(a[1]), int(b[1])] += 1
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = float(((obs - e) ** 2 / e).sum())
    assert abs(r.chi2 - round(chi2, 4)) < 1e-9
    assert r.dof == 4 and r.n == 2000
    v = np.sqrt(chi2 / (2000 * 2))
    assert abs(r.cramers_v - round(float(v), 4)) < 1e-9
    assert r.chi2 > 9.49                    # dependence detected at 5% / dof=4

    # independent pair: chi2 small
    rows2 = [(f"x{int(rng.integers(0,3))}", f"y{int(rng.integers(0,3))}")
             for _ in range(2000)]
    r2 = chi_square_test(
        spark.createDataFrame(rows2, "a string, b string"), col_a="a", col_b="b"
    ).collect()[0]
    assert r2.chi2 < 9.49


def test_benford_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import benford_test

    rng = np.random.default_rng(19)
    # products of uniforms are Benford-ish; include zero/NULL/negatives
    vals = [float(v) for v in np.exp(rng.uniform(0, np.log(10) * 6, 3000))]
    vals += [0.0, None]
    vals += [-v for v in vals[:50] if v]    # sign ignored
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.digit: r for r in benford_test(df, value_col="x").collect()}
    arr = np.array([abs(v) for v in vals if v])
    digits = (arr / 10 ** np.floor(np.log10(arr))).astype(int)
    total = len(digits)
    assert set(got) == set(np.unique(digits))
    for d in sorted(got):
        n_d = int((digits == d).sum())
        assert got[d].n == n_d
        assert abs(got[d].observed_p - round(n_d / total, 6)) < 1e-9
        exp_p = np.log10(1 + 1 / d)
        assert abs(got[d].expected_p - round(float(exp_p), 6)) < 1e-9
        e_cnt = exp_p * total
        assert abs(got[d].chi2_contrib
                   - round(float((n_d - e_cnt) ** 2 / e_cnt), 6)) < 1e-9
    # a Benford-ish source passes the chi-square gate chi2_8 (5%) = 15.51
    assert sum(r.chi2_contrib for r in got.values()) < 15.51


def _np_gini(x):
    x = np.sort(np.asarray(x, dtype=float))
    n = len(x)
    return float(2 * np.sum((np.arange(1, n + 1)) * x) / (n * x.sum()) - (n + 1) / n)


def test_gini_grouped_and_global(spark):
    from aws_sdk_pandas_spark.operators.stats import gini_coefficient

    rng = np.random.default_rng(23)
    even = rng.uniform(99.9, 100.1, 400)        # near-equal -> G ~ 0
    skew = rng.pareto(1.2, 400) + 0.01           # heavy concentration
    rows = [("even", float(v)) for v in even] + [("skew", float(v)) for v in skew]
    rows.append(("even", None))                  # NULL excluded
    df = spark.createDataFrame(rows, "g string, x double")

    got = {r.g: r for r in gini_coefficient(df, value_col="x", by=["g"]).collect()}
    assert abs(got["even"].gini - round(_np_gini(even), 6)) < 1e-9
    assert abs(got["skew"].gini - round(_np_gini(skew), 6)) < 1e-9
    assert got["even"].gini < 0.01 < 0.5 < got["skew"].gini
    assert got["even"].n == 400

    # ungrouped path (two-phase prefix-sum ranks) == same formula globally
    allv = np.array([v for _, v in rows if v is not None])
    r = gini_coefficient(df, value_col="x", num_partitions=8).collect()[0]
    assert abs(r.gini - round(_np_gini(allv), 6)) < 1e-9
    assert r.n == 800


def test_fit_ols_matches_numpy_lstsq(spark):
    from aws_sdk_pandas_spark.operators.stats import apply_ols, fit_ols

    rng = np.random.default_rng(29)
    n = 500
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-5, 5, n)
    # large-magnitude third feature: the cancellation trap two-pass
    # centering is there to survive
    x3 = 1.7e9 + rng.uniform(0, 1000, n)
    y = 3.0 * x1 - 1.25 * x2 + 4e-3 * x3 + 7.5 + rng.normal(0, 0.5, n)
    rows = [
        (int(i), float(a), float(b), float(c), float(d))
        for i, (a, b, c, d) in enumerate(zip(x1, x2, x3, y))
    ]
    rows.append((n, None, 1.0, 1.7e9, 5.0))  # NULL feature row excluded
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, x3 double, y double")

    m = fit_ols(df, x_cols=["x1", "x2", "x3"], y_col="y")
    # reference: the SAME centered normal-equation estimator in numpy
    # (raw-column lstsq on a 1.7e9-magnitude feature loses ~5 digits to
    # conditioning — that's the failure mode centering avoids)
    Xc = np.column_stack([x1, x2, x3])
    Xm = Xc - Xc.mean(axis=0)
    beta = np.linalg.solve(Xm.T @ Xm, Xm.T @ (y - y.mean()))
    intercept = y.mean() - beta @ Xc.mean(axis=0)
    assert m["n"] == n
    for got, want in zip(m["coef"] + [m["intercept"]], list(beta) + [intercept]):
        assert abs(got - want) < 1e-9 * max(1.0, abs(want))
    # and loosely against the generating truth
    for got, want in zip(m["coef"], [3.0, -1.25, 4e-3]):
        assert abs(got - want) < 0.05 * max(1.0, abs(want))
    pred = Xc @ beta + intercept
    resid = y - pred
    r2 = 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(m["r2"] - r2) < 1e-9
    assert m["r2"] > 0.99

    out = {r.id: r for r in apply_ols(
        df, m, residual_col="resid", y_col="y").collect()}
    for i in range(n):
        assert abs(out[i].prediction - pred[i]) < 1e-6
        assert abs(out[i].resid - (y[i] - pred[i])) < 1e-6
    assert out[n].prediction is None  # NULL feature propagates


def test_fit_ols_degenerate_inputs(spark):
    import pytest

    from aws_sdk_pandas_spark.operators.stats import fit_ols

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 4.0, 5.0), (3.0, 6.0, 7.0), (4.0, 8.0, 9.0)],
        "a double, b double, y double",
    )
    with pytest.raises(ValueError, match="singular"):
        fit_ols(df, x_cols=["a", "b"], y_col="y")  # b = 2a exactly
    with pytest.raises(ValueError, match="cannot determine"):
        fit_ols(df.limit(2), x_cols=["a", "b"], y_col="y")


def test_bootstrap_ci_matches_serial_poisson(spark):
    import hashlib

    from aws_sdk_pandas_spark.operators.stats import _POISSON1_CUM, bootstrap_ci

    rng = np.random.default_rng(37)
    vals = rng.normal(50.0, 8.0, 400)
    rows = [(int(i), float(v)) for i, v in enumerate(vals)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "id long, v double")

    B = 80
    r = bootstrap_ci(
        df, value_col="v", id_col="id", n_replicates=B, conf=0.9, seed=7
    ).collect()[0]

    # serial recompute with the identical md5-derived Poisson weights
    def w(i, b):
        h = hashlib.md5(f"{i}:{b}:7".encode()).hexdigest()[:8]
        u = int(h, 16) / 2**32
        for k, c in enumerate(_POISSON1_CUM):
            if u < c:
                return k
        return 9

    stats = []
    for b in range(B):
        ws = np.array([w(i, b) for i in range(400)], dtype=float)
        stats.append((ws * vals).sum() / ws.sum())
    stats = np.sort(np.array(stats))
    assert abs(r.estimate - round(float(vals.mean()), 6)) < 1e-9
    assert abs(r.se - round(float(stats.std(ddof=1)), 6)) < 1e-9
    # Spark percentile: exact interpolated — mirror numpy linear interp
    for got, q in ((r.ci_lo, 0.05), (r.ci_hi, 0.95)):
        want = float(np.percentile(stats, q * 100, method="linear"))
        assert abs(got - round(want, 6)) < 1e-9
    assert r.n == 400 and r.n_replicates == B
    # the interval behaves like one: covers the true mean, width ~ 2*1.64*se
    assert r.ci_lo < 50.0 < r.ci_hi
    assert r.ci_lo < r.estimate < r.ci_hi


def test_bootstrap_ci_sum_mode_and_validation(spark):
    import pytest

    from aws_sdk_pandas_spark.operators.stats import bootstrap_ci

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, v double"
    )
    r = bootstrap_ci(
        df, value_col="v", id_col="id", stat="sum", n_replicates=40
    ).collect()[0]
    assert r.estimate == sum(range(50))
    assert r.ci_lo < r.estimate < r.ci_hi  # E[w]=1 keeps sums centered

    with pytest.raises(ValueError, match="stat"):
        bootstrap_ci(df, value_col="v", id_col="id", stat="median")
    with pytest.raises(ValueError, match="conf"):
        bootstrap_ci(df, value_col="v", id_col="id", conf=1.5)


def test_diff_in_diff_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import diff_in_diff

    rng = np.random.default_rng(43)
    rows = []
    # shared time trend +5, true treatment effect +3
    cells = {
        ("t", "pre"): rng.normal(20, 2, 300),
        ("t", "post"): rng.normal(28, 2, 320),   # 20 + 5 trend + 3 effect
        ("c", "pre"): rng.normal(22, 2, 310),
        ("c", "post"): rng.normal(27, 2, 290),   # 22 + 5 trend
    }
    for (g, p), vs in cells.items():
        rows += [(g, p, float(v)) for v in vs]
    df = spark.createDataFrame(rows, "grp string, period string, y double")
    r = diff_in_diff(
        df, group_col="grp", period_col="period", metric_col="y",
        treat_value="t", post_value="post",
    ).collect()[0]

    m = {k: v.mean() for k, v in cells.items()}
    v = {k: v.var(ddof=1) for k, v in cells.items()}
    n = {k: len(v) for k, v in cells.items()}
    att = (m[("t", "post")] - m[("t", "pre")]) - (m[("c", "post")] - m[("c", "pre")])
    se = np.sqrt(sum(v[k] / n[k] for k in cells))
    assert abs(r.att - round(float(att), 6)) < 1e-9
    assert abs(r.se - round(float(se), 6)) < 1e-9
    assert abs(r.z_score - round(float(att / se), 4)) < 1e-9
    assert r.n == sum(n.values())
    assert 2.0 < r.att < 4.0 and r.z_score > 1.96   # recovers the +3 effect
    # a naive before/after on the treated group absorbs the trend
    naive = m[("t", "post")] - m[("t", "pre")]
    assert naive > 6.0  # trend+effect; DiD strips the trend


def test_cuped_reduces_variance_unbiased(spark):
    from aws_sdk_pandas_spark.operators.stats import ab_test, cuped_adjust

    rng = np.random.default_rng(47)
    n = 2000
    # pre-experiment covariate drives most of the metric variance
    x = rng.normal(100, 20, n)
    grp = np.where(np.arange(n) % 2 == 0, "control", "treat")
    effect = np.where(grp == "treat", 1.0, 0.0)
    y = 0.8 * x + effect + rng.normal(0, 3, n)
    rows = [(str(g), float(a), float(b)) for g, a, b in zip(grp, x, y)]
    rows.append(("treat", None, 50.0))    # NULL covariate -> y unadjusted
    df = spark.createDataFrame(rows, "grp string, x double, y double")

    adj = cuped_adjust(df, metric_col="y", covariate_col="x")
    got = adj.collect()

    xs = np.array([r[1] for r in rows if r[1] is not None])
    ys = np.array([r[2] for r in rows if r[1] is not None])
    theta = np.cov(xs, ys, ddof=1)[0, 1] / xs.var(ddof=1)
    for r in got:
        if r.x is None:
            assert r.y_cuped == 50.0
        else:
            want = r.y - theta * (r.x - xs.mean())
            assert abs(r.y_cuped - want) < 1e-9

    raw = ab_test(df, group_col="grp", metric_col="y",
                  baseline="control").collect()[0]
    cup = ab_test(adj, group_col="grp", metric_col="y_cuped",
                  baseline="control").collect()[0]
    # same effect estimate (up to noise), much tighter standard error
    assert abs(cup.diff - raw.diff) < 0.5
    assert cup.se < 0.35 * raw.se
    assert abs(cup.z_score) > abs(raw.z_score)


def test_conformal_matches_serial_and_covers(spark):
    import hashlib
    import math

    from aws_sdk_pandas_spark.operators.stats import apply_conformal, fit_conformal

    rng = np.random.default_rng(53)
    n = 1200
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-3, 3, n)
    # heteroskedastic, NON-Gaussian noise: the case where OLS +-1.96s lies
    y = 2.0 * x1 - x2 + 5 + rng.laplace(0, 1.0 + 0.2 * x1)
    rows = [
        (int(i), float(a), float(b), float(c))
        for i, (a, b, c) in enumerate(zip(x1, x2, y))
    ]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")

    m = fit_conformal(
        df, x_cols=["x1", "x2"], y_col="y", id_col="id",
        alpha=0.1, calib_frac=0.3, seed=9, num_partitions=8,
    )

    # serial recompute: same md5 split, same centered OLS, same k-th stat
    def u(i):
        return int(hashlib.md5(f"{i}:9".encode()).hexdigest()[:8], 16) / 2**32

    calib_ids = [i for i in range(n) if u(i) < 0.3]
    train_ids = [i for i in range(n) if u(i) >= 0.3]
    Xt = np.column_stack([x1[train_ids], x2[train_ids]])
    yt = y[train_ids]
    Xm = Xt - Xt.mean(axis=0)
    beta = np.linalg.solve(Xm.T @ Xm, Xm.T @ (yt - yt.mean()))
    intercept = yt.mean() - beta @ Xt.mean(axis=0)
    pred_c = np.column_stack([x1[calib_ids], x2[calib_ids]]) @ beta + intercept
    ares = np.abs(y[calib_ids] - pred_c)
    k = min(len(ares), math.ceil((len(ares) + 1) * 0.9))
    q = float(np.sort(ares)[k - 1])
    assert m["n_calib"] == len(calib_ids) and m["n_train"] == len(train_ids)
    assert abs(m["q"] - q) < 1e-9
    for got, want in zip(m["ols"]["coef"], beta):
        assert abs(got - want) < 1e-9 * max(1.0, abs(want))

    # marginal coverage ~ 90% on fresh exchangeable data
    x1f = rng.uniform(0, 10, 2000)
    x2f = rng.uniform(-3, 3, 2000)
    yf = 2.0 * x1f - x2f + 5 + rng.laplace(0, 1.0 + 0.2 * x1f)
    fresh = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1f, x2f, yf)],
        "x1 double, x2 double, y double",
    )
    iv = apply_conformal(fresh, m).collect()
    cov = np.mean([r.pred_lo <= r.y <= r.pred_hi for r in iv])
    assert 0.87 <= cov <= 0.94
    width = iv[0].pred_hi - iv[0].pred_lo
    assert abs(width - 2 * q) < 1e-9


def test_mutual_information_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import mutual_information

    rng = np.random.default_rng(73)
    rows = []
    for _ in range(3000):
        x = int(rng.integers(0, 3))
        # y copies x 70% of the time: strong but not perfect association
        y = x if rng.random() < 0.7 else int(rng.integers(0, 3))
        rows.append((f"x{x}", f"y{y}"))
    rows.append((None, "y0"))
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, col_a="a", col_b="b").collect()[0]

    obs = np.zeros((3, 3))
    for a, b in rows:
        if a is not None:
            obs[int(a[1]), int(b[1])] += 1
    p = obs / obs.sum()
    pi, pj = p.sum(1, keepdims=True), p.sum(0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = float(np.nansum(np.where(p > 0, p * np.log(p / (pi * pj)), 0)))
    ha = float(-(pi * np.log(pi)).sum())
    hb = float(-(pj * np.log(pj)).sum())
    assert abs(r.mi - round(mi, 6)) < 1e-9
    assert abs(r.h_a - round(ha, 6)) < 1e-9
    assert abs(r.h_b - round(hb, 6)) < 1e-9
    assert abs(r.nmi - round(mi / min(ha, hb), 6)) < 1e-9
    assert 0.2 < r.nmi < 0.8 and r.n == 3000

    # independent pair: MI near zero; identical pair: NMI = 1
    ind = spark.createDataFrame(
        [(f"x{int(rng.integers(0,3))}", f"y{int(rng.integers(0,3))}")
         for _ in range(3000)],
        "a string, b string",
    )
    assert mutual_information(ind, col_a="a", col_b="b").collect()[0].nmi < 0.02
    same = spark.createDataFrame([(f"v{i%4}", f"v{i%4}") for i in range(100)],
                                 "a string, b string")
    assert mutual_information(same, col_a="a", col_b="b").collect()[0].nmi == 1.0


def test_benford_near_power_of_ten_digit(spark):
    """Regression: doubles a hair below a power of ten made log10 round
    UP, flooring the leading digit to 0 — which then divided by zero in
    expected_p under ANSI.  The true leading digit there is 9."""
    from aws_sdk_pandas_spark.operators.stats import benford_test

    tricky = 9.999999999999999e-301   # log10 rounds to exactly -300
    df = spark.createDataFrame(
        [(tricky,), (123.0,), (987.0,)], "x double"
    )
    got = {r.digit: r.n for r in benford_test(df, value_col="x").collect()}
    assert got == {1: 1, 9: 2}        # tricky counted as digit 9, no error


def test_fdr_correct_matches_serial_bh(spark):
    rng = np.random.default_rng(101)
    # 20 true effects (tiny p) among 480 nulls (uniform p)
    ps = np.concatenate([rng.uniform(0, 1e-4, 20), rng.uniform(0, 1, 480)])
    rows = [(int(i), float(p)) for i, p in enumerate(ps)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "test_id long, p double")

    from aws_sdk_pandas_spark.operators.stats import fdr_correct

    got = {r.test_id: r for r in fdr_correct(df, p_col="p", alpha=0.05).collect()}
    assert 999 not in got

    # serial BH
    order = np.argsort(ps, kind="mergesort")
    m = len(ps)
    adj = np.minimum(1.0, ps[order] * m / (np.arange(m) + 1))
    q_sorted = np.minimum.accumulate(adj[::-1])[::-1]
    q = np.empty(m)
    q[order] = q_sorted
    for i in range(m):
        assert abs(got[i].q_value - round(float(q[i]), 6)) < 1e-9
        assert got[i].rejected == (round(float(q[i]), 6) <= 0.05)
    n_rej = sum(1 for i in range(m) if got[i].rejected)
    assert 20 <= n_rej <= 40      # finds the real effects, few extras
    # q-values are monotone in p
    byp = sorted(got.values(), key=lambda r: r.p)
    qs = [r.q_value for r in byp]
    assert qs == sorted(qs)


def test_fdr_correct_ties_deterministic(spark):
    """Tied p-values must share the SAME q-value (BH assigns the min
    over the suffix by rank, which spans both ties) — regression for
    the p-ordered suffix scan that split ties nondeterministically."""
    from aws_sdk_pandas_spark.operators.stats import fdr_correct

    rows = [(1, 0.001), (2, 0.04), (3, 0.04), (4, 0.9), (5, 1.0), (6, 1.0)]
    df = spark.createDataFrame(rows, "id long, p double")
    got = {r.id: r for r in fdr_correct(df, p_col="p", alpha=0.1).collect()}
    assert got[2].q_value == got[3].q_value
    assert got[2].rejected == got[3].rejected
    assert got[5].q_value == got[6].q_value == 1.0
    # serial BH on this table
    m = 6
    assert abs(got[2].q_value - round(min(0.04 * m / 3, 0.9 * m / 4, 1.0), 6)) < 1e-9


def test_ratio_ab_test_delta_method(spark):
    rng = np.random.default_rng(107)
    rows = []
    # per-user exposures and clicks; treatment lifts CTR 0.10 -> 0.12
    for grp, p in (("control", 0.10), ("treat", 0.12), ("null", 0.10)):
        for u in range(1500):
            views = int(rng.integers(1, 40))
            clicks = int(rng.binomial(views, p))
            rows.append((grp, float(clicks), float(views)))
    rows.append(("control", None, 0.0))   # NULL num counts as 0
    df = spark.createDataFrame(rows, "grp string, clicks double, views double")

    from aws_sdk_pandas_spark.operators.stats import ratio_ab_test

    got = {r.group: r for r in ratio_ab_test(
        df, group_col="grp", num_col="clicks", den_col="views",
        baseline="control",
    ).collect()}

    # serial delta-method recompute
    def stats(g):
        arr = [(c or 0.0, v) for gg, c, v in rows if gg == g]
        n = np.array([a for a, _ in arr]); d = np.array([b for _, b in arr])
        k = len(arr)
        r = n.mean() / d.mean()
        vr = (n.var(ddof=1) - 2 * r * np.cov(n, d, ddof=1)[0, 1]
              + r * r * d.var(ddof=1)) / (k * d.mean() ** 2)
        return k, r, vr

    kc, rc, vc = stats("control")
    for g in ("treat", "null"):
        kt, rt, vt = stats(g)
        r = got[g]
        assert r.n_base == kc and r.n_treat == kt
        assert abs(r.ratio_base - round(rc, 6)) < 1e-9
        assert abs(r.ratio_treat - round(rt, 6)) < 1e-9
        se = np.sqrt(vt + vc)
        assert abs(r.se - round(float(se), 6)) < 1e-9
        assert abs(r.z_score - round(float((rt - rc) / se), 4)) < 1e-9
    assert got["treat"].z_score > 1.96      # real lift detected
    assert abs(got["null"].z_score) < 1.96  # null passes


def test_effective_sample_size(spark):
    from aws_sdk_pandas_spark.operators.stats import effective_sample_size

    rows = (
        [("uniform", 1.0)] * 100              # ESS = n
        + [("skewed", 100.0)] + [("skewed", 0.01)] * 99   # mass on one row
        + [("skewed", None), ("skewed", -5.0)]             # excluded
    )
    df = spark.createDataFrame(rows, "g string, w double")
    got = {r.g: r for r in effective_sample_size(
        df, weight_col="w", by=["g"]).collect()}
    assert got["uniform"].ess == 100.0 and got["uniform"].ess_ratio == 1.0
    sw = 100.0 + 99 * 0.01
    sw2 = 100.0**2 + 99 * 0.01**2
    assert abs(got["skewed"].ess - round(sw * sw / sw2, 4)) < 1e-9
    assert got["skewed"].n == 100
    assert got["skewed"].ess_ratio < 0.02     # weighting discarded the corpus


def test_apdex(spark):
    rows = (
        [("api", 0.1)] * 70        # satisfied (T=0.5)
        + [("api", 1.0)] * 20      # tolerating (<= 2.0)
        + [("api", 5.0)] * 10      # frustrated
        + [("api", None), ("api", -3.0)]
        + [("db", 0.4)] * 4
    )
    df = spark.createDataFrame(rows, "svc string, lat double")

    from aws_sdk_pandas_spark.operators.stats import apdex

    got = {r.svc: r for r in apdex(
        df, latency_col="lat", threshold=0.5, by=["svc"]).collect()}
    a = got["api"]
    assert a.n == 100
    assert abs(a.pct_satisfied - 0.7) < 1e-9
    assert abs(a.pct_tolerating - 0.2) < 1e-9
    assert abs(a.pct_frustrated - 0.1) < 1e-9
    assert abs(a.apdex - 0.8) < 1e-9       # (70 + 20/2)/100
    assert a.p50 == 0.1 and a.p99 == 5.0
    assert got["db"].apdex == 1.0


def _np_avg_ranks(v: np.ndarray) -> np.ndarray:
    import pandas as pd  # noqa: F401  (rank helper uses it)

    return pd.Series(v).rank(method="average").to_numpy()


def test_anova_oneway_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import anova_oneway

    rng = np.random.default_rng(23)
    groups = {
        "a": rng.normal(10.0, 2.0, 400),
        "b": rng.normal(10.5, 2.0, 350),
        "c": rng.normal(12.0, 2.0, 300),
    }
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    rows += [(None, 1.0), ("a", None), ("a", float("nan"))]  # all excluded
    df = spark.createDataFrame(rows, "grp string, value double")
    r = anova_oneway(df, value_col="value", group_col="grp").collect()[0]

    allv = np.concatenate(list(groups.values()))
    gm = allv.mean()
    ssb = sum(len(v) * (v.mean() - gm) ** 2 for v in groups.values())
    ssw = sum(v.var(ddof=1) * (len(v) - 1) for v in groups.values())
    n, k = len(allv), 3
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r.f_stat - round(f, 4)) < 1e-9
    assert abs(r.eta_sq - round(ssb / (ssb + ssw), 6)) < 1e-9
    assert r.f_stat > 10.0                   # planted mean shift detected
    assert (r.df_between, r.df_within, r.n, r.k) == (2, n - 3, n, 3)


def test_anova_oneway_degenerate(spark):
    from aws_sdk_pandas_spark.operators.stats import anova_oneway

    # one group -> no between-variance; singleton groups -> no within
    one = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "grp string, value double"
    )
    r = anova_oneway(one, value_col="value", group_col="grp").collect()[0]
    assert r.f_stat is None and r.k == 1
    singles = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "grp string, value double"
    )
    r = anova_oneway(singles, value_col="value", group_col="grp").collect()[0]
    assert r.f_stat is None and r.df_within == 0 and r.k == 3


def test_kruskal_wallis_matches_numpy(spark):
    from aws_sdk_pandas_spark.operators.stats import kruskal_wallis

    rng = np.random.default_rng(29)
    groups = {
        "a": np.round(rng.lognormal(0.0, 1.0, 300), 1),  # ties via rounding
        "b": np.round(rng.lognormal(0.3, 1.0, 250), 1),
        "c": np.round(rng.lognormal(0.6, 1.0, 200), 1),
    }
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, value double")
    r = kruskal_wallis(
        df, value_col="value", group_col="grp", num_partitions=8
    ).collect()[0]

    allv = np.concatenate(list(groups.values()))
    ranks = _np_avg_ranks(allv)
    n = len(allv)
    idx = 0
    s = 0.0
    for vs in groups.values():
        rsum = ranks[idx: idx + len(vs)].sum()
        s += rsum * rsum / len(vs)
        idx += len(vs)
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    _, t = np.unique(allv, return_counts=True)
    h /= 1.0 - (t.astype(float) ** 3 - t).sum() / (float(n) ** 3 - n)
    assert abs(r.h_stat - round(h, 4)) < 1e-6
    assert r.h_stat > 6.0                    # planted shift detected
    assert (r.dof, r.n, r.k) == (2, n, 3)


def test_kruskal_wallis_all_tied(spark):
    from aws_sdk_pandas_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 5.0)] * 10 + [("b", 5.0)] * 10, "grp string, value double"
    )
    r = kruskal_wallis(df, value_col="value", group_col="grp").collect()[0]
    assert r.h_stat is None and r.n == 20 and r.k == 2


def test_spearman_matches_pandas(spark):
    import pandas as pd  # noqa: F401  (rank helper uses it)

    from aws_sdk_pandas_spark.operators.stats import spearman_corr

    rng = np.random.default_rng(31)
    x = np.round(rng.normal(0, 1, 800), 1)               # ties via rounding
    y = np.round(np.exp(x) + rng.normal(0, 0.5, 800), 1)  # monotone + noise
    rows = [(float(a), float(b)) for a, b in zip(x, y)]
    rows += [(None, 1.0), (1.0, None), (float("nan"), 2.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(
        df, x_col="x", y_col="y", num_partitions=8
    ).collect()[0]
    # no scipy in env: spearman == pearson on average ranks
    exp = float(np.corrcoef(_np_avg_ranks(x), _np_avg_ranks(y))[0, 1])
    assert abs(r.spearman_rho - round(exp, 6)) < 1e-7
    assert r.spearman_rho > 0.8              # monotone association found
    assert r.n == 800


def test_spearman_constant_column_is_null(spark):
    from aws_sdk_pandas_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(1.0, float(i)) for i in range(10)], "x double, y double"
    )
    r = spearman_corr(df, x_col="x", y_col="y").collect()[0]
    assert r.spearman_rho is None and r.n == 10
