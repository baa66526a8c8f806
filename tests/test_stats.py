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
