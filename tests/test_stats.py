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
