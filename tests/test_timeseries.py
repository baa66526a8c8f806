"""resample_locf semantics: bucketing, gap creation, forward fill."""

from __future__ import annotations

from aws_sdk_pandas_spark.operators.timeseries import resample_locf
from pyspark.sql import functions as F


def test_gapfill_locf(spark):
    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:10:00", 2.0),
            ("u1", "2024-01-01 00:40:00", 4.0),   # same hour -> avg 3.0
            ("u1", "2024-01-01 03:30:00", 9.0),   # hours 1,2 are gaps
            ("u2", "2024-01-01 05:00:00", 1.0),
        ],
        "user string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample_locf(df, time_col="ts", value_col="value", by=["user"], step="1 hour")
    rows = {(r.user, r.bucket.hour): r.value for r in out.collect()}
    assert rows == {
        ("u1", 0): 3.0,
        ("u1", 1): 3.0,   # filled
        ("u1", 2): 3.0,   # filled
        ("u1", 3): 9.0,
        ("u2", 5): 1.0,
    }


def test_gapfill_grid_bounded_by_span(spark):
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 1.0), ("u1", "2024-01-02 00:00:00", 2.0)],
        "user string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample_locf(df, time_col="ts", value_col="value", by=["user"], step="6 hours")
    assert out.count() == 5  # 24h span / 6h step + 1


def test_resample_interpolate_linear(spark):
    """Gap buckets get the linear blend of their neighbors; edges stay
    NULL; observed buckets keep their aggregate."""
    from datetime import datetime

    from aws_sdk_pandas_spark.operators.timeseries import resample_interpolate

    rows = [
        ("a", datetime(2026, 1, 1, 0, 30), 10.0),
        ("a", datetime(2026, 1, 1, 3, 15), 40.0),   # 2 empty buckets between
        ("b", datetime(2026, 1, 1, 0, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    got = {
        (r.g, r.bucket.hour): r.value
        for r in resample_interpolate(
            df, by=["g"], step="1 hour", time_col="ts", value_col="value"
        ).collect()
    }
    assert got[("a", 0)] == 10.0 and got[("a", 3)] == 40.0
    assert got[("a", 1)] == 20.0 and got[("a", 2)] == 30.0   # linear blend
    assert got[("b", 0)] == 5.0


def test_detect_anomalies_rolling(spark):
    from datetime import datetime

    from aws_sdk_pandas_spark.operators.timeseries import detect_anomalies_rolling

    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: stable series then a spike inside the window
    for i in range(10):
        rows.append((i, 1, base.replace(minute=i * 2), 10.0 + (i % 3) * 0.1))
    rows.append((10, 1, base.replace(minute=30), 50.0))  # spike
    # user 2: only 2 points -> cold start, never flagged
    rows.append((11, 2, base, 1.0))
    rows.append((12, 2, base.replace(minute=5), 100.0))
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp, value double")

    out = {r.event_id: r for r in detect_anomalies_rolling(
        df, ts_col="ts", value_col="value", by=["user_id"], z=3.0).collect()}
    assert out[10].anomaly_flag is True
    assert all(out[i].anomaly_flag is False for i in range(10))  # stable points
    assert out[12].anomaly_flag is False and out[12].anomaly_n_prior == 1  # cold start
    assert out[0].anomaly_zscore is None  # first point: no baseline

    # baseline excludes the current row: the spike's own value is absent
    # from its trailing stats (z computed against the stable 10.x mean)
    assert out[10].anomaly_zscore > 100


def test_rolling_anomaly_subsecond_baseline(spark):
    """Sub-second points must still see their same-second predecessors:
    only the current row is excluded from its own baseline."""
    from datetime import datetime, timedelta

    from aws_sdk_pandas_spark.operators.timeseries import detect_anomalies_rolling

    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, 1, base + timedelta(milliseconds=100 * i), 10.0 + (i % 3) * 0.1)
            for i in range(8)]
    rows.append((8, 1, base + timedelta(milliseconds=850), 99.0))  # spike at .85s
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp, value double")
    out = {r.event_id: r for r in detect_anomalies_rolling(
        df, ts_col="ts", value_col="value", by=["user_id"], z=3.0, min_points=5).collect()}
    assert out[8].anomaly_n_prior == 8  # all same-second predecessors counted
    assert out[8].anomaly_flag is True


def test_rolling_anomaly_cotimestamped_baseline(spark):
    """Points sharing the exact same timestamp form each other's
    baseline — only the row itself is excluded.  A dense equal-
    timestamp burst must get real z-scores, and a spike inside it must
    be flagged against its same-instant peers."""
    from datetime import datetime

    import numpy as np

    from aws_sdk_pandas_spark.operators.timeseries import detect_anomalies_rolling

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    vals = [10.0, 10.1, 10.2, 10.0, 10.1, 10.2, 50.0]  # 7 rows, one instant
    rows = [(i, 1, t0, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp, value double")
    out = {r.event_id: r for r in detect_anomalies_rolling(
        df, ts_col="ts", value_col="value", by=["user_id"], z=3.0, min_points=5).collect()}
    # every row's baseline = the other 6 rows at the same instant
    assert all(out[i].anomaly_n_prior == 6 for i in range(7))
    assert out[6].anomaly_flag is True and all(
        out[i].anomaly_flag is False for i in range(6))
    # z-score matches the serial leave-one-out recompute
    rest = np.array(vals[:-1])
    want = (vals[-1] - rest.mean()) / rest.std(ddof=1)
    assert abs(out[6].anomaly_zscore - want) < 1e-3


def test_page_hinkley_detects_mean_shift(spark):
    from datetime import datetime, timedelta

    from aws_sdk_pandas_spark.operators.timeseries import page_hinkley

    base = datetime(2024, 1, 1)
    rows = []
    # group 1: flat 10 for 50 points, then shifts to 14
    for i in range(80):
        v = 10.0 if i < 50 else 14.0
        rows.append((i, 1, base + timedelta(minutes=i), v))
    # group 2: flat throughout -> no alarm
    for i in range(80):
        rows.append((100 + i, 2, base + timedelta(minutes=i), 10.0))
    df = spark.createDataFrame(rows, "event_id int, k int, ts timestamp, value double")

    out = {r.event_id: r for r in page_hinkley(
        df, ts_col="ts", value_col="value", by=["k"], delta=0.1, threshold=20.0).collect()}
    g1_alarms = [i for i in range(80) if out[i].ph_alarm]
    assert g1_alarms and min(g1_alarms) > 50  # fires after the shift, not before
    assert all(not out[100 + i].ph_alarm for i in range(80))  # flat series silent

    # exact recompute of the statistic for group 1
    vals = [10.0] * 50 + [14.0] * 30
    mean = sum(vals) / len(vals)
    m, mn = 0.0, 0.0
    for i, v in enumerate(vals):
        m += v - mean - 0.1
        mn = min(mn, m)
        assert abs(out[i].ph_stat - round(m - mn, 6)) < 1e-6


def test_page_hinkley_series_starting_above_mean(spark):
    """Series whose early deviations are POSITIVE: the running min must
    include M_0 = 0, so the shift accumulates from the first row."""
    from datetime import datetime, timedelta

    from aws_sdk_pandas_spark.operators.timeseries import page_hinkley

    base = datetime(2024, 1, 1)
    vals = [14.0] * 30 + [10.0] * 50  # starts high, drops to flat
    rows = [(i, 1, base + timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id int, k int, ts timestamp, value double")
    out = {r.event_id: r.ph_stat for r in page_hinkley(
        df, ts_col="ts", value_col="value", by=["k"]).collect()}

    mean = sum(vals) / len(vals)
    m, mn = 0.0, 0.0
    for i, v in enumerate(vals):
        m += v - mean
        mn = min(mn, m)
        assert abs(out[i] - round(m - mn, 6)) < 1e-6, i
    assert out[0] > 0  # first row already above the M_0=0 floor


def test_ewma_matches_pandas_adjust_false(spark):
    """Full-lookback fold == pandas ewm(adjust=False) per group, and the
    default truncated lookback agrees to double precision."""
    import numpy as np
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import ewma

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 60),
            "i": list(range(60)) * 2,
            "x": rng.normal(50, 10, 120).round(3),
        }
    )
    expect = pdf.groupby("g")["x"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean()
    )
    df = spark.createDataFrame(pdf)
    got = (
        ewma(df, ts_col="i", value_col="x", by=["g"], alpha=0.3, lookback=200)
        .orderBy("g", "i")
        .toPandas()
    )
    np.testing.assert_allclose(got["ewma"].to_numpy(), expect.to_numpy(), rtol=1e-12)
    # derived lookback (alpha=0.3 -> ~104 rows) is exact in double precision
    got_trunc = (
        ewma(df, ts_col="i", value_col="x", by=["g"], alpha=0.3)
        .orderBy("g", "i")
        .toPandas()
    )
    np.testing.assert_allclose(got_trunc["ewma"].to_numpy(), expect.to_numpy(), rtol=1e-12)


def test_ewma_tie_breakers_deterministic(spark):
    """Equal timestamps fold in tie_breaker order, so reruns and
    repartitionings agree."""
    from aws_sdk_pandas_spark.operators.timeseries import ewma

    rows = [(1, "r1", 10.0), (1, "r2", 20.0), (2, "r3", 30.0)]
    df = spark.createDataFrame(rows, "t int, rid string, x double")
    got = {
        r.rid: r.ewma
        for r in ewma(
            df, ts_col="t", value_col="x", alpha=0.5, tie_breakers=["rid"]
        ).collect()
    }
    assert got["r1"] == 10.0
    assert got["r2"] == 15.0  # 0.5*10 + 0.5*20
    assert got["r3"] == 22.5


def test_autocorr_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import autocorr

    rng = np.random.default_rng(5)
    n = 200
    # AR(1)-ish series: strong lag-1 autocorrelation
    x = [0.0]
    for _ in range(n - 1):
        x.append(0.8 * x[-1] + rng.normal())
    pdf = pd.DataFrame({"t": range(n), "x": x})
    df = spark.createDataFrame(pdf)
    got = {
        r.lag: (r.acf, r.n_pairs)
        for r in autocorr(df, ts_col="t", value_col="x", lags=[1, 3]).collect()
    }
    s = pdf.set_index("t")["x"]
    for k in (1, 3):
        expect = float(np.corrcoef(s[k:], s.shift(k)[k:])[0, 1])
        assert got[k][1] == n - k
        assert abs(got[k][0] - round(expect, 6)) < 1e-6


def test_autocorr_degenerate_is_null(spark):
    from aws_sdk_pandas_spark.operators.timeseries import autocorr

    const = spark.createDataFrame(
        [("g", i, 7.0) for i in range(10)] + [("h", 0, 1.0)],
        "g string, t int, x double",
    )
    rows = {
        (r.g, r.lag): r.acf
        for r in autocorr(const, ts_col="t", value_col="x", by=["g"], lags=[1]).collect()
    }
    assert rows[("g", 1)] is None  # zero spread -> NaN corr -> NULL
    assert ("h", 1) not in rows  # no pairs at all -> no row


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """Planted trend + period-4 seasonal + zero noise: the decomposition
    recovers each part (up to the centered-MA edge NULLs), and
    x == trend + seasonal + residual wherever defined."""
    import numpy as np
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import seasonal_decompose

    n = 40
    season = [3.0, -1.0, -2.0, 0.0]  # sums to zero
    pdf = pd.DataFrame(
        {
            "t": range(n),
            "x": [10 + 0.5 * i + season[i % 4] for i in range(n)],
        }
    )
    got = (
        seasonal_decompose(
            spark.createDataFrame(pdf), ts_col="t", value_col="x", period=4
        )
        .orderBy("t")
        .toPandas()
    )
    mid = got.iloc[4:-4]
    # linear trend passes through the centered MA exactly
    np.testing.assert_allclose(mid["sd_trend"], 10 + 0.5 * mid["t"], atol=1e-6)
    for i, s in enumerate(season):
        vals = mid[mid["sd_phase"] == i]["sd_seasonal"].unique()
        assert len(vals) == 1 and abs(vals[0] - s) < 1e-6
    np.testing.assert_allclose(mid["sd_residual"], 0.0, atol=1e-6)
    # edges: trend/residual NULL, seasonal still assigned
    assert got.iloc[0]["sd_trend"] != got.iloc[0]["sd_trend"]  # NaN
    assert abs(got.iloc[0]["sd_seasonal"] - season[0]) < 1e-6


def test_seasonal_decompose_matches_statsmodels_shape_odd_period(spark):
    """Odd period: plain centered mean; per-group independence."""
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import seasonal_decompose

    rows = []
    for g, base in (("a", 0.0), ("b", 100.0)):
        for i in range(15):
            rows.append((g, i, base + i + [1.0, 0.0, -1.0][i % 3]))
    pdf = pd.DataFrame(rows, columns=["g", "t", "x"])
    got = (
        seasonal_decompose(
            spark.createDataFrame(pdf), ts_col="t", value_col="x", period=3, by=["g"]
        )
        .orderBy("g", "t")
        .toPandas()
    )
    mid = got[(got["t"] >= 1) & (got["t"] <= 13)]
    for g, base in (("a", 0.0), ("b", 100.0)):
        sub = mid[mid["g"] == g]
        assert (abs(sub["sd_trend"] - (base + sub["t"])) < 1e-6).all()
        assert (abs(sub["sd_residual"]) < 1e-6).all()


def test_holt_matches_serial_recursion(spark):
    """Full-lookback fold equals the serial Holt recursion exactly; the
    default truncated lookback agrees to double precision; forecast is
    level + h*trend."""
    import numpy as np
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import holt_smoothing

    rng = np.random.default_rng(17)
    n = 80
    xs = [10 + 0.7 * i + rng.normal(0, 2) for i in range(n)]
    pdf = pd.DataFrame({"t": range(n), "x": xs})

    a, b = 0.4, 0.2
    levels, trends = [], []
    l = t_ = None
    for x in xs:
        if l is None:
            l, t_ = x, 0.0
        else:
            lnew = a * x + (1 - a) * (l + t_)
            t_ = b * (lnew - l) + (1 - b) * t_
            l = lnew
        levels.append(l)
        trends.append(t_)

    got = (
        holt_smoothing(
            spark.createDataFrame(pdf), ts_col="t", value_col="x",
            alpha=a, beta=b, horizon=3, lookback=200,
        )
        .orderBy("t")
        .toPandas()
    )
    np.testing.assert_allclose(got["holt_level"], levels, rtol=1e-12)
    np.testing.assert_allclose(got["holt_trend"], trends, rtol=1e-12)
    np.testing.assert_allclose(
        got["holt_forecast"], np.array(levels) + 3 * np.array(trends), rtol=1e-12
    )
    # trend on a clean linear series converges to the slope
    assert abs(got["holt_trend"].iloc[-1] - 0.7) < 1.0


def test_holt_truncated_lookback_converges(spark):
    """A 64-row lookback agrees with the full recursion to ~1e-6 on a
    200-row series (geometric seed decay)."""
    import numpy as np
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import holt_smoothing

    n = 200
    pdf = pd.DataFrame({"t": range(n), "x": [50 + 0.3 * i for i in range(n)]})
    df = spark.createDataFrame(pdf)
    full = (
        holt_smoothing(df, ts_col="t", value_col="x", alpha=0.4, beta=0.2, lookback=400)
        .orderBy("t").toPandas()
    )
    trunc = (
        holt_smoothing(df, ts_col="t", value_col="x", alpha=0.4, beta=0.2, lookback=64)
        .orderBy("t").toPandas()
    )
    np.testing.assert_allclose(
        trunc["holt_level"].iloc[100:], full["holt_level"].iloc[100:], rtol=1e-6
    )


def test_cross_corr_lead_lag(spark):
    """y leads x by 2: xcorr peaks at lag 2, near zero elsewhere; lag 0
    equals numpy's plain correlation."""
    import numpy as np
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import cross_corr

    rng = np.random.default_rng(23)
    n = 300
    y = rng.normal(0, 1, n)
    x = np.roll(y, 2) + rng.normal(0, 0.05, n)  # x_t ~ y_{t-2}
    x[:2] = rng.normal(0, 1, 2)
    pdf = pd.DataFrame({"t": range(n), "x": x, "y": y})
    got = {
        r.lag: (r.xcorr, r.n_pairs)
        for r in cross_corr(
            spark.createDataFrame(pdf), ts_col="t", x_col="x", y_col="y", lags=[0, 1, 2]
        ).collect()
    }
    assert got[2][0] > 0.99 and got[2][1] == n - 2
    assert abs(got[1][0]) < 0.2 and abs(got[0][0]) < 0.2
    expect0 = float(np.corrcoef(x, y)[0, 1])
    assert abs(got[0][0] - round(expect0, 6)) < 1e-6


def test_rolling_quantile_matches_pandas(spark):
    """Trailing-hour median per group equals a pandas recompute; the
    exclude-current variant shifts the frame."""
    import numpy as np
    import pandas as pd

    from aws_sdk_pandas_spark.operators.timeseries import rolling_quantile

    rng = np.random.default_rng(9)
    rows = []
    for g in ("a", "b"):
        t = 0.0
        for _ in range(120):
            t += float(rng.integers(60, 600))
            rows.append((g, t, round(float(rng.normal(10, 3)), 3)))
    pdf = pd.DataFrame(rows, columns=["g", "t", "x"])
    df = spark.createDataFrame(pdf)
    got = (
        rolling_quantile(df, ts_col="t", value_col="x", by=["g"], window_seconds=3600)
        .orderBy("g", "t")
        .toPandas()
    )
    for _, r in got.iterrows():
        sub = pdf[(pdf["g"] == r["g"]) & (pdf["t"] >= r["t"] - 3600) & (pdf["t"] <= r["t"])]
        assert abs(r["rq_0_5"] - round(float(np.quantile(sub["x"], 0.5)), 6)) < 1e-9
    ex = (
        rolling_quantile(
            df, ts_col="t", value_col="x", by=["g"], window_seconds=3600,
            include_current=False, out_col="m",
        )
        .orderBy("g", "t")
        .toPandas()
    )
    first = ex.groupby("g").head(1)
    assert first["m"].isna().all()  # no trailing rows yet


def test_ewma_and_holt_skip_null_observations(spark):
    """A NULL mid-series carries state over instead of poisoning every
    later row in its lookback."""
    from aws_sdk_pandas_spark.operators.timeseries import ewma, holt_smoothing

    rows = [(1, 10.0), (2, None), (3, 20.0)]
    df = spark.createDataFrame(rows, "t int, x double")
    e = {r.t: r.ewma for r in ewma(df, ts_col="t", value_col="x", alpha=0.5).collect()}
    assert e[1] == 10.0
    assert e[2] == 10.0  # state carried
    assert e[3] == 15.0  # 0.5*10 + 0.5*20
    h = {
        r.t: (r.holt_level, r.holt_trend)
        for r in holt_smoothing(
            df, ts_col="t", value_col="x", alpha=0.5, beta=0.5
        ).collect()
    }
    assert h[1] == (10.0, 0.0)
    assert h[2] == (10.0, 0.0)
    lnew = 0.5 * 20 + 0.5 * 10
    assert h[3] == (lnew, 0.5 * (lnew - 10.0))


def test_time_weighted_avg_vs_plain_avg(spark):
    """A gauge at 10 for 9s then 100 for 1s: TWA ~ 10 + 90/10, while a
    plain mean of samples would over-weight the chatty spike; single
    observation returns itself."""
    from aws_sdk_pandas_spark.operators.timeseries import time_weighted_avg

    rows = [
        ("a", 0.0, 10.0),
        ("a", 9.0, 100.0),   # held 1s
        ("a", 10.0, 100.0),  # last: no weight
        ("b", 5.0, 7.0),     # singleton
    ]
    df = spark.createDataFrame(rows, "g string, t double, x double")
    got = {r.g: r for r in time_weighted_avg(df, ts_col="t", value_col="x", by=["g"]).collect()}
    # (10*9 + 100*1) / 10 = 19
    assert got["a"].twa == 19.0 and got["a"].span_seconds == 10.0
    assert got["b"].twa == 7.0 and got["b"].n_obs == 1


def test_resample_ohlc_first_last_semantics(spark):
    from datetime import datetime

    from aws_sdk_pandas_spark.operators.timeseries import resample_ohlc

    base = datetime(2026, 1, 1, 10)
    rows = [
        ("a", base.replace(minute=5), 1, 10.0),   # open
        ("a", base.replace(minute=20), 2, 50.0),  # high
        ("a", base.replace(minute=40), 3, 5.0),   # low
        ("a", base.replace(minute=55), 4, 30.0),  # close
        ("a", base.replace(hour=11, minute=1), 5, 99.0),  # next bucket
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, eid int, x double")
    got = {
        (r.g, r.bucket.hour): (r.open, r.high, r.low, r.close, r.n_obs)
        for r in resample_ohlc(
            df, by=["g"], step="1 hour", value_col="x", tie_breakers=["eid"]
        ).collect()
    }
    assert got[("a", 10)] == (10.0, 50.0, 5.0, 30.0, 4)
    assert got[("a", 11)] == (99.0, 99.0, 99.0, 99.0, 1)
    # same-timestamp ties break on the tie_breaker deterministically
    tie = spark.createDataFrame(
        [("g", base, 2, 8.0), ("g", base, 1, 3.0)], "g string, ts timestamp, eid int, x double"
    )
    r = resample_ohlc(tie, by=["g"], step="1 hour", value_col="x", tie_breakers=["eid"]).collect()[0]
    assert (r.open, r.close) == (3.0, 8.0)


def test_rate_of_change_and_counter_resets(spark):
    from aws_sdk_pandas_spark.operators.timeseries import rate_of_change

    rows = [
        ("a", 0.0, 100.0),
        ("a", 10.0, 150.0),   # +5/s
        ("a", 20.0, 30.0),    # counter reset
        ("a", 20.0, 31.0),    # same t (with tie id): dt=0 -> NULL
        ("b", 0.0, 1.0),
    ]
    df = spark.createDataFrame(
        [(g, t, v, i) for i, (g, t, v) in enumerate(rows)],
        "g string, t double, x double, i int",
    )
    got = {
        r.i: r.rate
        for r in rate_of_change(
            df, ts_col="t", value_col="x", by=["g"], tie_breakers=["i"]
        ).collect()
    }
    assert got[0] is None and got[4] is None          # first rows
    assert got[1] == 5.0
    assert got[2] == -12.0                            # raw derivative
    assert got[3] is None                             # dt == 0
    mono = {
        r.i: r.rate
        for r in rate_of_change(
            df, ts_col="t", value_col="x", by=["g"], tie_breakers=["i"],
            monotonic=True,
        ).collect()
    }
    assert mono[1] == 5.0 and mono[2] is None         # reset suppressed


def _serial_hw(xs, m, a, bcoef, g, h=0):
    """Serial Holt-Winters additive recursion mirroring holt_winters'
    init: first season -> level=mean, trend=0, s=x-mean."""
    l = b = None
    s = []
    cnt = 0
    out = []
    for x in xs:
        if cnt < m - 1:
            s.append(x)
            cnt += 1
            out.append((None, None, None, None))
            continue
        if cnt == m - 1:
            s.append(x)
            l = sum(s) / m
            b = 0.0
            s = [v - l for v in s]
            cnt += 1
        else:
            idx = cnt % m
            lnew = a * (x - s[idx]) + (1 - a) * (l + b)
            b = bcoef * (lnew - l) + (1 - bcoef) * b
            s[idx] = g * (x - lnew) + (1 - g) * s[idx]
            l = lnew
            cnt += 1
        cur = s[(cnt - 1) % m]
        fc = (l + h * b + s[(cnt - 1 + h) % m]) if h else None
        out.append((l, b, cur, fc))
    return out


def test_holt_winters_matches_serial(spark):
    import math

    import numpy as np

    from aws_sdk_pandas_spark.operators.timeseries import holt_winters

    rng = np.random.default_rng(71)
    m = 7
    n = 120
    xs = [
        50 + 0.3 * t + 10 * math.sin(2 * math.pi * (t % m) / m)
        + float(rng.normal(0, 0.5))
        for t in range(n)
    ]
    rows = [("g", t, float(x)) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    got = {
        r.t: r
        for r in holt_winters(
            df, ts_col="t", value_col="x", period=m, by=["g"],
            alpha=0.4, beta=0.1, gamma=0.3, horizon=m,
        ).collect()
    }
    want = _serial_hw(xs, m, 0.4, 0.1, 0.3, h=m)
    for t in range(n):
        wl, wb, ws, wf = want[t]
        r = got[t]
        if wl is None:
            assert r.hw_level is None and r.hw_seasonal is None
        else:
            assert abs(r.hw_level - wl) < 1e-9
            assert abs(r.hw_trend - wb) < 1e-9
            assert abs(r.hw_seasonal - ws) < 1e-9
            assert abs(r.hw_forecast - wf) < 1e-9

    # the m-step forecast from t tracks the actual x at t+m (seasonality
    # captured); a seasonal-blind forecast (level+trend only) does worse
    errs_hw, errs_flat = [], []
    for t in range(3 * m, n - m):
        actual = xs[t + m]
        errs_hw.append(abs(got[t].hw_forecast - actual))
        errs_flat.append(abs(got[t].hw_level + m * got[t].hw_trend - actual))
    assert np.mean(errs_hw) < 0.5 * np.mean(errs_flat)


def test_holt_winters_null_hold_and_validation(spark):
    import pytest

    from aws_sdk_pandas_spark.operators.timeseries import holt_winters

    xs = [10.0, 20.0, 10.0, 20.0, 10.0, None, 20.0]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs)], "g string, t int, x double"
    )
    got = {r.t: r for r in holt_winters(
        df, ts_col="t", value_col="x", period=2, by=["g"]).collect()}
    # NULL row holds the previous state verbatim
    assert got[5].hw_level == got[4].hw_level
    assert got[5].hw_seasonal == got[4].hw_seasonal
    # phase advances only on observed rows: row 6 continues the recursion
    want = _serial_hw([x for x in xs if x is not None], 2, 0.3, 0.1, 0.1)
    assert abs(got[6].hw_level - want[-1][0]) < 1e-9

    with pytest.raises(ValueError, match="period"):
        holt_winters(df, ts_col="t", value_col="x", period=1)
    with pytest.raises(ValueError, match="alpha"):
        holt_winters(df, ts_col="t", value_col="x", period=2, alpha=1.5)


def test_p_chart_limits_and_flags(spark):
    import math

    import numpy as np

    from aws_sdk_pandas_spark.operators.timeseries import p_chart

    rng = np.random.default_rng(97)
    rows = []
    # 20 in-control days at p=0.05, one shifted day at p=0.4, one tiny day
    for day in range(20):
        for _ in range(400):
            rows.append((f"d{day:02d}", int(rng.random() < 0.05)))
    for _ in range(400):
        rows.append(("d20", int(rng.random() < 0.4)))
    # tiny day at ~3x the base rate: at n=400 that would flag, but the
    # binomial limits WIDEN as 1/sqrt(n) and must absorb it at n=20
    rows += [("d21", 1)] * 3 + [("d21", 0)] * 17
    rows.append(("dnull", None))
    df = spark.createDataFrame(rows, "period string, fail int")
    got = {r.period: r for r in p_chart(
        df, time_col="period", flag_col="fail").collect()}

    flags = [p for p, r in got.items() if r.out_of_control]
    assert "d20" in flags
    assert "d21" not in flags            # wide limits protect small n
    assert len(flags) <= 3               # in-control days mostly quiet

    # arithmetic vs serial recompute
    all_flags = [f for _, f in rows if f is not None]
    pbar = sum(all_flags) / len(all_flags)
    r = got["d20"]
    assert r.n == 400
    assert abs(r.p_bar - round(pbar, 6)) < 1e-9
    half = 3.0 * math.sqrt(pbar * (1 - pbar) / 400)
    assert abs(r.ucl - round(min(pbar + half, 1.0), 6)) < 1e-9
    assert abs(r.lcl - round(max(pbar - half, 0.0), 6)) < 1e-9
    assert "dnull" not in got


def test_forecast_accuracy_matches_numpy(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.timeseries import forecast_accuracy

    rng = np.random.default_rng(103)
    rows = []
    series = {}
    for g, scale in (("small", 1.0), ("big", 1000.0)):
        # trend + weekly cycle: the seasonal-naive benchmark misses the
        # trend (its error ~= 7*slope), so a decent forecast wins
        t = np.arange(40)
        y = scale * (10 + 0.5 * t + np.sin(t * 2 * np.pi / 7)) + rng.normal(
            0, 0.1 * scale, 40
        )
        f = y + rng.normal(0, 0.2 * scale, 40)    # decent forecast
        series[g] = (y, f)
        rows += [(g, int(t), float(a), float(b)) for t, (a, b) in enumerate(zip(y, f))]
    df = spark.createDataFrame(rows, "g string, t int, y double, f double")
    got = {r.g: r for r in forecast_accuracy(
        df, actual_col="y", forecast_col="f", by=["g"], ts_col="t", season=7
    ).collect()}

    for g, (y, f) in series.items():
        e = y - f
        mae = np.abs(e).mean()
        rmse = np.sqrt((e**2).mean())
        sm = (2 * np.abs(e) / (np.abs(y) + np.abs(f))).mean()
        naive = np.abs(y[7:] - y[:-7]).mean()
        r = got[g]
        assert abs(r.mae - round(float(mae), 6)) < 1e-9
        assert abs(r.rmse - round(float(rmse), 6)) < 1e-9
        assert abs(r.smape - round(float(sm), 6)) < 1e-9
        assert abs(r.mase - round(float(mae / naive), 6)) < 1e-9
    # MASE is scale-free: both series land in the same ballpark even
    # though raw MAE differs 1000x
    assert abs(got["small"].mase - got["big"].mase) < 0.15
    assert got["big"].mae > 100 * got["small"].mae
    # good forecast beats seasonal naive
    assert got["small"].mase < 1.0


def test_burst_detect_and_burstiness(spark):
    from datetime import datetime, timedelta

    import numpy as np

    from aws_sdk_pandas_spark.operators.timeseries import burst_detect, burstiness

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # metronome: every 10s exactly (B -> -1), no burst
    for i in range(30):
        rows.append(("steady", t0 + timedelta(seconds=10 * i)))
    # bursty bot: 20 events in 5s, then silence, then 20 more
    for i in range(20):
        rows.append(("bot", t0 + timedelta(seconds=0.25 * i)))
    for i in range(20):
        rows.append(("bot", t0 + timedelta(seconds=600 + 0.25 * i)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")

    bd = {r.k: r for r in burst_detect(
        df, ts_col="ts", by=["k"], window="60 seconds", threshold=15).collect()}
    assert bd["steady"].max_in_window == 7      # 60s window at 10s cadence
    assert not bd["steady"].burst
    assert bd["bot"].max_in_window == 20 and bd["bot"].burst
    # earliest peak: the 20th event of the first volley (index 19)
    assert bd["bot"].peak_ts == t0 + timedelta(seconds=0.25 * 19)

    bs = {r.k: r for r in burstiness(df, ts_col="ts", by=["k"]).collect()}
    assert bs["steady"].burstiness == -1.0      # sigma=0 exactly
    # serial recompute for the bot
    gaps = [0.25] * 19 + [600 - 0.25 * 19] + [0.25] * 19
    mu, sigma = float(np.mean(gaps)), float(np.std(gaps))
    assert abs(bs["bot"].burstiness - round((sigma - mu) / (sigma + mu), 6)) < 1e-9
    assert bs["bot"].burstiness > 0.5           # strongly bursty signature
    assert bs["bot"].n_gaps == 39


def test_rolling_corr(spark):
    from datetime import datetime, timedelta

    import numpy as np

    from aws_sdk_pandas_spark.operators.timeseries import rolling_corr

    t0 = datetime(2024, 1, 1)
    rng = np.random.default_rng(113)
    xs = rng.normal(10, 2, 40)
    # first half: y tracks x tightly; second half: decoupled
    ys = np.where(
        np.arange(40) < 20, 2 * xs + rng.normal(0, 0.1, 40), rng.normal(0, 2, 40)
    )
    rows = [("g", t0 + timedelta(seconds=30 * i), float(a), float(b))
            for i, (a, b) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, "g string, ts timestamp, x double, y double")
    got = rolling_corr(
        df, ts_col="ts", x_col="x", y_col="y", by=["g"],
        window_seconds=300, min_points=5,
    ).orderBy("ts").collect()

    # serial recompute at a coupled and a decoupled point
    for idx in (15, 39):
        lo = max(0, idx - 10)  # 300s window at 30s cadence = 11 points
        xx, yy = xs[lo:idx + 1], ys[lo:idx + 1]
        want = float(np.corrcoef(xx, yy)[0, 1])
        assert abs(got[idx].rolling_corr - round(want, 6)) < 1e-6, idx
    assert got[15].rolling_corr > 0.99     # coupled regime
    assert abs(got[39].rolling_corr) < 0.8 # decoupled regime
    assert got[0].rolling_corr is None     # < min_points


def test_rolling_corr_epoch_scale_no_cancellation(spark):
    """Regression: the one-pass co-moment form lost ~12 digits on
    epoch-scale magnitudes and reported decoupling on perfectly
    coupled series; centering must keep corr ~1."""
    from datetime import datetime, timedelta

    import numpy as np

    from aws_sdk_pandas_spark.operators.timeseries import rolling_corr

    t0 = datetime(2024, 1, 1)
    rng = np.random.default_rng(127)
    xs = 1.7e9 + rng.uniform(0, 60, 30)          # epoch-scale, tiny spread
    ys = 2 * xs + rng.normal(0, 1e-3, 30)        # near-perfectly coupled
    rows = [("g", t0 + timedelta(seconds=10 * i), float(a), float(b))
            for i, (a, b) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, "g string, ts timestamp, x double, y double")
    got = rolling_corr(
        df, ts_col="ts", x_col="x", y_col="y", by=["g"],
        window_seconds=200, min_points=5,
    ).orderBy("ts").collect()
    assert all(r.rolling_corr > 0.999 for r in got[5:])
