"""Behavioral analytics: Kaplan–Meier vs a serial recompute (censoring
semantics), Markov transitions vs brute force, RFM vs serial ranks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.behavior import (
    event_transitions,
    rfm_segments,
    survival_curve,
)


def _km(pairs):
    """Serial Kaplan–Meier over (duration, observed) pairs."""
    from collections import Counter

    d = Counter(t for t, e in pairs if e)
    c = Counter(t for t, e in pairs if not e)
    times = sorted(set(d) | set(c))
    total, seen, s, out = len(pairs), 0, 1.0, {}
    for t in times:
        at_risk = total - seen
        if d[t]:
            s *= 1 - d[t] / at_risk
        out[t] = (at_risk, d[t], c[t], s)
        seen += d[t] + c[t]
    return out


def test_survival_curve_matches_serial_km(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    # mixed observed/censored, heavy ties (integer days)
    pairs = [
        (int(rng.integers(1, 30)), int(rng.random() < 0.7)) for _ in range(400)
    ]
    df = spark.createDataFrame(
        [("g",) + p for p in pairs], "g string, dur int, ev int"
    )
    got = {
        r.t: r
        for r in survival_curve(
            df, duration_col="dur", event_col="ev", by=["g"]
        ).collect()
    }
    want = _km(pairs)
    assert set(got) == set(want)
    for t, (n_risk, n_ev, n_cen, s) in want.items():
        r = got[t]
        assert (r.n_risk, r.n_events, r.n_censored) == (n_risk, n_ev, n_cen)
        assert abs(r.survival - round(s, 6)) < 1e-9

    # censoring matters: ignoring it would call everyone at t=29 churned
    last = max(want)
    assert got[last].survival > 0 or want[last][3] == 0


def test_survival_curve_zero_tail_and_nulls(spark):
    # everyone dies at t=3 -> survival exactly 0 from there on (the
    # exp(sum(ln)) guard), NULL rows excluded
    rows = [("a", 1, 1), ("a", 2, 0), ("a", 3, 1), ("a", 3, 1), ("a", None, 1), ("a", 2, None)]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    got = {r.t: r for r in survival_curve(df, duration_col="dur", event_col="ev").collect()}
    assert set(got) == {1, 2, 3}
    assert abs(got[1].survival - round(1 - 1 / 4, 6)) < 1e-9
    assert got[2].n_censored == 1 and got[2].survival == got[1].survival
    assert got[3].n_risk == 2 and got[3].survival == 0.0


def test_event_transitions_brute_force(spark):
    from collections import Counter

    rows = []
    seqs = {
        "u1": ["view", "click", "view", "purchase"],
        "u2": ["view", "view", "error", "view"],
        "u3": ["click"],                     # terminal-only: no pairs
    }
    for u, states in seqs.items():
        for i, st in enumerate(states):
            rows.append((u, i, st))
    df = spark.createDataFrame(rows, "user string, seq int, state string")
    got = {
        (r.src, r.dst): r
        for r in event_transitions(
            df, key_col="user", state_col="state", order_by=["seq"]
        ).collect()
    }
    pairs = Counter()
    for states in seqs.values():
        for a, b in zip(states, states[1:]):
            pairs[(a, b)] += 1
    assert set(got) == set(pairs)
    src_tot = Counter()
    for (a, _), n in pairs.items():
        src_tot[a] += n
    for (a, b), n in pairs.items():
        assert got[(a, b)].n == n
        assert abs(got[(a, b)].p - round(n / src_tot[a], 6)) < 1e-9


def test_rfm_segments_match_serial_ranks(spark):
    import numpy as np

    rng = np.random.default_rng(12)
    base = dt.date(2024, 1, 1)
    rows = []
    for cust in range(40):
        for _ in range(int(rng.integers(1, 12))):
            rows.append(
                (
                    f"c{cust:02d}",
                    base + dt.timedelta(days=int(rng.integers(0, 200))),
                    float(np.round(rng.uniform(5, 500), 2)),
                )
            )
    df = spark.createDataFrame(rows, "cust string, d date, amt double")
    got = {r.cust: r for r in rfm_segments(
        df, key_col="cust", ts_col="d", amount_col="amt", num_partitions=4
    ).collect()}

    # serial recompute
    ref = max(d for _, d, _ in rows)
    per = {}
    for c, d, a in rows:
        r = per.setdefault(c, [10**9, 0, 0.0])
        r[0] = min(r[0], (ref - d).days)
        r[1] += 1
        r[2] += a
    n = len(per)

    def scores(metric_idx, good_asc):
        order = sorted(
            per.items(),
            key=lambda kv: (
                (-kv[1][metric_idx]) if not good_asc else kv[1][metric_idx],
                kv[0],
            ),
        )
        return {c: (rank * 5) // n + 1 for rank, (c, _) in enumerate(order)}

    rs, fs, ms = scores(0, False), scores(1, True), scores(2, True)
    for c, vals in per.items():
        r = got[c]
        assert (r.recency, r.frequency) == (vals[0], vals[1])
        assert abs(r.monetary - vals[2]) < 1e-6
        assert (r.r_score, r.f_score, r.m_score) == (rs[c], fs[c], ms[c])
        assert r.segment == f"{rs[c]}{fs[c]}{ms[c]}"
    # directionality: the most stale customer must hold r_score 1
    stalest = max(per, key=lambda c: (per[c][0], c))
    assert got[stalest].r_score == 1


def test_top_paths(spark):
    from aws_sdk_pandas_spark.operators.behavior import top_paths

    seqs = {
        "u1": ["view", "click", "purchase"],
        "u2": ["view", "click", "purchase"],
        "u3": ["view", "view"],
        "u4": ["view", "click", "purchase", "view", "view", "view", "error"],
        "u5": ["error"],
    }
    rows = [
        (u, i, s) for u, states in seqs.items() for i, s in enumerate(states)
    ]
    rows.append((None, 0, "view"))
    df = spark.createDataFrame(rows, "user string, seq int, state string")
    got = top_paths(
        df, key_col="user", state_col="state", order_by=["seq"],
        max_len=5, top_k=10,
    ).collect()
    paths = {r.path: r for r in got}
    # u4's path truncates at 5 steps
    assert paths["view>click>purchase"].n_keys == 2
    assert "view>click>purchase>view>view" in paths
    assert paths["view>view"].n_keys == 1
    assert paths["error"].n_keys == 1
    assert abs(paths["view>click>purchase"].share - 0.4) < 1e-9  # 2 of 5 users
    # ordering: most-traveled first, ties lexicographic
    counts = [r.n_keys for r in got]
    assert counts == sorted(counts, reverse=True)


def _serial_window_funnel(events, steps, window):
    """ClickHouse-style greedy DP: (ts, state) events, sorted."""
    idx = {s: i for i, s in enumerate(steps)}
    starts = [None] * len(steps)
    for t, s in sorted(events):
        if s not in idx:
            continue
        i = idx[s]
        if i == 0:
            starts[0] = t  # latest start wins
        elif starts[i - 1] is not None and t - starts[i - 1] <= window:
            starts[i] = starts[i - 1]
    level = 0
    for i, v in enumerate(starts):
        if v is not None:
            level = i + 1
    return level


def test_window_funnel_matches_serial(spark):
    import numpy as np

    from aws_sdk_pandas_spark.operators.behavior import window_funnel

    steps = ["view", "click", "purchase"]
    rng = np.random.default_rng(83)
    rows, want = [], {}
    for u in range(60):
        evs = []
        for _ in range(int(rng.integers(1, 15))):
            t = float(rng.integers(0, 1000))
            s = ["view", "click", "purchase", "error"][int(rng.integers(0, 4))]
            evs.append((t, s))
        # dedupe times so the total order is unambiguous cross-impl
        seen, uniq = set(), []
        for t, s in evs:
            if t not in seen:
                seen.add(t)
                uniq.append((t, s))
        for t, s in uniq:
            rows.append((f"u{u}", t, s))
        want[f"u{u}"] = _serial_window_funnel(uniq, steps, 100.0)

    df = spark.createDataFrame(rows, "user string, ts double, state string")
    got = {
        r.user: r.level
        for r in window_funnel(
            df, key_col="user", ts_col="ts", state_col="state",
            steps=steps, window_seconds=100.0,
        ).collect()
    }
    # users with no step events at all don't appear; they'd be level 0
    for u, lvl in want.items():
        assert got.get(u, 0) == lvl, u
    assert max(want.values()) == 3  # the full chain occurs somewhere

    # hand cases: restart resets the clock; out-of-window step 2 ignored
    hand = [
        ("a", 0.0, "view"), ("a", 50.0, "click"), ("a", 90.0, "purchase"),   # 3
        ("b", 0.0, "view"), ("b", 150.0, "click"),                            # 1
        ("c", 0.0, "view"), ("c", 120.0, "view"), ("c", 160.0, "click"),
        ("c", 219.0, "purchase"),                                             # 3: restart at 120
        ("d", 10.0, "click"), ("d", 20.0, "purchase"),                        # 0: no step 1
    ]
    hdf = spark.createDataFrame(hand, "user string, ts double, state string")
    hg = {r.user: r.level for r in window_funnel(
        hdf, key_col="user", ts_col="ts", state_col="state",
        steps=steps, window_seconds=100.0,
    ).collect()}
    assert hg["a"] == 3 and hg["b"] == 1 and hg["c"] == 3 and hg["d"] == 0


def test_rolling_active_users(spark):
    import datetime as dtm

    from aws_sdk_pandas_spark.operators.behavior import rolling_active_users

    base = dtm.date(2024, 3, 1)
    # u1 active days 0,1; u2 active day 0 only; u3 active day 5
    rows = [
        ("u1", base), ("u1", base), ("u1", base + dtm.timedelta(days=1)),
        ("u2", base),
        ("u3", base + dtm.timedelta(days=5)),
        (None, base), ("u1", None),
    ]
    df = spark.createDataFrame(rows, "user string, d date")
    got = {r.day: r for r in rolling_active_users(
        df, ts_col="d", user_col="user", windows=[1, 3]).collect()}

    # serial recompute: EVERY day in the span must have a row, zeros
    # for dead days (the contract downstream stickiness ratios need)
    active = {("u1", 0), ("u1", 1), ("u2", 0), ("u3", 5)}
    assert set(got) == {base + dtm.timedelta(days=o) for o in range(6)}
    for off in range(6):
        day = base + dtm.timedelta(days=off)
        for w, col in ((1, "active_1d"), (3, "active_3d")):
            want = len({u for u, a in active if off - w + 1 <= a <= off})
            assert getattr(got[day], col) == want, (day, col)
    assert got[base + dtm.timedelta(days=3)].active_1d == 0  # dead day -> 0
    # spot values
    assert got[base].active_1d == 2                      # u1,u2 day0
    assert got[base + dtm.timedelta(days=1)].active_1d == 1
    assert got[base + dtm.timedelta(days=2)].active_3d == 2  # u1,u2 in window
    assert got[base + dtm.timedelta(days=5)].active_3d == 1  # u3


def test_cohort_ltv(spark):
    import datetime as dtm

    from aws_sdk_pandas_spark.operators.behavior import cohort_ltv

    d0 = dtm.date(2024, 1, 1)
    d1 = dtm.date(2024, 1, 2)
    rows = [
        # cohort d0: u1 and u2
        ("u1", d0, 10.0), ("u1", d0, 5.0), ("u1", d1, 20.0),
        ("u2", d0, 1.0), ("u2", dtm.date(2024, 1, 4), 4.0),
        # cohort d1: u3
        ("u3", d1, 7.0),
        (None, d0, 9.0), ("u1", None, 9.0),
    ]
    df = spark.createDataFrame(rows, "user string, d date, amt double")
    got = {(r.cohort, r.day_offset): r for r in cohort_ltv(
        df, key_col="user", ts_col="d", amount_col="amt").collect()}

    r00 = got[(d0, 0)]
    assert r00.n_cohort_users == 2
    assert r00.revenue == 16.0 and r00.cum_revenue == 16.0
    assert abs(r00.cum_ltv_per_user - 8.0) < 1e-9
    r01 = got[(d0, 1)]
    assert r01.revenue == 20.0 and r01.cum_revenue == 36.0
    r03 = got[(d0, 3)]
    assert r03.revenue == 4.0 and r03.cum_revenue == 40.0
    assert abs(r03.cum_ltv_per_user - 20.0) < 1e-9
    r10 = got[(d1, 0)]
    assert r10.n_cohort_users == 1 and r10.cum_ltv_per_user == 7.0
    assert set(got) == {(d0, 0), (d0, 1), (d0, 3), (d1, 0)}


def test_step_latency(spark):
    import datetime as dtm

    from aws_sdk_pandas_spark.operators.behavior import step_latency

    t0 = dtm.datetime(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return t0 + dtm.timedelta(seconds=sec)

    rows = [
        # u1: converts 90s after first signup (purchase BEFORE signup ignored)
        ("u1", at(-50), "purchase"), ("u1", at(0), "signup"),
        ("u1", at(90), "purchase"), ("u1", at(500), "purchase"),
        # u2: signs up twice; latency from the FIRST signup
        ("u2", at(10), "signup"), ("u2", at(100), "signup"),
        ("u2", at(130), "purchase"),
        # u3: never converts
        ("u3", at(5), "signup"),
        # u4: converts but never signed up -> no row
        ("u4", at(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, state string")
    got = {r.user: r for r in step_latency(
        df, key_col="user", ts_col="ts", state_col="state",
        from_state="signup", to_state="purchase",
    ).collect()}
    assert set(got) == {"u1", "u2", "u3"}
    assert got["u1"].latency_seconds == 90.0
    assert got["u2"].latency_seconds == 120.0
    assert got["u3"].to_ts is None and got["u3"].latency_seconds is None
