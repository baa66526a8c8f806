"""asof_join semantics (pandas merge_asof contract) + plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from aws_sdk_pandas_spark.operators.asof import asof_join, asof_join_split


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00"), "L"),
            (2, "u1", _ts("2024-01-01T12:00:00"), "L"),
            (3, "u2", _ts("2024-01-01T09:00:00"), "L"),
        ],
        "id bigint, user string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30:00"), 10.0),
            ("u1", _ts("2024-01-01T11:00:00"), 20.0),
            ("u2", _ts("2024-01-01T11:00:00"), 30.0),
        ],
        "user string, ts timestamp, price double",
    )
    return left, right


def test_backward(spark):
    left, right = _frames(spark)
    got = {
        r.id: r.price
        for r in asof_join(left, right, on="ts", by=["user"]).collect()
    }
    # id=1: 09:30 row; id=2: 11:00 row; id=3 (u2): nothing at-or-before
    assert got == {1: 10.0, 2: 20.0, 3: None}


def test_forward(spark):
    left, right = _frames(spark)
    got = {
        r.id: r.price
        for r in asof_join(
            left, right, on="ts", by=["user"], direction="forward"
        ).collect()
    }
    assert got == {1: 20.0, 2: None, 3: 30.0}


def test_tolerance(spark):
    left, right = _frames(spark)
    got = {
        r.id: r.price
        for r in asof_join(
            left, right, on="ts", by=["user"], tolerance="INTERVAL 45 MINUTES"
        ).collect()
    }
    # id=1 gap 30m ok; id=2 gap 1h exceeds tolerance -> null
    assert got == {1: 10.0, 2: None, 3: None}


def test_equal_timestamp_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00"))], "id bigint, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:00:00"), 5.0)],
        "user string, ts timestamp, price double",
    )
    rows = asof_join(left, right, on="ts", by=["user"]).collect()
    assert rows[0].price == 5.0


def test_no_nested_loop_join(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="ts", by=["user"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # exactly the one window exchange on the by-keys
    assert plan.count("Exchange hashpartitioning") <= 1


def test_column_name_collision_suffix(spark):
    left, right = _frames(spark)
    cols = asof_join(left, right, on="ts", by=["user"]).columns
    assert cols == ["id", "user", "ts", "tag", "ts_right", "price"]


def _split_source(spark):
    """One frame holding both roles, discriminated by ``kind``."""
    return spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00"), "L", None),
            (2, "u1", _ts("2024-01-01T12:00:00"), "L", None),
            (3, "u2", _ts("2024-01-01T09:00:00"), "L", None),
            (4, "u1", _ts("2024-01-01T09:30:00"), "R", 10.0),
            (5, "u1", _ts("2024-01-01T11:00:00"), "R", 20.0),
            (6, "u2", _ts("2024-01-01T11:00:00"), "R", 30.0),
            (7, "u2", _ts("2024-01-01T11:30:00"), "X", 99.0),  # neither role
        ],
        "id bigint, user string, ts timestamp, kind string, price double",
    )


def test_split_matches_two_frame_form(spark):
    """asof_join_split == asof_join(events.where(lp), events.where(rp)
    .select(right_cols)) for every direction/tolerance combination."""
    ev = _split_source(spark)
    lp = F.col("kind") == "L"
    rp = F.col("kind") == "R"
    right_cols = ["user", "ts", "price"]
    for kw in (
        {},
        {"direction": "forward"},
        {"tolerance": "INTERVAL 45 MINUTES"},
        {"direction": "forward", "tolerance": "INTERVAL 45 MINUTES"},
    ):
        two = asof_join(
            ev.where(lp), ev.where(rp).select(*right_cols), on="ts", by=["user"], **kw
        )
        one = asof_join_split(
            ev, on="ts", left_pred=lp, right_pred=rp, right_cols=right_cols,
            by=["user"], **kw
        )
        assert one.columns == two.columns
        key = lambda r: tuple(str(v) for v in r)
        assert sorted(map(key, one.collect())) == sorted(map(key, two.collect())), kw


def test_split_single_scan(spark, tmp_path):
    """The point of the split form: ONE scan of the source feeds both
    roles (the two-frame form plans two)."""
    ev = _split_source(spark)
    path = str(tmp_path / "ev.parquet")
    ev.write.mode("overwrite").parquet(path)
    src = spark.read.parquet(path)
    out = asof_join_split(
        src,
        on="ts",
        left_pred=F.col("kind") == "L",
        right_pred=F.col("kind") == "R",
        right_cols=["user", "ts", "price"],
        by=["user"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_attribute_conversions_models(spark):
    from datetime import datetime, timedelta

    from aws_sdk_pandas_spark.operators.asof import attribute_conversions

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two touches then a purchase; one stale touch outside window
        (1, 1, "click", t0 - timedelta(hours=30)),
        (2, 1, "click", t0 - timedelta(hours=2)),
        (3, 1, "click", t0 - timedelta(hours=1)),
        (4, 1, "purchase", t0),
        # user 2: purchase with no touches -> absent
        (5, 2, "purchase", t0),
        # user 3: touch AFTER the purchase -> absent
        (6, 3, "click", t0 + timedelta(hours=1)),
        (7, 3, "purchase", t0),
    ]
    df = spark.createDataFrame(rows, "event_id int, user_id int, event_type string, ts timestamp")

    lin = attribute_conversions(df, lookback="24 hours", model="linear").collect()
    got = {(r.conversion_id, r.touch_id): r.weight for r in lin}
    assert got == {(4, 2): 0.5, (4, 3): 0.5}  # stale touch excluded, weights sum to 1

    last = attribute_conversions(df, lookback="24 hours", model="last").collect()
    assert [(r.conversion_id, r.touch_id, r.weight) for r in last] == [(4, 3, 1.0)]

    first = attribute_conversions(df, lookback="24 hours", model="first").collect()
    assert [(r.conversion_id, r.touch_id, r.weight) for r in first] == [(4, 2, 1.0)]
