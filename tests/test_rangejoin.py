"""interval_join semantics + plan shape (no nested-loop join)."""

from __future__ import annotations

from datetime import datetime

from aws_sdk_pandas_spark.operators.rangejoin import interval_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:15:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T10:15:00")),
        ],
        "id bigint, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", "w1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:30:00")),
            ("u1", "w2", _ts("2024-01-01T10:10:00"), _ts("2024-01-01T10:20:00")),
            ("u2", "w3", _ts("2024-01-01T11:00:00"), _ts("2024-01-01T11:30:00")),
        ],
        "user string, name string, lo timestamp, hi timestamp",
    )
    return points, intervals


def test_inner(spark):
    points, intervals = _frames(spark)
    got = {
        (r.id, r.name)
        for r in interval_join(
            points, intervals, point_col="ts", start_col="lo", end_col="hi",
            by=["user"], bucket_width="15 minutes",
        ).collect()
    }
    # point 1 in both u1 windows; 2 and 3 in none
    assert got == {(1, "w1"), (1, "w2")}


def test_left_keeps_unmatched(spark):
    points, intervals = _frames(spark)
    rows = interval_join(
        points, intervals, point_col="ts", start_col="lo", end_col="hi",
        by=["user"], bucket_width="15 minutes", how="left",
    ).collect()
    by_id: dict[int, set] = {}
    for r in rows:
        by_id.setdefault(r.id, set()).add(r.name)
    assert by_id[1] == {"w1", "w2"}
    assert by_id[2] == {None}
    assert by_id[3] == {None}


def test_boundary_inclusive(spark):
    points, intervals = _frames(spark)
    edge = spark.createDataFrame(
        [(9, "u1", _ts("2024-01-01T10:30:00"))], "id bigint, user string, ts timestamp"
    )
    got = {
        (r.id, r.name)
        for r in interval_join(
            edge, intervals, point_col="ts", start_col="lo", end_col="hi",
            by=["user"], bucket_width="1 hour",
        ).collect()
    }
    assert got == {(9, "w1")}  # hi bound inclusive


def test_no_nested_loop(spark):
    points, intervals = _frames(spark)
    plan = (
        interval_join(
            points, intervals, point_col="ts", start_col="lo", end_col="hi",
            by=["user"], bucket_width="15 minutes",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
