"""Pareto-front operator vs an O(n²) brute-force dominance check."""

from __future__ import annotations

import numpy as np
import pytest


def _brute_front(points, n_max):
    """Indices of non-dominated points; first n_max coords maximize,
    the rest minimize."""
    arr = np.array(points, dtype=float)
    arr[:, n_max:] = -arr[:, n_max:]
    keep = []
    for i in range(len(arr)):
        dominated = any(
            (arr[j] >= arr[i]).all() and (arr[j] > arr[i]).any()
            for j in range(len(arr))
            if j != i
        )
        if not dominated:
            keep.append(i)
    return set(keep)


def test_pareto_front_matches_brute_force(spark):
    from aws_sdk_pandas_spark.operators.skyline import pareto_front

    rng = np.random.default_rng(79)
    pts = [
        (int(i), float(a), float(b), float(c))
        for i, (a, b, c) in enumerate(
            zip(
                np.round(rng.uniform(0, 10, 400), 1),   # ties on purpose
                np.round(rng.uniform(0, 10, 400), 1),
                np.round(rng.uniform(0, 10, 400), 1),
            )
        )
    ]
    pts.append((400, None, 1.0, 1.0))   # NULL criterion excluded
    df = spark.createDataFrame(
        pts, "id int, q double, nov double, cost double"
    ).repartition(8)
    got = {
        r.id
        for r in pareto_front(
            df, maximize=["q", "nov"], minimize=["cost"]
        ).collect()
    }
    want = _brute_front([(p[1], p[2], p[3]) for p in pts[:400]], n_max=2)
    assert got == want
    assert 400 not in got

    # duplicates of a front point all survive
    dup = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 5.0, 5.0), (3, 1.0, 1.0)], "id int, a double, b double"
    )
    got2 = {r.id for r in pareto_front(dup, maximize=["a", "b"]).collect()}
    assert got2 == {1, 2}

    # 2-criteria staircase sanity: the front of (x, -x) is everything
    stair = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(50)], "id int, a double, b double"
    ).repartition(6)
    assert pareto_front(stair, maximize=["a", "b"]).count() == 50

    with pytest.raises(ValueError, match="max_candidates"):
        pareto_front(stair, maximize=["a", "b"], max_candidates=10)
    with pytest.raises(ValueError, match="criterion"):
        pareto_front(stair)
