"""Interval (range) join — point-in-interval matching at scale.

Spark plans a raw ``p.ts BETWEEN i.start AND i.end`` join as a
BroadcastNestedLoopJoin (fine only while the interval side broadcasts) or
a cartesian product.  This operator rewrites the range predicate as an
equi-join on coarse time buckets: points land in exactly one bucket,
intervals explode to every bucket they overlap, the join runs on
``(by..., bucket)`` through the ordinary hash-shuffle machinery, and the
exact containment predicate filters afterwards.  Both sides scale
linearly; bucket width trades explode-factor against bucket selectivity
(pick it near the typical interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _parse_duration_seconds(width: str | float | int) -> float:
    if isinstance(width, (int, float)):
        return float(width)
    parts = width.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"bucket_width must be '<n> <unit>' or seconds, got {width!r}")
    n = float(parts[0])
    unit = parts[1].rstrip("s")
    scale = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    if unit not in scale:
        raise ValueError(f"unknown unit {parts[1]!r}")
    return n * scale[unit]


def _seconds(df: DataFrame, colname: str) -> F.Column:
    """Numeric seconds for bucketing: timestamps (incl. TIMESTAMP_NTZ,
    which Spark 4 refuses to cast straight to DOUBLE) go through exact
    epoch microseconds; numeric columns cast directly."""
    dtype = dict(df.dtypes).get(colname, "")
    if dtype.startswith("timestamp") or dtype == "date":
        return F.unix_micros(F.col(colname).cast("timestamp_ltz")) / F.lit(1_000_000.0)
    return F.col(colname).cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: str | float = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= point <= end``), optionally also matching ``by`` keys.

    ``how='inner'`` keeps matched pairs; ``'left'`` keeps pointless
    points with null interval columns.  Columns of both inputs are
    preserved (interval columns colliding with point columns get an
    ``_ivl`` suffix).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by or [])
    width = _parse_duration_seconds(bucket_width)

    ivl_names = {
        c: (c + "_ivl" if c in points.columns else c)
        for c in intervals.columns
        if c not in by
    }

    p_sec = _seconds(points, point_col)
    pts = points.withColumn("__bucket", F.floor(p_sec / width))

    s_sec = _seconds(intervals, start_col)
    e_sec = _seconds(intervals, end_col)
    ivl = (
        intervals.select(
            *[F.col(c) for c in by],
            F.struct(
                *[F.col(c).alias(ivl_names[c]) for c in ivl_names]
            ).alias("__ivl"),
            F.explode(
                F.sequence(F.floor(s_sec / width), F.floor(e_sec / width))
            ).alias("__bucket"),
        )
    )

    joined = pts.join(ivl, by + ["__bucket"], "left" if how == "left" else "inner")
    contained = (
        F.col("__ivl").isNotNull()
        & (F.col(point_col) >= F.col(f"__ivl.{ivl_names[start_col]}"))
        & (F.col(point_col) <= F.col(f"__ivl.{ivl_names[end_col]}"))
    )
    if how == "inner":
        out = joined.where(contained)
    else:
        # left join: keep the point row; null out non-containing matches,
        # then collapse duplicate unmatched rows born from bucket overlap
        out = joined.withColumn(
            "__ivl", F.when(contained, F.col("__ivl"))
        ).dropDuplicates(points.columns + ["__ivl"])
        # a point with >=1 real match must not also keep its null row
        w_cols = [F.col(c) for c in points.columns]
        matched_ids = (
            out.where(F.col("__ivl").isNotNull())
            .select(*w_cols)
            .dropDuplicates()
            .withColumn("__has_match", F.lit(True))
        )
        out = out.join(matched_ids, points.columns, "left").where(
            F.col("__ivl").isNotNull() | F.col("__has_match").isNull()
        ).drop("__has_match")

    return out.select(
        *[F.col(c) for c in points.columns],
        *[F.col(f"__ivl.{ivl_names[c]}").alias(ivl_names[c]) for c in ivl_names],
    )
