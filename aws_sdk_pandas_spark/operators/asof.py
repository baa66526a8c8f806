"""As-of (nearest-event) join — a training-pipeline/time-series operator
Spark lacks natively, expressed as a composition of built-in ops.

Semantics follow the public ``pandas.merge_asof`` contract: for every
left row, pick the single right row with the largest ``on`` value <=
the left's (direction="backward"; "forward" is the mirror), matching
within ``by`` groups, optionally bounded by ``tolerance``.

Scale design (100 TB): the naive formulation is a non-equi join
(``l.ts >= r.ts`` + row_number), which Catalyst can only execute as a
broadcast-nested-loop or cartesian product per key.  Instead both
sides are unioned and processed with ONE window over (by, ts) —
a single hash-partition shuffle on the ``by`` keys plus a per-partition
sort, both spillable, never O(|L|x|R|).  No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the columns of the nearest
    right row at-or-before (backward) / at-or-after (forward) its ``on``
    value within the same ``by`` group; unmatched -> nulls.

    ``tolerance``: max allowed |l.on - r.on| as an INTERVAL expression
    (e.g. ``"INTERVAL 1 HOUR"``) or Column; matches farther away become
    nulls, exactly like pandas ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by or [])

    left_cols = list(left.columns)
    right_payload = [c for c in right.columns if c not in by]

    lhs = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left_cols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_payload).alias("__r"),
    )
    both = lhs.unionByName(rhs)
    return _asof_from_union(
        both, by=by, direction=direction, tolerance=tolerance,
        left_cols=left_cols, right_payload=right_payload, suffix=suffix,
    )


def asof_join_split(
    events: DataFrame,
    *,
    on: str,
    left_pred: Column,
    right_pred: Column,
    right_cols: list[str],
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join where BOTH sides are row-subsets of one source frame —
    ``asof_join(events.where(left_pred), events.where(right_pred)
    .select(right_cols))`` computed from a SINGLE scan.

    The two-frame form plans two FileScans over the same table (Catalyst
    does not share subplans), i.e. a doubled read of what is typically
    the largest table (guide §6: read less).  Here each row is routed to
    the left or right role with one CASE projection and the rest of the
    pipeline (one window shuffle) is shared with ``asof_join``.

    ``left_pred`` / ``right_pred`` must be disjoint: a row matching both
    is treated as a LEFT row only (the two-frame form would duplicate it
    into both roles).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by or [])
    left_cols = list(events.columns)
    right_payload = [c for c in right_cols if c not in by]

    is_left = F.when(left_pred, F.lit(1)).when(right_pred, F.lit(0))
    both = events.where(left_pred | right_pred).select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        is_left.alias("__is_left"),
        F.when(is_left == 1, F.struct(*[F.col(c) for c in left_cols])).alias("__l"),
        F.when(is_left == 0, F.struct(*[F.col(c) for c in right_payload])).alias("__r"),
    )
    return _asof_from_union(
        both, by=by, direction=direction, tolerance=tolerance,
        left_cols=left_cols, right_payload=right_payload, suffix=suffix,
    )


def _asof_from_union(
    both: DataFrame,
    *,
    by: list[str],
    direction: str,
    tolerance: Column | str | None,
    left_cols: list[str],
    right_payload: list[str],
    suffix: str,
) -> DataFrame:
    """Shared tail of the as-of pipeline: one window over the combined
    (left+right) rows, tolerance guard, unpack."""
    out_names = {
        c: (c + suffix if c in left_cols else c) for c in right_payload
    }

    # at equal timestamps a right row must be visible to a left row
    # (>= / <= are inclusive), so right (0) sorts toward the window start
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    matched = (
        both.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .withColumn(
            "__mt", F.last(F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True).over(w)
        )
        .where(F.col("__is_left") == 1)
    )

    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        gap_ok = (
            (F.col("__t") - F.col("__mt") <= tol)
            if direction == "backward"
            else (F.col("__mt") - F.col("__t") <= tol)
        )
        matched = matched.withColumn(
            "__m", F.when(gap_ok, F.col("__m"))
        )

    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__m.{c}").alias(out_names[c]) for c in right_payload],
    )


def attribute_conversions(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    touch_type: str = "click",
    lookback: str = "24 hours",
    model: str = "linear",
) -> DataFrame:
    """Multi-touch conversion attribution: credit each conversion to the
    touch events of the same user inside the lookback window
    (``conv.ts - lookback < touch.ts <= conv.ts``), weighted by the
    chosen model — ``last`` / ``first`` (all credit to one touch) or
    ``linear`` (1/n to each of the n touches).

    Returns ``conversion_id, touch_id, weight`` (conversions with no
    touch in window are absent — join back for unattributed volume).

    Scale shape: the candidate join rides the bucketed interval join
    (``operators.rangejoin.interval_join`` — user-and-bucket equi keys,
    never a time cross product); the weighting is one window partitioned
    by conversion, bounded by touches-per-window.
    """
    from aws_sdk_pandas_spark.operators.rangejoin import (
        _parse_duration_seconds,
        interval_join,
    )

    if model not in ("last", "first", "linear"):
        raise ValueError("model must be last|first|linear")
    lb = _parse_duration_seconds(lookback)
    touches = events.where(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("__touch_ts"),
    )
    convs = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("__conv_ts"),
        # NTZ interval arithmetic directly: an ltz round-trip would make
        # the boundary instant-based (DST-sensitive) for wall-clock data
        (F.col(ts_col) - F.expr(f"INTERVAL {int(lb)} SECONDS")).alias("__win_start"),
    )
    pairs = interval_join(
        touches,
        convs,
        point_col="__touch_ts",
        start_col="__win_start",
        end_col="__conv_ts",
        by=["__u"],
        bucket_width=lookback,
    ).where(F.col("__touch_ts") > F.col("__win_start"))  # window is half-open
    w = Window.partitionBy("conversion_id")
    if model == "linear":
        out = pairs.withColumn(
            "weight", F.round(F.lit(1.0) / F.count(F.lit(1)).over(w), 6)
        )
    else:
        order = (
            [F.col("__touch_ts").desc(), F.col("touch_id").desc()]
            if model == "last"
            else [F.col("__touch_ts").asc(), F.col("touch_id").asc()]
        )
        out = pairs.withColumn(
            "weight",
            F.when(F.row_number().over(w.orderBy(*order)) == 1, 1.0),
        ).where(F.col("weight").isNotNull())
    return out.select("conversion_id", "touch_id", "weight")
