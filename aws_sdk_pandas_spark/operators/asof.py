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

    right_payload = [c for c in right.columns if c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_payload
    }

    lhs = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_payload).alias("__r"),
    )
    both = lhs.unionByName(rhs)

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
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(out_names[c]) for c in right_payload],
    )
