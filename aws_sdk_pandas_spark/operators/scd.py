"""Slowly-changing-dimension (type 2) history builder.

The reference's upsert family (redshift/_utils.py:173-211 precombine
"greatest version wins", athena/_write_iceberg.py:366-385 MERGE) covers
type-1 overwrites; warehouse pipelines equally need the type-2 variant:
turn a change log into validity intervals per business key.

Spark-first design: one shuffle on the business key, two window passes
over the same partitioning (Catalyst reuses the sort): a lag() pass to
collapse consecutive rows whose tracked attributes did not change, then a
lead() pass to close each surviving version's interval.  No driver state,
no joins — scales linearly in the change log and is skew-bound only by
rows-per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_sdk_pandas_spark.exceptions import InvalidArgument


def scd2_from_changes(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    track_cols: list[str],
    *,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build a type-2 history from a change log.

    ``keys``: business key columns. ``order_by``: columns that order the
    change log within a key (must be deterministic — include a tiebreaker).
    ``track_cols``: attributes whose change opens a new version; rows where
    none of them changed relative to the previous change-log row are
    collapsed into the open version.

    Returns ``keys + track_cols + [valid_from, valid_to, is_current]``
    where ``valid_from`` is the first ``order_by[0]`` value of the version,
    ``valid_to`` the next version's ``valid_from`` (null while current).
    """
    if not keys or not order_by or not track_cols:
        raise InvalidArgument("keys, order_by and track_cols are all required")

    order = [F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order)

    # change detection: null-safe comparison against the previous row's
    # tracked attributes (first row per key always opens a version)
    state = F.struct(*[F.col(c) for c in track_cols])
    changed = ~state.eqNullSafe(F.lag(state).over(w))

    versions = df.withColumn("__chg", changed).where(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(*keys).orderBy(*order)
    valid_from = F.col(order_by[0])
    valid_to = F.lead(order_by[0]).over(w2)
    return versions.select(
        *keys,
        *track_cols,
        valid_from.alias(valid_from_col),
        valid_to.alias(valid_to_col),
        valid_to.isNull().alias(current_col),
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    pick_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Point-in-time dimension resolution: each fact row joins the
    dimension version valid at its timestamp
    (``valid_from <= ts < valid_to``; the open version has null
    ``valid_to``) — the lookup every fact table runs against a type-2
    history built by :func:`scd2_from_changes`.

    Scale shape: the join is keyed on the business keys (one hash
    shuffle); the validity predicate rides the join condition and only
    ever filters the per-key version candidates — a well-formed SCD2
    history has non-overlapping versions per key, so at most ONE version
    matches each fact and the join never expands rows (no interval
    bucketing needed, unlike a general range join).

    ``pick_cols``: dimension columns to attach (default: everything but
    the keys and validity columns).
    """
    if not keys:
        raise InvalidArgument("keys are required")
    f = facts.alias("__f")
    d = dim.alias("__d")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    ts = F.col(f"__f.{ts_col}")
    cond = cond & (ts >= F.col(f"__d.{valid_from_col}"))
    cond = cond & (
        F.col(f"__d.{valid_to_col}").isNull() | (ts < F.col(f"__d.{valid_to_col}"))
    )
    if pick_cols is not None:
        pick = pick_cols  # explicit [] = attach nothing (existence join)
    else:
        # default also skips names the facts already carry — otherwise a
        # shared attribute (updated_at etc.) would produce a duplicate
        # column and AMBIGUOUS_REFERENCE downstream
        taken = set(keys) | {valid_from_col, valid_to_col, "is_current"} | set(
            facts.columns
        )
        pick = [c for c in dim.columns if c not in taken]
    return f.join(d, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}") for c in pick],
    )
