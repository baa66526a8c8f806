"""Skew-mitigation operators.

AQE's skew-join splitting handles most sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled, on in session defaults), but two
patterns still need explicit structure at 100 TB:

- a large-x-large equi-join where one side has a few pathologically hot
  keys (AQE can split the partition, but every split still reads the
  full matching other side): ``salted_join`` replicates the build side
  per salt so the hot key's rows spread over N tasks.
- ``count_distinct`` / ``collect_set`` over a hot group: partial
  aggregation cannot combine distinct sets cheaply; ``two_stage_distinct``
  splits the distinct into (key, value)-level dedup then a key-level
  count, both shuffles uniformly keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salting: ``left`` rows get a random salt in
    [0, num_salts); ``right`` is replicated once per salt value; the join
    runs on ``on + [salt]`` so a hot key's rows land in ``num_salts``
    different tasks instead of one straggler.

    Use when BOTH sides are too big to broadcast and a handful of keys
    dominate.  Cost: right side shuffled ``num_salts``x — pick the
    smaller side as ``right``.  Supports inner and left joins (semantics
    identical to the unsalted join; row multiplicity preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    salt = (F.rand(seed=42) * num_salts).cast("int")
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = l_s.join(r_s, on + ["__salt"], how)
    return out.drop("__salt")


def two_stage_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """``COUNT(DISTINCT distinct_col) GROUP BY keys`` as two uniform
    shuffles: dedup on (keys, value) — the value spreads a hot key over
    the cluster — then count per key.  Equivalent result to the direct
    ``count_distinct``, which funnels each hot key's full value stream
    through one task."""
    out_col = out_col or f"n_distinct_{distinct_col}"
    return (
        df.select(*keys, distinct_col)
        .dropDuplicates(keys + [distinct_col])
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
