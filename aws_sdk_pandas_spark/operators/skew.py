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


def key_distribution(
    df: DataFrame,
    col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """Heaviest keys of a prospective join/groupBy column: ``rank, key
    (string), n, share`` for the ``top_k`` most frequent values — the
    direct input to choosing a salting factor (``salted_join`` docs:
    salt ~ heaviest-key share x parallelism).

    One groupBy shuffle on the key, then a top-k that compiles to
    TakeOrderedAndProject over the (already reduced) distinct-key
    table.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(col).cast("string").alias("key")).agg(
        F.count("*").alias("n")
    )
    total = df.count()
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top_k)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return top.select(
        F.row_number().over(w).alias("rank"),
        "key",
        "n",
        F.round(F.col("n") / F.lit(float(total)), 6).alias("share"),
    )


def skew_metrics(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """One row per candidate key column: ``column, n_rows, n_distinct,
    n_nulls, max_share, entropy_norm`` — ``max_share`` is the heaviest
    key's fraction (the straggler-task bound under hash partitioning:
    one task gets at least that share of the shuffle), ``entropy_norm``
    the key-distribution entropy normalized to [0, 1] (1 = uniform;
    low values mean salting or AQE skew handling will pay off).

    Entropy folds to pure aggregates over the distinct-key table:
    ``H = ln N - sum(n * ln n) / N`` (no window, map-side combinable),
    normalized by ``ln K``.  One groupBy per column, bounded by key
    cardinality; the per-column one-row results union into one small
    frame.
    """
    out = None
    for c in cols:
        counts = df.groupBy(F.col(c).cast("string").alias("key")).agg(
            F.count("*").alias("n")
        )
        n_total = F.sum("n")
        k_keys = F.count("*")
        entropy = (
            F.log(n_total.cast("double"))
            - F.sum(F.col("n") * F.log(F.col("n").cast("double"))) / n_total
        )
        row = counts.agg(
            F.lit(c).alias("column"),
            n_total.alias("n_rows"),
            F.count(F.when(F.col("key").isNotNull(), 1)).alias("n_distinct"),
            F.coalesce(
                F.sum(F.when(F.col("key").isNull(), F.col("n"))), F.lit(0)
            ).alias("n_nulls"),
            F.round(F.max("n") / n_total, 6).alias("max_share"),
            F.round(
                F.when(
                    k_keys > 1, entropy / F.log(k_keys.cast("double"))
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("entropy_norm"),
        )
        out = row if out is None else out.unionByName(row)
    return out
