"""Approximate/sketch aggregates — the bounded-memory scale path.

At 100 TB an exact COUNT(DISTINCT) is a full shuffle of every distinct
key and an exact percentile a global sort; the sketch forms are one-pass,
bounded-memory, map-side-combinable (HyperLogLog++ / Greenwald-Khanna
inside Spark).  The reference delegates these to Athena/Presto
(``approx_distinct``, ``approx_percentile`` pass-through,
awswrangler/athena/_read.py:951); here they're first-class wrappers with
accuracy-tested defaults.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count (relative standard deviation ``rsd``).
    Memory is O(1/rsd^2) per group regardless of cardinality."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    relative_error: float = 0.01,
) -> list[float]:
    """Greenwald-Khanna approximate quantiles — one pass, no global sort.
    ``relative_error=0`` degenerates to the exact (sort-based) algorithm."""
    return df.approxQuantile(col, list(probabilities), relative_error)


def approx_percentile_col(
    col: Column | str, percentage: float | list[float], accuracy: int = 10_000
) -> Column:
    """``approx_percentile`` as a Column aggregate (usable inside
    ``groupBy().agg``, unlike ``approxQuantile``)."""
    if isinstance(percentage, list):
        pct = F.array(*[F.lit(p) for p in percentage])
    else:
        pct = F.lit(percentage)
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, pct, F.lit(accuracy))


def frequent_items(
    df: DataFrame, cols: list[str], support: float = 0.01
) -> DataFrame:
    """Items more frequent than ``support`` (single-pass heavy-hitters;
    may contain false positives, never false negatives)."""
    return df.stat.freqItems(cols, support)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) sketches.  HLL answers "how many
# distinct" but cannot intersect two sketches; KMV keeps the k smallest
# key hashes, so union = k-smallest of the merged arrays and intersection
# follows from the fraction of union survivors present in both — the
# audience-overlap / corpus-overlap estimator at 100 TB, without ever
# joining the raw key sets.  Hashes are the first 52 bits of md5 (13 hex
# chars): engine-rederivable (the DuckDB oracle recomputes them), exactly
# long-representable, collision odds ~n^2/2^53.
# ---------------------------------------------------------------------------

_KMV_BITS = 52


def _kmv_hash(col: Column, seed: int) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(seed)))), 1, 13),
        16,
        10,
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    *,
    by: list[str] | None = None,
    k: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Bottom-k sketch of the DISTINCT ``key_col`` values per group:
    ``by..., hashes array<bigint> (sorted, <= k), n_kept``.

    Scale shape: one distinct shuffle on (group, key), then the
    per-group bottom-k via a keyed window — or, ungrouped, a global
    sort+limit that Spark compiles to ``TakeOrderedAndProject``
    (per-partition bottom-k merged on the driver, never a
    single-partition window funnel).  Final collect is bounded at <= k
    elements; a sketch is ~2 KB at k=256 whatever the cardinality.
    """
    from pyspark.sql.window import Window

    keys = list(by or [])
    d = (
        df.select(*keys, F.col(key_col).alias("__key"))
        .distinct()
        .withColumn("__h", _kmv_hash(F.col("__key"), seed))
    )
    if keys:
        w = Window.partitionBy(*keys).orderBy("__h", "__key")
        d = d.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    else:
        d = d.orderBy("__h", "__key").limit(k)
    return d.groupBy(*keys).agg(
        F.array_sort(F.collect_list("__h")).alias("hashes"),
        F.count("*").alias("n_kept"),
    )


def _kmv_estimate_expr(hashes: Column, k: int) -> Column:
    """(k-1)/theta scaled to the hash domain; exact when unsaturated."""
    sz = F.size(hashes)
    theta = F.element_at(hashes, sz).cast("double")
    return F.when(sz < k, sz.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(2**_KMV_BITS)) / theta
    )


def kmv_estimate(sketch: DataFrame, *, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group from a ``kmv_sketch`` frame:
    exact below k, (k-1)/theta beyond (relative error ~1/sqrt(k-2))."""
    return sketch.withColumn("est_distinct", _kmv_estimate_expr(F.col("hashes"), k))


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    *,
    by: list[str] | None = None,
    k: int = 256,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Set-operation estimates from two ``kmv_sketch`` frames built with
    the SAME k and seed: ``est<sa>, est<sb>, est_union,
    est_intersection, est_jaccard`` (per ``by`` group; cross-pair of the
    single rows when ``by`` is empty).

    Union sketch = k smallest of the merged hash arrays; theta comes
    from it; intersection = union estimate x the fraction of union
    survivors present in BOTH inputs (the standard theta-sketch rho).
    When both sides are unsaturated every estimate degenerates to the
    exact count.  All array math is JVM built-ins on <= 2k element
    arrays — the join ships kilobytes per group, never the key sets.
    """
    sa, sb = suffixes
    keys = list(by or [])
    aa = a.select(*keys, F.col("hashes").alias(f"__h{sa}"))
    bb = b.select(*keys, F.col("hashes").alias(f"__h{sb}"))
    j = aa.join(bb, keys) if keys else aa.crossJoin(bb)
    merged = F.array_sort(F.array_union(F.col(f"__h{sa}"), F.col(f"__h{sb}")))
    kk = F.least(F.lit(k), F.size(merged))
    topk = F.slice(merged, 1, kk)
    common = F.size(
        F.array_intersect(F.array_intersect(topk, F.col(f"__h{sa}")), F.col(f"__h{sb}"))
    )
    est_union = _kmv_estimate_expr(topk, k)
    est_inter = est_union * common.cast("double") / kk.cast("double")
    return (
        j.withColumn(f"est{sa}", _kmv_estimate_expr(F.col(f"__h{sa}"), k))
        .withColumn(f"est{sb}", _kmv_estimate_expr(F.col(f"__h{sb}"), k))
        .withColumn("est_union", est_union)
        .withColumn("est_intersection", est_inter)
        .withColumn(
            "est_jaccard",
            F.when(est_union > 0, est_inter / est_union).otherwise(F.lit(0.0)),
        )
        .drop(f"__h{sa}", f"__h{sb}")
    )
