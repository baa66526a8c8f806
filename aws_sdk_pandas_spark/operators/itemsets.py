"""Frequent-itemset mining (market basket) on MLlib FP-Growth.

The classic "what co-occurs?" analytics — products per order, tags per
document, hosts per session.  FP-Growth is the right distributed shape
(two scans: item counts, then conditional FP-trees per partition —
never the candidate-explosion of Apriori), and Spark ships it in MLlib;
this wraps it onto plain DataFrames with deterministic, SQL-checkable
output columns.

Reference parity: aws-sdk-pandas has no mining surface; its users run
this class of query through Athena self-joins (pair co-occurrence),
which is exactly what the DuckDB oracle for the size<=2 slice does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _baskets(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct-item baskets — persisted by the callers across their
    count + FP-Growth actions so the shuffle runs once."""
    return (
        df.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .where(F.col("__i").isNotNull())
        .groupBy("__b")
        .agg(F.collect_set("__i").alias("items"))
    )


def frequent_itemsets(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    max_size: int | None = None,
) -> DataFrame:
    """Frequent itemsets over (basket, item) rows: returns ``items``
    (sorted array — deterministic across runs/partitionings), ``size``,
    ``freq`` (baskets containing the set) and ``support`` (freq /
    n_baskets, rounded).

    Scale shape: one groupBy builds the distinct-item baskets, MLlib
    FP-Growth does its two passes; ``min_support`` bounds the result
    (and the tree depth) — the knob that keeps 100 TB tractable.
    ``max_size`` optionally truncates to small itemsets (the size<=2
    slice is what co-occurrence dashboards consume).
    """
    from pyspark.ml.fpm import FPGrowth

    baskets = _baskets(df, basket_col, item_col).persist()
    n_baskets = baskets.count()  # also materializes the cache for the fit
    if n_baskets == 0:
        baskets.unpersist()
        raise ValueError("no baskets")
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=0.5
    ).fit(baskets)
    baskets.unpersist()
    out = model.freqItemsets.select(
        F.array_sort("items").alias("items"),
        F.size("items").alias("size"),
        F.col("freq"),
        F.round(F.col("freq") / F.lit(float(n_baskets)), 6).alias("support"),
    )
    if max_size is not None:
        out = out.where(F.col("size") <= max_size)
    return out


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.5,
) -> DataFrame:
    """Association rules from an FP-Growth run over the same basket
    construction as :func:`frequent_itemsets` (its own fit — call this
    directly when rules are the goal): ``antecedent, consequent,
    confidence, lift, support`` with sorted arrays for deterministic
    output."""
    from pyspark.ml.fpm import FPGrowth

    baskets = _baskets(df, basket_col, item_col).persist()
    baskets.count()
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=min_confidence
    ).fit(baskets)
    baskets.unpersist()
    return model.associationRules.select(
        F.array_sort("antecedent").alias("antecedent"),
        F.array_sort("consequent").alias("consequent"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
        F.round("support", 6).alias("support"),
    )


def sequential_patterns(
    df: DataFrame,
    *,
    sequence_col: str,
    item_col: str,
    order_col: str,
    min_support: float = 0.1,
    max_pattern_length: int = 2,
) -> DataFrame:
    """Frequent sequential patterns (MLlib PrefixSpan): which ordered
    event chains recur across users/sessions — the "what happens before
    a purchase" complement to unordered itemsets.  Support counts
    SEQUENCES (users) containing the pattern as an ordered subsequence.

    Returns ``pattern`` (array of items, one per step), ``length``,
    ``freq``, ``support`` — deterministic output ordering left to the
    caller.

    Scale shape: one groupBy builds each sequence (sorted by
    ``order_col`` inside the aggregation, not a global sort); PrefixSpan
    grows patterns by projected-database recursion, bounded by
    ``max_pattern_length`` and ``min_support`` — the two knobs that keep
    the lattice tractable at scale.
    """
    from pyspark.ml.fpm import PrefixSpan

    seqs = (
        df.select(
            F.col(sequence_col).alias("__s"),
            F.col(order_col).alias("__o"),
            F.col(item_col).alias("__i"),
        )
        .where(F.col("__i").isNotNull())
        .groupBy("__s")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__o", "__i"))),
                lambda s: F.array(s["__i"]),
            ).alias("sequence")
        )
    ).persist()
    n_seqs = seqs.count()
    if n_seqs == 0:
        seqs.unpersist()
        raise ValueError("no sequences")
    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    )
    out = ps.findFrequentSequentialPatterns(seqs)
    res = out.select(
        F.flatten("sequence").alias("pattern"),
        F.size("sequence").alias("length"),
        F.col("freq"),
        F.round(F.col("freq") / F.lit(float(n_seqs)), 6).alias("support"),
    )
    res = res.localCheckpoint(eager=True)  # materialize before unpersisting input
    seqs.unpersist()
    return res
