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

from pyspark.sql import DataFrame, Window
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


def item_similarity(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
    top_k: int | None = None,
    cap_per_basket: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Item-item co-occurrence similarity — the "customers who bought X
    also bought Y" table: one row per unordered item pair with
    ``item_a, item_b, n_pair, cosine, lift, jaccard`` over basket
    co-membership (cosine = c_ab/√(c_a·c_b); lift > 1 means the pair
    co-occurs more than independence predicts; Jaccard penalizes
    popular-with-everything items).  With ``top_k``, instead returns
    the k nearest neighbors PER item (both directions materialized,
    ranked by cosine with deterministic tie-breaks) — the direct input
    to an item-to-item recommender.

    Scale shape: both sides of the pair join are the DEDUPLICATED
    (basket, item) table, so the single self-join shuffle is keyed on
    basket and bounded by Σ basket_size² — ``cap_per_basket`` caps
    that quadratic term for hub baskets (keeps the lexicographically
    first N items per basket, deterministic) the way the dedup family
    caps hot shingles.  Item marginals are aggregations of the deduped
    table, joined back on the item key.  ``min_pairs`` drops the
    noise tail before any metric math.
    """
    b = F.col(basket_col)
    it = F.col(item_col)
    base = (
        df.where(b.isNotNull() & it.isNotNull())
        .select(b.alias("__b"), it.alias("__i"))
        .distinct()
    )
    if cap_per_basket is not None:
        w = Window.partitionBy("__b").orderBy(F.col("__i").asc())
        base = (
            base.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cap_per_basket)
            .drop("__rn")
        )
    # persist the deduplicated (basket, item) table: the basket count,
    # the item marginals and BOTH pair-join sides re-derived it — 5 scans
    # of the input plus 4 redundant distinct shuffles in one executed
    # plan (tools/scan_count_audit.py).  One scan + one distinct shuffle
    # builds it; every consumer reads the cache (guide §5).  Lifetime is
    # caller-owned.
    base = base.persist()
    n_baskets = base.agg(F.countDistinct("__b").alias("__nb"))
    items = base.groupBy("__i").agg(F.count(F.lit(1)).alias("__c"))
    left = base.select(F.col("__b"), F.col("__i").alias("item_a"))
    right = base.select(F.col("__b"), F.col("__i").alias("item_b"))
    pairs = (
        left.join(right, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pairs)
    )
    j = (
        pairs.join(
            items.select(F.col("__i").alias("item_a"), F.col("__c").alias("__ca")),
            "item_a",
        )
        .join(
            items.select(F.col("__i").alias("item_b"), F.col("__c").alias("__cb")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))  # ONE row
    )
    cos = F.col("n_pair") / F.sqrt(F.col("__ca").cast("double") * F.col("__cb"))
    lift = (
        F.col("n_pair").cast("double")
        * F.col("__nb")
        / (F.col("__ca").cast("double") * F.col("__cb"))
    )
    jac = F.col("n_pair") / (
        F.col("__ca") + F.col("__cb") - F.col("n_pair")
    ).cast("double")
    out = j.select(
        "item_a",
        "item_b",
        "n_pair",
        F.round(cos, round_to).alias("cosine"),
        F.round(lift, round_to).alias("lift"),
        F.round(jac, round_to).alias("jaccard"),
    )
    if top_k is None:
        return out.orderBy("item_a", "item_b")
    # materialize both directions, rank neighbors per item
    both = out.unionByName(
        out.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "n_pair",
            "cosine",
            "lift",
            "jaccard",
        )
    )
    w = Window.partitionBy("item_a").orderBy(
        F.col("cosine").desc(), F.col("n_pair").desc(), F.col("item_b").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .orderBy("item_a", "rank")
    )
