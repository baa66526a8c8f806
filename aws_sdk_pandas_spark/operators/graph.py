"""Connected components and duplicate clustering.

Near-duplicate PAIRS (minhash/ngram/embedding dedup) form a graph; the
deliverable of a dedup pipeline is its components: one cluster id per
document, keep one representative per cluster.  (SURVEY P5: MinHashLSH +
connected components.)

Algorithm: iterative min-label propagation — every node repeatedly takes
the minimum label among itself and its neighbors.  Each round is one
join + one aggregate (both key-partitioned shuffles, AQE-sized); rounds
needed = graph diameter, which for near-dup clusters is tiny (pairs are
near-cliques).  ``localCheckpoint`` truncates the lineage each round so
the plan does not grow exponentially.  No driver-side graph state: at
100 TB the edge list never leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Component label per node: ``(id, cluster_id)`` where cluster_id is
    the minimum node id reachable from ``id``.  Only nodes appearing in
    ``pairs`` are returned (isolated docs are their own cluster by
    definition — join back if needed)."""
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    edges.count()  # materialize once; reused every round

    labels = (
        edges.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        # carry old and new labels in ONE frame: the convergence check is
        # then a filter-count on the checkpointed result instead of a
        # second full join against the previous labels (halves the
        # per-iteration shuffle work).  eager=False: the count below is
        # the first action over the frame, so ONE job both materializes
        # the checkpoint and computes the count — the eager default
        # spent a separate materialization job per round (2 -> 1
        # actions/iter).
        updated = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(
                labels["id"],
                labels["label"].alias("__old"),
                F.least(
                    labels["label"], F.coalesce(nbr["nbr_min"], labels["label"])
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = updated.where(F.col("label") != F.col("__old")).count()
        labels = updated.drop("__old")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate clusters from a pair list: ``(id, cluster_id, is_representative)``
    — the representative (minimum id) is the row to KEEP; everything else
    in the cluster is a duplicate to drop."""
    cc = connected_components(pairs, id_a, id_b, max_iter=max_iter)
    return cc.withColumn("is_representative", F.col("id") == F.col("cluster_id"))


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """The end-to-end dedup deliverable: given the corpus and its
    near-duplicate PAIRS, keep exactly one row per duplicate cluster —
    the highest-``score_col`` member (ties and no-score: minimum id) —
    and every row that was never paired.

    Scale shape: connected components over the pair list (never the
    corpus), one left join corpus x labels (labels side is |paired docs|,
    typically << corpus, broadcast by AQE), one window shuffle on
    cluster_id for the argmax.  The corpus is scanned once.
    """
    from pyspark.sql.window import Window

    labels = connected_components(pairs, max_iter=max_iter).select(
        F.col("id").alias(id_col), "cluster_id"
    )
    joined = df.join(labels, id_col, "left")
    # unpaired rows (the vast majority) must NOT enter the window — a
    # NULL cluster_id would funnel them all into one window partition
    singles = joined.where(F.col("cluster_id").isNull()).drop("cluster_id")
    order = (
        [F.col(score_col).desc()] if score_col is not None else []
    ) + [F.col(id_col).asc()]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    best = (
        joined.where(F.col("cluster_id").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "cluster_id")
    )
    return singles.unionByName(best)
