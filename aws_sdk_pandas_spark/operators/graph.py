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
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["label"], F.coalesce(nbr["nbr_min"], labels["label"])
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
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
