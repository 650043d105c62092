"""Connected components over near-duplicate pairs → dedup clusters.

The capstone of the dedup pipeline: pair lists (from exact digests,
MinHash, SimHash or embedding similarity) rarely form clean 1:1 matches —
A~B, B~C must collapse into one cluster {A,B,C} with one canonical
survivor. This is small-star/large-star label propagation (the
alternating-algorithm from the map-reduce connected-components
literature): every node repeatedly adopts the minimum label in its
neighborhood until a fixed point.

Scale: each iteration is one shuffle on the node id; iterations needed =
O(log(diameter)), and near-dup graphs have tiny diameters (chains of
doc revisions). localCheckpoint truncates the growing lineage so plan
size stays constant across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """pairs(id_a, id_b) → (id, component) with component = min id reachable.

    Deterministic: labels are min-ids, independent of partitioning.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    # initial label: the node's own id (nodes = every id appearing in pairs)
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn("component", F.col("id"))

    converged = False
    for _ in range(max_iter):
        # each node proposes its current label to every neighbor
        prop = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.select("id", "component")
            .union(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)  # truncate lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # label propagation needs O(diameter) rounds — a >max_iter-hop
        # chain would silently return SPLIT components; fail loudly.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter (graph diameter exceeds the iteration budget)"
        )
    return labels


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Collapse near-dup pairs into clusters; return df with a
    `cluster_id` (min reachable id; singletons keep their own id) and
    `is_canonical` (the cluster survivor)."""
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    out = df.join(comp, id_col, "left").withColumn(
        "cluster_id", F.coalesce("component", F.col(id_col))
    )
    return out.drop("component").withColumn(
        "is_canonical", F.col(id_col) == F.col("cluster_id")
    )
