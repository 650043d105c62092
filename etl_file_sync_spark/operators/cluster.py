"""Connected components over near-duplicate pairs → dedup clusters.

The capstone of the dedup pipeline: pair lists (from exact digests,
MinHash, SimHash or embedding similarity) rarely form clean 1:1 matches —
A~B, B~C must collapse into one cluster {A,B,C} with one canonical
survivor.

Algorithm: the ALTERNATING large-star/small-star algorithm from the
map-reduce connected-components literature (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public). Each round is
two grouped aggregations on node id:

- large-star: every node's strictly-larger neighbors re-point to the
  minimum of its closed neighborhood;
- small-star: every node and its not-larger neighbors re-point to that
  minimum.

Rounds needed are O(log²n) in theory and a handful in practice — versus
O(diameter) for naive min-label propagation, which a 1000-hop revision
chain would defeat. Each round shuffles on node id only; localCheckpoint
truncates the growing lineage so plan size stays constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(e: DataFrame) -> DataFrame:
    """Symmetric closure (u,v)+(v,u), no self-loops, distinct."""
    return (
        e.select("u", "v")
        .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _min_nbr(sym: DataFrame) -> DataFrame:
    """(u, m): minimum of u's closed neighborhood (neighbors + itself)."""
    return sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """pairs(id_a, id_b) → (id, component) with component = min id reachable.

    Deterministic: labels are min-ids, independent of partitioning.
    max_iter bounds ROUNDS of (large-star, small-star); convergence is
    O(log²n) rounds so 20 covers any realistic graph — if the budget is
    somehow exhausted we raise rather than return split components.
    """
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    nodes = _sym(edges).select(F.col("u").alias("id")).distinct().localCheckpoint(eager=True)
    cur = _sym(edges).localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        # large-star: neighbors larger than u attach to min(N[u])
        sym = cur
        mn = _min_nbr(sym)
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mn, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        ls = _sym(large).localCheckpoint(eager=True)

        # small-star: u and its not-larger neighbors attach to min(N[u])
        mn2 = _min_nbr(ls)
        small = (
            ls.filter(F.col("v") <= F.col("u"))
            .join(mn2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mn2.select(F.col("u"), F.col("m").alias("v")))
        )
        new = _sym(small).localCheckpoint(eager=True)

        changed = new.exceptAll(cur).limit(1).count() + cur.exceptAll(new).limit(1).count()
        cur = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} star rounds; "
            "raise max_iter (pathological graph for the iteration budget)"
        )

    # fixpoint edges are stars (u, root): label = min neighbor (the root),
    # or the node's own id for roots/singleton-in-pairs nodes
    labels = cur.groupBy("u").agg(F.min("v").alias("root"))
    return (
        nodes.join(labels, nodes.id == labels.u, "left")
        .select("id", F.when(F.col("root") < F.col("id"), F.col("root")).otherwise(F.col("id")).alias("component"))
    )


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
