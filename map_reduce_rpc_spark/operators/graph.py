"""Iterative graph operators on DataFrames: connected components.

The training-pipeline use: near-dup PAIRS (minhash/jaccard/simhash
output) must become dup CLUSTERS — keep one doc per component, drop
the rest. That closure is inherently iterative; it cannot be a single
SQL query, so this is the engine's iterative-algorithm surface.

Algorithm: min-label propagation. Every node starts labeled with its
own id; each round replaces a node's label with the min of its own and
its neighbors' labels; fixpoint = component = min node id reachable.
Rounds needed = graph diameter (near-dup graphs are shallow — dup
clusters are cliques-ish, diameter 1-3).

Scale notes: each round is one join + one aggregation on the edge
list (shuffle on node id, partial-agg'd). Labels are persisted and
localCheckpoint()ed every round so the plan/lineage stays O(1) deep
instead of O(rounds) — without that, iteration re-executes the whole
history each round and the driver's plan compiler becomes the
bottleneck. Convergence is detected with a count of changed labels
(one cheap action per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """(node, component) for every node in the edge list; component is
    the minimum node id in the node's connected component."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint()

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # Un-converged labels are WRONG component assignments (long
        # paths propagate one hop per round); surface it rather than
        # silently returning partial closures.
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iter} rounds; "
            "labels may split true components (raise max_iter — rounds needed "
            "= graph diameter)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_keepers(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Cluster the dup pairs and pick the keeper (min id) per cluster:
    (node, component, is_keeper) — drop rows where is_keeper is false
    to dedup a corpus given its near-dup pair list."""
    cc = connected_components(edges, src, dst)
    return cc.withColumn("is_keeper", F.col("node") == F.col("component"))
