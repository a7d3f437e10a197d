"""Iterative graph operators over edge frames (beyond the reference's
2-hop joins): connected components via min-label propagation.

The reference's graph surface stops at J1 mutuals and 2-hop co-purchase
composition; community/cluster structure over the follow graph needs a
fixpoint algorithm. Label propagation is the canonical Spark shape for
it: each round is one shuffle (edge join + min-aggregate), the driver
loop checks convergence with a cheap count, and ``localCheckpoint``
truncates the growing lineage (same pattern as
``extensions.similarity.kmeans_centroids_train``). Rounds needed =
graph diameter — for social graphs that's small (shrinking diameter
effect); pathological chains are bounded by ``max_iters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrize and dedup an edge list; drops self-loops (they never
    change a label)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return (
        fwd.unionByName(rev)
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """(node, component) where component = the minimum node id reachable
    from the node (undirected). Deterministic: ids are compared with
    plain ordering, no RNG anywhere.

    Per round: label(n) <- min(label(n), min over neighbors m of
    label(m)); stop when no label changed (driver-side count — one cheap
    action per round, the standard convergence check for iterative
    plans). Each round is one shuffle on dst plus an aggregate; the
    label frame is checkpointed so round i doesn't re-execute rounds
    0..i-1.
    """
    e = _undirected(edges, src, dst).localCheckpoint()
    labels = (
        e.select(F.col("src").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # labels flowing across edges: neighbor's current label per node
        incoming = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(incoming, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("_chg")).limit(1).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    return labels


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, n_nodes) — the usual downstream of CC (cluster-size
    distribution, giant-component detection)."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
