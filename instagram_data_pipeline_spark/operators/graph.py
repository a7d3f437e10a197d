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

from pyspark.sql import DataFrame, Window
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

    Per round, two steps:

    1. propagate: label(n) <- min(label(n), min over neighbors m of
       label(m)) — one shuffle on dst plus an aggregate;
    2. pointer-jump: label(n) <- label(label(n)) — one equi-join of the
       label frame against itself (every label IS a node id in the same
       component, so the jump stays within the component and labels
       remain monotone non-increasing).

    Plain propagation alone needs diameter-many rounds (a 10k-node
    chain would stall at max_iters and return wrong labels); the jump
    step shortcuts label chains so the covered distance roughly doubles
    per round — geometric convergence, the same effect as the
    large-star/small-star contraction of Kiveris et al. (MapReduce CC,
    2014) with simpler dataflow. max_iters=20 therefore covers any
    component whose label-chain distance fits in ~2^20.

    Stops when no label changed (driver-side limit(1).count — one cheap
    action per round); the label frame is localCheckpoint-ed each round
    so round i doesn't re-execute rounds 0..i-1. RAISES on
    non-convergence rather than returning wrong labels — consumers
    (dedup_clusters, leakage_safe_split) depend on exact components.
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
        prop = labels.join(incoming, "node", "left").select(
            "node",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("_mid"),
        )
        # pointer jump: follow my label's own label one step
        jump = prop.select(
            F.col("node").alias("_jn"), F.col("_mid").alias("_jc")
        )
        updated = (
            prop.join(jump, prop["_mid"] == jump["_jn"], "left")
            .select(
                "node",
                # _jc <= _mid always (labels never exceed their node id),
                # so the jump result needs no least() against _mid
                F.coalesce("_jc", F.col("_mid")).alias("component"),
                (F.coalesce("_jc", F.col("_mid")) < F.col("_old")).alias(
                    "_chg"
                ),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("_chg")).limit(1).count()
        labels = updated.drop("_chg")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(label-chain distance > ~2^max_iters); raise max_iters"
    )


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, n_nodes) — the usual downstream of CC (cluster-size
    distribution, giant-component detection)."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row graph summary: nodes, edges, triangles, global clustering
    coefficient (3*triangles / wedges).

    Triangles are counted on the DEGREE-ORIENTED graph: each undirected
    edge points from its lower-(degree, id) endpoint to the higher one,
    so every triangle materializes exactly once and — the scale
    property — the out-degree of any node is O(sqrt(m)) regardless of
    how skewed the raw degree distribution is. The wedge join's fan-out
    is sum(outdeg^2) <= m^1.5 instead of the sum(deg^2) a naive
    neighbor self-join pays; for a power-law graph (celebrity nodes)
    that is the difference between feasible and not. Each of the two
    joins is a plain shuffled equi-join; no driver loops.
    """
    und = _undirected(edges, src, dst).localCheckpoint()
    canon = und.filter(F.col("src") < F.col("dst"))
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e = (
        canon.join(
            deg.select(F.col("node").alias("src"), F.col("deg").alias("_ds")),
            "src",
        ).join(
            deg.select(F.col("node").alias("dst"), F.col("deg").alias("_dd")),
            "dst",
        )
    )
    fwd = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )
    # wedge u->v->w closed by the oriented edge u->w
    e1 = oriented.alias("e1")
    e2 = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    ).alias("e2")
    e3 = oriented.select(
        F.col("u").alias("u"), F.col("v").alias("w")
    ).alias("e3")
    tri = (
        e1.join(e2, "v")
        .join(e3, ["u", "w"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    summary = canon.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ).crossJoin(
        deg.agg(
            F.sum(
                (F.col("deg") * (F.col("deg") - 1) / 2).cast("long")
            ).alias("_wedges")
        )
    ).crossJoin(tri)
    return summary.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.round(
            F.when(F.col("_wedges") > 0,
                   3.0 * F.col("n_triangles") / F.col("_wedges"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("clustering_coeff"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    symmetric: bool = True,
) -> DataFrame:
    """(node, pagerank) after a FIXED number of power iterations —
    deterministic and therefore oracle-checkable (the same loop unrolls
    into iterated SQL CTEs, mirroring the k-means oracle).

    Numeric discipline for cross-engine parity: per-edge contributions
    are rounded to 12 decimals and summed as DECIMAL(28,12) (exact,
    order-independent — a plain double SUM would expose aggregation
    order), and each iteration's rank is re-rounded to 12 decimals so
    both engines iterate on identical values. Dangling nodes don't
    arise in symmetric mode (every node has out-degree >= 1); in
    directed mode their mass is NOT redistributed (documented choice,
    mirrored by the oracle).

    Per iteration: one shuffle (contributions grouped by dst) plus a
    broadcast-able join against the rank frame; ``localCheckpoint``
    truncates lineage exactly as in :func:`connected_components`.
    """
    if symmetric:
        e = _undirected(edges, src, dst)
    else:
        e = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
    e = e.localCheckpoint()
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    n_nodes = nodes.count()  # one scalar: pins 1/n as a literal both sides
    # rounding stays engine-side (SQL ROUND = half-up; Python round is
    # banker's — mixing them would break oracle parity at boundaries)
    base = F.round(F.lit(1.0 - damping) / F.lit(float(n_nodes)), 12)
    ranks = nodes.withColumn(
        "pr", F.round(F.lit(1.0) / F.lit(float(n_nodes)), 12)
    ).localCheckpoint()
    for _ in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("pr") / F.col("outdeg"), 12)
                .cast("decimal(28,12)")
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").cast("double").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    base + F.lit(damping) * F.coalesce("_in", F.lit(0.0)),
                    12,
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("pr").alias("pagerank"))


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
) -> DataFrame:
    """The k-core: the maximal subgraph where every node keeps degree
    >= k, by iterative peeling — drop under-degree nodes, re-derive
    degrees, repeat. Returns (node, deg) inside the core (empty if no
    k-core exists).

    Runs EXACTLY ``rounds`` rounds: once peeling reaches the fixpoint,
    further rounds are no-ops, so any rounds >= the peel depth yields
    the true core — and a fixed count is what lets the oracle unroll
    the same loop into CTEs (peel depth on real graphs is small; the
    localCheckpoint per round keeps lineage flat either way). Each
    round is one degree aggregation + two semi-joins — all key-partitioned
    shuffles, no driver-side data."""
    e = _undirected(edges, src, dst).localCheckpoint()
    for _ in range(rounds):
        keep = (
            e.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("node")
        )
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own label; each round, a node adopts the most frequent
    label among its neighbors' PREVIOUS-round labels, ties broken by the
    smallest label — fully deterministic (classic async LPA is run-order
    dependent; the synchronous fixed-round form is reproducible and, for
    a FIXED round count, exactly unrollable in SQL, which is how the
    oracle checks it).

    Per round: one join (neighbor labels), one (node, label) count
    aggregation with map-side combine, one per-node argmax
    (WindowGroupLimit) — three exchanges on node-sized frames, with
    localCheckpoint truncating lineage like the other iterative graph
    ops here. Returns (node, label) after ``rounds`` rounds.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
        .filter(F.col("s") != F.col("d"))
        .dropDuplicates(["s", "d"])
        .localCheckpoint()
    )
    labels = sym.select(F.col("s").alias("node")).dropDuplicates().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(rounds):
        neigh = sym.join(
            labels.withColumnRenamed("node", "d"), "d"
        ).select(F.col("s").alias("node"), "label")
        counts = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("n")
        )
        w = Window.partitionBy("node").orderBy(
            F.col("n").desc(), F.col("label").asc()
        )
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels


def incremental_components(
    components: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fold a NEW edge batch into an existing (node, component)
    assignment without recomputing over the full graph — the
    incremental-maintenance form of :func:`connected_components`
    (same contract as the LSH/IVF index appends: batch-k cost depends
    on the batch, not the corpus).

    Only components the new edges TOUCH can merge, so the work
    contracts to the LABEL graph: map each new edge's endpoints to
    their current labels (a node unseen by the assignment labels
    itself), run CC over the distinct (label_a, label_b) pairs — a
    graph no larger than 2x the batch — and remap. Components untouched
    by the batch are never read past the one mapping join.

    Append-then-merge is EXACTLY equivalent to recomputing CC over the
    union graph (min-label semantics compose), which is what the
    ``incremental_components`` query hash-proves against the full-graph
    recursive oracle."""
    sym = (
        new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            new_edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .dropDuplicates()
    )
    lab = components.select(
        F.col("node"), F.col("component").alias("_lab")
    )
    mapped = (
        sym.join(lab.withColumnRenamed("node", "a"), "a", "left")
        .withColumnRenamed("_lab", "_la")
        .join(lab.withColumnRenamed("node", "b"), "b", "left")
        .withColumnRenamed("_lab", "_lb")
        .select(
            F.coalesce("_la", F.col("a")).alias("la"),
            F.coalesce("_lb", F.col("b")).alias("lb"),
        )
        .filter(F.col("la") != F.col("lb"))
        .dropDuplicates()
    )
    meta = connected_components(
        mapped.select(F.col("la").alias("src"), F.col("lb").alias("dst"))
    ).select(
        F.col("node").alias("_old"), F.col("component").alias("_new")
    )
    # remap existing assignment (labels not in meta keep themselves)
    updated = (
        components.join(
            meta, components["component"] == meta["_old"], "left"
        )
        .select(
            "node", F.coalesce("_new", F.col("component")).alias("component")
        )
    )
    # nodes introduced by the batch: their self-label rides the same map
    batch_nodes = (
        sym.select(F.col("a").alias("node"))
        .dropDuplicates()
        .join(components.select("node"), "node", "anti")
    )
    fresh = (
        batch_nodes.join(
            meta, batch_nodes["node"] == meta["_old"], "left"
        )
        .select(
            "node", F.coalesce("_new", F.col("node")).alias("component")
        )
    )
    return updated.unionByName(fresh)


def community_stats(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """Per-community modularity ingredients over a canonical (src<dst)
    edge set: member count, internal edge count ``e_in``, and total
    member degree ``d_sum`` — all exact integers, so the frame is
    engine-portable; the scalar Newman modularity is one expression
    away for any consumer, Q = sum_c (e_in/m - (d_sum/2m)^2), kept
    OUT of the frame on purpose (a cross-community float sum has
    engine-dependent addition order; the ingredients don't).

    Shape: one degree aggregation, one label groupBy, and the
    internal-edge count as two node-keyed joins (each edge looks up
    both endpoint labels) + one label groupBy — no pairwise expansion
    beyond the edge list itself."""
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    nl = labels.join(deg, "node", "left").select(
        "node", "label", F.coalesce(F.col("_d"), F.lit(0)).alias("_d")
    )
    grp = nl.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("_d").cast("long").alias("d_sum"),
    )
    ein = (
        edges.join(
            nl.select(F.col("node").alias("src"),
                      F.col("label").alias("_la")),
            "src",
        )
        .join(
            nl.select(F.col("node").alias("dst"),
                      F.col("label").alias("_lb")),
            "dst",
        )
        .filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count(F.lit(1)).alias("_e"))
    )
    return grp.join(ein, "label", "left").select(
        "label", "n_nodes",
        F.coalesce(F.col("_e"), F.lit(0)).cast("long").alias("e_in"),
        "d_sum",
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 100,
    max_mid_degree: int | None = 10_000,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003): score each
    NON-adjacent pair (u, w) with a common neighbor by
    sum_v 1/ln(deg(v)) over the shared neighbors v — rare shared
    neighbors are strong evidence, hubs are weak evidence. The
    friend-of-friend recommendation every social/graph product ships.

    Shape: two-hop wedge enumeration via one neighbor self-join on the
    mid node, an anti-join removing already-connected pairs, and one
    aggregation. The wedge fan-out is sum(deg(mid)^2) — a hub mid is
    THE hot key (one degree-10M celebrity alone emits 10^14 wedge
    rows), so mids are capped at ``max_mid_degree`` BEFORE the
    self-join (semi-join against the low-degree node set): hubs
    contribute <= 1/ln(deg) ~ nothing per wedge, so dropping them as
    evidence is the published accuracy-neutral practice (the same
    degree-bounding move that makes :func:`triangle_stats` O(sqrt(m))),
    and it bounds the join's per-key fan-out at cap^2. ``None``
    disables the cap (exact scores, unbounded fan-out — small graphs
    only). Surviving mids keep their TRUE degree in the 1/ln(deg)
    term. Numeric discipline: each term is rounded to 12 decimals and
    summed as DECIMAL(28,12) — order-independent, so the score is
    engine-exact; a common neighbor always has deg >= 2, so ln never
    hits zero.

    Returns the top-``k`` candidates by (aa_score desc, src, dst) with
    the evidence: (src, dst, n_common, aa_score rounded to 6).
    """
    und = _undirected(edges, src, dst).localCheckpoint()
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    if max_mid_degree is not None:
        ok_mids = deg.filter(
            F.col("deg") <= F.lit(int(max_mid_degree))
        ).select(F.col("node").alias("dst"))
        und_mid = und.join(ok_mids, "dst", "semi")
    else:
        und_mid = und
    a = und_mid.select(F.col("src").alias("u"), F.col("dst").alias("mid"))
    b = und_mid.select(F.col("src").alias("w"), F.col("dst").alias("mid"))
    wedges = a.join(b, "mid").filter(F.col("u") < F.col("w"))
    canon = und.filter(F.col("src") < F.col("dst"))
    open_pairs = wedges.join(
        canon,
        (wedges.u == canon.src) & (wedges.w == canon.dst),
        "left_anti",
    )
    term = F.round(F.lit(1.0) / F.log(F.col("deg")), 12).cast(
        "decimal(28,12)"
    )
    scored = (
        open_pairs.join(deg, open_pairs.mid == deg.node)
        .groupBy(F.col("u").alias(src), F.col("w").alias(dst))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.round(F.sum(term), 6).cast("double").alias("aa_score"),
        )
    )
    return scored.orderBy(
        F.col("aa_score").desc(), F.col(src), F.col(dst)
    ).limit(k)
