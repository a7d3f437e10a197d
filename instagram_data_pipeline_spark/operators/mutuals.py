"""Flagship operator: mutual-follower edges (J1).

Reference semantics (``instagram_scraper.py:428-435``)::

    INSERT INTO mutuals (user_id, mutual_id)
    SELECT f1.user_id, f1.follower_id
    FROM followers f1
    JOIN following f2
      ON f1.user_id = f2.user_id AND f1.follower_id = f2.following_id
    WHERE f1.user_id = %s
    ON CONFLICT (user_id, mutual_id) DO NOTHING

"accounts that follow user X which X also follows back" — a 2-key
conjunctive self-equi-join between the two edge tables, equivalently the
INTERSECT of their key-pair projections.

Spark-first design:
* Expressed as a plain inner equi-join on the composite key so Catalyst
  is free to pick broadcast-hash (selective per-user filter -> tiny side)
  or sort-merge (full-table derivation) with AQE skew-splitting for
  celebrity fan-out (SURVEY §7 risk 5).
* ``dropDuplicates`` runs *before* the join: the edge uniqueness contract
  makes it a no-op on clean data, but on raw ingest it shrinks the shuffle
  instead of multiplying matches.
* At 100 TB both edge tables should be bucketed/partitioned by
  ``user_id`` so the per-user variant never scans the full table and the
  full variant co-locates without an extra exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mutual_edges(
    followers: DataFrame,
    following: DataFrame,
    user_id: str | None = None,
) -> DataFrame:
    """Derive mutual edges: (user_id, mutual_id) present in both edge sets.

    ``followers`` has (user_id, follower_id); ``following`` has
    (user_id, following_id). Optional ``user_id`` reproduces the
    reference's per-user WHERE — the filter is applied to *both* sides so
    it pushes below the join into each scan.
    """
    f1 = followers.select("user_id", "follower_id")
    f2 = following.select("user_id", "following_id")
    if user_id is not None:
        f1 = f1.filter(F.col("user_id") == user_id)
        f2 = f2.filter(F.col("user_id") == user_id)
    f1 = f1.dropDuplicates(["user_id", "follower_id"])
    f2 = f2.dropDuplicates(["user_id", "following_id"])
    cond: Column = (f1.user_id == f2.user_id) & (f1.follower_id == f2.following_id)
    # SHUFFLE_HASH on the following side (guide §3.1): both sides are
    # already hash-partitioned on the join key by their dedup
    # aggregates, so sort-merge's only extra work is two full sorts —
    # the hash join skips them (r14: 1.74s -> 1.39s at sf0.1). AQE
    # cannot discover this one itself (its SMJ->SHJ rewrite only fires
    # when the join reads shuffle stages directly; here the dedup
    # aggregates sit in between). Scale-safe: the build side is one
    # post-shuffle partition of the deduped edge set — bounded by
    # partition sizing, and AQE skew-join splitting applies to
    # shuffled-hash joins too.
    return f1.join(f2.hint("shuffle_hash"), cond, "inner").select(
        f1.user_id.alias("user_id"), f1.follower_id.alias("mutual_id")
    )


def mutual_edges_salted(
    followers: DataFrame,
    following: DataFrame,
    salt: int = 8,
) -> DataFrame:
    """Salted twin of :func:`mutual_edges` for celebrity fan-out.

    AQE skew-splitting is the first line of defense; this is the manual
    fallback when one user's edge list is so hot that even split
    partitions overwhelm a task (SURVEY §7 risk 5). The followers side
    is spread over ``salt`` deterministic sub-keys and the following
    side replicated ``salt`` times (``operators.skew.salted_join``), so
    the hot key's rows land on ``salt`` tasks instead of one. Output is
    row-identical to ``mutual_edges`` — asserted on a skewed fixture in
    tests and hash-checked against the same SQL oracle as the plain
    form (salting must be semantics-invisible).

    Measured verdict (bench.py ``mutual_edges_skew_*``, BENCHNOTES.md):
    J1 itself is STRUCTURALLY skew-resistant — the join key is the
    composite (user_id, edge_id), which a celebrity fans out into
    distinct values, so the plain join beats this twin even under a
    150k-edge hot user and the ``salt``-times replication is pure
    overhead there. Reach for this ONLY when a single-column hot key is
    forced (per-user groupBys, single-key joins); for the composite-key
    join, plain + AQE is the right plan."""
    from .skew import salted_join

    f1 = followers.select("user_id", "follower_id").dropDuplicates(
        ["user_id", "follower_id"]
    )
    f2 = following.select(
        "user_id", F.col("following_id").alias("follower_id")
    ).dropDuplicates(["user_id", "follower_id"])
    out = salted_join(f1, f2, ["user_id", "follower_id"], salt=salt)
    return out.select("user_id", F.col("follower_id").alias("mutual_id"))


def mutual_edges_intersect(followers: DataFrame, following: DataFrame) -> DataFrame:
    """INTERSECT formulation (SURVEY §2.7) — oracle cross-check for J1.

    INTERSECT is set semantics, so it also deduplicates; Spark plans it as
    a left-semi join after aggregate — same shuffle shape as the join form.
    """
    a = followers.select(
        F.col("user_id"), F.col("follower_id").alias("mutual_id")
    )
    b = following.select(
        F.col("user_id"), F.col("following_id").alias("mutual_id")
    )
    return a.intersect(b)
