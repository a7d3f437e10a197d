"""U2 + the analysis lifecycle: validate model output, map category names
to ids, and upsert into the interests fact table.

Reference: validation drop of unknown categories
(``interest_analyzer.py:268-270``), name->id mapping via the dimension
dict (``:115-119``), upsert with refreshed confidence (``:275-280``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import following_profiles, pending_users
from ..operators.writes import upsert_keep_newest
from .categorizer import (
    MAIN_CATEGORIES,
    SUBCATEGORIES,
    Categorizer,
    categorize_following,
)


def default_categories(spark) -> DataFrame:
    """The reference's seeded taxonomy (18 main + 9 sub categories,
    interest_analyzer.py:40-110) with stable surrogate ids."""
    rows = []
    ids = {}
    for i, name in enumerate(MAIN_CATEGORIES, start=1):
        ids[name] = i
        rows.append((i, name, None, f"{name} related content"))
    for j, (name, parent) in enumerate(
        sorted(SUBCATEGORIES.items()), start=len(MAIN_CATEGORIES) + 1
    ):
        rows.append((j, name, ids[parent], f"{name} (sub of {parent})"))
    from ..schemas import INTEREST_CATEGORIES

    return spark.createDataFrame(rows, INTEREST_CATEGORIES)


def validate_results(
    results: DataFrame,
    users: DataFrame,
    interest_categories: DataFrame,
) -> DataFrame:
    """U2: keep only known categories (inner join doubles as the P8
    filter), resolve username -> user_id, default missing confidence to
    0.5. Output is interests-shaped (sans id/created_at)."""
    cats = F.broadcast(
        interest_categories.select("category_id", "category_name")
    )
    # fresh aliases break lineage: results is often derived FROM users
    # (profiles join), which would make username/user_id ambiguous
    user_map = users.select(
        F.col("user_id").alias("_uid"), F.col("username").alias("_uname")
    )
    return (
        results.withColumn(
            "confidence", F.coalesce(F.col("confidence"), F.lit(0.5))
        )
        .join(cats, results.category == cats.category_name, "inner")
        .join(user_map, F.col("username") == F.col("_uname"), "inner")
        .select(
            F.col("_uid").alias("user_id"),
            "category_id",
            F.col("confidence").alias("confidence_score"),
        )
    )


def analyze_pending_users(
    users: DataFrame,
    following: DataFrame,
    scrape_jobs: DataFrame,
    interests: DataFrame,
    interest_categories: DataFrame,
    categorizer: Categorizer | None = None,
    limit: int = 5,
    now: dt.datetime | None = None,
    next_id_start: int = 0,
) -> DataFrame:
    """The --mode analysis lifecycle (SURVEY §3.3): J3 pending anti-join
    -> J2 profile join -> U1 model batches -> U2 validation -> A1 upsert.
    Returns the new interests table contents."""
    ts = F.lit(now or dt.datetime(2024, 1, 1)).cast("timestamp")
    pending = pending_users(users, scrape_jobs, interests, limit=limit)
    # set-based version of the reference's per-user loop
    # (interest_analyzer.py:285-315): all pending users' following edges
    # flow through ONE model pass — same semantics, one job
    edges = following.join(
        pending.select("user_id"), "user_id", "left_semi"
    )
    profiles = following_profiles(edges, users).dropDuplicates(["username"])
    results = categorize_following(profiles, categorizer)
    validated = validate_results(results, users, interest_categories)
    incoming = (
        validated.dropDuplicates(["user_id", "category_id"])
        .withColumn("id", F.lit(None).cast("long"))
        .withColumn("created_at", ts)
        .select("id", "user_id", "category_id", "confidence_score", "created_at")
    )
    if incoming.isEmpty():
        return interests
    merged = upsert_keep_newest(
        interests,
        incoming,
        keys=["user_id", "category_id"],
        order_col="created_at",
    )
    return merged
