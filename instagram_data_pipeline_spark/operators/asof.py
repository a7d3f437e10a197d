"""As-of (backward) joins and time-range joins — the temporal operators
Spark lacks as built-ins (SURVEY §2.12 / task north star).

An as-of join attaches, to each left row, the most recent right row for
the same key with ``right_ts <= left_ts`` (optionally within a
tolerance). The naive formulation is a non-equi range join — a
broadcast nested loop that dies at scale. The scalable shape used here
is the **union + window** plan:

1. tag left and right rows, union them into one frame;
2. one window per key ordered by (ts, tag): ``last_value`` of the right
   payload with ``ignoreNulls`` carries the latest right row forward;
3. keep the left rows; enforce the tolerance with a final filter.

Cost: ONE shuffle on the key (the window), no pair explosion — the same
plan shape a sort-merge as-of join would produce natively. DuckDB has a
native ASOF JOIN, which makes the operator exactly oracle-checkable
against an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row with the same
    ``on`` key — ``direction="backward"`` (default) takes the latest
    right row with ``right_ts <= left_ts``; ``direction="forward"`` the
    earliest right row with ``right_ts >= left_ts`` (e.g. time-to-next-
    conversion). Both are the same one-shuffle union + window plan, the
    forward form just orders the window descending.

    Ties (right_ts == left_ts) match, mirroring DuckDB ASOF semantics.
    When several right rows share the same timestamp, the pick is
    deterministic (extreme of (ts, *right_cols) order); callers wanting
    a specific tie rule should dedup the right side per (key, ts) first.
    Unmatched left rows survive with NULL right columns (left-outer
    semantics); a ``tolerance_us`` turns matches farther than the
    tolerance back into NULLs.

    Output: all left columns, then ``right_ts + suffix`` and each of
    ``right_cols`` suffixed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    fwd = direction == "forward"
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    l_tag = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        )
    ).withColumn("_ord", F.col(left_ts))
    r_tag = (
        right.select(F.col(on), F.col(right_ts).alias("_ord"),
                     payload.alias("_payload"))
        .withColumn("_is_left", F.lit(0))
    )
    # align columns for the union: left keeps its full row
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    merged = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # order: timestamp (reversed for forward), then right-before-left at
    # equal ts (ties match in both directions), then the payload itself
    # for determinism among equal right ts
    order = (
        [F.col("_ord").desc(), F.col("_is_left").asc(), F.col("_payload").desc()]
        if fwd
        else [F.col("_ord").asc(), F.col("_is_left").asc(), F.col("_payload").asc()]
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_us is not None:
        gap = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_match._ts"))
        fresh = (-gap if fwd else gap) <= tolerance_us
        out = out.withColumn(
            "_match", F.when(fresh, F.col("_match"))
        )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("_match._ts").alias(right_ts + suffix))
    sel += [F.col(f"_match.{c}").alias(c + suffix) for c in right_cols]
    return out.select(*sel)


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    on: str | None = None,
) -> DataFrame:
    """Point-in-interval range join without a nested loop: intervals are
    exploded onto the fixed-width buckets they overlap, points hash to
    their bucket, and the match becomes a bucket equi-join plus a cheap
    residual predicate. Fan-out per interval = interval_width /
    bucket_width — pick the width near the median interval length.

    Optional ``on`` adds an equality key to the join (bucket AND key).
    Returns all left columns + all right columns (inner join).
    """
    lo_b = (F.col(right_lo) / bucket_width).cast("long")
    hi_b = (F.col(right_hi) / bucket_width).cast("long")
    r_exp = right.withColumn("_bucket", F.explode(F.sequence(lo_b, hi_b)))
    l_b = left.withColumn(
        "_bucket", (F.col(left_point) / bucket_width).cast("long")
    )
    keys = ["_bucket"] + ([on] if on else [])
    return (
        l_b.join(r_exp, keys)
        .filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) <= F.col(right_hi))
        )
        .drop("_bucket")
    )


def multitouch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key_col: str = "user_id",
    conv_ts: str = "ts",
    touch_ts: str = "ts",
    conv_id: str = "event_id",
    touch_id: str = "click_id",
    value_col: str = "value",
    window: str = "1 hour",
    position_weighted: bool = False,
) -> DataFrame:
    """Multi-touch attribution: every touch inside ``window`` before a
    conversion shares its value — linear (equal split) by default, or
    U-shaped-ish position weighting (first and last touch get double
    weight) with ``position_weighted``.

    The generalization of the as-of join's last-touch model: one
    equi-join on the key carries the shuffle (per-key touch lists are
    small relative to the corpus; a celebrity key with millions of
    touches would ride the same AQE/salting path as the mutuals join),
    the time window is a residual predicate, and weights come from ONE
    count/rank window per conversion — no second shuffle, the join
    output is already partitioned by conversion.

    Weight arithmetic: weights are exact rationals (1/n, or
    num/denominator in position mode) materialized as doubles by a
    single division — cross-engine deterministic; credited value rounds
    at 6 after multiplying.
    """
    c = conversions.select(
        F.col(key_col).alias("_k"),
        F.col(conv_ts).alias("_cts"),
        F.col(conv_id).alias("_cid"),
        F.col(value_col).alias("_val"),
    )
    t = touches.select(
        F.col(key_col).alias("_k"),
        F.col(touch_ts).alias("_tts"),
        F.col(touch_id).alias("_tid"),
    )
    j = c.join(t, "_k").filter(
        (F.col("_tts") <= F.col("_cts"))
        & (F.col("_tts") > F.col("_cts") - F.expr(f"INTERVAL {window}"))
    )
    w = Window.partitionBy("_k", "_cid")
    wo = w.orderBy(F.col("_tts"), F.col("_tid"))
    n = F.count(F.lit(1)).over(w)
    if position_weighted:
        r = F.row_number().over(wo)
        num = F.when((r == 1) | (r == n), F.lit(2)).otherwise(F.lit(1))
        den = F.when(n == 1, F.lit(2)).when(n == 2, F.lit(4)).otherwise(n + 2)
        weight = num.cast("double") / den.cast("double")
    else:
        weight = F.lit(1.0) / F.count(F.lit(1)).over(w).cast("double")
    return j.select(
        F.col("_k").alias(key_col),
        F.col("_cid").alias(conv_id),
        F.col("_tid").alias(touch_id),
        F.round(weight, 9).alias("weight"),
        F.round(F.col("_val") * F.round(weight, 9), 6).alias("credited"),
    )
