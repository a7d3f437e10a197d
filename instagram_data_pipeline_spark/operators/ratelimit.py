"""Per-key token-bucket rate limiting + deterministic retry jitter —
the engine-side form of the reference's T4/T5 controls
(instagram_pipeline/scraper/instagram_scraper.py:150-160 sleeps between
live requests; proxy_manager.py jitters retries). A data platform
applies the SAME policy as a replayable operator: given a request log,
decide deterministically which requests the budget admits and when the
rejected ones may retry — auditable, engine-checkable, and usable both
for batch replay (this module) and as the update function of a
stateful stream (the applyInPandasWithState shape of
streaming/stateful.py's quota gate).

Integer-exact bucket arithmetic: timestamps in epoch seconds, refill =
elapsed_seconds * rate (tokens/sec), all longs — the admission sequence
is bit-identical in any engine, so the SQL oracle replays it with a
recursive walk.

The per-key fold is sequential by nature (each admission changes the
tokens the next request sees) and runs as a codegen fold over a
time-sorted request array — same local-sequential/global-parallel
split as FFD bin packing; keys are independent.

Bounded at scale: the fold is segmented at RESET GAPS. Whenever two
consecutive requests of a key are ``>= capacity / rate`` seconds
apart, the refill (``elapsed * rate`` capped at ``capacity``) lands on
exactly ``capacity`` no matter what came before — the bucket state is
erased, so each gap-delimited segment replays independently from a
full bucket. A hot key's array is therefore bounded by its longest
*continuous* burst, not by the whole replay window; the optional
``max_segment`` guard turns a pathological never-idle key into a loud
error instead of a silent straggler task. Segmentation costs NO extra
shuffle: the groupBy on (key, segment) reuses the segment window's
hash partitioning on the key (subset-key clustering), so the whole
fold is still one exchange (verified in the plan audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_bucket_admission(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    rate: int = 1,
    capacity: int = 300,
    cost: int = 60,
    backoff: int = 60,
    jitter_max: int = 30,
    max_segment: int | None = None,
) -> DataFrame:
    """Replay a request log through per-key token buckets.

    Bucket starts FULL (capacity); before each request (time-sorted,
    ``id_col`` tiebreak) it refills ``elapsed * rate`` capped at
    ``capacity``; a request is admitted iff ``tokens >= cost`` and then
    pays ``cost``. Rejected requests get a deterministic
    ``retry_at = ts + backoff + md5(id) % jitter_max`` — hash jitter
    decorrelates retry storms with no RNG state (the T5 policy).

    The replay is segmented at reset gaps (``gap * rate >= capacity``
    refills to exactly ``capacity``, erasing prior state), so each
    segment folds independently from a full bucket and per-task memory
    is bounded by the longest continuous burst, not the replay window.
    ``max_segment`` (optional) raises a task error naming the key if
    any single burst exceeds it — the documented bound.

    Returns ``(key, id, ts_s, tokens_after, admitted, retry_at)``."""
    ts_s = F.col(ts_col).cast("long")
    reqs = df.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        ts_s.alias("_ts"),
    )
    seq = Window.partitionBy("_k").orderBy("_ts", "_id")
    reset = (
        (F.col("_ts") - F.lag("_ts").over(seq)) * F.lit(rate)
        >= F.lit(capacity)
    ).cast("int")
    segged = reqs.withColumn(
        "_seg", F.sum(F.coalesce(reset, F.lit(0))).over(seq)
    )
    per_key = segged.groupBy("_k", "_seg").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_ts"), F.col("_id")))
        ).alias("_rs")
    )
    if max_segment is not None:
        per_key = per_key.withColumn(
            "_guard",
            F.assert_true(
                F.size("_rs") <= max_segment,
                F.format_string(
                    "token_bucket_admission: key %s has a continuous "
                    "burst of %d requests (> max_segment "
                    f"{max_segment}); raise max_segment or shorten "
                    "the replay window",
                    F.col("_k").cast("string"),
                    F.size("_rs"),
                ),
            ),
        ).filter(F.col("_guard").isNull()).drop("_guard")

    def step(acc, r):
        refill = (r["_ts"] - acc["prev_ts"]) * rate
        filled = F.least(
            F.lit(capacity),
            acc["tokens"] + F.greatest(refill, F.lit(0)),
        )
        ok = filled >= cost
        after = F.when(ok, filled - cost).otherwise(filled)
        dec = F.struct(
            r["_id"].alias("id"),
            r["_ts"].alias("ts_s"),
            after.alias("tokens_after"),
            ok.alias("admitted"),
        )
        return F.struct(
            r["_ts"].alias("prev_ts"),
            after.alias("tokens"),
            F.concat(acc["out"], F.array(dec)).alias("out"),
        )

    init = F.struct(
        F.element_at("_rs", 1)["_ts"].alias("prev_ts"),
        F.lit(capacity).cast("long").alias("tokens"),
        F.array()
        .cast(
            "array<struct<id:long,ts_s:long,tokens_after:long,"
            "admitted:boolean>>"
        )
        .alias("out"),
    )
    folded = per_key.select(
        "_k", F.aggregate("_rs", init, step)["out"].alias("_out")
    )
    jitter = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long"),
        jitter_max,
    )
    return (
        folded.select("_k", F.explode("_out").alias("d"))
        .select(
            F.col("_k").alias(key_col),
            F.col("d.id").alias(id_col),
            "d.ts_s",
            "d.tokens_after",
            "d.admitted",
        )
        .withColumn(
            "retry_at",
            F.when(
                ~F.col("admitted"),
                F.col("ts_s") + F.lit(backoff) + jitter,
            ),
        )
    )


def admission_summary(decisions: DataFrame, key_col: str) -> DataFrame:
    """(key, n_requests, n_admitted, n_rejected) rollup of a replay."""
    return decisions.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum(F.col("admitted").cast("long")).alias("n_admitted"),
        F.sum((~F.col("admitted")).cast("long")).alias("n_rejected"),
    )
