"""Record linkage / entity resolution with blocking — the standard
two-source dedup shape (Fellegi & Sunter 1969; the Magellan/dedupe.io
pipeline): candidate pairs come from an EQUALITY join on cheap blocking
keys (never a cartesian product), each candidate is scored with
per-field string similarities, and each dirty record keeps its best
match above a threshold.

Scale shape: the blocking join is an ordinary equi-join — shuffles on
the block key, co-locatable/bucketable like any other join, with
per-block cost |A_b| x |B_b| (choose blocking keys so blocks stay
bounded; a skewed block is a hot key like any other and salts the same
way). Scoring is whole-stage codegen (``levenshtein`` is a built-in in
both Spark and DuckDB); the best-match pick is one window over the
candidate set. Nothing leaves the JVM.

Similarities are integer per-mille (1000 - lev*1000 div maxlen) and the
weighted score uses integer division, so the match decision is
bit-identical across engines and replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_link(
    clean: DataFrame,
    dirty: DataFrame,
    block_cols: list[str],
    fields: list[tuple[str, str, int]],
    clean_id: str = "clean_id",
    dirty_id: str = "dirty_id",
    threshold_pm: int = 800,
) -> DataFrame:
    """Link each ``dirty`` record to its best ``clean`` match.

    ``fields`` is [(clean_col, dirty_col, weight)]; the candidate score
    is the weight-weighted integer mean of the per-field similarities.
    Returns ``(dirty_id, clean_id, score_pm)`` — one row per dirty
    record that cleared ``threshold_pm``, ties broken on the lowest
    clean id (deterministic)."""
    cand = clean.join(dirty, block_cols)
    total_w = sum(w for _, _, w in fields)
    num = None
    for ca, cb, w in fields:
        mx = F.greatest(F.length(ca), F.length(cb))
        sim = F.when(mx == 0, F.lit(1000)).otherwise(
            F.lit(1000)
            - F.expr(f"levenshtein({ca}, {cb}) * 1000 div "
                     f"greatest(length({ca}), length({cb}))")
        )
        term = sim * F.lit(w)
        num = term if num is None else num + term
    score = F.expr(
        f"CAST(_score_num div {total_w} AS BIGINT)"
    )
    w_best = Window.partitionBy(dirty_id).orderBy(
        F.col("score_pm").desc(), F.col(clean_id)
    )
    return (
        cand.withColumn("_score_num", num.cast("long"))
        .withColumn("score_pm", score)
        .filter(F.col("score_pm") >= threshold_pm)
        .withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .select(dirty_id, clean_id, "score_pm")
    )
