"""Benchmark decontamination: find training documents that share long
word n-grams with a held-out eval set.

The standard pre-training hygiene pass (GPT-3 appendix C, PaLM, Llama):
an eval example is "contaminated" if its n-grams appear in training
text, so training docs carrying eval n-grams must be flagged/dropped.
The scalable shape is an inverted-index equi-join, NOT pairwise doc
comparison:

1. each side explodes into DISTINCT word n-gram shingles per doc
   (per-row array exprs, then one explode);
2. shingles join on their md5 — a hash equi-join whose fan-out is
   bounded by true shingle collisions (eval sets are small: the eval
   side broadcasts at real scale);
3. one aggregation rolls hits up to a per-training-doc report.

Everything is built-in exprs over the md5 portable hash, so the whole
pipeline is exactly reproducible in ANSI SQL (the oracle runs it
verbatim in DuckDB). No analog in the reference (ingest-side engine);
first-class for the 100 TB training-data mission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def doc_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, sh) rows: md5 of each DISTINCT n-word shingle of the doc.
    Distinct-per-doc BEFORE the explode (array_distinct on the per-row
    array) so repeated boilerplate inside one doc doesn't multiply join
    fan-out."""
    sh = F.array_distinct(X.word_shingles(X.tokens(F.col(text_col)), n))
    return df.select(
        F.col(id_col), F.explode(sh).alias("_sh")
    ).select(id_col, F.md5(F.col("_sh")).alias("sh"))


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per contaminated training doc: how many distinct eval shingles it
    carries and how many eval docs those span. Training docs with no
    overlap are absent (the clean 99%+ — at scale you anti-join this
    report against the corpus to drop/flag).

    Plan: shuffle on the 32-hex shingle hash (narrow rows), then one
    aggregation on the training doc id. With a realistically small eval
    side, Spark broadcasts it and the only shuffle is the final rollup.
    """
    t = doc_shingle_hashes(train, id_col, text_col, n)
    e = doc_shingle_hashes(eval_df, id_col, text_col, n).withColumnRenamed(
        id_col, "_eval_id"
    )
    return (
        t.join(e, "sh")
        .groupBy(id_col)
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
    )
