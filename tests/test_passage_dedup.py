"""Passage-level dedup: planted repeated spans across distinct docs."""

from __future__ import annotations

from instagram_data_pipeline_spark.extensions.dedup import passage_dedup


def _docs(spark):
    span = " ".join(f"w{i}" for i in range(10))  # one exact 10-word chunk
    rows = [
        (1, span + " unique alpha beta gamma"),
        (2, span + " other delta words here"),  # repeats doc 1's first chunk
        (3, "totally different text entirely"),
        (4, span),  # nothing but the repeated span
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_first_occurrence_wins(spark):
    out = {
        r["doc_id"]: r
        for r in passage_dedup(_docs(spark), chunk_size=10).collect()
    }
    # doc 1 keeps everything (it is the first occurrence)
    assert out[1]["n_chunks_kept"] == out[1]["n_chunks_total"] == 2
    assert out[1]["clean_text"].startswith("w0 w1")
    # doc 2 loses the repeated leading span, keeps its tail
    assert out[2]["n_chunks_total"] == 2
    assert out[2]["n_chunks_kept"] == 1
    assert out[2]["clean_text"] == "other delta words here"
    # doc 3 untouched
    assert out[3]["n_chunks_kept"] == 1
    # doc 4 is pure boilerplate -> emptied, but the row survives
    assert out[4]["n_chunks_kept"] == 0
    assert out[4]["clean_text"] == ""


def test_chunk_order_preserved(spark):
    text = " ".join(f"t{i}" for i in range(25))  # 3 chunks: 10+10+5
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    row = passage_dedup(df, chunk_size=10).collect()[0]
    assert row["n_chunks_total"] == 3
    assert row["clean_text"] == text


def test_contamination_report_planted(spark):
    from instagram_data_pipeline_spark.extensions.decontam import (
        contamination_report,
    )

    span = " ".join(f"e{i}" for i in range(5))  # a 5-gram from eval
    train = spark.createDataFrame(
        [
            (1, "clean words only nothing shared here at all"),
            (2, f"prefix {span} suffix words"),     # carries eval 5-gram
            (3, f"{span} {span}"),                  # repeated -> still distinct
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, f"intro {span} outro"), (101, f"again {span} here")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in contamination_report(train, eval_df, n=5).collect()
    }
    assert 1 not in got                      # clean doc absent
    assert got[2]["n_eval_docs"] == 2        # the span is in both eval docs
    assert got[2]["n_shared_shingles"] >= 1
    # doc 3: span twice + bridging shingles; the exact shared set is the
    # distinct overlap with eval shingles
    assert got[3]["n_eval_docs"] == 2


def test_passage_dedup_idempotent(spark):
    """A deduped corpus has no cross-doc repeated chunks left, so a
    second pass keeps everything (fixpoint after one application)."""
    import pyspark.sql.functions as F

    span = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, span + " unique alpha beta gamma"),
            (2, span + " other delta words here"),
            (3, span),
        ],
        ["doc_id", "text"],
    )
    once = passage_dedup(df, chunk_size=10).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = passage_dedup(once, chunk_size=10)
    for r in twice.collect():
        assert r["n_chunks_kept"] == r["n_chunks_total"], r
