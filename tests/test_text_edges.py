"""Text/vector edge cases under ANSI mode: empty text and zero vectors
must yield NULL, never a DIVIDE_BY_ZERO error (DuckDB-aligned)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.similarity import (
    as_double_vec,
    cosine,
)
from instagram_data_pipeline_spark.functions import text as X


def test_empty_text_ratios_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "real text here"), (3, "!!!")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            X.punct_ratio(F.col("text")).alias("pr"),
            X.quality_score(F.col("text")).alias("q"),
            X.lang_id(F.col("text")).alias("lang"),
            X.token_count(F.col("text")).alias("n"),
        ).collect()
    }
    assert rows[1].pr is None  # NULL, no ANSI error
    # LEAST skips NULLs in BOTH engines -> empty text scores 0.0
    assert rows[1].q == 0.0
    assert rows[1].lang == "und"
    assert rows[3].pr == 1.0
    assert rows[2].n == 3


def test_zero_vector_cosine_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, v array<double>"
    )
    a = df.select(F.col("id"), F.col("v").alias("a"))
    rows = a.select(
        "id", cosine(F.col("a"), F.array(F.lit(1.0), F.lit(1.0))).alias("c")
    ).collect()
    got = {r.id: r.c for r in rows}
    assert got[1] is None
    assert got[2] == pytest.approx(0.7071067811865475)


def test_shingles_short_docs_empty_not_descending(spark):
    # sequence(1, 0) counts DOWN in Spark — the guard must return []
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")],
                               "doc_id long, text string")
    out = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", X.word_shingles(X.tokens(F.col("text")), 3).alias("sh")
        ).collect()
    }
    assert out[1] == []
    assert out[2] == ["a b c", "b c d"]


def test_dup_ngram_fraction_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "x"),                      # shorter than n -> 0.0
            (2, "a b a b a b"),            # bigrams: ab ba ab ba ab -> 2/5 uniq
            (3, "p q r s"),                # all bigrams unique -> 0.0
            (4, ""),                       # empty text -> 0.0
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.f
        for r in df.select(
            "doc_id", X.dup_ngram_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    assert out[1] == 0.0
    assert out[2] == pytest.approx(1 - 2 / 5)
    assert out[3] == 0.0
    assert out[4] == 0.0


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail me at Bob.Smith+x@Example.co.uk or call 555-1234 now")],
        "doc_id long, text string",
    )
    n_emails, n_phones = X.pii_counts(F.col("text"))
    r = df.select(
        X.redact_pii(F.col("text")).alias("t"),
        n_emails.alias("ne"),
        n_phones.alias("np"),
    ).collect()[0]
    assert r.t == "mail me at <EMAIL> or call <PHONE> now"
    assert r.ne == 1 and r.np == 1
