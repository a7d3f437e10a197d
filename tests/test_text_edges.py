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


def test_c4_line_filter_rules(spark):
    """Each C4 keep-rule individually: terminal punctuation, min words,
    javascript/cookie markers; NULL lines drop."""
    from pyspark.sql import functions as F

    from instagram_data_pipeline_spark.functions.text import c4_line_filter

    lines = [
        "a good long sentence.",          # kept
        "ends with question?",            # dropped: 3 words? "ends","with","question?" -> 3 words, kept
        "short.",                         # dropped: < 3 words
        "no terminal punctuation here",   # dropped: no . ! ?
        "please enable javascript now.",  # dropped: marker
        "we use cookie banners here.",    # dropped: marker
        "Mixed CASE JavaScript ends.",    # dropped: marker, case-insensitive
        "three word line!",               # kept
    ]
    df = spark.createDataFrame([(lines,)], "ls array<string>")
    got = df.select(c4_line_filter(F.col("ls")).alias("kept")).first().kept
    assert got == [
        "a good long sentence.",
        "ends with question?",
        "three word line!",
    ]
    # NULL element never survives
    df2 = spark.createDataFrame(
        [(["fine long sentence.", None],)], "ls array<string>"
    )
    assert df2.select(
        c4_line_filter(F.col("ls")).alias("k")
    ).first().k == ["fine long sentence."]


class TestHtmlToText:
    @staticmethod
    def _clean(spark, html):
        from instagram_data_pipeline_spark.functions.text import html_to_text

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(html_to_text(F.col("h")).alias("t")).collect()[0].t

    def test_script_style_comments_dropped(self, spark):
        got = self._clean(
            spark,
            "<p>keep</p><script>var x = '<p>fake</p>';</script>"
            "<style>p { display: none }</style><!-- secret -->done",
        )
        assert "fake" not in got and "secret" not in got
        assert "display" not in got
        assert got == "keep\ndone"

    def test_block_tags_become_lines_inline_tags_do_not(self, spark):
        got = self._clean(
            spark,
            "<div>first</div><p>a <b>bold</b> word</p><span>tail</span>",
        )
        assert got == "first\na bold word\ntail"

    def test_entities_decode_once_in_order(self, spark):
        # &amp;lt; must decode to the literal text "&lt;", NOT to "<"
        got = self._clean(spark, "<p>&amp;lt; and &lt; and &amp;</p>")
        assert got == "&lt; and < and &"

    def test_whitespace_collapses_and_empty_lines_drop(self, spark):
        got = self._clean(
            spark, "<p>a   b</p>\n\n<p>   </p><p>c</p>"
        )
        assert got == "a b\nc"


class TestReadabilityEntropy:
    @staticmethod
    def _one(spark, text, fn):
        df = spark.createDataFrame([(text,)], "text string")
        return df.select(fn(F.col("text")).alias("v")).collect()[0].v

    def test_sentence_and_syllable_floors(self, spark):
        from instagram_data_pipeline_spark.functions import text as X

        assert self._one(spark, "no punctuation here", X.sentence_count) == 1
        assert self._one(spark, "One. Two! Three?", X.sentence_count) == 3
        # one vowel-run word ('y' counts) -> exactly 1
        assert self._one(spark, "rhythm", X.syllable_estimate) == 1
        # vowel-less word floors at the word count
        assert self._one(spark, "pfft", X.syllable_estimate) == 1

    def test_flesch_orders_simple_above_dense(self, spark):
        from instagram_data_pipeline_spark.functions import text as X

        simple = "The cat sat. The dog ran. It was fun."
        dense = (
            "notwithstanding institutional interdependencies "
            "characteristically obfuscate multidimensional "
            "organizational heterogeneity considerations"
        )
        assert self._one(spark, simple, X.flesch_score) > self._one(
            spark, dense, X.flesch_score
        )

    def test_char_entropy_extremes(self, spark):
        import math

        from instagram_data_pipeline_spark.functions import text as X

        # single repeated char -> 0 bits
        assert self._one(spark, "aaaa aaaa", X.char_entropy) == 0.0
        # uniform over 4 chars -> exactly 2 bits
        assert self._one(spark, "abcd", X.char_entropy) == 2.0
        # all 36 chars once -> log2(36) (float-sum tolerance: 36-term
        # accumulation differs from math.log2 in the last bits)
        full = "abcdefghijklmnopqrstuvwxyz0123456789"
        assert abs(
            self._one(spark, full, X.char_entropy) - math.log2(36)
        ) < 1e-12
        # natural-ish prose sits between
        mid = self._one(
            spark, "the quick brown fox jumps over the lazy dog",
            X.char_entropy,
        )
        assert 3.0 < mid < 5.0


class TestMojibake:
    def test_repair_fixes_known_damage(self, spark):
        from instagram_data_pipeline_spark.functions.text import (
            mojibake_hits,
            repair_mojibake,
        )

        damaged = "naÃ¯ve cafÃ© â€œquoteâ€™ Â· end"
        clean = "naïve café “quote’ · end"
        df = spark.createDataFrame([(damaged,), (clean,), ("plain",)], "t string")
        rows = df.select(
            mojibake_hits(F.col("t")).alias("h"),
            repair_mojibake(F.col("t")).alias("r"),
        ).collect()
        assert rows[0].h == 5 and rows[0].r == clean
        # already-clean text: no hits, repair is identity
        assert rows[1].h == 0 and rows[1].r == clean
        assert rows[2].h == 0 and rows[2].r == "plain"

    def test_table_order_trigraphs_first(self):
        from instagram_data_pipeline_spark.functions.text import MOJIBAKE_TABLE

        lens = [len(bad) for bad, _ in MOJIBAKE_TABLE]
        assert lens == sorted(lens, reverse=True)


class TestDedupLines:
    def test_keeps_first_occurrence_in_order(self, spark):
        from instagram_data_pipeline_spark.functions.text import dedup_lines

        df = spark.createDataFrame(
            [(["a", "b", "a", "c", "b", "a"],), ([],), (["x"],)],
            "L array<string>",
        )
        rows = df.select(dedup_lines(F.col("L")).alias("K")).collect()
        assert rows[0].K == ["a", "b", "c"]
        assert rows[1].K == []
        assert rows[2].K == ["x"]
