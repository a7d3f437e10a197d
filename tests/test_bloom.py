"""Bloom-filter join pruning: exactness vs plain semi-join, no false
negatives, and the prune actually prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from instagram_data_pipeline_spark.operators.bloom import (
    bloom_prune,
    bloom_semi_join,
    bloom_words,
)


def _frames(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("key"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 50).select((F.col("id") * 13 % 997).alias("key"))
    return fact, dim


def test_semi_join_exact(spark):
    fact, dim = _frames(spark)
    got = bloom_semi_join(fact, dim, "key", n_bits=1 << 12, k=4)
    want = fact.join(dim.dropDuplicates(), "key", "left_semi")
    assert sorted(got.collect()) == sorted(want.collect())


def test_no_false_negatives(spark):
    fact, dim = _frames(spark)
    words = bloom_words(dim, "key", n_bits=1 << 12, k=4)
    pruned = bloom_prune(fact, "key", words, n_bits=1 << 12, k=4)
    true_matches = fact.join(dim.dropDuplicates(), "key", "left_semi")
    # every true match survives the prune
    assert true_matches.exceptAll(pruned).count() == 0


def test_prune_reduces_rows(spark):
    fact, dim = _frames(spark)
    words = bloom_words(dim, "key", n_bits=1 << 12, k=4)
    pruned_n = bloom_prune(fact, "key", words, n_bits=1 << 12, k=4).count()
    fact_n = fact.count()
    match_n = fact.join(dim.dropDuplicates(), "key", "left_semi").count()
    # candidates sit between the true matches and the full table, and
    # the filter must do real work (dim covers ~5% of the key space, so
    # a sane filter kills the overwhelming majority of rows)
    assert match_n <= pruned_n < fact_n
    assert pruned_n < fact_n // 2


def test_empty_dim_prunes_everything(spark):
    fact, _ = _frames(spark)
    empty = fact.select("key").filter(F.lit(False))
    words = bloom_words(empty, "key", n_bits=1 << 12, k=4)
    assert bloom_prune(fact, "key", words, n_bits=1 << 12, k=4).count() == 0


def test_bitmap_mergeable(spark):
    """OR of two halves' bitmaps == bitmap of the union (monoid merge)."""
    _, dim = _frames(spark)
    a = dim.filter(F.col("key") < 400)
    b = dim.filter(F.col("key") >= 400)
    wa = bloom_words(a, "key", n_bits=1 << 12, k=4)
    wb = bloom_words(b, "key", n_bits=1 << 12, k=4)
    merged = [x | y for x, y in zip(wa, wb)]
    assert merged == bloom_words(dim, "key", n_bits=1 << 12, k=4)
