"""BPE training: the hand-computable Sennrich corpus, merge
application semantics, and segmentation-compression monotonicity."""

from __future__ import annotations

from instagram_data_pipeline_spark.extensions.bpe import (
    bpe_segment_stats,
    bpe_train,
    word_symbol_table,
)


def _corpus(spark, words):
    return spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )


def test_bpe_sennrich_merge_sequence(spark):
    docs = _corpus(
        spark, ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    got = bpe_train(docs, n_merges=5)
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_repeated_symbol_merges_left_to_right(spark):
    # 'aaaa' -> pairs (a,a)x3; merge once -> [aa, aa, </w>] (greedy
    # left-to-right, no overlap), not [a, aa, a, ...]
    docs = _corpus(spark, ["aaaa"] * 2)
    m = bpe_train(docs, n_merges=1)
    assert m[0][1:3] == ("a", "a")
    from instagram_data_pipeline_spark.extensions.bpe import _apply_merge

    table = _apply_merge(word_symbol_table(docs), "a", "a")
    syms = table.collect()[0].syms
    assert syms == ["aa", "aa", "</w>"]


def test_bpe_compression_improves_with_merges(spark):
    docs = _corpus(
        spark, ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    m5 = bpe_train(docs, n_merges=5)
    none = bpe_segment_stats(docs, []).collect()[0]
    five = bpe_segment_stats(docs, m5).collect()[0]
    assert five.symbols_per_word < none.symbols_per_word
    assert five.n_words == none.n_words


def test_bpe_exhausts_gracefully(spark):
    # tiny corpus: fewer productive merges than requested -> stops early
    docs = _corpus(spark, ["ab", "ab"])
    m = bpe_train(docs, n_merges=50)
    assert 0 < len(m) <= 3  # a+b, ab+</w>, then nothing mergeable


def test_bpe_encode_greedy_overlap_and_rank_order(spark):
    """The chained-replace encode must match BPE's greedy left-to-right
    semantics: 'aaa' with merge (a,a) becomes [aa, a] (never [aa, aa]),
    and merges apply in rank order (later merges see earlier output)."""
    from instagram_data_pipeline_spark.extensions.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "spark spark"), (3, "merge"),
         (4, "aaaa"), (5, "abab")],
        "doc_id long, text string",
    )
    merges = [("a", "a"), ("a", "b"), ("s", "p"), ("sp", "a"), ("r", "k"),
              ("spa", "rk"), ("e", "</w>"), ("g", "e</w>")]
    got = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    assert got[1].subword_text == "aa a </w>"
    assert got[1].n_subwords == 3
    # full pipeline: s+p -> sp+a -> r+k -> spa+rk -> 'spark'
    assert got[2].subword_text == "spark </w> spark </w>"
    # rank order: e+</w> first, then g absorbs e</w>
    assert got[3].subword_text == "m e r ge</w>"
    assert got[3].n_words == 1 and got[3].n_subwords == 4
    # consecutive same-merge pairs must BOTH merge (a shared-delimiter
    # encoding would consume the boundary and skip every second pair)
    assert got[4].subword_text == "aa aa </w>"
    assert got[5].subword_text == "ab ab </w>"
