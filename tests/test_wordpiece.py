"""WordPiece greedy longest-match-first encode: precedence, ##
continuations, char fallback, empty-word guard."""

from __future__ import annotations

from instagram_data_pipeline_spark.extensions.wordpiece import (
    wordpiece_encode,
)

VOCAB = (
    [chr(c) for c in range(97, 123)]
    + ["##" + chr(c) for c in range(97, 123)]
    + ["sp", "spark", "un", "unw", "##ark", "##anted", "##ed", "##want"]
)


def _enc(spark, words, vocab=VOCAB, **kw):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    out = wordpiece_encode(df, "word", vocab, **kw)
    return {r.word: list(r.pieces) for r in out.collect()}


def test_longest_match_wins(spark):
    got = _enc(spark, ["spark"])
    # 'spark' (len 5) beats 'sp' (len 2) and 's'
    assert got["spark"] == ["spark"]


def test_continuation_prefix_and_greedy_walk(spark):
    got = _enc(spark, ["unwanted"])
    # greedy: 'unw' (longest initial) then '##anted'
    assert got["unwanted"] == ["unw", "##anted"]


def test_greedy_is_not_optimal_and_that_is_the_contract(spark):
    # 'sparkx': greedy takes 'spark' then '##x' — never backtracks
    got = _enc(spark, ["sparkx"])
    assert got["sparkx"] == ["spark", "##x"]


def test_char_fallback_emits_unk_and_advances(spark):
    # '7' is out of vocab: [UNK] for it, neighbors still encode
    got = _enc(spark, ["a7b"])
    assert got["a7b"] == ["a", "[UNK]", "##b"]


def test_empty_word_encodes_to_empty(spark):
    got = _enc(spark, [""])
    assert got[""] == []


def test_max_piece_len_caps_matching(spark):
    # with max_piece_len=3 'spark' can't match whole; greedy does
    # 'sp' ('spa' not in vocab) then '##ark'
    got = _enc(spark, ["spark"], max_piece_len=3)
    assert got["spark"] == ["sp", "##ark"]
