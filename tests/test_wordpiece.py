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


def test_reconstruction_property_seeded_batch(spark):
    """Length/content accounting over a seeded random batch: pieces
    with ## stripped concatenate back to the word wherever every char
    is in-vocab; [UNK] consumes exactly one character, so the length
    account holds even for out-of-alphabet input."""
    import random

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_"  # _ is out-of-vocab
    vocab = (
        [chr(c) for c in range(97, 123)]
        + [str(d) for d in range(10)]
        + ["##" + chr(c) for c in range(97, 123)]
        + ["##" + str(d) for d in range(10)]
        + ["sp", "spark", "##ark", "un", "##ed"]
    )
    words = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(60)
    })
    got = _enc(spark, words, vocab=vocab)
    for w in words:
        pieces = got[w]
        total = sum(
            1 if p == "[UNK]" else len(p.replace("##", "", 1))
            for p in pieces
        )
        assert total == len(w), (w, pieces)
        if "_" not in w:
            rebuilt = "".join(p.replace("##", "", 1) for p in pieces)
            assert rebuilt == w, (w, pieces)
        else:
            assert "[UNK]" in pieces
