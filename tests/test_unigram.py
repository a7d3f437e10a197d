"""Unigram tokenizer: Viterbi exactness vs a pure-Python reference,
trainer determinism and coverage properties."""

from __future__ import annotations

import pytest

from instagram_data_pipeline_spark.extensions.unigram import (
    UNK_COST4,
    unigram_train,
    viterbi_segment,
    word_freqs,
)

BIG = 1_000_000


def ref_viterbi(word: str, vocab: dict[str, int], L: int):
    """Reference DP, independent implementation: returns (pieces, cost).
    Tie-break identical to the operator: min cost, then smallest j."""
    n = len(word)
    dp = [(0, 0)] + [(None, None)] * n
    for i in range(1, n + 1):
        best = None
        for j in range(1, min(L, i) + 1):
            piece = word[i - j:i]
            c = vocab.get(piece, UNK_COST4 if j == 1 else BIG)
            cand = (dp[i - j][0] + c, j)
            if best is None or cand < best:
                best = cand
        dp[i] = best
    pieces, pos = [], n
    while pos > 0:
        j = dp[pos][1]
        pieces.insert(0, word[pos - j:pos])
        pos -= j
    return pieces, dp[n][0]


VOCAB = {
    "win": 4, "dow": 4, "window": 9, "mill": 6, "wind": 5,
    "er": 3, "filt": 6, "s": 8, "ing": 5, "fil": 7, "ter": 7,
}


@pytest.fixture(scope="module")
def words(spark):
    docs = spark.createDataFrame(
        [
            (1, "window windmill filters windowing"),
            (2, "winter filter wind mill windows"),
            (3, "termite term"),
        ],
        "doc_id long, text string",
    )
    return word_freqs(docs)


def test_viterbi_matches_reference_on_every_word(words):
    got = {
        r.word: (list(r.pieces), r.cost4)
        for r in viterbi_segment(words, VOCAB, max_piece_len=6).collect()
    }
    for w in got:
        assert got[w] == ref_viterbi(w, VOCAB, 6), w


def test_viterbi_prefers_cheaper_split_over_whole_word(spark):
    # 'window' as win+dow costs 8 < the whole-word piece at 9
    df = spark.createDataFrame([("window", 1)], "word string, freq long")
    r = viterbi_segment(df, VOCAB, max_piece_len=6).collect()[0]
    assert list(r.pieces) == ["win", "dow"] and r.cost4 == 8


def test_viterbi_unknown_chars_fall_back_per_char(spark):
    df = spark.createDataFrame([("xyz", 1)], "word string, freq long")
    r = viterbi_segment(df, {"q": 1}, max_piece_len=4).collect()[0]
    assert list(r.pieces) == ["x", "y", "z"]
    assert r.cost4 == 3 * UNK_COST4


def test_viterbi_reconstruction_is_lossless(words):
    for r in viterbi_segment(words, VOCAB, max_piece_len=6).collect():
        assert "".join(r.pieces) == r.word


def test_trainer_deterministic_and_total(spark):
    docs = spark.createDataFrame(
        [(1, "window window window filter"), (2, "windmill filter window")],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, unigram_train(docs, vocab_size=10, iters=2,
                                 max_piece_len=6, seed_size=20).collect())
    )
    b = sorted(
        map(tuple, unigram_train(docs, vocab_size=10, iters=2,
                                 max_piece_len=6, seed_size=20).collect())
    )
    assert a == b and a
    pieces = {p for p, _, _ in a}
    # the dominant word survives as one piece; counts are positive
    assert "window" in pieces
    assert all(c > 0 for _, c, _ in a)
    # every piece re-derivable: final vocab segments the corpus without
    # hitting the unsegmentable sentinel
    vocab = {p: c4 for p, _, c4 in a}
    seg = viterbi_segment(word_freqs(docs), vocab, max_piece_len=6)
    assert all(r.cost4 < BIG for r in seg.collect())


def test_viterbi_empty_word_yields_empty_segmentation(spark):
    """sequence(1, 0) counts DOWN in Spark: a zero-length word must not
    run spurious DP steps (ADVICE r4) — it segments to [] at cost 0."""
    df = spark.createDataFrame([("",), ("ab",)], "word string")
    rows = {r.word: r for r in viterbi_segment(df, VOCAB).collect()}
    assert list(rows[""].pieces) == []
    assert rows[""].cost4 == 0
    assert rows["ab"].pieces  # non-empty words still segment
