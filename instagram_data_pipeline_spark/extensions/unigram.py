"""Unigram-LM (SentencePiece-style) subword tokenizer: Viterbi encoder
plus a hard-EM trainer — the OTHER major subword algorithm besides BPE
(Kudo 2018, "Subword Regularization"; the reference repo tokenizes
nothing — interest extraction delegates whole posts to GPT-4,
instagram_pipeline/analysis/interest_analyzer.py — so this lives in the
§2.12 training-data extension family beside extensions/bpe.py).

Design for scale:

* The DP runs over DISTINCT WORDS, not tokens: corpus text reduces to a
  (word, freq) table first, so a trillion-token corpus with a 10^7-word
  vocabulary does 10^7 DPs, not 10^12 — then encoded words join back to
  documents by equality. Each DP is a per-row higher-order expression
  (whole-stage codegen, zero Python, zero shuffle).
* Piece costs are INTEGERS (cost4 = round(-4 * log2 p)): integer sums
  are exact and engine-portable, so Viterbi argmin (min cost, then
  shortest-piece-first tiebreak) is bit-identical in SQL — the encoder
  is hash-checkable against a DuckDB recursive-CTE replay.
* The trainer is hard EM (Viterbi counts instead of forward-backward
  expectations): segment -> recount -> prune -> renormalize, a bounded
  driver loop like k-means (similarity.kmeans_centroids_train) and BPE
  (bpe.bpe_train). The vocab table (<= vocab_size rows, the model
  parameters) is collected once per round to re-enter the codegen DP as
  literals — the k-means-centroid analog of a bounded control-plane
  read.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as X

UNK_COST4 = 60  # single-char fallback: -4*log2(p_unk), p_unk = 2^-15
_BIG = 1_000_000  # unsegmentable multi-char piece


def word_freqs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the normalized corpus — the input of both the
    trainer and the encoder. One explode + one count shuffle."""
    return (
        df.select(F.explode(X.tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _piece_cost(sub: Column, j: Column, vocab_map: Column) -> Column:
    known = F.element_at(vocab_map, sub)
    return F.coalesce(
        known, F.when(j == 1, F.lit(UNK_COST4)).otherwise(F.lit(_BIG))
    )


def viterbi_segment(
    words: DataFrame,
    vocab: dict[str, int],
    word_col: str = "word",
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi-segment each word under integer piece costs: appends
    ``pieces array<string>`` and ``cost4 long``.

    The DP is one ``aggregate`` over character positions carrying the
    prefix-cost/backpointer table, then one backward fold reconstructs
    the argmin segmentation — all inside whole-stage codegen. Ties
    break (min cost, then SMALLEST backpointer j = shortest final
    piece), mirrored exactly by the SQL oracle's ORDER BY cost, j."""
    if not vocab:
        raise ValueError("viterbi_segment: empty vocab")
    vocab_map = F.create_map(
        *[F.lit(x) for kv in sorted(vocab.items()) for x in kv]
    )
    L = max_piece_len
    w = F.col(word_col)
    n = F.length(w)
    # sequence(1, 0) yields the DESCENDING array [1, 0] — a zero-length
    # word must fold over an empty index array (dp stays at init,
    # pieces = [], cost = 0), not run spurious DP steps
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )

    # dp: index p+1 holds struct(c = best cost of prefix p, j = piece
    # length ending that prefix); index 1 = (0, 0)
    def step(acc: Column, i: Column) -> Column:
        cands = F.transform(
            F.sequence(F.lit(1), F.least(F.lit(L), i)),
            lambda j: F.struct(
                (
                    F.element_at(acc, i - j + 1)["c"]
                    + _piece_cost(F.substring(w, i - j + 1, j), j, vocab_map)
                ).alias("c"),
                j.alias("j"),
            ),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    dp = F.aggregate(
        idx,
        F.array(F.struct(F.lit(0).alias("c"), F.lit(0).alias("j"))),
        step,
    )

    # backward walk: n folds of (pos -> pos - dp[pos+1].j), prepending
    # the piece; no-ops once pos reaches 0
    def back(acc: Column, _: Column) -> Column:
        pos = acc["pos"]
        j = F.element_at(F.col("_dp"), pos + 1)["j"]
        return F.when(
            pos <= 0, acc
        ).otherwise(
            F.struct(
                (pos - j).alias("pos"),
                F.concat(
                    F.array(F.substring(w, pos - j + 1, j)), acc["parts"]
                ).alias("parts"),
            )
        )

    walked = F.aggregate(
        idx,
        F.struct(
            n.alias("pos"), F.array().cast("array<string>").alias("parts")
        ),
        back,
    )
    return (
        words.withColumn("_dp", dp)
        .withColumn("pieces", walked["parts"])
        .withColumn(
            "cost4", F.element_at(F.col("_dp"), n + 1)["c"].cast("long")
        )
        .drop("_dp")
    )


def unigram_init_vocab(
    words: DataFrame,
    max_piece_len: int = 8,
    seed_size: int = 100,
) -> DataFrame:
    """Seed vocabulary: every single character, plus the ``seed_size``
    most frequent multi-char substrings of corpus words (frequency
    weighted). One explode of O(len * max_piece_len) substrings per
    distinct word, one count shuffle."""
    subs = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda j: F.substring(F.col("word"), i, j),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("count"))
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("count").desc(), "piece")
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def _costs4(vocab_counts: list[tuple[str, int]]) -> dict[str, int]:
    """count -> integer cost4 = round(-4 * log2(count / total))."""
    total = sum(c for _, c in vocab_counts) or 1
    return {
        p: max(1, round(-4 * math.log2(c / total)))
        for p, c in vocab_counts
        if c > 0
    }


def unigram_train(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 60,
    iters: int = 3,
    max_piece_len: int = 8,
    seed_size: int = 100,
) -> DataFrame:
    """Hard-EM unigram trainer: seed with frequent substrings, then
    repeat (Viterbi-segment the word table under current costs ->
    recount pieces by corpus frequency -> keep single chars plus the
    ``vocab_size`` best multi-char pieces -> renormalize).

    Per round: one codegen segmentation pass over distinct words, one
    piece-count shuffle, one <= vocab_size collect (the model — see
    module docstring). Returns (piece, count, cost4) of the final
    vocabulary, deterministic for a fixed corpus."""
    # the word table stays DISTRIBUTED (10^7 rows at corpus scale);
    # localCheckpoint truncates lineage so each EM round re-reads the
    # materialized table instead of re-tokenizing the corpus
    words = word_freqs(df, id_col, text_col).localCheckpoint()
    vocab_rows = [
        (r.piece, r["count"])
        for r in unigram_init_vocab(words, max_piece_len, seed_size).collect()
    ]
    for _ in range(iters):
        costs = _costs4(sorted(vocab_rows))
        seg = viterbi_segment(words, costs, max_piece_len=max_piece_len)
        counts = (
            seg.select(
                "freq", F.explode("pieces").alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("freq").alias("count"))
        )
        chars = counts.filter(F.length("piece") == 1)
        multi = (
            counts.filter(F.length("piece") > 1)
            .orderBy(F.col("count").desc(), "piece")
            .limit(vocab_size)
        )
        vocab_rows = [
            (r.piece, r["count"])
            for r in chars.unionByName(multi).collect()
        ]
    costs = _costs4(sorted(vocab_rows))
    out = sorted(
        (p, c, costs[p]) for p, c in vocab_rows if p in costs
    )
    return df.sparkSession.createDataFrame(
        out, "piece string, count long, cost4 int"
    )
