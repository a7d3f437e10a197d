"""WordPiece tokenization (BERT-style greedy longest-match-first) as a
pure codegen fold — the third tokenizer family next to BPE
(extensions/bpe.py, merge-replay) and unigram-LM (extensions/unigram.py,
Viterbi DP).

Algorithm (char-fallback variant): at each position take the LONGEST
vocab piece that matches — word-initial pieces match verbatim,
word-internal pieces carry the ``##`` continuation prefix; if nothing
matches, emit ``[UNK]`` and advance one character (the vocab below
always contains every single character, so the fallback only fires on
out-of-alphabet input). This differs from strict BERT (which rejects
the WHOLE word to [UNK] on first failure) — the char fallback is the
common production choice because it degrades gracefully; documented so
the oracle mirrors it exactly.

Scale shape: encoding is ``F.aggregate`` over a per-word index array —
whole-stage codegen, zero Python, zero shuffles; the vocab rides into
the plan as a literal array (a trained vocab is vocab-sized driver
state, same as BPE merge tables). The fold runs at most ``len(word)``
steps and each step is O(max_piece_len) membership probes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pieces(w: Column, pos: Column, j: Column) -> Column:
    frag = w.substr(pos + F.lit(1), j)
    return F.when(pos == 0, frag).otherwise(F.concat(F.lit("##"), frag))


def wordpiece_encode_expr(
    word: Column, vocab: list[str], max_piece_len: int = 8
) -> Column:
    """Array of WordPiece tokens for ``word`` — pure codegen.

    Empty strings encode to ``[]`` (guarded: ``sequence(1, 0)`` counts
    DOWN in Spark, the same edge fixed in unigram's Viterbi DP).
    """
    va = F.array(*[F.lit(v) for v in vocab])
    n = F.length(word)
    L = max_piece_len
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )

    def step(acc: Column, _: Column) -> Column:
        pos = acc["pos"]
        js = F.sequence(F.least(F.lit(L), n - pos), F.lit(1), F.lit(-1))
        found = F.filter(
            js, lambda j: F.array_contains(va, _pieces(word, pos, j))
        )
        # try_element_at: ANSI mode makes element_at THROW on an empty
        # array — the no-match fallback path must yield NULL instead
        first = F.try_element_at(found, F.lit(1))
        jj = F.coalesce(first, F.lit(1))
        pc = F.when(
            F.size(found) > 0, _pieces(word, pos, first)
        ).otherwise(F.lit("[UNK]"))
        return F.when(pos >= n, acc).otherwise(
            F.struct(
                (pos + jj).alias("pos"),
                F.concat(acc["parts"], F.array(pc)).alias("parts"),
            )
        )

    init = F.struct(
        F.lit(0).alias("pos"),
        F.array().cast("array<string>").alias("parts"),
    )
    return F.aggregate(idx, init, step)["parts"]


def wordpiece_encode(
    words: DataFrame,
    word_col: str,
    vocab: list[str],
    max_piece_len: int = 8,
    out_col: str = "pieces",
) -> DataFrame:
    """Attach the WordPiece token array for ``word_col``."""
    return words.withColumn(
        out_col,
        wordpiece_encode_expr(F.col(word_col), vocab, max_piece_len),
    )
