"""BPE tokenizer training as DataFrame aggregations (Sennrich et al.
2016) — the tokenizer-side operator a training-data engine needs
beyond counting (functions.text.bpe_tokens counts with a FIXED
pre-tokenizer; this trains the merge table itself).

Shape: classic BPE trains on the WORD-FREQUENCY table, not the corpus
— after one tokenize+count pass (vocabulary-sized, Zipf-small), every
merge iteration runs on ``(word-as-symbol-array, count)`` rows. Each
iteration is one explode+sum to score adjacent pairs, one 1-row argmax
(the merge decision — collected driver-side exactly like the ledger
control batches: a deliberate, tiny, documented control-flow read),
and one in-row fold to apply the merge. No shuffles grow with corpus
size; the corpus is touched once.

Determinism: ties on pair count break lexicographically, so the merge
sequence — and therefore the whole tokenizer — is reproducible across
runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X

END = "</w>"


def word_symbol_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(syms array<string>, cnt) — each distinct word as its character
    sequence plus the end-of-word marker, weighted by corpus count."""
    words = (
        docs.select(F.explode(X.tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = F.concat(
        F.split(F.col("w"), ""),  # chars
        F.array(F.lit(END)),
    )
    return words.select(syms.alias("syms"), "cnt")


def _pair_counts(table: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies, weighted by word count."""
    n = F.size("syms")
    pairs = table.select(
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                F.slice("syms", 2, F.greatest(n - 1, F.lit(0))).alias("b"),
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("cnt").alias("n"))


def _apply_merge(table: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with the merged symbol, left to
    right, inside each word — an in-row fold, no shuffle."""
    merged = a + b
    fold = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return table.select(fold.alias("syms"), "cnt")


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(rank, left, right,
    pair_count)] in merge order. The returned list IS the tokenizer
    (apply ranks greedily = standard BPE encode)."""
    table = word_symbol_table(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(table)
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0].a, best[0].b, best[0].n
        merges.append((rank, a, b, n))
        table = _apply_merge(table, a, b).localCheckpoint()
    return merges


def bpe_segment_stats(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained merge list to the word table and report the
    resulting segmentation: (n_words, n_symbols, symbols_per_word) —
    the compression the tokenizer achieves on this corpus."""
    table = word_symbol_table(docs, text_col)
    for _, a, b, _n in merges:
        table = _apply_merge(table, a, b)
    return table.agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.size("syms") * F.col("cnt")).alias("n_symbols"),
        F.round(
            F.sum(F.size("syms") * F.col("cnt")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("symbols_per_word"),
    )


def apply_merges_expr(word: F.Column, merges: list[tuple[str, str]]) -> F.Column:
    """Encode ONE word column with a fixed merge list, as a pure string
    expression — the corpus-tokenization (encode) side of BPE, built so
    it runs identically in any engine:

    * the word becomes a FULLY-WRAPPED symbol string
      ``(c)(h)(a)(r)(s)(</w>)`` — each symbol in its own parens (the
      normalized alphabet is [a-z0-9], so parens are unambiguous).
      Wrapping matters: a shared-delimiter encoding like ``|a|b|``
      makes consecutive occurrences share their boundary character, so
      left-to-right replacement skips every second pair (``abab`` with
      merge (a,b) would give [ab, a, b], not BPE's [ab, ab]);
    * each merge (a, b) in rank order is one
      ``replace('(a)(b)', '(ab)')`` — adjacent matches share no
      characters, so non-overlapping left-to-right replacement IS
      greedy BPE pairing (``(a)(a)(a)(a)(a)`` -> ``(aa)(aa)(a)``), and
      one pass per merge is exhaustive because replacing (a,b) with the
      new symbol ``ab`` can never create another literal (a,b)
      adjacency;
    * chained replaces = merges applied in rank order — the standard
      encode, property-tested against a scan-based reference
      implementation in tests/test_codecs_properties.py.

    Map-only whole-stage codegen: tokenizing a corpus with a trained
    tokenizer is a scan-fused projection, no shuffle, no Python. (At
    100 TB one would first encode the DISTINCT word table and broadcast-
    join it back — same expression, amortized over word frequency.)
    """
    r = F.concat(
        F.lit("("), F.regexp_replace(word, "(.)", "$1)("), F.lit(f"{END})")
    )
    for a, b in merges:
        r = F.replace(r, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
    return r


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_subwords, subword_text): every document
    re-tokenized with the given merge table. ``subword_text`` is the
    space-joined subword stream (with </w> markers), the exact input a
    token-id lookup or packing stage consumes."""
    toks = X.tokens(F.col(text_col))
    piped = F.transform(
        toks,
        lambda w: F.replace(
            F.btrim(apply_merges_expr(w, merges), F.lit("()")),
            F.lit(")("),
            F.lit(" "),
        ),
    )
    joined = F.array_join(piped, " ")
    n_sub = F.size(F.filter(F.split(joined, " "), lambda s: s != ""))
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_words"),
        n_sub.cast("int").alias("n_subwords"),
        joined.alias("subword_text"),
    )


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2 style; Radford et al. 2019, public): the
# encoding every modern open LLM dump actually uses. Differences from
# the word-level trainer above: (1) the unit is the BYTE, lifted into
# printable unicode via the published bytes_to_unicode table so merges
# operate on ordinary strings; (2) no </w> end marker — the leading
# space becomes part of the token (byte 0x20 -> 'Ġ'); (3) the
# pre-tokenizer is the published GPT-2 regex, not whitespace split.
# The merge application reuses the wrapped-symbol chained-replace fold
# (apply_merges_expr's argument), with \x01/\x02 wrappers because the
# byte alphabet's image contains '(' and ')'.
# ---------------------------------------------------------------------------

#: the published GPT-2 pre-tokenizer pattern (Java-regex flavor; the
#: (?!\S) lookahead keeps the final space of a run attached to the
#: following word)
GPT2_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)


def gpt2_byte_to_unicode() -> dict[int, str]:
    """The published GPT-2 bytes_to_unicode table: printable ASCII and
    most of Latin-1 map to themselves; the remaining 68 bytes map to
    256+n in order — every byte becomes exactly one printable unicode
    char, so byte sequences round-trip through ordinary strings."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_B2U = gpt2_byte_to_unicode()


def byte_alphabet_expr(col: F.Column) -> F.Column:
    """Lift a UTF-8 string column into the GPT-2 byte alphabet with
    FULL byte fidelity, in pure codegen: encode to UTF-8 bytes, decode
    those bytes as ISO-8859-1 (one char per byte, always valid), then
    one 256-entry translate to the published byte->unicode table. A
    multi-byte UTF-8 char correctly becomes multiple byte-symbols —
    the actual GPT-2 behavior, not an ASCII approximation."""
    src = "".join(chr(b) for b in range(256))
    dst = "".join(_B2U[b] for b in range(256))
    return F.translate(
        F.decode(F.encode(col, "UTF-8"), "ISO-8859-1"), src, dst
    )


def apply_byte_merges_expr(
    tok: F.Column, merges: list[tuple[str, str]]
) -> F.Column:
    """Greedy BPE encode of ONE byte-alphabet token as a chained-
    replace expression (the apply_merges_expr argument, restated for
    byte symbols): each symbol is individually wrapped
    ``\\x01sym\\x02`` — \\x01/\\x02 are control bytes OUTSIDE the byte
    alphabet's image, so wrapping is unambiguous for every possible
    symbol (the image contains '(' and ')', which rules out the paren
    wrapper the word-level encoder uses). Each merge (a, b) is one
    ``replace('\\x01a\\x02\\x01b\\x02' -> '\\x01ab\\x02')``: adjacent
    matches share no characters, so left-to-right replacement IS the
    greedy pairing, and one pass per merge is exhaustive. Returns the
    space-joined subword string for the token."""
    r = F.regexp_replace(tok, "(.)", "\x01$1\x02")
    for a, b in merges:
        r = F.replace(
            r, F.lit(f"\x01{a}\x02\x01{b}\x02"), F.lit(f"\x01{a}{b}\x02")
        )
    return F.replace(
        F.btrim(r, F.lit("\x01\x02")), F.lit("\x02\x01"), F.lit(" ")
    )


def byte_bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_pretokens, n_subwords, subword_text): GPT-2-style encode
    of every document — published pre-tokenizer regex, byte->unicode
    lift, greedy merge replay. Map-only whole-stage codegen: no
    shuffle, no Python in the hot path. (At 100 TB: encode the DISTINCT
    pretoken table once and broadcast-join it back — same expressions,
    amortized over token frequency.)"""
    pretoks = F.regexp_extract_all(
        F.col(text_col), F.lit(GPT2_PRETOKEN_RE), 0
    )
    encoded = F.transform(
        pretoks, lambda t: apply_byte_merges_expr(byte_alphabet_expr(t), merges)
    )
    joined = F.array_join(encoded, " ")
    n_sub = F.size(F.filter(F.split(joined, " "), lambda s: s != ""))
    return docs.select(
        F.col(id_col),
        F.size(pretoks).cast("int").alias("n_pretokens"),
        n_sub.cast("int").alias("n_subwords"),
        joined.alias("subword_text"),
    )
