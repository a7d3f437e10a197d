"""BPE training: the hand-computable Sennrich corpus, merge
application semantics, and segmentation-compression monotonicity."""

from __future__ import annotations

import pytest

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


def test_gpt2_byte_to_unicode_matches_published_table():
    """Pin the published bytes_to_unicode values (Radford et al. 2019):
    a bijection over all 256 bytes, identity on printable ASCII and
    most of Latin-1, and the 68 remaining bytes mapped to 256+n in
    order — space is 'Ġ' (U+0120), newline 'Ċ' (U+010A)."""
    from instagram_data_pipeline_spark.extensions.bpe import (
        gpt2_byte_to_unicode,
    )

    b2u = gpt2_byte_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert b2u[ord(" ")] == "Ġ" and ord("Ġ") == 0x120
    assert b2u[ord("\n")] == "Ċ" and ord("Ċ") == 0x10A
    assert b2u[ord("\t")] == "ĉ"
    assert b2u[0] == "Ā"          # first remapped byte -> 256
    assert b2u[127] == "ġ"        # DEL: first gap after the 0-32 run
    assert b2u[173] == chr(323)   # soft hyphen: the last remapped byte
    for b in range(ord("!"), ord("~") + 1):
        assert b2u[b] == chr(b)   # printable ASCII is identity
    assert b2u[255] == "ÿ"        # top of Latin-1 is identity


def test_byte_bpe_encode_matches_scan_reference(spark):
    """The chained-replace byte-level encode must equal a Python
    scan-based greedy BPE over the GPT-2 pre-tokens — including
    multi-byte UTF-8 (each byte its own symbol), leading-space Ġ
    tokens, consecutive-pair merges, and empty documents."""
    from instagram_data_pipeline_spark.extensions.bpe import (
        GPT2_PRETOKEN_RE,
        byte_bpe_encode,
        gpt2_byte_to_unicode,
    )

    b2u = gpt2_byte_to_unicode()
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"),
        ("Ġ", "o"), ("e", "r"), ("Ġo", "f"), ("t", "t"),
    ]
    texts = {
        1: "the theme of the inner other",
        2: "héllo wörld",          # multi-byte UTF-8
        3: "",
        4: "attt tttt",            # consecutive same-pair merges
        5: "it's 42 items, OK?",   # contractions / digits / punct
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in byte_bpe_encode(docs, merges).collect()}

    regex = pytest.importorskip("regex")  # \p{L} needs the regex module
    pat = regex.compile(GPT2_PRETOKEN_RE)

    def ref(text):
        toks = pat.findall(text)
        subs = []
        for t in toks:
            syms = [b2u[b] for b in t.encode("utf-8")]
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            subs.extend(syms)
        return toks, subs

    for doc_id, text in texts.items():
        toks, subs = ref(text)
        r = got[doc_id]
        assert r.n_pretokens == len(toks), (doc_id, r)
        assert r.n_subwords == len(subs), (doc_id, r)
        assert r.subword_text == " ".join(subs), (doc_id, r)
