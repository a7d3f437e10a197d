"""Dedup operator semantics: exact groups, Jaccard ground truth, and the
probabilistic ops (MinHash LSH, SimHash) validated against planted dupes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.dedup import (
    drop_exact_dups,
    exact_dedup,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word edit -> near-dup
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution and shuffles"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),          # exact dup of 1 (modulo nothing)
        (3, "  " + BASE.upper() + "!!  "),  # exact dup after normalization
        (4, NEAR),          # near-dup of 1
        (5, OTHER),
        (6, "tiny doc"),    # < 3 tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(corpus):
    groups = {r.keep_id: r.n_dups for r in exact_dedup(corpus, "doc_id", "text").collect()}
    assert groups[1] == 3  # 1, 2, 3 all normalize to the same fingerprint
    assert groups[4] == 1 and groups[5] == 1 and groups[6] == 1


def test_drop_exact_dups_keeps_lowest_id(corpus):
    kept = sorted(r.doc_id for r in drop_exact_dups(corpus, "doc_id", "text").collect())
    assert kept == [1, 4, 5, 6]


def test_ngram_jaccard_finds_planted_near_dup(corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, threshold=0.3).collect()
    }
    assert pairs[(1, 4)] > 0.5  # one-word edit keeps most shingles
    assert (1, 5) not in pairs and (4, 5) not in pairs
    # exact dups have jaccard exactly 1.0
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 3)] == 1.0 and pairs[(2, 3)] == 1.0


def test_minhash_lsh_recalls_near_dups(corpus):
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dups(corpus, threshold=0.5).collect()
    }
    # exact-dup pairs (jaccard 1.0) are guaranteed candidates: identical
    # signatures collide in every band
    assert {(1, 2), (1, 3), (2, 3)} <= got
    # the planted near-dup should be found too (high jaccard -> high band
    # collision probability with 8 bands of 4)
    assert (1, 4) in got
    # unrelated docs must be filtered by the exact-verify stage
    assert all(5 not in pair for pair in got)


def test_simhash_identical_docs_zero_hamming(corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dups(corpus, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0  # same token multiset
    assert pairs[(1, 4)] <= 10  # near-dup within hamming budget
    assert (1, 5) not in pairs


def test_simhash_pigeonhole_complete_vs_bruteforce(spark, corpus):
    """Banded candidate generation must find EVERY pair within max_hamming
    (pigeonhole: chunks = max_hamming + 1 disjoint bit ranges)."""
    from instagram_data_pipeline_spark.extensions.dedup import simhash

    sigs = {r.doc_id: r.simhash for r in simhash(corpus).collect()}
    for mh in (3, 8):
        want = {
            (a, b)
            for a in sigs
            for b in sigs
            if a < b and bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= mh
        }
        got = {
            (r.doc_a, r.doc_b)
            for r in simhash_near_dups(corpus, max_hamming=mh).collect()
        }
        assert got == want


def test_simhash_rejects_insufficient_chunks(corpus):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(corpus, max_hamming=8, chunks=4).collect()


def test_winnow_shared_run_guarantee(spark):
    """Winnowing guarantee: docs sharing a run of >= k + window - 1
    normalized chars share at least one fingerprint; a doc shorter than
    k yields none."""
    from instagram_data_pipeline_spark.extensions.dedup import (
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, "AAA " + shared + " BBB"),
            (2, "xyz prefix words " + shared + " other suffix"),
            (3, "completely unrelated content about columnar engines"),
            (4, "tiny"),  # < k chars after normalization -> no grams
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=16, window=8)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert by_doc[1] & by_doc[2], "shared 51-char run must share a fingerprint"
    assert not (by_doc[1] & by_doc.get(3, set()))
    assert 4 not in by_doc
    # deterministic across runs
    again = {}
    for r in winnow_fingerprints(docs, k=16, window=8).collect():
        again.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert again == by_doc


def test_jaccard_pairs_deterministic(corpus):
    a = sorted(map(tuple, ngram_jaccard_pairs(corpus, threshold=0.3).collect()))
    b = sorted(map(tuple, ngram_jaccard_pairs(corpus, threshold=0.3).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Cross-document duplicated spans (exact-substring dedup)
# ---------------------------------------------------------------------------


class TestDupSpanDetect:
    def _spans(self, spark, rows, **kw):
        from instagram_data_pipeline_spark.extensions.dedup import (
            dup_span_detect,
        )

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            (r.doc_id, r.span_start): (r.span_tokens, r.max_share)
            for r in dup_span_detect(df, **kw).collect()
        }

    def test_planted_shared_span_exact_boundaries(self, spark):
        shared = "alpha bravo charlie delta echo foxtrot golf hotel"
        rows = [
            (1, f"one two three {shared} four five"),
            (2, f"{shared} six seven eight nine ten"),
            (3, "unrelated words entirely different from everything here"),
        ]
        spans = self._spans(spark, rows, k=4, min_tokens=4)
        # doc 1: span starts after the 3 lead-in tokens, 8 tokens long
        assert spans[(1, 3)] == (8, 2)
        # doc 2: span at position 0
        assert spans[(2, 0)] == (8, 2)
        assert not any(d == 3 for d, _ in spans)

    def test_within_doc_repetition_not_flagged(self, spark):
        rep = "lorem ipsum dolor sit amet"
        rows = [
            (1, f"{rep} and then {rep} again"),
            (2, "something else entirely unrelated to the first document"),
        ]
        assert self._spans(spark, rows, k=4, min_tokens=4) == {}

    def test_min_tokens_filters_short_matches(self, spark):
        shared = "red green blue cyan"  # exactly 4 tokens shared
        rows = [
            (1, f"{shared} magenta yellow"),
            (2, f"black white {shared}"),
        ]
        assert self._spans(spark, rows, k=4, min_tokens=5) == {}
        spans = self._spans(spark, rows, k=4, min_tokens=4)
        assert spans[(1, 0)] == (4, 2)
        assert spans[(2, 2)] == (4, 2)

    def test_three_way_share_raises_max_share(self, spark):
        shared = "november oscar papa quebec romeo sierra"
        rows = [
            (i, f"doc number {i} prefix {shared} suffix {i}")
            for i in range(1, 4)
        ]
        spans = self._spans(spark, rows, k=4, min_tokens=6)
        # the true shared substring is "prefix <shared> suffix" (8
        # tokens): the surrounding scaffold words are identical across
        # docs too, and the operator must report the MAXIMAL span
        assert all(v == (8, 3) for v in spans.values())
        assert {s for _, s in spans} == {3}
        assert len(spans) == 3

    def test_two_disjoint_spans_stay_separate(self, spark):
        a = "uniform victor whiskey xray"
        b = "yankee zulu alpha beta"
        rows = [
            (1, f"{a} BREAK ONE {b}"),
            (2, f"{b} BREAK TWO {a}"),
        ]
        spans = self._spans(spark, rows, k=4, min_tokens=4)
        assert len(spans) == 4
        assert all(v == (4, 2) for v in spans.values())


# ---------------------------------------------------------------------------
# Incremental MinHash-LSH index (build / probe / append)
# ---------------------------------------------------------------------------


class TestLshIndex:
    @staticmethod
    def _build_probe(spark, corpus_rows, batch_rows, **kw):
        from instagram_data_pipeline_spark.extensions.dedup import (
            lsh_index_build,
            lsh_index_probe,
        )

        schema = "doc_id long, text string"
        corpus = spark.createDataFrame(corpus_rows, schema)
        batch = spark.createDataFrame(batch_rows, schema)
        sigs, idx = lsh_index_build(corpus)
        dec = lsh_index_probe(sigs, idx, batch, **kw)
        return corpus, batch, sigs, idx, dec

    def test_probe_drops_planted_dup_keeps_novel(self, spark):
        _, _, _, _, dec = self._build_probe(
            spark,
            [(1, BASE), (2, OTHER)],
            [(10, BASE), (11, NEAR), (12, "fresh unseen text about parquet "
                                          "row groups and column chunks")],
            threshold=0.5,
        )
        rows = {r.doc_id: r for r in dec.collect()}
        assert rows[10].decision == "drop" and rows[10].match_id == 1
        assert rows[10].est_jaccard == 1.0
        assert rows[11].decision == "drop" and rows[11].match_id == 1
        assert rows[12].decision == "keep" and rows[12].match_id is None

    def test_short_doc_kept_with_null_match(self, spark):
        _, _, _, _, dec = self._build_probe(
            spark, [(1, BASE)], [(10, "no")], threshold=0.5
        )
        r = dec.collect()[0]
        assert (r.decision, r.match_id, r.est_jaccard) == ("keep", None, None)

    def test_append_then_reprobe_self_matches(self, spark):
        from instagram_data_pipeline_spark.extensions.dedup import (
            lsh_index_append,
            lsh_index_probe,
        )

        corpus, batch, sigs, idx, dec = self._build_probe(
            spark,
            [(1, BASE)],
            [(10, OTHER), (11, BASE)],
            threshold=0.5,
        )
        first = {r.doc_id: r.decision for r in dec.collect()}
        assert first == {10: "keep", 11: "drop"}
        sigs2, idx2 = lsh_index_append(sigs, idx, batch, dec)
        # only the KEPT doc entered the index
        assert sorted(r.doc_id for r in sigs2.select("doc_id").collect()) == [1, 10]
        # a re-delivered batch now matches its indexed self at estimate 1.0
        redec = {
            r.doc_id: r
            for r in lsh_index_probe(
                sigs2, idx2, batch, threshold=0.5
            ).collect()
        }
        assert redec[10].decision == "drop" and redec[10].match_id == 10
        assert redec[10].est_jaccard == 1.0
        assert redec[11].decision == "drop" and redec[11].match_id == 1

    def test_hot_bucket_cap_bounds_candidates(self, spark):
        # 30 identical corpus docs form one hot band bucket per band;
        # max_bucket below 30 suppresses them, so the probe finds nothing
        corpus = [(i, BASE) for i in range(1, 31)]
        _, _, _, _, capped = self._build_probe(
            spark, corpus, [(100, BASE)], threshold=0.5, max_bucket=10
        )
        r = capped.collect()[0]
        assert r.decision == "keep" and r.match_id is None
        # generous cap: match returns, tie-break picks the lowest old id
        _, _, _, _, open_ = self._build_probe(
            spark, corpus, [(100, BASE)], threshold=0.5, max_bucket=50
        )
        r2 = open_.collect()[0]
        assert r2.decision == "drop" and r2.match_id == 1


# ---------------------------------------------------------------------------
# Duplicated-span REMOVAL (the consuming half of dup_span_detect)
# ---------------------------------------------------------------------------


class TestDupSpanRemove:
    @staticmethod
    def _clean(spark, rows, **kw):
        from instagram_data_pipeline_spark.extensions.dedup import (
            dup_span_remove,
        )

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            r.doc_id: (r.clean_text, r.n_removed)
            for r in dup_span_remove(df, **kw).collect()
        }

    SHARED = "alpha bravo charlie delta echo foxtrot"
    U1 = "one two three four five six seven"
    U2 = "red orange yellow green blue indigo violet"

    def test_keep_first_preserves_canonical_copy(self, spark):
        rows = [
            (1, f"{self.U1} {self.SHARED}"),
            (2, f"{self.SHARED} {self.U2}"),
        ]
        out = self._clean(spark, rows, k=4, min_tokens=4)
        # doc 1 is the canonical (lowest doc_id): untouched
        assert out[1] == (f"{self.U1} {self.SHARED}", 0)
        # doc 2 lost exactly the 6 shared tokens
        assert out[2] == (self.U2, 6)

    def test_keep_none_cuts_everywhere(self, spark):
        rows = [
            (1, f"{self.U1} {self.SHARED}"),
            (2, f"{self.SHARED} {self.U2}"),
        ]
        out = self._clean(spark, rows, k=4, min_tokens=4, keep="none")
        assert out[1] == (self.U1, 6)
        assert out[2] == (self.U2, 6)

    def test_doc_without_dups_is_identity(self, spark):
        rows = [(1, self.U1), (2, self.U2)]
        out = self._clean(spark, rows, k=4)
        assert out[1] == (self.U1, 0) and out[2] == (self.U2, 0)

    def test_full_duplicate_doc_empties_non_canonical(self, spark):
        rows = [(1, self.SHARED), (2, self.SHARED)]
        out = self._clean(spark, rows, k=4, min_tokens=4)
        assert out[1] == (self.SHARED, 0)
        assert out[2] == ("", 6)

    def test_three_copies_one_survivor(self, spark):
        rows = [
            (3, f"u3a u3b u3c u3d {self.SHARED} z3a z3b"),
            (5, f"{self.SHARED} w5a w5b w5c"),
            (9, f"m9a m9b {self.SHARED} n9c n9d"),
        ]
        out = self._clean(spark, rows, k=4, min_tokens=4)
        survivors = sorted(d for d, (t, _) in out.items() if self.SHARED in t)
        assert survivors == [3]  # lowest (doc_id, start) keeps the content
        assert out[5] == ("w5a w5b w5c", 6)
        assert out[9] == ("m9a m9b n9c n9d", 6)

    def test_reordered_pieces_split_into_aligned_groups(self, spark):
        # Junction grams of "U1 SHARED" vs "SHARED U1" are unshared, so
        # runs do NOT merge across the junction: each doc yields separate
        # U1 and SHARED runs, groups align by content, and doc 1 holds
        # both canonicals — doc 2 is fully cut.
        rows = [
            (1, f"{self.U1} {self.SHARED}"),
            (2, f"{self.SHARED} {self.U1}"),
        ]
        first = self._clean(spark, rows, k=4, min_tokens=4)
        assert first[1] == (f"{self.U1} {self.SHARED}", 0)
        assert first[2] == ("", 13)
        none = self._clean(spark, rows, k=4, min_tokens=4, keep="none")
        assert none[1] == ("", 13) and none[2] == ("", 13)

    def test_merged_extent_subcopy_over_retains_never_loses(self, spark):
        # Docs 1/2 share the junction, so their maximal run is the merged
        # U1+SHARED extent; doc 3 carries SHARED alone, a DIFFERENT
        # content group with itself as canonical. Result: doc 2 is cut
        # against doc 1, doc 3 survives untouched — SHARED is retained
        # twice (documented over-retention), but never lost: the
        # canonical of every content group survives by construction.
        rows = [
            (1, f"{self.U1} {self.SHARED}"),
            (2, f"{self.U1} {self.SHARED}"),
            (3, f"f3a f3b {self.SHARED} f3c"),
        ]
        out = self._clean(spark, rows, k=4, min_tokens=4)
        assert out[1] == (f"{self.U1} {self.SHARED}", 0)
        assert out[2] == ("", 13)
        assert out[3] == (f"f3a f3b {self.SHARED} f3c", 0)

    def test_invalid_keep_policy_raises(self, spark):
        import pytest as _pytest

        from instagram_data_pipeline_spark.extensions.dedup import (
            dup_span_remove,
        )

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            dup_span_remove(df, keep="banana").collect()


# ---------------------------------------------------------------------------
# Quality-aware canonical selection
# ---------------------------------------------------------------------------


def test_cluster_canonicals_by_score(spark):
    from instagram_data_pipeline_spark.extensions.dedup import (
        cluster_canonicals_by_score,
    )

    assign = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (7, 7), (8, 200), (9, 200)],
        "doc_id long, cluster long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.5), (9, 0.5)],
        "doc_id long, score double",
    )
    out = {
        r.doc_id: (r.canonical_id, r.is_canonical)
        for r in cluster_canonicals_by_score(assign, scores).collect()
    }
    # cluster 100: 2 and 3 tie at 0.9 -> lowest id 2 wins over higher-id 3
    assert out[1] == (2, False)
    assert out[2] == (2, True)
    assert out[3] == (2, False)
    # singleton is its own canonical
    assert out[7] == (7, True)
    # cluster 200: tie -> lowest id
    assert out[8] == (8, True) and out[9] == (8, False)


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment ~1 in the
    short direction while Jaccard stays tiny — the quote-inclusion case
    the asymmetric detector exists for."""
    from instagram_data_pipeline_spark.extensions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog near the river"
    filler = " ".join(f"word{i} token{i} item{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id long, text string",
    )
    cont = ngram_containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row.doc_a, row.doc_b) == (1, 2)
    assert row.containment_a >= 0.9  # A's shingles live inside B
    assert row.containment_b < 0.2
    # symmetric Jaccard at the usual 0.1 threshold misses the pair
    jac = ngram_jaccard_pairs(docs, threshold=0.1).collect()
    assert jac == []


def test_cdc_chunks_are_insertion_robust(spark):
    """THE content-defined-chunking property: inserting one word near
    the start of a document must leave every chunk after the edit's
    chunk byte-identical (boundaries depend only on local content), so
    shared passages keep their fingerprints across near-duplicates —
    exactly what fixed-size chunking cannot do."""
    import hashlib

    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.extensions.dedup import (
        cdc_chunk_stats,
    )

    words = [f"w{(i * 7919) % 1000:03d}" for i in range(400)]
    original = " ".join(words)
    edited = " ".join(words[:3] + ["zzinserted"] + words[3:])

    def ref_chunks(text, divisor=8):
        out, cur = [], []
        for w in text.split():
            cur.append(w)
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            if h % divisor == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    c_orig, c_edit = ref_chunks(original), ref_chunks(edited)
    # all chunks after the edited one are identical -> fingerprints too
    assert c_orig[1:] == c_edit[1:]
    assert c_orig[0] != c_edit[0]

    # and the operator agrees: in a corpus of the two docs, every chunk
    # except the two edited heads is a corpus-level duplicate
    docs = spark.createDataFrame(
        [(1, original), (2, edited)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in cdc_chunk_stats(docs).collect()}
    assert got[1].n_chunks == len(c_orig)
    assert got[2].n_chunks == len(c_edit)
    assert got[1].n_dup_chunks == len(c_orig) - 1
    assert got[2].n_dup_chunks == len(c_edit) - 1

    # empty doc: zero chunks, zero dup, dup_ppm 0 (no divide-by-zero)
    docs2 = spark.createDataFrame(
        [(1, "a b"), (2, "")], "doc_id long, text string"
    )
    empty = {r.doc_id: r for r in cdc_chunk_stats(docs2).collect()}[2]
    assert (empty.n_chunks, empty.n_dup_chunks, empty.dup_ppm) == (0, 0, 0)
