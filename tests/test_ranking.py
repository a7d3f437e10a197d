"""BM25 retrieval and bigram-LM perplexity: planted-relevance and
planted-fluency fixtures (the operator-level twins of the oracle
parity check in test_queries_oracle.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.ranking import (
    bigram_lm_scores,
    bm25_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_more_matching_terms_rank_higher(spark):
    docs = _docs(spark, [
        (1, "cat dog fish bird"),
        (2, "cat dog fish fish"),
        (3, "cat mouse mouse mouse"),
        (4, "mouse mouse mouse mouse"),
    ])
    got = bm25_topk(docs, ("cat", "dog", "fish"), k=4).collect()
    order = [r.doc_id for r in got]
    # doc 4 matches nothing -> absent entirely
    assert 4 not in order
    # docs 1/2 (3 distinct matches) beat doc 3 (1 match)
    assert set(order[:2]) == {1, 2} and order[2] == 3


def test_bm25_length_normalization(spark):
    # same tf for the query term; the shorter document scores higher
    docs = _docs(spark, [
        (1, "cat dog"),
        (2, "cat dog bird fish mouse horse goat pig cow hen"),
    ])
    got = {r.doc_id: r.score for r in bm25_topk(docs, ("cat",), k=2).collect()}
    assert got[1] > got[2]


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 of 5 docs, 'common' in all 5: the rare-term
    # doc must outrank a common-term-only doc at equal tf
    rows = [(i, "common filler words here") for i in range(1, 5)]
    rows.append((5, "rare filler words here"))
    docs = _docs(spark, [(i, t + " common") for i, t in rows[:4]]
                 + [(5, "rare filler words here common")])
    got = bm25_topk(docs, ("rare", "common"), k=5).collect()
    assert got[0].doc_id == 5


def test_lm_repetitive_doc_scores_more_fluent(spark):
    # "ab ab ab..." bigrams are all high-count; the shuffled-vocab doc's
    # bigrams are singletons -> higher avg negative log-likelihood
    rows = [(i, "a b a b a b a b") for i in range(1, 9)]
    rows.append((9, "q w e r t y u i"))
    got = {r.doc_id: r.avg_nll
           for r in bigram_lm_scores(_docs(spark, rows)).collect()}
    assert got[9] > got[1]
    assert all(math.isfinite(v) for v in got.values())


def test_lm_short_docs_excluded(spark):
    rows = [(1, "one"), (2, ""), (3, "two tokens here")]
    got = bigram_lm_scores(_docs(spark, rows)).collect()
    assert {r.doc_id for r in got} == {3}
    assert got[0].n_bigrams == 2


def test_dsir_target_like_docs_score_higher(spark):
    from pyspark.sql import functions as F

    from instagram_data_pipeline_spark.extensions.ranking import dsir_log_ratios

    # target slice speaks 'alpha beta'; raw background speaks 'gamma delta'.
    rows = (
        [(i, "alpha beta alpha beta", "en") for i in range(1, 5)]
        + [(i, "gamma delta gamma delta", "xx") for i in range(5, 9)]
        # held-out docs, one per dialect, NOT in the target slice:
        + [(20, "alpha beta alpha beta", "xx"),
           (21, "gamma delta gamma delta", "xx")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.avg_log_ratio
           for r in dsir_log_ratios(docs, F.col("lang") == "en").collect()}
    # the alpha-beta held-out doc resembles the target -> higher ratio
    assert got[20] > got[21]
    # and target members themselves score above background members
    assert got[1] > got[5]
    assert all(r is not None for r in got.values())


def test_hashed_tf_dense_form_feeds_the_ann_family(spark, sf_dir):
    from instagram_data_pipeline_spark.extensions.ranking import (
        hashed_tf,
        hashed_tf_vectors,
    )
    from instagram_data_pipeline_spark.extensions.similarity import (
        cosine_topk,
    )
    from instagram_data_pipeline_spark.io import load_testdata

    docs = load_testdata(spark, sf_dir, "documents").limit(60)
    dense = hashed_tf_vectors(docs, dim=64)
    row = dense.first()
    assert len(row.embedding) == 64
    # dense form agrees with long form entry-by-entry
    sparse = {(r.doc_id, r.bucket): r.v
              for r in hashed_tf(docs, dim=64).collect()}
    for r in dense.limit(5).collect():
        for b, val in enumerate(r.embedding):
            assert val == float(sparse.get((r.doc_id, b), 0))
    # and it is a drop-in embedding column for the similarity family
    corpus = dense.filter(F.col("doc_id") >= 5).withColumnRenamed(
        "doc_id", "vec_id"
    )
    queries = dense.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    top = cosine_topk(corpus, queries, k=3)
    assert top.count() == 3 * queries.count()


def test_hashed_tf_sign_independent_of_bucket(spark):
    """Regression: sign must come from a hash independent of the bucket
    hash. With pmod(h, 128) buckets (= low 7 bits of h) and the sign
    drawn from bit 6 OF THE SAME HASH, every bucket is monochromatic —
    colliding terms always cancel in the same direction and the
    unbiased-collision property of the hashing trick breaks. With an
    independent sign hash, a 400-term vocab at dim=128 (~3 terms per
    bucket) must produce at least one bucket holding both signs."""
    from instagram_data_pipeline_spark.extensions.ranking import hashed_tf

    docs = spark.createDataFrame(
        [(i, f"term{i}") for i in range(400)], "doc_id long, text string"
    )
    # one distinct term per doc -> each row's v IS that term's sign
    rows = hashed_tf(docs, dim=128).collect()
    signs_by_bucket: dict[int, set[int]] = {}
    for r in rows:
        signs_by_bucket.setdefault(r.bucket, set()).add(r.v)
    assert any(s == {1, -1} for s in signs_by_bucket.values())


def test_hashed_tf_identical_docs_identical_vectors(spark):
    from instagram_data_pipeline_spark.extensions.ranking import (
        hashed_tf_vectors,
    )

    docs = spark.createDataFrame(
        [(1, "spark joins data fast"), (2, "spark joins data fast"),
         (3, "completely different words here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: tuple(r.embedding)
           for r in hashed_tf_vectors(docs, dim=32).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_kneser_ney_context_distributions_sum_to_one(spark):
    """KN with the bigram-table context normalizer is a proper
    conditional distribution: for every context w1, sum_w2 p(w2|w1)
    == 1 exactly (up to float summation) — the invariant that breaks
    if the normalizer silently switches to unigram counts."""
    from instagram_data_pipeline_spark.extensions.ranking import (
        kneser_ney_prob_table,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "a cat and a dog and a bird"),
        ],
        "doc_id long, text string",
    )
    tbl = kneser_ney_prob_table(docs).collect()
    d = 0.75
    # reconstruct the full-vocabulary distribution: observed pairs carry
    # the discounted term, EVERY vocab word shares the backoff mass via
    # p_cont — so per context the total is
    #   sum_observed (c-D)/cctx  +  (D * n1f / cctx) * sum_vocab p_cont
    # and sum_vocab p_cont == 1 because continuation type counts sum to
    # the bigram type total.
    # recompute the pieces from raw bigrams to cross-check the table
    from collections import Counter

    corpus = [
        "the cat sat on the mat".split(),
        "the dog sat on the log".split(),
        "a cat and a dog and a bird".split(),
    ]
    cb = Counter()
    for ws in corpus:
        for i in range(len(ws) - 1):
            cb[(ws[i], ws[i + 1])] += 1
    cctx = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in cb.items():
        cctx[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    nt = len(cb)
    got = {(r.w1, r.w2): r.p for r in tbl}
    assert set(got) == set(cb)
    for (w1, w2), c in cb.items():
        expect = (c - d) / cctx[w1] + d * n1f[w1] / cctx[w1] * n1b[w2] / nt
        assert abs(got[(w1, w2)] - expect) < 1e-12, (w1, w2)
        assert 0.0 < got[(w1, w2)] <= 1.0
    # full-vocab normalization: discounted mass + backoff weight == 1
    for w1 in cctx:
        disc = sum(
            (c - d) / cctx[w1] for (a, _), c in cb.items() if a == w1
        )
        backoff = d * n1f[w1] / cctx[w1]
        assert abs(disc + backoff - 1.0) < 1e-12, w1


def test_kneser_ney_continuation_beats_raw_frequency(spark):
    """The KN signature: a word frequent only in ONE context (low
    continuation count) gets a smaller backoff share than a word seen
    after many distinct contexts, even at equal raw frequency."""
    from instagram_data_pipeline_spark.extensions.ranking import (
        kneser_ney_prob_table,
    )

    # 'francisco' appears 4x but only ever after 'san' (1 continuation
    # context); 'deal' appears 4x after 4 DISTINCT contexts.
    docs = spark.createDataFrame(
        [
            (1, "san francisco san francisco san francisco san francisco"),
            (2, "good deal bad deal new deal old deal"),
        ],
        "doc_id long, text string",
    )
    tbl = {(r.w1, r.w2): r for r in kneser_ney_prob_table(docs).collect()}
    n1b_francisco = [
        k for k in tbl if k[1] == "francisco"
    ]
    n1b_deal = [k for k in tbl if k[1] == "deal"]
    assert len(n1b_francisco) == 1 and len(n1b_deal) == 4


def test_score_calibration_equal_keep_rates_across_sources(spark):
    """The point of calibration: sources with disjoint absolute score
    ranges keep the same fraction each; a raw global threshold would
    have dropped the low-scoring source entirely."""
    from instagram_data_pipeline_spark.extensions.ranking import (
        per_source_score_calibration,
    )

    rows = [(i, "low", 100 + i) for i in range(40)] + [
        (100 + i, "high", 900_000 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score_ppm long")
    got = per_source_score_calibration(df, keep_rate_ppm=500_000).collect()
    kept = {"low": 0, "high": 0}
    for r in got:
        kept[r.source] += int(r.keep)
    assert kept == {"low": 20, "high": 5}  # floor(n/2) each, exactly
    # percentiles span 0..1e6 within each source
    pcts = sorted(r.pct_ppm for r in got if r.source == "low")
    assert pcts[0] == 0 and pcts[-1] == 1_000_000
    # the kept set is the TOP half by score within each source
    for r in got:
        if r.source == "low":
            assert r.keep == (r.score_ppm >= 100 + 20)


def test_phrase_search_overlap_and_normalization(spark):
    from instagram_data_pipeline_spark.extensions.ranking import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat sat mat"),
            (2, "The  CAT, sat!"),          # case/punct normalize to a hit
            (3, "cat cat cat"),              # overlapping "cat cat" x2
            (4, "sat cat"),                  # reversed: no hit
        ],
        "doc_id long, text string",
    )
    got = {
        (r.phrase, r.doc_id): r.n_hits
        for r in phrase_search(docs, ["cat sat", "cat cat"]).collect()
    }
    assert got[("cat sat", 1)] == 2
    assert got[("cat sat", 2)] == 1
    assert got[("cat cat", 3)] == 2      # overlapping matches both count
    assert ("cat sat", 4) not in got
