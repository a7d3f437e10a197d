"""Registry-order contract: the driver's correctness gate checks only the
first ``DRIVER_WINDOW`` entries of ``queries()``, so the order must be
explicit and every name accounted for (no import-side-effect ordering)."""

from __future__ import annotations

from instagram_data_pipeline_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY_ORDER,
    load_all,
)

# queries that MUST occupy the round-15 driver window (standing policy:
# changed-impl re-verifies first): one representative per r15
# optimization family + the r14 decimal-narrowing sites the r14 window
# never reached (VERDICT r14 Next #5).
PRIORITY = {
    # similarity norm hoists
    "cosine_topk", "embedding_near_dups", "semdedup_drops",
    "kmeans_clusters",
    # LM distinct-lp / SHUFFLE_HASH restructures
    "lm_perplexity", "lm_perplexity_interpolated",
    "lm_perplexity_kneser_ney", "curation_pipeline",
    # Generate-bound text kernels + spread-probe consumers
    "gopher_quality_filter", "readability_stats", "repetition_stats",
    "quality_gate", "lang_id", "pricing_summary",
    # ngram_jaccard restructure + the composed funnel
    "ngram_jaccard_pairs", "dedup_funnel_report",
    # pandas UDAF mapInPandas rewrite
    "pandas_group_summary",
    # VERDICT r14 Next #5 decimal-narrowing verification
    "mv_incremental_refresh", "stream_static_enrich", "bm25_topk",
    "dsir_weights", "label_centroids",
}


def test_order_is_exact_and_complete():
    reg = load_all()
    assert list(reg) == list(REGISTRY_ORDER), (
        "registered queries and REGISTRY_ORDER must match 1:1 — add new "
        "queries to REGISTRY_ORDER explicitly (placement decides driver "
        "evidence)"
    )


def test_priority_queries_inside_driver_window():
    window = set(list(load_all())[:DRIVER_WINDOW])
    assert PRIORITY <= window, sorted(PRIORITY - window)


# Queries that are rows-only BY NATURE (iterative argmax + list-fold is
# not SQL-expressible) but carry dedicated exact-value pytest evidence
# instead of an oracle twin. Keep this list justified: every entry must
# name the test module that pins its values. (Both are in-window for
# round 4, so the post-window oracle check below doesn't reach them —
# the allowlist stays for future rotations.)
POST_WINDOW_ROWS_ONLY_OK = {
    "bpe_merges",  # tests/test_bpe.py pins the exact merge sequence;
    #               hash-checked twin bpe_encode_tokens (r04+r05 green)
    # tests/test_unigram.py pins the EM vocab; twin unigram_encode_tokens
    # (r05 green, empty-word DP guard re-verified)
    "unigram_vocab",
    # tests/test_classifier.py pins planted-separable convergence, loss
    # decrease, partition-invariant determinism; twin
    # classifier_score_fixed (r05 green, 2nd row in the r6 window)
    "classifier_weights",
    # engine-specific xxhash64 signature tiers: portable md5 twins
    # (*_portable) are multi-round hash-green and stay CI-checked
    "minhash_near_dups",
    "simhash_near_dups",
    "cms_heavy_users",
    "approx_distinct_users",
    # two-stage PQ ANN trainer tier: hash-checked twin pq_adc_fixed
    # seated at the window's last slot (r06 green); k-means codebook
    # convergence pinned in tests/test_similarity.py
    "pq_topk",
    # iterative eigen-trainer tier, demoted ADJACENT to its
    # hash-checked twin pca_eig2_fixed (both r6+r7 driver-green);
    # tests/test_pca.py pins reconstruction + orthonormality
    "pca_components",
}



def test_demoted_queries_all_have_oracles():
    """Everything past the window must be hash-checkable in CI (pytest
    oracle twins) — or carry dedicated exact-value tests (explicit
    allowlist above); otherwise it has no evidence at all."""
    reg = load_all()
    for name in list(reg)[DRIVER_WINDOW:]:
        if name in POST_WINDOW_ROWS_ONLY_OK:
            continue
        assert reg[name].oracle is not None, name
