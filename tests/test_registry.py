"""Registry-order contract: the driver's correctness gate checks only the
first ``DRIVER_WINDOW`` entries of ``queries()``, so the order must be
explicit and every name accounted for (no import-side-effect ordering)."""

from __future__ import annotations

from instagram_data_pipeline_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY_ORDER,
    load_all,
)

# queries that MUST occupy the round-3 driver window: no driver row yet
# (VERDICT r2 "What's missing" #1), new this round, or oracle-upgraded
PRIORITY = {
    # text / dedup / sampling family — registered after slot 50 in r2
    "dedup_exact", "doc_fingerprint", "token_stats", "bpe_token_stats",
    "text_quality", "lang_id", "lang_source_rollup", "winnow_fingerprint",
    "ngram_jaccard_pairs", "tfidf_top_terms", "token_packing",
    "stratified_sample", "mixture_sample",
    # model path, temporal joins, ledger tail
    "keyword_categorize", "validate_interests", "asof_attribution",
    "range_band_join", "daily_quota_admission", "ledger_assign_ids",
    "ledger_both_complete", "ledger_delete_failed",
    # new in round 3
    "stream_stream_attribution", "multimodal_image_stats",
    "dedup_clusters", "cube_revenue", "continuous_rollup",
    "asof_forward_attribution", "multimodal_frame_sample",
    "minhash_near_dups_portable", "cms_heavy_users_portable",
    "simhash_near_dups_portable",
    # rows-only -> hash oracle upgrades in round 3
    "connected_components", "embedding_near_dups_bucketed",
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


# Post-window queries that are rows-only BY NATURE (iterative argmax +
# list-fold is not SQL-expressible) but carry dedicated exact-value
# pytest evidence instead of an oracle twin. Keep this list justified:
# every entry must name the test module that pins its values.
POST_WINDOW_ROWS_ONLY_OK = {
    "bpe_merges",  # tests/test_bpe.py pins the exact merge sequence
    "pq_topk",  # tests/test_similarity.py pins recall@5 >= 0.8 vs brute
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
