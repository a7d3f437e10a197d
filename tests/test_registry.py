"""Registry-order contract: the driver's correctness gate checks only the
first ``DRIVER_WINDOW`` entries of ``queries()``, so the order must be
explicit and every name accounted for (no import-side-effect ordering)."""

from __future__ import annotations

from instagram_data_pipeline_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY_ORDER,
    load_all,
)

# queries that MUST occupy the round-6 driver window: the round-6
# promote queue (VERDICT r5 Next #3 — the 19 new-r5 queries with no
# lifetime driver row + dup_spans + event_transitions), the
# changed-implementation re-verifies, and this round's new registrations
PRIORITY = {
    # the round-6 promote queue (VERDICT r5 "What's missing" #1)
    "tokenizer_fertility", "blocklist_filter", "crawl_frontier",
    "stream_event_transitions", "curation_pipeline",
    "classifier_quality_report", "anchor_text_index", "ann_filtered_topk",
    "temperature_sample_wor", "langid_confusion",
    "lm_perplexity_interpolated", "community_stats",
    "cross_source_contamination", "event_rate_spikes",
    "dedup_cluster_histogram", "lsh_band_stats", "bloom_fp_report",
    "keyset_page", "scd2_as_of", "dup_spans", "event_transitions",
    # implementation/output changed in round 6 — re-verify in-window
    # (pca_project_fixed: ARRAY -> scalar p0..p3, VERDICT r5 Next #1;
    # temperature_sample_wor is in the queue above and ALSO changed:
    # largest-remainder quotas, ADVICE r5 #4)
    "pca_project_fixed",
    # new registrations this round (VERDICT r5 Next #6/#7)
    "pca_eig2_fixed", "txlog_retention_lookup",
    # rows-only trainer adjacent to its new hard twin (policy)
    "pca_components",
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
