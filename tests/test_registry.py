"""Registry-order contract: the driver's correctness gate checks only the
first ``DRIVER_WINDOW`` entries of ``queries()``, so the order must be
explicit and every name accounted for (no import-side-effect ordering)."""

from __future__ import annotations

from instagram_data_pipeline_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY_ORDER,
    load_all,
)

# queries that MUST occupy the round-8 driver window: the new
# format-lifecycle queries, the changed-implementation re-verifies
# (formats.py grew column mapping + deletion vectors + the ADVICE r7
# fixes; adamic_adar gained the hub-degree cap), and second lifetime
# rows for the round-7 first-row singles (VERDICT r7 Missing #1)
PRIORITY = {
    # new round-8 format-lifecycle queries
    "txlog_rename_evolution", "txlog_delete_vectors",
    "txlog_changes_backfill",
    # implementation changed in round 8 — re-verify in-window
    "adamic_adar",
    "txlog_zonemap_scan", "txlog_compact", "txlog_zorder_scan",
    "txlog_minmax_pushdown", "txlog_change_feed", "txlog_bloom_lookup",
    "txlog_datasource_scan", "txlog_stream_changes",
    "txlog_retention_lookup", "txlog_count_pushdown",
    # second lifetime rows for the round-7 first-row singles
    "gopher_quality_filter", "byte_bpe_encode_tokens",
    "late_data_accounting", "grouping_sets_revenue", "record_linkage",
    "semdedup_drops", "hll_merge_rollup", "phrase_search",
    "mad_outliers", "stream_outer_attribution", "cdc_chunk_stats",
    "json_schema_infer",
    # the two second rows round 7 explicitly deferred
    "mutual_edges_salted", "dataset_card",
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
