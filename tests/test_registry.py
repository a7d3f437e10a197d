"""Registry-order contract: the driver's correctness gate checks only the
first ``DRIVER_WINDOW`` entries of ``queries()``, so the order must be
explicit and every name accounted for (no import-side-effect ordering)."""

from __future__ import annotations

from instagram_data_pipeline_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY_ORDER,
    load_all,
)

# queries that MUST occupy the round-11 driver window: the SQL-surface
# completion set needing first driver rows (plus the merge re-verify
# the exact r10 budget couldn't hold, and the alter/ctas changed-impl
# re-verifies from the ADVICE r10 fixes), then the r4-vintage cohort —
# the oldest driver evidence in the registry — and the r5 FIFO head
# with twin pairs whole (VERDICT r10 Next #1)
PRIORITY = {
    # SQL-surface set: merge re-verify + 7 first-driver-row queries
    "txlog_merge_into_sql", "txlog_maintenance_sql",
    "txlog_insert_into_sql", "txlog_restore_sql", "txlog_ctas_sql",
    "txlog_alter_sql", "txlog_constraints_sql", "txlog_convert_sql",
    # r4-vintage cohort heads (full 25 seated; spot-pin one per family)
    "pagerank", "bm25_topk", "semantic_dedup", "leakage_safe_split",
    "quantile_sketch", "snapshot_diff", "scd2_history",
    "multitouch_attribution", "multimodal_audio_stats",
    "connected_components", "url_frequency_cap", "constraint_report",
    # r5 FIFO head: rows-only tiers seated WITH their hash-checked twins
    "classifier_score_fixed", "classifier_weights",
    "unigram_encode_tokens", "unigram_vocab",
    "bpe_encode_tokens", "bpe_merges",
    "minhash_near_dups_portable", "minhash_near_dups",
    "simhash_near_dups_portable", "simhash_near_dups",
    "cms_heavy_users_portable", "cms_heavy_users",
    "approx_distinct_users_portable", "approx_distinct_users",
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
