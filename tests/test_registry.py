"""Registry-order contract: the driver's correctness gate checks only the
first ``DRIVER_WINDOW`` entries of ``queries()``, so the order must be
explicit and every name accounted for (no import-side-effect ordering)."""

from __future__ import annotations

from instagram_data_pipeline_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY_ORDER,
    load_all,
)

# queries that MUST occupy the round-12 driver window: the first driver
# row for txlog_overwrite_sql (registered mid-r11 after that window was
# seated), the txlog SQL-statement set re-verifying the changed
# commit/validation path (constraints-in-manifest, replace_table fix,
# NOT NULL ADD rejection — VERDICT r11 #2 + ADVICE r11), the CDF read
# faces re-verifying the schema-evolution contract (VERDICT r11 #7),
# then the r5/r6-vintage cohorts — the oldest driver evidence in the
# registry — with twin pairs whole (VERDICT r11 Next #1)
PRIORITY = {
    # first driver row + changed-impl SQL-statement set
    "txlog_overwrite_sql",
    "txlog_merge_into_sql", "txlog_maintenance_sql",
    "txlog_insert_into_sql", "txlog_restore_sql", "txlog_ctas_sql",
    "txlog_alter_sql", "txlog_constraints_sql", "txlog_convert_sql",
    "txlog_update_sql", "txlog_delete_sql",
    # CDF faces: schema-evolution contract pinned this round
    "txlog_change_feed", "txlog_stream_changes", "txlog_changes_backfill",
    # r5-vintage remainder (oldest driver evidence)
    "stream_neardup_dedup", "multimodal_jpeg_stats", "dedup_keep_best",
    "multimodal_mjpeg_stats", "c4_line_filter", "dup_span_removal",
    # r6-vintage cohort, PQ twin pair whole
    "contrastive_triplets", "dup_spans", "html_extract",
    "incremental_components", "label_propagation", "pca_project_fixed",
    "pq_adc_fixed", "pq_topk", "rate_limit_admission", "warc_roundtrip",
    "web_pipeline", "wordpiece_encode_tokens",
    # r7 FIFO head: PCA rows-only tier seated WITH its hash-checked twin
    "pca_eig2_fixed", "pca_components",
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
