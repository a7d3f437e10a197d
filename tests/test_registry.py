"""Registry-order contract: the driver's correctness gate checks only the
first ``DRIVER_WINDOW`` entries of ``queries()``, so the order must be
explicit and every name accounted for (no import-side-effect ordering)."""

from __future__ import annotations

from instagram_data_pipeline_spark.queries import (
    DRIVER_WINDOW,
    REGISTRY_ORDER,
    load_all,
)

# queries that MUST occupy the round-5 driver window: never driver-checked
# before (VERDICT r4 "What's missing" #1), oracle or implementation changed
# this round, or a rows-only tier whose portable twin must ride along
PRIORITY = {
    # never driver-checked: late-round-4 wave (VERDICT r4 Next #1)
    "contrastive_triplets", "pca_project_fixed", "pca_components",
    "bin_packing", "label_propagation", "classifier_score_fixed",
    "classifier_weights", "warc_roundtrip", "html_extract", "web_pipeline",
    "rate_limit_admission", "incremental_components", "readability_stats",
    "shard_source_mix", "dataset_card", "chunk_dedup", "lsh_quality_report",
    "ann_recall_report", "dedup_funnel_report",
    # oracle fixed (HUGEINT CAST) — re-verify (VERDICT r4 Next #2)
    "training_shards",
    # new registration (VERDICT r4 Next #3)
    "mutual_edges_salted",
    # implementation changed in round 5 (ADVICE #2/#4, VERDICT Next #5)
    "skew_report", "unigram_encode_tokens",
    # probabilistic tiers: rows-only + portable twin pairs (policy)
    "minhash_near_dups", "minhash_near_dups_portable",
    "simhash_near_dups", "simhash_near_dups_portable",
    "cms_heavy_users", "cms_heavy_users_portable",
    "approx_distinct_users", "approx_distinct_users_portable",
    "bpe_merges", "bpe_encode_tokens", "unigram_vocab", "pq_topk",
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
    "bpe_merges",  # tests/test_bpe.py pins the exact merge sequence
    "pq_topk",  # tests/test_similarity.py pins recall@5 >= 0.8 vs brute
    # tests/test_pca.py pins Gram-vs-numpy equality, planted-axis
    # recovery, orthonormality, and partition-invariant determinism;
    # the projection half is hash-checked via pca_project_fixed
    "pca_components",
    # tests/test_classifier.py pins planted-separable convergence,
    # loss decrease, and partition-invariant determinism; the scoring
    # half is hash-checked via classifier_score_fixed
    "classifier_weights",
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
