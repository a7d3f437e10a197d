"""Query registry: every operator exposed as a named (spark_fn, oracle_sql)
pair over the driver testdata tables.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine's DataFrame-API
implementation; ``oracle`` is the equivalent ANSI SQL DuckDB runs on the
same parquet (None for ops SQL can't express — the driver then records a
rows-only check). Column names/aliases MUST match between the two sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: Optional[str], doc: str = "", tags: tuple[str, ...] = ()
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, tags)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver check-window budget
# ---------------------------------------------------------------------------
# The driver's correctness gate runs the FIRST 50 entries of ``queries()`` in
# dict order against the DuckDB oracle; everything after slot 50 gets no
# driver-issued evidence that round.  ``REGISTRY_ORDER`` therefore controls —
# explicitly, not by import side-effect — exactly which queries occupy the
# window.  Standing policy (established round 4, VERDICT r3 #1/#5):
# never-driver-checked queries come first; every rows-only probabilistic
# tier sits NEXT TO its hash-checked portable twin so each family ships
# one hard row per round; queries whose ORACLE or IMPLEMENTATION changed
# this round re-verify in-window even if previously green; remaining
# slots give once-green queries a second lifetime row and seat the
# round's new queries.  Multi-round-green queries demote past the window
# — all of them stay oracle-checked every CI run by
# tests/test_queries_oracle.py regardless.
REGISTRY_ORDER: tuple[str, ...] = (
    # ================= round-6 driver window (50 slots) ==================
    # Standing policy unchanged (see above). This round (VERDICT r5
    # "Next round" #1/#3/#5/#6/#7):
    # (a) slots 1-21 promote the round-6 queue exactly as planned last
    #     round — the 19 new-r5 queries that have never received a
    #     driver row, plus dup_spans and event_transitions.
    #     temperature_sample_wor ALSO changed this round (largest-
    #     remainder quotas, ADVICE r5 #4) so its in-window seat doubles
    #     as the changed-implementation re-verify.
    # (b) pca_project_fixed re-verifies after the r5 red row: output
    #     reshaped from ARRAY<DOUBLE> to scalar p0..p3 (the driver
    #     canonicalizer cannot sort list columns); CI now bans nested
    #     types in oracle-paired output schemas (tests/test_queries_
    #     oracle.py::test_nested_output_guard_catches_array_column).
    # (c) NEW pca_eig2_fixed gives the rows-only trainer its hard row
    #     (distributed Gram -> closed-form 2x2 eigenvalues, the
    #     pq_adc_fixed pattern) — seated adjacent to pca_components.
    # (d) NEW txlog_retention_lookup driver-checks expire_versions +
    #     read_for_keys (r5's pytest-only table-format features).
    # (e) second lifetime rows for the r5-green singles (VERDICT Next
    #     #5) fill the remaining slots.
    # -- (a) slots 1-21: the round-6 promote queue -----------------------
    "tokenizer_fertility",
    "blocklist_filter",
    "crawl_frontier",
    "stream_event_transitions",
    "curation_pipeline",
    "classifier_quality_report",
    "anchor_text_index",
    "ann_filtered_topk",
    "temperature_sample_wor",
    "langid_confusion",
    "lm_perplexity_interpolated",
    "community_stats",
    "cross_source_contamination",
    "event_rate_spikes",
    "dedup_cluster_histogram",
    "lsh_band_stats",
    "bloom_fp_report",
    "keyset_page",
    "scd2_as_of",
    "dup_spans",
    "event_transitions",
    # -- (b)/(c) PCA family: re-verify + rows-only + NEW hard twin -------
    "pca_project_fixed",
    "pca_components",
    "pca_eig2_fixed",
    # -- (d) NEW: retention + point-lookup pruning, driver-checked -------
    "txlog_retention_lookup",
    # -- (d') NEW: batch twin of the streaming QualityMonitorSink --------
    "monitor_drift_report",
    # -- (d'') NEW round-6 operators: KN discounting LM + asymmetric
    #    containment dedup ------------------------------------------------
    "lm_perplexity_kneser_ney",
    "containment_pairs",
    "score_calibration",
    "mv_incremental_refresh",
    "join_size_preflight",
    # -- (d''') round-6 second wave: encoding repair, epoch-repeat
    #    mixture, bucketed-layout join, JSONL quarantine source --------
    "mojibake_repair",
    "mixture_epochs",
    "bucketed_join",
    "jsonl_quarantine",
    "intradoc_line_dedup",
    "matryoshka_recall",
    "txlog_count_pushdown",
    "csv_quarantine",
    # -- (e) second lifetime rows for the r5-green singles ---------------
    "warc_roundtrip",
    "html_extract",
    "web_pipeline",
    "rate_limit_admission",
    "label_propagation",
    "incremental_components",
    "classifier_score_fixed",
    "contrastive_triplets",
    "wordpiece_encode_tokens",
    "pq_topk",
    "pq_adc_fixed",
    # ------------------- driver window ends at slot 50 --------------------
    # (bin_packing / training_shards / mutual_edges_salted /
    # robots_exclusion / link_graph / domain_quality_rollup /
    # perplexity_mixture / ngram_novelty are all r05-green — their
    # second-row slots yielded to the eight new round-6 registrations
    # above, same trade as last round; ann_recall_report /
    # lsh_quality_report / chunk_dedup / dataset_card /
    # shard_source_mix / readability_stats likewise r05-green; the
    # rows-only pq_topk stays seated NEXT TO its hash-checked twin
    # pq_adc_fixed per the standing adjacency policy)
    "bin_packing",
    "training_shards",
    "mutual_edges_salted",
    "robots_exclusion",
    "link_graph",
    "domain_quality_rollup",
    "perplexity_mixture",
    "ngram_novelty",
    "readability_stats",
    "shard_source_mix",
    "dataset_card",
    "chunk_dedup",
    "lsh_quality_report",
    "ann_recall_report",
    # Demoted past the window: every name below is >=1-round driver-green
    # (most 2-3 rounds) and stays DuckDB-oracle-checked every CI run by
    # tests/test_queries_oracle.py. Relative order preserved from the
    # round-5 file; rows-only allowlist entries are covered by
    # POST_WINDOW_ROWS_ONLY_OK in tests/test_registry.py.
    "classifier_weights",
    "dedup_funnel_report",
    "skew_report",
    "unigram_encode_tokens",
    "unigram_vocab",
    "bpe_encode_tokens",
    "bpe_merges",
    "minhash_near_dups_portable",
    "minhash_near_dups",
    "simhash_near_dups_portable",
    "simhash_near_dups",
    "cms_heavy_users_portable",
    "cms_heavy_users",
    "approx_distinct_users_portable",
    "approx_distinct_users",
    "ivf_incremental_topk",
    "incremental_minhash_dedup",
    "stream_neardup_dedup",
    "multimodal_jpeg_stats",
    "dedup_keep_best",
    "multimodal_mjpeg_stats",
    "c4_line_filter",
    "dup_span_removal",
    "triangle_stats",
    "pagerank",
    "kcore_members",
    "bm25_topk",
    "lm_perplexity",
    "dsir_weights",
    "semantic_dedup",
    "leakage_safe_split",
    "quantile_sketch",
    "grouped_median_sketch",
    "distribution_drift",
    "snapshot_diff",
    "scd2_history",
    "multitouch_attribution",
    "stream_static_enrich",
    "context_chunks",
    "multimodal_audio_stats",
    "weighted_sample",
    "hashed_tf_features",
    "equidepth_buckets",
    "connected_components",
    "dedup_clusters",
    "multimodal_png_stats",
    "multimodal_ulaw_stats",
    "url_frequency_cap",
    "constraint_report",
    "mutual_edges",
    "dataset_split",
    "embedding_quantize",
    "embedding_near_dups",
    "cosine_topk",
    "embedding_norms",
    "ann_lsh_topk",
    "ivf_topk",
    "kmeans_clusters",
    "pricing_summary",
    "label_centroids",
    "ledger_enqueue_due",
    "ledger_dequeue_transition",
    "ledger_point_update",
    "ledger_complete_batch",
    "dedup_exact",
    "doc_fingerprint",
    "token_stats",
    "bpe_token_stats",
    "text_quality",
    "lang_id",
    "lang_source_rollup",
    "winnow_fingerprint",
    "ngram_jaccard_pairs",
    "tfidf_top_terms",
    "token_packing",
    "stratified_sample",
    "mixture_sample",
    "keyword_categorize",
    "validate_interests",
    "asof_attribution",
    "range_band_join",
    "daily_quota_admission",
    "ledger_assign_ids",
    "ledger_both_complete",
    "ledger_delete_failed",
    "stream_stream_attribution",
    "multimodal_image_stats",
    "cube_revenue",
    "continuous_rollup",
    "asof_forward_attribution",
    "multimodal_frame_sample",
    "bloom_pruned_join",
    "passage_dedup",
    "repetition_stats",
    "pii_redaction",
    "stream_dedup",
    "decontamination",
    "quality_gate",
    "retention_cohorts",
    "incremental_dedup",
    "temperature_mixture",
    "embedding_near_dups_bucketed",
    "sessionize_batch",
    "sessionize_stream",
    "upsert_keep_newest",
    "insert_if_absent",
    "top_k_per_group",
    "running_total",
    "hourly_window_counts",
    "mutual_edges_intersect",
    "key_lookup",
    "enrichment_join",
    "pending_anti_join",
    "dim_hierarchy",
    "three_way_join",
    "count_via_join",
    "fifo_dequeue",
    "temporal_in_filter",
    "daily_counts",
    "conditional_counts",
    "union_dedup",
    "semi_join_exists",
    "pivot_status_counts",
    "rollup_revenue",
    "regional_revenue",
    "sql_api_top_spenders",
    "copurchase_pairs",
    "table_profile",
    "event_funnel",
    "price_quantiles",
    "pandas_group_summary",
    "props_json_extract",
)
DRIVER_WINDOW = 50


def load_all() -> dict[str, QuerySpec]:
    """Import every query module, then return the registry in the explicit
    ``REGISTRY_ORDER`` (names registered but missing from the list are
    appended at the back, past the driver window, never silently dropped)."""
    from . import core  # noqa: F401
    from . import diagnostics  # noqa: F401
    from . import extensions  # noqa: F401
    from . import graph  # noqa: F401
    from . import ledger  # noqa: F401
    from . import model  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import ranking  # noqa: F401
    from . import temporal  # noqa: F401
    from . import text  # noqa: F401
    from . import web  # noqa: F401

    ordered = {n: REGISTRY[n] for n in REGISTRY_ORDER if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
