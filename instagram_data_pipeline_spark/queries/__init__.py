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
    # ================= round-14 driver window (50 slots) =================
    # Standing policy unchanged (see above). Window composition
    # (VERDICT r13 "Next round" #1 + #2):
    # (a) slot 1: txlog_notnull_sql — registered mid-r13 AFTER that
    #     round's window was seated; needs its FIRST driver row
    #     (CI-oracle-green + judge-verified PASS at the driver's sf0.01
    #     in r13).
    # (b) slots 2-13: the entire r8-vintage cohort — the oldest driver
    #     evidence in the registry (FIFO per COVERAGE.md rotation policy).
    # (c) slot 14: txlog_widen_evolution — named in the r13 brief; also
    #     a changed-impl re-verify (below).
    # (d) slots 15-43: every txlog-format query face — staged by the
    #     interrupted r14 build plan for the delta-log manifest rewrite
    #     (VERDICT r13 "Next round" #2). r14 became an optimization
    #     round and that rewrite did NOT land; the faces stay in-window
    #     as re-verifies for this round's txlog correctness fixes
    #     (ADVICE r13: overwrite stale-schema refusal, NOT NULL
    #     pre-schema guard, per-writer vacuum checkpoint tmp).
    # (e) slots 44-50: the r9-vintage FIFO head (non-txlog).
    "txlog_notnull_sql",
    "anchor_text_index",
    "temperature_sample_wor",
    "langid_confusion",
    "community_stats",
    "cross_source_contamination",
    "event_rate_spikes",
    "dedup_cluster_histogram",
    "lsh_band_stats",
    "bloom_fp_report",
    "event_transitions",
    "dedup_funnel_report",
    "triangle_stats",
    "txlog_widen_evolution",
    # --- (d) txlog changed-impl re-verifies: delta-log + checkpoint ---
    "txlog_replace_where_sql",
    "txlog_overwrite_sql",
    "txlog_alter_sql",
    "txlog_constraints_sql",
    "txlog_restore_sql",
    "txlog_change_feed",
    "txlog_stream_changes",
    "txlog_changes_backfill",
    "txlog_rename_evolution",
    "txlog_zonemap_scan",
    "txlog_compact",
    "txlog_zorder_scan",
    "txlog_minmax_pushdown",
    "txlog_datasource_scan",
    "txlog_retention_lookup",
    "txlog_count_pushdown",
    "txlog_stream_merge_sink",
    "txlog_rebucket_layout",
    "txlog_zorder_equidepth",
    "txlog_delete_vectors",
    "txlog_bloom_lookup",
    "txlog_time_travel_sql",
    "txlog_ctas_sql",
    "txlog_insert_into_sql",
    "txlog_merge_into_sql",
    "txlog_maintenance_sql",
    "txlog_convert_sql",
    "txlog_update_sql",
    "txlog_delete_sql",
    # --- (e) r9-vintage FIFO head ---
    "mutual_edges",
    "dataset_split",
    "embedding_quantize",
    "embedding_near_dups",
    "cosine_topk",
    "embedding_norms",
    "pricing_summary",
    # ------------------- driver window ends at slot 50 --------------------
    # r15 queue: the r9-vintage FIFO remainder, then r10/r11 FIFO, then
    # the demoted r12/r13 windows at the back. New queries registered
    # mid-r14 go right here with a rationale comment. Everything below
    # stays DuckDB-oracle-checked every CI run by
    # tests/test_queries_oracle.py; rows-only tiers past the window are
    # covered by POST_WINDOW_ROWS_ONLY_OK.
    "label_centroids",
    "ledger_enqueue_due",
    "ledger_dequeue_transition",
    "ledger_point_update",
    "ledger_complete_batch",
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
    "dpp_partition_prune",
    "multimodal_flac_stats",
    "event_funnel",
    "price_quantiles",
    "pandas_group_summary",
    "props_json_extract",
    "ledger_assign_ids",
    "ledger_delete_failed",
    "ledger_both_complete",
    "daily_quota_admission",
    "keyword_categorize",
    "validate_interests",
    "asof_attribution",
    "asof_forward_attribution",
    "range_band_join",
    "retention_cohorts",
    "cube_revenue",
    "continuous_rollup",
    "lang_id",
    "lang_source_rollup",
    "text_quality",
    "token_stats",
    "bpe_token_stats",
    "doc_fingerprint",
    "tfidf_top_terms",
    "repetition_stats",
    "pii_redaction",
    "quality_gate",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "passage_dedup",
    "winnow_fingerprint",
    "incremental_dedup",
    "decontamination",
    "stream_dedup",
    "stream_stream_attribution",
    "ann_lsh_topk",
    "ivf_topk",
    "kmeans_clusters",
    "embedding_near_dups_bucketed",
    "bloom_pruned_join",
    "multimodal_image_stats",
    "multimodal_frame_sample",
    "token_packing",
    "stratified_sample",
    "mixture_sample",
    "temperature_mixture",
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
    "classifier_score_fixed",
    "classifier_weights",
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
    "contrastive_triplets",
    "dup_spans",
    "html_extract",
    "incremental_components",
    "label_propagation",
    "pca_project_fixed",
    "pq_adc_fixed",
    "pq_topk",
    "rate_limit_admission",
    "warc_roundtrip",
    "web_pipeline",
    "wordpiece_encode_tokens",
    "join_size_preflight",
    "score_calibration",
    "monitor_drift_report",
    "bucketed_join",
    "lm_perplexity_kneser_ney",
    "containment_pairs",
    "mv_incremental_refresh",
    "mojibake_repair",
    "mixture_epochs",
    "jsonl_quarantine",
    "csv_quarantine",
    "intradoc_line_dedup",
    "matryoshka_recall",
    "pca_eig2_fixed",
    "pca_components",
    "bin_packing",
    "training_shards",
    "robots_exclusion",
    # --- demoted r13 window (multi-round-green, FIFO to the back) ---
    "link_graph",
    "domain_quality_rollup",
    "perplexity_mixture",
    "ngram_novelty",
    "readability_stats",
    "shard_source_mix",
    "chunk_dedup",
    "lsh_quality_report",
    "ann_recall_report",
    "adamic_adar",
    "gopher_quality_filter",
    "byte_bpe_encode_tokens",
    "late_data_accounting",
    "grouping_sets_revenue",
    "record_linkage",
    "semdedup_drops",
    "hll_merge_rollup",
    "phrase_search",
    "mad_outliers",
    "stream_outer_attribution",
    "cdc_chunk_stats",
    "json_schema_infer",
    "mutual_edges_salted",
    "dataset_card",
    "tokenizer_fertility",
    "curation_pipeline",
    "ann_filtered_topk",
    "lm_perplexity_interpolated",
    "keyset_page",
    "scd2_as_of",
    "blocklist_filter",
    "crawl_frontier",
    "stream_event_transitions",
    "classifier_quality_report",
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
