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
    # ================= round-5 driver window (50 slots) ==================
    # Policy unchanged (see above). This round: (a) slots 1-19 promote the
    # late-round-4 wave that has NEVER received a driver row (VERDICT r4
    # Next #1) — the only driver-checkable proof of T4/T5
    # (rate_limit_admission) and the S6 parse-half (warc/html/web);
    # (b) training_shards re-verifies in-window after the HUGEINT oracle
    # fix (CAST SUM AS BIGINT, VERDICT r4 Next #2) along with the other
    # three audited SUM oracles (shard_source_mix, dataset_card,
    # dedup_funnel_report — all in the promote wave anyway);
    # (c) mutual_edges_salted is newly registered (VERDICT r4 Next #3);
    # (d) queries whose IMPLEMENTATION changed this round re-verify
    # in-window (skew_report -> TakeOrderedAndProject, ADVICE #2;
    # unigram_encode_tokens -> empty-word DP guard, ADVICE #4;
    # rate_limit_admission -> integer hour bucket + segmented fold,
    # ADVICE #3 / VERDICT Next #5);
    # (e) rows-only probabilistic tiers stay adjacent to their
    # hash-checked twins; (f) remaining slots give the r04-green-once
    # singles their second lifetime row (VERDICT r4 Next #8) and seat
    # the new round-5 queries.
    # -- (a) slots 1-19: the never-driver-checked promote queue ----------
    "contrastive_triplets",
    "pca_project_fixed",
    "pca_components",
    "bin_packing",
    "label_propagation",
    "classifier_score_fixed",
    "classifier_weights",
    "warc_roundtrip",
    "html_extract",
    "web_pipeline",
    "rate_limit_admission",
    "incremental_components",
    "readability_stats",
    "shard_source_mix",
    "dataset_card",
    "chunk_dedup",
    "lsh_quality_report",
    "ann_recall_report",
    "dedup_funnel_report",
    # -- (b) oracle fixed this round: re-verify -------------------------
    "training_shards",
    # -- (c) new registration: skew-safe J1 twin ------------------------
    "mutual_edges_salted",
    # -- (d) implementation changed this round: re-verify ---------------
    "skew_report",
    "unigram_encode_tokens",
    # -- (e) rows-only tiers adjacent to hash-checked twins -------------
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
    "pq_topk",
    "pq_adc_fixed",
    # -- (f) second lifetime rows for the r04-green singles -------------
    "ivf_incremental_topk",
    "incremental_minhash_dedup",
    "stream_neardup_dedup",
    "multimodal_jpeg_stats",
    "dedup_keep_best",
    "multimodal_mjpeg_stats",
    "c4_line_filter",
    "dup_span_removal",
    # -- new round-5 queries seat here (slots 45-50) ---------------------
    "robots_exclusion",
    "link_graph",
    "domain_quality_rollup",
    "wordpiece_encode_tokens",
    "perplexity_mixture",
    "ngram_novelty",
    # ------------------- driver window ends at slot 50 --------------------
    # ROUND-6 PROMOTE QUEUE (head of the next window, per the standing
    # policy): the 19 new-r5 queries below have never received a driver
    # row — all CI-oracle-checked every run — plus dup_spans (r04-green,
    # yielded its second-row slot to pq_adc_fixed). Keep them first.
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
    # dup_spans (r04-green) yielded its in-window second-row slot to
    # pq_adc_fixed, the new hash-checked PQ twin
    "dup_spans",
    "event_transitions",
    # Round-4 window graduates: every name below earned its r04 driver row
    # and demotes past the window; all stay oracle-checked every CI run.
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
    # mutual_edges: r01+r02 hash rows AND re-run by the driver's entry()
    # smoke-check every round (its salted twin is in-window above).
    "mutual_edges",
    # pricing_summary sits first past the window this round: r01+r02
    # driver rows, bench-headline coverage every round, pytest oracle.
    # ledger_dequeue_transition / ledger_point_update /
    # ledger_complete_batch yielded their second-row slots to the new
    # compressed-audio/video + duplicated-span queries (all three are
    # r02-green and CI-oracle-checked); the r02-green embeddings family
    # (dataset_split, embedding_quantize, embedding_near_dups,
    # cosine_topk, embedding_norms) yielded its second-row slots to the
    # new round-4 wave (incremental_minhash_dedup, ivf_incremental_topk,
    # dup_span_removal, stream_neardup_dedup, dedup_keep_best).
    "dataset_split",
    "embedding_quantize",
    "embedding_near_dups",
    "cosine_topk",
    "embedding_norms",
    # ann_lsh_topk / ivf_topk / kmeans_clusters are r03-green hash
    # singles; ivf_topk's oracle is additionally re-exercised in-window
    # every round that ivf_incremental_topk is (same one-shot IVF SQL).
    "ann_lsh_topk",
    "ivf_topk",
    "kmeans_clusters",
    "pricing_summary",
    "label_centroids",
    "ledger_enqueue_due",
    "ledger_dequeue_transition",
    "ledger_point_update",
    "ledger_complete_batch",
    # Post-window: everything below is ≥1-round driver-green (most 2-3
    # rounds) and stays pytest-oracle-checked every CI run.  Round-5 queue:
    # promote whichever of the below have the fewest driver rows once the
    # round-4 wave is green.
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
    # Two-round-green core relational queries, demoted past the window;
    # each still oracle-checked every CI run by tests/test_queries_oracle.py.
    # (sessionize_stream's streaming evidence is carried in-window by
    # stream_stream_attribution + continuous_rollup.)
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
