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
# window.  Policy (round 3): queries with NO prior driver row come first, then
# newly added / oracle-upgraded queries, then rows-only probabilistic ops,
# then one-round-green queries; queries with TWO rounds of green driver rows
# (core relational, all of which also have pytest oracle twins in
# tests/test_queries_oracle.py) are demoted past the window.  Rotate with
# intent each round so every query accumulates driver evidence.
REGISTRY_ORDER: tuple[str, ...] = (
    # -- slots 1-21: never driver-checked before round 3 (text / dedup /
    #    sampling family, model path, as-of + range joins, ledger tail) -----
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
    # -- new in round 3 ----------------------------------------------------
    "stream_stream_attribution",
    "multimodal_image_stats",
    "dedup_clusters",
    "cube_revenue",
    "continuous_rollup",
    "asof_forward_attribution",
    "multimodal_frame_sample",
    "minhash_near_dups_portable",
    "cms_heavy_users_portable",
    "simhash_near_dups_portable",
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
    # -- oracle upgraded in round 3 (rows-only -> hash) --------------------
    "connected_components",
    "embedding_near_dups_bucketed",
    # -- rows-only probabilistic ops (keep continuity rows) ----------------
    "minhash_near_dups",
    "simhash_near_dups",
    "ann_lsh_topk",
    "ivf_topk",
    "kmeans_clusters",
    "cms_heavy_users",
    "approx_distinct_users",
    # ------------------- driver window ends at slot 50 --------------------
    # Post-window rotation queue for round 4 (in order): context_chunks,
    # multimodal_audio_stats, then the 18-query late-round-3 wave below
    # (graph analytics, ranking/LM/DSIR, semantic dedup, sketches, CDC,
    # attribution, sampling). All are pytest-oracle-checked every CI run
    # meanwhile; rotate them into slots 1-20 next round by demoting the
    # r3-green text/dedup family (which will then hold driver rows from
    # two rounds).
    "context_chunks",
    "multimodal_audio_stats",
    # round-3 late wave: graph analytics + ranking/LM/semantic-dedup —
    # pytest-oracle-checked now, rotate into the window next round
    "triangle_stats",
    "pagerank",
    "bm25_topk",
    "lm_perplexity",
    "semantic_dedup",
    "stream_static_enrich",
    "leakage_safe_split",
    "quantile_sketch",
    "dsir_weights",
    "bpe_merges",
    "distribution_drift",
    "grouped_median_sketch",
    "pq_topk",
    "snapshot_diff",
    "scd2_history",
    "multitouch_attribution",
    "kcore_members",
    "weighted_sample",
    "hashed_tf_features",
    "equidepth_buckets",
    # flagship demoted r3: mutual_edges evidence is abundant elsewhere
    # (entry() smoke every round, bench headline, pytest twin, two green
    # driver rounds)
    "mutual_edges",
    "pricing_summary",
    # One-round-green (r02) extension/ledger queries rotated out to fund
    # new round-3 slots; cosine_topk keeps the vector-fold evidence and
    # ledger_{enqueue_due,dequeue_transition,complete_batch} keep the
    # ledger-family evidence in-window.
    "embedding_norms",
    "ledger_enqueue_due",
    "cosine_topk",
    "embedding_near_dups",
    "embedding_quantize",
    "dataset_split",
    "label_centroids",
    "ledger_complete_batch",
    "ledger_dequeue_transition",
    "ledger_point_update",
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
    from . import extensions  # noqa: F401
    from . import graph  # noqa: F401
    from . import ledger  # noqa: F401
    from . import model  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import ranking  # noqa: F401
    from . import temporal  # noqa: F401
    from . import text  # noqa: F401

    ordered = {n: REGISTRY[n] for n in REGISTRY_ORDER if n in REGISTRY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
