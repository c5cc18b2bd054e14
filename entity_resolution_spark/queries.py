"""Driver-contract query registry (SURVEY.md §2 operator inventory).

Each entry: name -> (spark, sf_dir) -> DataFrame, with a matching DuckDB
oracle SQL string in ORACLE_SQL where the operator is SQL-expressible.
Column names are aliased identically on both sides (the driver's compare
hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# Registrations land in entity_resolution_spark/contract/*.py; import them
# here so a single `from entity_resolution_spark.queries import SPARK_QUERIES`
# sees everything.
from .contract import (  # noqa: E402,F401
    classifier_ops,
    core_ops,
    dedup_ops,
    linkage_ops,
    quality_ops,
    sampling_ops,
    stats_ops,
    stream_ops,
    text_ops,
    warehouse_ops,
)

# The external correctness driver executes at most ~50 queries in dict
# insertion order; with >50 registered, the tail never receives a
# CORRECTNESS row. Re-rank so queries that have never been driver-verified
# (or were only verified in an early round) come first; everything else
# keeps its relative registration order. Every query still runs in pytest
# (tests/test_queries_oracle.py parametrizes the full registry), so the
# re-rank only changes driver-visibility, not coverage.
#
# ROTATION STRATEGY (for the next round): once CORRECTNESS_r03 lands,
# move every query that received a green r3 row BELOW the ones that
# didn't — the window rotates each round until every registered query has
# at least one driver-green row on record. 229 registered / ~50-query
# window: everything after position ~50 waits for a later rotation; the
# names not listed here at all are r1/r2-driver-green and deliberately
# land at the tail in registration order. The 31 queries added in the
# final session (correlation/rank stats through markov attribution) sit
# at positions 7-37 — all inside the window — because fresh code benefits
# most from an external value check.
_DRIVER_PRIORITY = [
    # never received a driver CORRECTNESS row (round 1-2 window overflow)
    "doc_repetition_stats",
    "redact_customer_pii",
    "tfidf_top_terms",
    "multimodal_fake_features",
    "f_jw_levenshtein",
    "stream_interval_join",
    # newest this session: rank-statistics trio (distributed prefix-sum
    # ranking) — freshest code, verify first
    "correlation_lineitem",
    "mw_u_purchase_vs_click",
    "gini_event_value",
    "table_diff_event_snapshots",
    "fingerprint_events_by_type",
    "cusum_change_point_events",
    "link_prediction_copurchase",
    "mutual_information_docs",
    "association_rules_capped",
    "cohort_ltv_weekly",
    "sortedness_events_ts",
    "readability_lang_report",
    "interarrival_quantiles_events",
    "kaplan_meier_user_lifetimes",
    "did_event_value",
    "histogram_order_totalprice",
    "quality_threshold_sweep",
    "hll_merge_sources",
    "modularity_copurchase_brand",
    "assortativity_copurchase",
    "hll_overlap_user_sets",
    "hll_rolling_users_7d",
    "attribution_markov_removal",
    "attribution_shapley",
    "weighted_quantiles_lineitem",
    "new_vs_returning_weekly",
    "funnel_stage_latency",
    "robust_means_orders",
    "categorical_assoc_lineitem",
    "bootstrap_ci_event_value",
    "effect_size_purchase_vs_view",
    # new in round 3 (resumed session): join-planning analytics trio +
    # chaining-resistant star clustering
    "tpch_q3_topk",
    "tpch_q5_region_volume",
    "tpch_q18_big_orders",
    "star_clusters_ngram",
    "pareto_frontier_parts",
    "above_avg_orders",
    "ntile_customer_deciles",
    "fd_profile_lineitem",
    "pk_candidates_orders",
    "ind_fk_candidates",
    "fuzzy_duplicate_orders",
    "ks_drift_events_value",
    "benford_orders_totalprice",
    "decayed_user_value",
    "weighted_jaccard_docs",
    "wow_event_growth",
    "rfm_customer_segments",
    # new in round 3 (closing session): warehouse maintenance + mining
    "cdc_apply_user_state",
    "ivm_event_type_totals",
    "attribution_last_touch",
    "lpa_communities_ngram",
    "bitext_margin_pairs",
    "mad_outliers_orders",
    "mixture_temperature_report",
    "smith_waterman_part_names",
    "skipping_report_events",
    "rolling_daily_user_value",
    "attribution_multi_touch",
    "join_size_estimate_events",
    "range_boundaries_lineitem",
    # new in round 3 (later session)
    "cube_lineitem_revenue",
    "corrclust_pivot_ngram",
    "dbscan_embeddings",
    "bm25_search_topk",
    "bpe_train_merges",
    "gopher_quality_flags",
    "weighted_docs_sample",
    "blocking_quality_report",
    "ivf_append_full_probe",
    "length_batch_layout",
    "padding_efficiency_report",
    "source_sketch_similarity",
    "zipf_fit_report",
    "hll_vocab_estimate",
    "bloom_membership_probe",
    "cm_token_frequencies",
    "stream_vocab_monitor",
    "ccnet_perplexity_buckets",
    "corpus_stats_report",
    "stratified_docs_sample",
    "embedding_decontamination",
    "vocab_coverage_oov",
    "contrastive_pair_mining",
    "dedup_cluster_size_histogram",
    "token_drift_report",
    "kmeans_topic_assign",
    "cluster_balanced_sample",
    "balanced_token_shards",
    "random_projection_reduce",
    "embedding_drift_report",
    "encode_documents_ids",
    "pack_token_ids_stream",
    # new in round 3
    "pipeline_resume_equivalence",
    "knn_join_topk_string_ids",
    "pipeline_clusters",
    "dedup_remove_spans",
    "doc_line_dedup",
    "c4_page_filter",
    "shuffle_shards_layout",
    "boilerplate_segment_removal",
    "bigram_lm_perplexity",
    "cross_corpus_neardup",
    "bpe_top_merges",
    "source_overlap_matrix",
    "stream_dedup_gate",
    "nb_lang_predictions",
    "fs_em_linkage",
    "snm_candidate_pairs",
    "metablocking_wnp_edges",
    "survivorship_golden_records",
    "ppjoin_token_jaccard",
    "fs_em_linkage_tf",
    "fs_linkage_clusters",
    "dedup_containment",
    "token_entropy_stats",
    "fs_review_queue",
    "fs_cluster_audit",
    "fs_explain_weights",
    "ngram_novelty_scores",
    "phonetic_soundex_keys",
    "fs_pr_curve_report",
    "edit_distance_join_names",
    "one_to_one_matches",
    "tfidf_cosine_join_docs",
    "bcubed_nmi_ari_metrics",
    "soft_tfidf_part_names",
    "similarity_graph_triangles",
    "k_anonymity_customer",
    "k_anonymity_summary_customer",
    "monge_elkan_part_names",
    "iqr_outlier_orders",
    "compaction_plan_documents",
    "zorder_layout_events",
    "scd2_user_event_history",
    "pagerank_similarity_graph",
    "canopy_blocking_docs",
    "heavy_hitters_per_window",
    "key_skew_events_user",
    "key_skew_summary_events",
    "hybrid_rrf_search",
    "expectations_orders_report",
    "pmi_collocations_top",
    "funnel_view_click_purchase",
    "hits_similarity_graph",
    "schema_drift_events_halves",
    "cohort_retention_weekly",
    "k_core_similarity_graph",
    "resample_user_events_daily",
    "markov_event_transitions",
    "ab_test_events_value",
    "association_rules_lineitem",
    "activity_streaks_users",
    "ols_trend_value_by_type",
    "chi2_lang_source_documents",
    "bfs_labels_similarity_graph",
    "weighted_median_lineitem",
    # never driver-verified (added round 3; strictly before the reworked
    # trio below, which at least carries pre-rework r2-green rows +
    # full-probe equality pytest gates)
    "chunk_documents_sliding",
    "quantize_embeddings_int8",
    "semantic_dedup_embeddings",
    "sim_search_quantized_topk",
    "leakage_safe_split",
    "dsir_importance_sample",
    # reworked in round 3 (distributed kNN joins) — re-verify when the
    # window allows
    "knn_join_topk",
    "ivf_knn_join_full_probe",
    "dedup_embedding_cosine",
    # round-1 row only; re-verify under the current engine
    "lang_id_heuristic",
    "text_quality_score",
    "token_count_bpe",
    "w1_topk_per_group",
    "w2_running_sum",
    "u2_set_except",
    "u3_distinct_pairs",
    "a8_semantic_buckets",
    "f10_parse_probes",
    "p2_null_drop",
    "o5_longest_per_lang",
]


def _rerank() -> None:
    ranked = {n: SPARK_QUERIES[n] for n in _DRIVER_PRIORITY if n in SPARK_QUERIES}
    for n, fn in SPARK_QUERIES.items():
        ranked.setdefault(n, fn)
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(ranked)


_rerank()
