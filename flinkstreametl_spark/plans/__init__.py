"""Named query registry. Importing this package registers every query
module; ``__spark_entry__.py``, the tests, and ``bench.py`` all consume
the same registry."""

from flinkstreametl_spark.plans.registry import REGISTRY, QuerySpec, oracle_sql_map, queries_map

# Import for registration side effects.
from flinkstreametl_spark.plans import reference as _reference  # noqa: E402,F401
from flinkstreametl_spark.plans import analytics as _analytics  # noqa: E402,F401
from flinkstreametl_spark.plans import analytics_ext as _analytics_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import llm as _llm  # noqa: E402,F401
from flinkstreametl_spark.plans import tpch_ext as _tpch_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import pipeline_ext as _pipeline_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import coverage_ext as _coverage_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import corpus_ext as _corpus_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import ml_ext as _ml_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import ingest_ext as _ingest_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import warehouse_ext as _warehouse_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import quality_ext as _quality_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import timeseries_ext as _timeseries_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import graph_ext as _graph_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import orderstats_ext as _orderstats_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import dedup_audit_ext as _dedup_audit_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import retrieval_ext as _retrieval_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import ann_ext as _ann_ext  # noqa: E402,F401

# The driver's correctness gate verifies the FIRST 50 registered queries
# (registration order == dict order), so ordering decides what gets a
# driver verdict each round. CORRECTNESS_r07 came back 50/50 green:
# entering round 8, all 189 currently-registered, ever-driver-checked
# queries hold a green latest verdict (distribution r7=50, r6=50,
# r5=49, r4=40; zero unchecked). Two further names appear in the
# CORRECTNESS_r01 artifact only — approx_distinct_users and
# stats_builtin_moments, checked once with err=no_oracle — and now live
# OUTSIDE the driver registry (AUDIT_REGISTRY sketches), so artifact
# reconciliations count 191 distinct historical names vs 189 registered
# (ADVICE r7). Round 8 executes the rotation recorded in round 7:
#   1. _NEW_R8 — every round-8 addition, appended the day it lands
#      (each verified locally at sf0.001/sf0.01 on landing). They lead
#      so a failure can't be hidden by the [:50] cut. Capacity 10 —
#      asserted below so additions can never evict a stale-evidence
#      name.
#   2. _PRIORITY_R8 — exactly the 40 names whose latest verdict is
#      r4-era (computed from CORRECTNESS_r01–r07, listed in their r4
#      window order). After this round the oldest repo-wide verdict
#      tier becomes r5.
#   3. _BACKFILL_R8 — r5-era names in THEIR r5 window order, filling
#      whatever slots the [:50] cut leaves (50 - len(_NEW_R8) - 40);
#      evidence-freshness headroom, not an obligation.
# Verified queries move behind the window (their recorded evidence
# stands). The 3 sketch queries (HLL/KLL/moments) live in
# AUDIT_REGISTRY — queries() stays 100% oracle-backed.
#
# ROUND-9 ROTATION PLAN (updated for the late-round-8 build wave): the
# round-8 flywheel produced 40 post-window additions — they live in
# _NEW_R9 below, each oracle-verified locally at sf0.001 AND sf0.01 on
# landing (tools/verify_contract.py re-run green over the whole
# registry before every commit — eighteen runs this round) and ALL 40
# re-verified at sf1 (docs/ROUND8.md). If CORRECTNESS_r08 comes back
# 50/50 green, the stale backlog is the 42 r5-era names _BACKFILL_R8
# didn't reach. Round 9 window = _NEW_R9 (40, never driver-checked —
# they lead) + the first 10 r5-era names in their r5 window order; the
# remaining r5-era names lead round 10's window (a two-round refresh
# of the r5 tier — the additions-vs-staleness trade is explicit here
# rather than enforced by the 10-slot cap, which exists to stop
# SILENT eviction, not a planned split). If any r8 window name fails,
# it jumps the queue after repair.
_NEW_R8: list[str] = [
    # Round-8 additions, appended the day each lands.
    "bm25_topk_docs",
    "decontaminate_by_retrieval",
    "ann_index_staleness_audit",
    "ngram_repetition_stats",
    "mrl_truncation_recall",
    "domain_budget_allocation",
    "bm25_index_staleness_audit",
    "profile_documents",
    "pca_power_topcomp",
    "hard_negative_mining",
]

# Round-8 additions that landed AFTER _NEW_R8 hit its 10-slot capacity
# (the assert below is the guard that sent them here instead of
# evicting a stale-evidence name). Each was oracle-verified locally at
# sf0.001 AND sf0.01 on landing (tools/parity_sweep.py); they lead the
# round-9 window per the rotation plan above.
_NEW_R9: list[str] = [
    "linkpred_copurchase_scores",
    "seasonal_decompose_daily",
    "dsir_importance_topk",
    "hybrid_rrf_retrieval",
    "bloom_prune_fpr_audit",
    "token_gini_diversity",
    "mutual_knn_pairs",
    "embedding_centroid_drift",
    "quality_calibration_audit",
    "kcore_peeling_profile",
    "decontaminate_by_embedding",
    "stratified_kfold_audit",
    "theil_sen_trend_daily",
    "join_key_skew_report",
    "rolling_median_7d",
    "neardup_source_matrix",
    "sq8_reconstruction_error",
    "dedup_funnel_by_source",
    "nucleus_sample_per_source",
    "trigram_novelty_curve",
    "knn_label_disagreement",
    "multitouch_attribution_daily",
    "time_weighted_avg_daily",
    "lsh_band_sweep_audit",
    "quality_score_drift",
    "langid_confusion_matrix",
    "orders_reconciliation_audit",
    "simhash_hamming_histogram",
    "label_separation_audit",
    "error_burn_rate_daily",
    "value_ks_drift",
    "neardup_cluster_size_histogram",
    "prf_expanded_retrieval",
    "session_gap_sensitivity",
    "semantic_cosine_histogram",
    "embedding_dim_stats",
    "source_vocab_overlap",
    "revenue_topk_concentration",
    "mad_anomaly_days",
    "pagerank_weighted_copurchase",
]

_PRIORITY_R8 = [
    # the 40 r4-era names, in their CORRECTNESS_r04 window order
    "incremental_minhash_replay",
    "scd2_order_status_history",
    "coherent_sample_orders",
    "trend_fit_by_event_type",
    "null_safe_join_segments",
    "winsorized_price_stats",
    "zorder_key_orders",
    "dq_violation_counts",
    "bpe_encode_token_counts",
    "collect_set_sorted",
    "inverted_index_terms",
    "gopher_quality_gate",
    "vocab_coverage_curve",
    "mad_robust_price",
    "zscore_tail_events",
    "asof_tolerance_enrich",
    "cluster_canonical_docs",
    "rfm_customer_segments",
    "daily_moving_avg_7d",
    "median_cont_quantity",
    "session_transition_counts",
    "nation_revenue_contribution",
    "order_gap_stats",
    "ewma_daily_value",
    "cusum_changepoint_daily",
    "dow_seasonality_profile",
    "udtf_sentence_spans",
    "salted_hot_key_agg",
    "click_purchase_attribution",
    "basket_lift_top_pairs",
    "span_dedup_keep_first",
    "int8_knn_recall",
    "groupwise_minmax_norm",
    "peak_concurrent_sessions",
    "series_correlation_pairs",
    "knn_pandas_topk",
    "knn_brute_topk",
    "exact_dup_groups",
    "embedding_neardup_pairs",
    "decontaminate_ngram_hits",
]

_BACKFILL_R8 = [
    # r5-era names in their CORRECTNESS_r05 window order; only the
    # first 50 - len(_NEW_R8) - 40 make the window.
    "dim_3way_join",
    "replace_upsert_latest",
    "changelog_op_column",
    "json_payload_roundtrip",
    "flagship_enrich_sql",
    "string_funcs_parts",
    "anti_join_no_orders",
]

_WINDOW_R8 = (*_NEW_R8, *_PRIORITY_R8, *_BACKFILL_R8)[:50]

# Every round-8 addition AND every r4-era stale-evidence name must
# survive the [:50] truncation — the capacity assert keeps additions
# from silently evicting a priority name (the discipline that held for
# rounds 6-8).
assert len(_NEW_R8) <= 10, (
    "round-8 additions exceed window capacity; move the overflow to _NEW_R9"
)
assert all(n in _WINDOW_R8 for n in (*_NEW_R8, *_PRIORITY_R8))


def _reorder() -> None:
    missing = [n for n in _WINDOW_R8 if n not in REGISTRY]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    if len(_WINDOW_R8) != len(set(_WINDOW_R8)):
        raise ValueError("duplicate names in window")
    no_oracle = [n for n in _WINDOW_R8 if REGISTRY[n].oracle is None]
    if no_oracle:
        raise ValueError(f"rows-only queries may not sit in the driver window: {no_oracle}")
    rest_oracle = [n for n, s in REGISTRY.items() if n not in _WINDOW_R8 and s.oracle is not None]
    rest_rows_only = [n for n, s in REGISTRY.items() if n not in _WINDOW_R8 and s.oracle is None]
    ordered = {n: REGISTRY[n] for n in (*_WINDOW_R8, *rest_oracle, *rest_rows_only)}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
