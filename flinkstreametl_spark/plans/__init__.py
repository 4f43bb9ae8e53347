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

# The driver's correctness gate verifies the FIRST 50 registered queries
# (registration order == dict order), so ordering decides what gets a
# driver verdict each round. CORRECTNESS_r04 came back 50/50 green, so
# entering round 5 EVERY registered query (165) holds a green driver
# verdict on record (cumulative r1-r4). Round 5 executes the planned
# rotation: refresh the evidence that is oldest first.
#   1. _PRIORITY_R5 — the 29 queries whose ONLY driver verdict is
#      r1-era (it predates the driver's fixture regeneration — the
#      round-2 NTZ episode). Local parity covers them against current
#      fixtures, but the official evidence is stale; after this round
#      no registered query's newest verdict is older than r2.
#   2. _NEW_R5 — queries added during round 5; every new registration
#      is appended here THE DAY IT LANDS so it gets a verdict this
#      round instead of waiting a full rotation (the round-3 mistake,
#      fixed in round 4 — keep the discipline).
#   3. _REPINS_R5 — high-traffic re-pins (frozen bench set + the §2
#      CDC/streaming core), displaced from the tail as _NEW_R5 grows.
#      Every repin already holds a fresh r4 verdict, so displacement
#      never loses evidence.
# Verified queries move behind the window (their recorded evidence
# stands). The 3 sketch queries (HLL/KLL/moments) live in
# AUDIT_REGISTRY — queries() stays 100% oracle-backed.
#
# ROUND-6 ROTATION PLAN: if CORRECTNESS_r05 comes back 50/50 green, no
# registered query's newest verdict is older than r2, and the oldest
# tier is the 45 r2-era names (occupancy_rate_by_region, the q10-q22
# analogs, dedup_keep_first, ...). Round 6 window = _NEW_R6 (additions
# the day they land) + the r2-era names oldest-first + bench/CDC
# re-pins in the tail. If any r5 window name fails, it leads the
# round-6 window after repair.
_PRIORITY_R5 = [
    # §2 CDC/streaming core with r1-only verdicts — lead the window
    "dim_3way_join",
    "replace_upsert_latest",
    "changelog_op_column",
    "json_payload_roundtrip",
    "flagship_enrich_sql",
    "string_funcs_parts",
    # analytics / window / set-op names with r1-only verdicts
    "anti_join_no_orders",
    "cube_agg",
    "full_outer_nation_counts",
    "group_distinct_agg",
    "grouping_sets_agg",
    "null_handling_buckets",
    "pivot_status_qty",
    "q14_promo_revenue_share",
    "q18_large_orders",
    "q4_order_priority",
    "rollup_agg",
    "scalar_subquery_above_avg",
    "semi_join_with_orders",
    "setop_except_all_keys",
    "setop_except_nations",
    "setop_intersect_all_keys",
    "setop_intersect_nations",
    "setop_union_all_keys",
    "setop_union_nations",
    "sort_events_top50",
    "topk_orders",
    "window_rank_top3",
    "window_running_total",
]

_NEW_R5: list[str] = [
    "ivf_recall_curve",
    "capped_balance_daily",
    "user_activity_streaks",
    "cumulative_unique_users",
    "equidepth_totalprice_bounds",
    "pareto_frontier_parts",
    "mode_brand_per_type",
    "topk_with_ties_orders",
    "weighted_median_quantity",
    "scd2_point_in_time_status",
    "dau_mau_stickiness",
    # not new, but round-5 changed their live behavior (dbl_wide
    # moments / regex group idx / SRP bucket cap) — window them for
    # fresh verdicts rather than leaning on pre-change evidence
    "stats_corr_covar_exact",
    "redact_documents",
    "embedding_srp_pairs",
]

_REPINS_R5 = [
    # frozen bench set, highest-traffic first (q18_large_orders sits
    # in _PRIORITY_R5 this round; incremental_minhash_multibatch is
    # the round-4 bench addition)
    "flagship_enrich",
    "q1_pricing_summary",
    "sessionize_events",
    "minhash_lsh_neardup",
    "simhash_near_pairs",
    "incremental_minhash_multibatch",
    "knn_cosine_fast",
    "knn_pandas_topk",
    "knn_brute_topk",
    "exact_dup_groups",
    "embedding_neardup_pairs",
    "decontaminate_ngram_hits",
    "fuzzy_dup_parts",
    "tfidf_top_terms",
    "passage_dedup_stats",
    "bigram_familiarity_score",
    "dup_span_ladder",
    "asof_latest_order",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q12_priority_shipping_counts",
    "q13_order_count_distribution",
    "token_frequency_top100",
    "occupancy_rate_by_region",
    "text_quality_stats",
    "chunk_documents",
    "training_data_pipeline",
    # §2 CDC/streaming core re-pins (the rest lead the window this
    # round as _PRIORITY_R5 members)
    "cdc_filter_project",
    "temporal_active_filter",
    "session_window_agg",
    "timestamp_parse_roundtrip",
]

_WINDOW_R5 = (*_PRIORITY_R5, *_NEW_R5, *_REPINS_R5)[:50]


def _reorder() -> None:
    missing = [n for n in _WINDOW_R5 if n not in REGISTRY]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    if len(_WINDOW_R5) != len(set(_WINDOW_R5)):
        raise ValueError("duplicate names in window")
    no_oracle = [n for n in _WINDOW_R5 if REGISTRY[n].oracle is None]
    if no_oracle:
        raise ValueError(f"rows-only queries may not sit in the driver window: {no_oracle}")
    rest_oracle = [n for n, s in REGISTRY.items() if n not in _WINDOW_R5 and s.oracle is not None]
    rest_rows_only = [n for n, s in REGISTRY.items() if n not in _WINDOW_R5 and s.oracle is None]
    ordered = {n: REGISTRY[n] for n in (*_WINDOW_R5, *rest_oracle, *rest_rows_only)}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
