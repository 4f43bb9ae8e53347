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

# The driver's correctness gate verifies the FIRST 50 registered queries
# (registration order == dict order), so ordering decides what gets a
# driver verdict each round. Cumulative green verdicts: 44 (r1) + 49
# (r2) = 93 of 131. Round 3 window: the 35 oracle-backed queries still
# without a verdict (sessionize_events crashed in r2 on the NTZ cast,
# since fixed; the other 34 registered past position 50 in r2), plus 15
# re-pins — flagship + timestamp-heavy queries re-proven against the
# regenerated testdata whose `ts` now reads as TIMESTAMP_NTZ. Verified
# queries move behind the window (their recorded evidence stands);
# rows-only queries go last so they never consume a verdict slot.
#
# ROUND-4 ROTATION PLAN: once CORRECTNESS_r03 lands, the only names
# without a verdict should be the round-3 additions registered after
# this window was frozen — scd2_order_status_history,
# coherent_sample_orders, trend_fit_by_event_type,
# null_safe_join_segments, winsorized_price_stats, zorder_key_orders,
# dq_violation_counts, bpe_encode_token_counts — plus any r3 window
# name that failed. Rotate those to the front; fill the rest of the 50
# with re-pins of the heaviest-traffic queries.
_WINDOW_R3 = [
    # every oracle-backed query still without a green driver verdict
    # (sessionize_events crashed in r2 on the NTZ cast — now fixed;
    # the rest registered after position 50 in the r2 window)
    "sessionize_events",
    "posexplode_tokens",
    "collect_set_sorted",
    "funnel_conversion",
    "cohort_retention",
    "simhash_near_pairs",
    "knn_cosine_fast",
    "ann_ivf_topk",
    "audio_features_wav",
    "video_frame_sample",
    "neardup_cluster_assign",
    "date_arithmetic_orders",
    "grouped_agg_pandas_udf",
    "pack_sequences",
    "decontaminate_ngram_hits",
    "bpe_pair_counts",
    "weighted_sample_topk",
    "quota_sample_per_lang",
    "props_map_entries",
    "fuzzy_dup_parts",
    "tfidf_top_terms",
    "inverted_index_terms",
    "passage_dedup_stats",
    "embedding_srp_pairs",
    "bigram_familiarity_score",
    "textrank_keywords",
    "dup_span_ladder",
    "bpe_train_merges",
    "knn_pandas_topk",
    "kmeans_cluster_sizes",
    "quality_classifier_score",
    "ingest_batch_pipeline",
    "cdc_rolling_hash_chunks",
    "range_join_error_context",
    "temperature_mix_sample",
    # re-pins: flagship + timestamp-heavy queries re-proven against the
    # regenerated testdata (ts now reads as TIMESTAMP_NTZ under Spark 4)
    "flagship_enrich",
    "q1_pricing_summary",
    "asof_latest_order",
    "session_window_agg",
    "sliding_window_counts",
    "temporal_active_filter",
    "timestamp_parse_roundtrip",
    "monthly_revenue_trend",
    "cdc_filter_project",
    "q3_shipping_priority",
    "q5_region_revenue",
    "token_frequency_top100",
    "q6_forecast_revenue",
    "window_lag_lead_ntile",
    "stats_variance_exact",
]


def _reorder() -> None:
    missing = [n for n in _WINDOW_R3 if n not in REGISTRY]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    if len(_WINDOW_R3) != len(set(_WINDOW_R3)):
        raise ValueError("duplicate names in window")
    no_oracle = [n for n in _WINDOW_R3 if REGISTRY[n].oracle is None]
    if no_oracle:
        raise ValueError(f"rows-only queries may not sit in the driver window: {no_oracle}")
    rest_oracle = [n for n, s in REGISTRY.items() if n not in _WINDOW_R3 and s.oracle is not None]
    rest_rows_only = [n for n, s in REGISTRY.items() if n not in _WINDOW_R3 and s.oracle is None]
    ordered = {n: REGISTRY[n] for n in (*_WINDOW_R3, *rest_oracle, *rest_rows_only)}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
