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

# The driver's correctness gate verifies the FIRST 50 registered queries
# (registration order == dict order), so ordering decides what gets a
# driver verdict each round. Round 2 window: the two round-1 hash-FAILs
# (oracle casts now fixed), the two queries promoted from rows-only to
# oracle-backed, then every oracle-backed query that had no round-1
# verdict (the whole LLM/dedup/similarity suite, TPC-H q2/q7-q22
# analogs, pipeline + coverage ops). Queries already verified green in
# CORRECTNESS_r01.json move behind the window (their evidence stands);
# rows-only queries go last so they never consume a verdict slot.
#
# ROUND-3 ROTATION PLAN: once CORRECTNESS_r02 lands, swap the then-
# verified window for the queries still without any driver verdict —
# the round-2 additions (ingest_batch_pipeline, range_join_error_context,
# temperature_mix_sample, cdc_rolling_hash_chunks, audio_features_wav,
# video_frame_sample, bigram_familiarity_score, textrank_keywords,
# funnel_conversion, cohort_retention, weighted_sample_topk,
# quota_sample_per_lang, simhash_near_pairs, knn_cosine_fast,
# ann_ivf_topk, neardup_cluster_assign, and the late round-2 additions
# fuzzy_dup_parts, dup_span_ladder, bpe_train_merges) plus any
# remaining unverified oracle-backed names in registration order.
_WINDOW_R2 = [
    # round-1 hash-FAILs, re-submitted with fixed oracles
    "occupancy_rate_by_region",
    "sessionize_events",
    # promoted rows-only -> exact oracle
    "percentile_quantities",
    "pandas_udf_quality",
    # LLM-pipeline suite (llm.py) — no round-1 verdict
    "text_quality_stats",
    "langid_heuristic",
    "doc_fingerprint",
    "exact_dup_groups",
    "dedup_keep_first",
    "minhash_lsh_neardup",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "knn_brute_topk",
    "embedding_norms",
    "label_centroids",
    "media_meta",
    "bpe_ish_token_count",
    "embedding_neardup_pairs",
    "chunk_documents",
    "doc_repetition_stats",
    # TPC-H analog extensions (tpch_ext.py) — no round-1 verdict
    "q2_min_cost_supplier",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping_counts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_disjunctive_predicate",
    "q20_excess_suppliers",
    "q21_sole_supplier_orders",
    "q22_idle_customers",
    # training-data pipeline ops (pipeline_ext.py) — no round-1 verdict
    "hash_split_train_test",
    "stratified_hash_sample",
    "array_functions_embeddings",
    "training_data_pipeline",
    # coverage extensions (coverage_ext.py / analytics_ext.py) — no round-1 verdict
    "conditional_aggregates",
    "window_range_frame",
    "window_rows_frame_dist",
    "listagg_region_nations",
    "unpivot_part_measures",
    "resample_ffill_hourly",
    "histogram_totalprice",
    "redact_documents",
    "stats_corr_covar_exact",
    "median_disc_quantity",
    "rollup_with_grouping_id",
]


def _reorder() -> None:
    missing = [n for n in _WINDOW_R2 if n not in REGISTRY]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    if len(_WINDOW_R2) != len(set(_WINDOW_R2)):
        raise ValueError("duplicate names in window")
    no_oracle = [n for n in _WINDOW_R2 if REGISTRY[n].oracle is None]
    if no_oracle:
        raise ValueError(f"rows-only queries may not sit in the driver window: {no_oracle}")
    rest_oracle = [n for n, s in REGISTRY.items() if n not in _WINDOW_R2 and s.oracle is not None]
    rest_rows_only = [n for n, s in REGISTRY.items() if n not in _WINDOW_R2 and s.oracle is None]
    ordered = {n: REGISTRY[n] for n in (*_WINDOW_R2, *rest_oracle, *rest_rows_only)}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
