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
# driver verdict each round. CORRECTNESS_r06 came back 50/50 green:
# entering round 7 all 179 ever-driver-checked queries hold a green
# latest verdict (distribution r6=50, r5=49, r4=40, r3=40) and the 10
# late-round-6 additions are registered-but-unchecked. Round 7 executes
# the rotation recorded in round 6 (VERDICT r6 item 1) exactly:
#   1. _NEW_R7 — the 10 round-6 additions with NO driver verdict yet
#      (the r6 window was full when they landed; each verified locally
#      at sf0.001/sf0.01/sf1 — docs/ROUND6.md). They lead so a failure
#      can't be hidden by the [:50] cut.
#   2. _PRIORITY_R7 — exactly the 40 names whose latest verdict is
#      r3-era (computed from CORRECTNESS_r01–r06). Their verdicts
#      predate the round-5 regex/decimal/cap fixes and two rounds of
#      shared-helper refactors. After this round the oldest
#      repo-wide verdict tier becomes r4.
#   3. Zero re-pin slots: 10 + 40 fill the window exactly. Queries
#      ADDED during round 7 (streaming-ANN drift audit, BM25) register
#      BEHIND the window and are recorded below as the r8 window's
#      mandatory leaders — the same cadence that carried the round-6
#      additions here.
# Verified queries move behind the window (their recorded evidence
# stands). The 3 sketch queries (HLL/KLL/moments) live in
# AUDIT_REGISTRY — queries() stays 100% oracle-backed.
#
# ROUND-8 ROTATION PLAN: if CORRECTNESS_r07 comes back 50/50 green,
# the oldest tier becomes the 40 r4-era names. Round 8 window =
# _NEW_R8 (every round-7 addition, appended the day it lands — see
# _NEW_R8 below) + the r4-era names oldest-first, capped at 50. If any
# r7 window name fails, it leads the round-8 window after repair.
_NEW_R7 = [
    # the 10 late-round-6 registrations, driver-unchecked until now
    "pagerank_copurchase",
    "pq_adc_recall",
    "token_balanced_shards",
    "split_leakage_audit",
    "domain_signature_terms",
    "lsh_precision_recall_audit",
    "dedup_method_agreement",
    "cluster_safe_split",
    "tokenizer_fertility_by_lang",
    "split_representativeness_audit",
]

_PRIORITY_R7 = [
    # the 40 r3-era names, §2/goal-parity core first
    "cdc_filter_project",
    "temporal_active_filter",
    "timestamp_parse_roundtrip",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "asof_latest_order",
    "range_join_error_context",
    "session_window_agg",
    "sliding_window_counts",
    "window_lag_lead_ntile",
    "stats_variance_exact",
    "monthly_revenue_trend",
    "cohort_retention",
    "funnel_conversion",
    "date_arithmetic_orders",
    "grouped_agg_pandas_udf",
    "ingest_batch_pipeline",
    "posexplode_tokens",
    "props_map_entries",
    # LLM-pipeline tier
    "ann_ivf_topk",
    "kmeans_cluster_sizes",
    "neardup_cluster_assign",
    "dup_span_ladder",
    "passage_dedup_stats",
    "fuzzy_dup_parts",
    "cdc_rolling_hash_chunks",
    "bpe_pair_counts",
    "bpe_train_merges",
    "bigram_familiarity_score",
    "textrank_keywords",
    "tfidf_top_terms",
    "token_frequency_top100",
    "quality_classifier_score",
    "quota_sample_per_lang",
    "temperature_mix_sample",
    "weighted_sample_topk",
    "pack_sequences",
    "audio_features_wav",
    "video_frame_sample",
]

_NEW_R8: list[str] = [
    # Round-8 additions, appended the day each lands (verified locally
    # at sf0.001/sf0.01 on landing; they lead the round-8 window).
    "bm25_topk_docs",
    "decontaminate_by_retrieval",
    "ann_index_staleness_audit",
]

_WINDOW_R7 = (*_NEW_R7, *_PRIORITY_R7)[:50]

# Everything the round owes a verdict — the 10 unchecked round-6
# additions AND the 40 stale-evidence names — must survive the [:50]
# truncation. The window is exactly full: a round-7 addition placed in
# the window would silently evict a priority name, so additions go to
# _NEW_R8 instead (asserted disjoint below).
assert len(_NEW_R7) + len(_PRIORITY_R7) == 50, (
    "round-7 window must be exactly the 10 unchecked + 40 r3-era names"
)
assert all(n in _WINDOW_R7 for n in (*_NEW_R7, *_PRIORITY_R7))
assert not set(_NEW_R8) & set(_WINDOW_R7), (
    "round-7 additions may not displace window names; they take the r8 window"
)


def _reorder() -> None:
    missing = [n for n in _WINDOW_R7 if n not in REGISTRY]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    if len(_WINDOW_R7) != len(set(_WINDOW_R7)):
        raise ValueError("duplicate names in window")
    no_oracle = [n for n in _WINDOW_R7 if REGISTRY[n].oracle is None]
    if no_oracle:
        raise ValueError(f"rows-only queries may not sit in the driver window: {no_oracle}")
    rest_oracle = [n for n, s in REGISTRY.items() if n not in _WINDOW_R7 and s.oracle is not None]
    rest_rows_only = [n for n, s in REGISTRY.items() if n not in _WINDOW_R7 and s.oracle is None]
    ordered = {n: REGISTRY[n] for n in (*_WINDOW_R7, *rest_oracle, *rest_rows_only)}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
