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

# The driver's correctness gate verifies the FIRST 50 registered queries
# (registration order == dict order), so ordering decides what gets a
# driver verdict each round. CORRECTNESS_r05 came back 50/50 green, so
# entering round 6 EVERY registered query (176) holds a green driver
# verdict on record (cumulative r1-r5) and the oldest evidence tier is
# the 43 names whose newest verdict is r2-era. Round 6 executes the
# recorded rotation (commit 91f962b; VERDICT r5 item 1):
#   1. _PRIORITY_R6 — exactly those 43 r2-era names (computed from
#      CORRECTNESS_r01–r05 latest-verdict distribution: r5=50, r4=43,
#      r3=40, r2=43). Their verdicts predate the round-5
#      regex/decimal/cap fixes and two rounds of shared-helper
#      refactors (plans/shared.py). After this round the oldest
#      verdict repo-wide is r3.
#   2. _NEW_R6 — queries added during round 6; every new registration
#      is appended here THE DAY IT LANDS so it gets a verdict this
#      round instead of waiting a full rotation. CAP: 43 priority
#      names leave only 7 window slots, so at most 7 additions may
#      register as driver-facing this round — more would silently
#      evict priority names at the [:50] truncation (guarded below).
#   3. _REPINS_R6 — flagship + highest-traffic bench names fill any
#      remaining tail slots; each already holds a fresh r4/r5 verdict,
#      so displacement never loses evidence.
# Verified queries move behind the window (their recorded evidence
# stands). The 3 sketch queries (HLL/KLL/moments) live in
# AUDIT_REGISTRY — queries() stays 100% oracle-backed.
#
# ROUND-7 ROTATION PLAN: if CORRECTNESS_r06 comes back 50/50 green,
# the oldest tier becomes the 40 r3-era names (ann_ivf_topk,
# asof_latest_order, cdc_filter_project, kmeans_cluster_sizes, the
# q3/q5/q6 analogs, ...). Round 7 window = _NEW_R7 + those 40
# oldest-first + re-pins. If any r6 window name fails, it leads the
# round-7 window after repair. _NEW_R7 MUST start with the five
# late-round-6 additions, which have NO driver verdict yet (the r6
# window was already full when they landed; each is verified at
# sf0.001/sf0.01/sf1 locally — see docs/ROUND6.md): pagerank_copurchase,
# split_leakage_audit, domain_signature_terms,
# lsh_precision_recall_audit, dedup_method_agreement,
# cluster_safe_split, tokenizer_fertility_by_lang,
# split_representativeness_audit, and (wave 3) token_balanced_shards
# and pq_adc_recall. That is 10 additions + 40 r3-era names = the
# full round-7 window with zero re-pin slots — the soft cap is
# reached; any further round-6 addition would push an r3-era name's
# refresh to round 8. Do not add more this round.
_PRIORITY_R6 = [
    # the 43 r2-era names, §2/goal-parity core first
    "occupancy_rate_by_region",
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
    "conditional_aggregates",
    "histogram_totalprice",
    "listagg_region_nations",
    "median_disc_quantity",
    "percentile_quantities",
    "resample_ffill_hourly",
    "rollup_with_grouping_id",
    "unpivot_part_measures",
    "window_range_frame",
    "window_rows_frame_dist",
    "pandas_udf_quality",
    # LLM-pipeline tier
    "array_functions_embeddings",
    "bpe_ish_token_count",
    "chunk_documents",
    "dedup_keep_first",
    "doc_fingerprint",
    "doc_repetition_stats",
    "embedding_norms",
    "hash_split_train_test",
    "label_centroids",
    "langid_heuristic",
    "media_meta",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "stratified_hash_sample",
    "text_quality_stats",
    "training_data_pipeline",
]

_NEW_R6: list[str] = [
    # four names changed live behavior or oracle contract this round
    # (fresh verdicts needed on the changed semantics), three are new
    # registrations:
    "copurchase_triangle_stats",  # oracle rewritten to the adjacency-intersection form (runs at sf1)
    "weighted_median_quantity",  # weights now floor() on both engines (ADVICE r5)
    "image_phash_neardup",  # synthetic image space now scales with the corpus (sf1 artifact fix)
    "semantic_dedup_pairs",  # oracle pair scoring rewritten to in-row list folds (sf1 oracle cost)
    "ivf_kmeans_recall_curve",  # NEW: the recall curve with the kmeans-learned coarse quantizer
    "mixture_weights_by_lang",  # NEW: temperature (alpha=0.5) data-mixture allocation planner
    "context_length_waste_curve",  # NEW: truncation/padding loss per candidate context length
]

_REPINS_R6 = [
    # flagship + §2 core re-pins — fill tail slots ONLY if priority +
    # new leave room ([:50] cuts from here first; all three hold fresh
    # r5 verdicts, so being cut loses nothing). This round 43 + 7 fill
    # the window exactly and none of these enter it.
    "flagship_enrich",
    "q1_pricing_summary",
    "cdc_filter_project",
]

_WINDOW_R6 = (*_PRIORITY_R6, *_NEW_R6, *_REPINS_R6)[:50]

# Everything the round owes a verdict — the 43 stale-evidence names AND
# every round-6 addition/behavior change — must survive the [:50]
# truncation. (Priority names lead the tuple and cannot be cut; the
# _NEW_R6 tail is what an 8th addition would silently evict.)
assert len(_PRIORITY_R6) + len(_NEW_R6) <= 50, (
    "round-6 window overflows: an addition would fall out of the driver "
    "window and ship without a verdict; move a priority name out instead"
)
assert all(n in _WINDOW_R6 for n in (*_PRIORITY_R6, *_NEW_R6))


def _reorder() -> None:
    missing = [n for n in _WINDOW_R6 if n not in REGISTRY]
    if missing:
        raise ValueError(f"window names not registered: {missing}")
    if len(_WINDOW_R6) != len(set(_WINDOW_R6)):
        raise ValueError("duplicate names in window")
    no_oracle = [n for n in _WINDOW_R6 if REGISTRY[n].oracle is None]
    if no_oracle:
        raise ValueError(f"rows-only queries may not sit in the driver window: {no_oracle}")
    rest_oracle = [n for n, s in REGISTRY.items() if n not in _WINDOW_R6 and s.oracle is not None]
    rest_rows_only = [n for n, s in REGISTRY.items() if n not in _WINDOW_R6 and s.oracle is None]
    ordered = {n: REGISTRY[n] for n in (*_WINDOW_R6, *rest_oracle, *rest_rows_only)}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
