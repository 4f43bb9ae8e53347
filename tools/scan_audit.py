"""Repo-wide duplicate-scan audit: build every registered query's plan
at sf0.001 and report queries whose final plan scans the SAME parquet
table >= 3 times.

A high count is either (a) the lazy-reuse-in-loops trap — an iterative
consumer replaying its upstream derivation per iteration (textrank was
22 scans of documents before round 6 wave 3 pinned its loop inputs) or
(b) a deliberate multi-pass design (banded LSH self-joins, the
equi-depth two-level selection, tf-idf's df/tf passes) where each scan
is a narrow column-pruned pass that is CHEAPER than pinning the table.
The tool cannot tell them apart — a human (or the next round's
reviewer) judges each line; the value is that NEW regressions show up
as diffs against the table below.

Usage: python tools/scan_audit.py  [writes nothing; prints the table]

Expected state (round 9) — all deliberate multi-pass designs (each
extra scan is a narrow column-pruned pass judged cheaper than a
materialization):
  ann_ivf_topk 3, cluster_safe_split 3, dedup_method_agreement 8,
  domain_budget_allocation 8, embedding_srp_pairs 4,
  equidepth_totalprice_bounds 5, incremental_minhash_multibatch 4,
  lsh_precision_recall_audit 4, minhash_lsh_neardup 4,
  neardup_source_matrix 6 (the minhash chain's 4 + two (doc_id, source)
  dimension lookups), ngram_repetition_stats 3,
  nucleus_sample_per_source 3, pareto_frontier_parts 3,
  resample_ffill_hourly 3, session_gap_sensitivity 3 (one narrow pass
  per timeout variant), temperature_mix_sample 3, tfidf_top_terms 3.
Round-11 history: the audit caught mann_kendall_trend_daily replaying
the _daily events aggregation for each of its 3 consumers — fixed by
pinning the daily frame (timeseries_ext.py), restoring the table above.
Round-9 history: the audit caught four fresh additions
(funnel_conversion_steps at SEVEN events scans — unpinned stage
lineage replayed per consumer — plus cohort/mannwhitney/dataset_card
at 3-4); all four were pinned/combined the same day and now plan at
<= 1 scan per table.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkstreametl_spark.plans import REGISTRY  # noqa: E402
from flinkstreametl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = get_spark("scan-audit")
    flagged = 0
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — audit must keep going
            print(f"{name}: ERR {type(ex).__name__}: {ex}")
            flagged += 1
            continue
        tables = re.findall(r"file:[^\s\]]*/(\w+)\.parquet", plan)
        multi = {t: n for t, n in collections.Counter(tables).items() if n >= 3}
        if multi:
            print(f"{name}: {multi}")
            flagged += 1
    print(f"total flagged: {flagged}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
