"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Output is split three ways (the driver keeps only a 2000-char tail of
stdout, which a samples-embedded line outgrew in round 12):
- stdout, FINAL line: ONE compact JSON <1900 chars —
  {"metric": "bench_total_sec", ..., "queries": {name: median_2dp},
  "order": "sorted(name)", "value": total_sec} with "order"/"value"
  last so any future truncation eats medians before the headline; if
  the line would exceed 1900 chars the per-query map is dropped
  (medians then live only in the sidecar/stderr).
- sidecar file: the full record (medians + every per-run sample +
  heavy-tier map) at $SPARK_GRAFT_BENCH_SAMPLES (default
  BENCH_SAMPLES.json at the repo root) — the adjudication evidence.
- stderr: the same full record as one JSON line, plus per-query
  progress lines, in case the sidecar is unwritable.

Each timed run executes a query to completion (count() — forces the
full plan; results are not collected to the driver). A warmup pass
first pays JVM/codegen startup so per-query numbers reflect steady
state; per-query medians are over 3 runs (5 for the heavy tier).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flinkstreametl_spark.plans import REGISTRY  # noqa: E402
from flinkstreametl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference-centerpiece enrich join + the heavy
# aggregate/join/dedup/similarity queries (tag "bench"). Sorted by
# name so the bench order is CANONICAL — independent of registry
# order, which the driver-window rotation reshuffles every round
# (VERDICT r11 item 1: the r11 registry reorder moved four unchanged
# queries to the front of the run and their medians inflated 4-15×;
# a name-sorted order makes round-over-round comparisons
# position-stable).
BENCH_QUERIES = sorted(name for name, spec in REGISTRY.items() if "bench" in spec.tags)


def main() -> None:
    spark = get_spark("flinkstreametl-bench")
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # Warmup: absorb session/codegen startup and touch every fixture
    # table once so the first benched query doesn't pay the initial
    # parquet footer reads / filesystem cache misses for its inputs.
    from flinkstreametl_spark.schemas import FIXTURE_TABLES
    from flinkstreametl_spark.sources.parquet import load_table

    for t in FIXTURE_TABLES:
        load_table(spark, SF_DIR, t).count()
    REGISTRY["flagship_enrich"].fn(spark, SF_DIR).count()

    # Median of RUNS executions per query: this VM's wall-clock has
    # ±25% external noise and the first execution additionally pays
    # plan analysis + codegen compile, so single-shot numbers muddied
    # round-over-round comparisons (r1-r3 were single-shot — expect
    # medians to read lower on compile-heavy queries).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Heavy tier (median >3s at sf0.1): the 3-run median wobbles ±25%
    # at that cost — wider than the regressions the bench exists to
    # catch (measured r6→r7: pagerank 3.58→4.33s on an identical
    # plan). 5 runs tightens the median without touching the cheap
    # tier's total runtime.
    heavy_runs = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_RUNS", "5"))
    # dsir_importance_topk joined after its r9 median (2.84s) stayed
    # above the 2.5s watch threshold (VERDICT r9 item 5) — still the
    # unchanged, plan-audited scale-safe plan; the 5-run median makes
    # a real regression separable from the ±25% 3-run wobble.
    heavy = {
        "pagerank_copurchase",
        "ivf_kmeans_recall_curve",
        "hits_order_part_scores",
        "dsir_importance_topk",
        # The streaming replays ≥3s joined in r14 (VERDICT r13 item 2),
        # reversing the r11 "fixed engine overhead, tight spread"
        # rationale: stream_stream_join_replay is the single biggest
        # bench line (6.4s r13 median) and the repeated noise victim
        # (28.2s in r13 run 2, 15.2s in r11) — a 5-run median makes the
        # driver-recorded total robust to the documented multi-minute
        # hypervisor noise windows instead of relying on post-hoc
        # adjudication.
        "stream_stream_join_replay",
        "stream_cdc_upsert_replay",
    }
    times: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        samples = []
        for _ in range(heavy_runs if name in heavy else runs):
            t0 = time.perf_counter()
            n = REGISTRY[name].fn(spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 4)
        all_samples[name] = [round(s, 4) for s in samples]
        print(
            f"# {name}: median {times[name]:.2f}s of {[round(s, 2) for s in samples]} ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(times.values()), 4)
    # Per-run samples must persist for adjudication (VERDICT r11 item
    # 1b) but may NOT ride in the final stdout line: the driver keeps
    # only a 2000-char tail of stdout, and in r12 the samples-embedded
    # line outgrew it, truncating the leading "value" key — the driver
    # recorded BENCH_r12.json {"parsed": null} (VERDICT r12 item 1).
    # So: full record (medians + every sample) goes to a sidecar file
    # and to stderr; the FINAL stdout line is a compact JSON sized to
    # always survive the tail capture (47 medians at 2dp ≈ 1.4k
    # chars), with "value"/"order" LAST in key order so any future
    # truncation eats medians before the headline.
    full_record = {
        "metric": "headline query wall-clock, sum of per-query medians over bench set",
        "value": total,
        "unit": "sec",
        "queries": times,
        "samples": all_samples,
        "sf": sf_val,
        "runs": runs,
        "runs_heavy": {n: heavy_runs for n in sorted(heavy) if n in times},
        "agg": "median",
        "order": "sorted(name)",
    }
    samples_path = os.environ.get(
        "SPARK_GRAFT_BENCH_SAMPLES",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SAMPLES.json"),
    )
    samples_file: str | None = os.path.basename(samples_path)
    try:
        with open(samples_path, "w") as fh:
            json.dump(full_record, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # unwritable sandbox — stderr still has it
        print(f"# samples file not written ({exc})", file=sys.stderr)
        samples_file = None  # don't advertise a file that doesn't exist
    print(json.dumps(full_record), file=sys.stderr)

    # runs_heavy rides in the compact record too (~90 chars): the
    # 5-run heavy tier is load-bearing measurement protocol, and the
    # stdout line is the only thing the driver parses.
    compact_base = {
        "metric": "bench_total_sec",
        "unit": "sec",
        "sf": sf_val,
        "runs": runs,
        "runs_heavy": {n: heavy_runs for n in sorted(heavy) if n in times},
        "agg": "median",
        "samples_file": samples_file,
    }
    compact = json.dumps(
        {
            **compact_base,
            "queries": {n: round(t, 2) for n, t in times.items()},
            "order": "sorted(name)",
            "value": total,
        },
        separators=(",", ":"),
    )
    if len(compact) > 1900:
        # Headroom breach (query-set growth): drop per-query medians
        # from stdout entirely — they live in the sidecar (when
        # samples_file is non-null) and on stderr — and keep the
        # headline parseable no matter what. The key is a plain count
        # (ADVICE r13: "queries_in_file" implied a file that may not
        # have been written).
        compact = json.dumps(
            {
                **compact_base,
                "n_queries": len(times),
                "order": "sorted(name)",
                "value": total,
            },
            separators=(",", ":"),
        )
    print(compact)
    spark.stop()


if __name__ == "__main__":
    main()
