"""Per-query Spark JOB counts, split construction vs action (round-15
measurement harness).

VERDICT r14 item 6: for localCheckpoint-pin changes, `.explain` plan
shrinkage UNDERCOUNTS the work — the pinned subtree's cost moves into
separate eager checkpoint jobs invisible to the final plan. The honest
evidence for pin changes is the number of Spark jobs and where they
run: jobs scheduled while the query function merely BUILDS its
DataFrame (eager pins) vs jobs run by the timed action. This probe
reports both, plus wall-clock for each phase, using the driver's
AppStatusStore job list (no UI needed).

Usage:
  python tools/job_count_probe.py [--runs 2] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkstreametl_spark.plans import REGISTRY  # noqa: E402
from flinkstreametl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _n_jobs(spark) -> int:
    store = spark._jsparkSession.sparkContext().statusStore()
    return store.jobsList(None).size()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("job-count-probe")

    from flinkstreametl_spark.schemas import FIXTURE_TABLES
    from flinkstreametl_spark.sources.parquet import load_table

    for t in FIXTURE_TABLES:
        load_table(spark, SF_DIR, t).count()

    out: dict[str, list[dict]] = {}
    for name in args.names:
        runs = []
        for _ in range(args.runs):
            j0 = _n_jobs(spark)
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            j1 = _n_jobs(spark)
            df.count()
            t2 = time.perf_counter()
            j2 = _n_jobs(spark)
            runs.append(
                {
                    "construct_jobs": j1 - j0,
                    "construct_sec": round(t1 - t0, 3),
                    "action_jobs": j2 - j1,
                    "action_sec": round(t2 - t1, 3),
                }
            )
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
