"""Round-14 optimization measurement harness (guide §1).

For each named bench query: capture `.explain("formatted")` into
plans/r14/<name>_<tag>.txt and time N isolated executions with the
bench's own action (`count()`) plus one noop-sink run (guide §1.4) so
the computation is timed without the count's column pruning advantage.

Usage:
  python tools/profile_bench.py --tag before [--runs 3] [name ...]
With no names, runs the whole bench set.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkstreametl_spark.plans import REGISTRY  # noqa: E402
from flinkstreametl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    ),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    names = args.names or sorted(
        n for n, s in REGISTRY.items() if "bench" in s.tags
    )
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("profile-bench")

    # Warmup identical to bench.py: touch every fixture table once.
    from flinkstreametl_spark.schemas import FIXTURE_TABLES
    from flinkstreametl_spark.sources.parquet import load_table

    for t in FIXTURE_TABLES:
        load_table(spark, SF_DIR, t).count()
    REGISTRY["flagship_enrich"].fn(spark, SF_DIR).count()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if not args.no_plan:
            df = REGISTRY[name].fn(spark, SF_DIR)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan.rstrip() + "\n")
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        noop = round(time.perf_counter() - t0, 4)
        med = round(statistics.median(samples), 4)
        out[name] = {"median": med, "samples": samples, "noop": noop}
        print(f"# {name}: median {med:.2f}s of {samples} noop {noop:.2f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
