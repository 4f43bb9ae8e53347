"""Regenerate docs/PLANS.md: the formatted physical plan of every bench
query at sf0.001 — the evidence trail for the plan-shape claims in
docs/SCALE.md (broadcasts, pushed filters, exchange counts).

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkstreametl_spark.plans import REGISTRY  # noqa: E402
from flinkstreametl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLANS.md")


def main() -> None:
    spark = get_spark("dump-plans")
    names = sorted(n for n, s in REGISTRY.items() if "bench" in s.tags)
    with open(OUT, "w") as f:
        f.write(
            "# PLANS — physical plans of the bench set (generated)\n\n"
            "Regenerate with `python tools/dump_plans.py`. Each section is\n"
            "`explain('formatted')` at sf0.001 — scan-level PushedFilters /\n"
            "ReadSchema included. Read together with docs/SCALE.md.\n"
        )
        for name in names:
            df = REGISTRY[name].fn(spark, SF_DIR)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            plan = df._jdf.queryExecution().explainString(mode)
            f.write(f"\n## {name}\n\n```\n{plan.rstrip()}\n```\n")
    print(f"wrote {OUT} ({len(names)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
