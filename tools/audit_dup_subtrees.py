"""Audit every registry query's physical plan for duplicated expensive
subtrees — the self-join / fan-out recompute pattern round 14 fixed in
the bench set (Spark plans each side of a self-join as a full subtree
and does not dedupe common subplans).

Heuristic: group operator-node signatures that mark real work
(Generate = explode/tokenize, BatchEvalPython/ArrowEvalPython/
MapInPandas = Python crossing, HashAggregate over a parquet scan) by
their detail string; more than one occurrence of the same signature in
one plan usually means the same upstream stage executes twice.

Usage: python tools/audit_dup_subtrees.py [--sf-dir /root/testdata/sf0.001]
Prints one line per (query, duplicated-signature) hit.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkstreametl_spark.plans import REGISTRY  # noqa: E402
from flinkstreametl_spark.session import get_spark  # noqa: E402

INTERESTING = ("Generate", "ArrowEvalPython", "BatchEvalPython", "MapInPandas")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("audit-dup-subtrees")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    names = args.names or sorted(REGISTRY)
    hits = 0
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            continue
        # Details section: "(12) Generate\nInput ...\nArguments: ..." —
        # fingerprint = node kind + normalized first argument line
        # (expression ids stripped so identical subtrees match).
        sigs = []
        for m in re.finditer(
            r"^\(\d+\) (\w+)[^\n]*\n((?:[A-Z][^\n]*\n?)*)", plan, re.M
        ):
            kind = m.group(1)
            if kind not in INTERESTING:
                continue
            detail = re.sub(r"#\d+[L]?", "#x", m.group(2))[:300]
            sigs.append(f"{kind}:{detail}")
        for sig, cnt in Counter(sigs).items():
            if cnt > 1:
                hits += 1
                print(f"{name}: x{cnt} {sig.splitlines()[0][:160]}", flush=True)
    print(f"# total duplicated-signature hits: {hits}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
