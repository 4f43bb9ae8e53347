"""Command-line entry: list, run, and explain registered queries.

Usage:
    python -m flinkstreametl_spark list [--tag TAG]
    python -m flinkstreametl_spark run NAME [--sf-dir DIR] [--limit N]
    python -m flinkstreametl_spark explain NAME [--sf-dir DIR]
    python -m flinkstreametl_spark oracle NAME

A user of the reference project drives it through one hard-wired Flink
job (`Main.java`); here every operator is a named query over the same
fixture tables, runnable and inspectable individually — `run` executes
on Spark, `oracle` prints the DuckDB-portable SQL twin, `explain`
prints the formatted physical plan (broadcasts, pushed filters,
exchanges) for plan review.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flinkstreametl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", default=None, help="filter by tag")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("name")
        p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        if name == "run":
            p.add_argument("--limit", type=int, default=20)

    p_oracle = sub.add_parser("oracle", help="print the DuckDB SQL twin")
    p_oracle.add_argument("name")

    args = ap.parse_args(argv)

    import flinkstreametl_spark.plans  # noqa: F401  (registration side effects)
    from flinkstreametl_spark.plans.registry import AUDIT_REGISTRY, all_specs

    specs = all_specs()
    if args.cmd == "list":
        for name, spec in specs.items():
            if args.tag and args.tag not in spec.tags:
                continue
            kind = "audit-only" if name in AUDIT_REGISTRY else ("oracle" if spec.oracle else "rows-only")
            print(f"{name:40s} [{kind}] {','.join(spec.tags)}")
        return 0

    if args.name not in specs:
        print(f"unknown query: {args.name!r} (see `list`)", file=sys.stderr)
        return 2
    spec = specs[args.name]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("-- rows-only query: no SQL twin", file=sys.stderr)
            return 1
        print(spec.oracle.strip())
        return 0

    from flinkstreametl_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}-{args.name}")
    df = spec.fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
