"""Audit engine-side output types for every oracle-backed query.

The driver's value-hash is typed: a DuckDB HUGEINT vs Spark BIGINT
mismatch fails the hash even when the values are numerically equal
(round-1 lesson: occupancy_rate_by_region / sessionize_events). Both
engines expose result types lazily, so this audit is cheap — no query
execution.

Usage: python tools/typecheck_oracles.py [sf_dir]
Prints one line per mismatched column; exit code 1 if any.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flinkstreametl_spark.plans import REGISTRY
from flinkstreametl_spark.schemas import FIXTURE_TABLES
from flinkstreametl_spark.session import get_spark


# Spark simpleString -> acceptable DuckDB type strings.
#
# Calibrated against round-1 driver evidence (CORRECTNESS_r01.json): the
# driver's hash normalizes through pandas, so int-width differences
# (Spark INT vs DuckDB BIGINT) and timestamp_ntz vs TIMESTAMP hash equal
# — r01 queries with those combos all passed. DuckDB HUGEINT (int128)
# however becomes float64 in pandas and fails the hash — both r01
# hash-FAILs were exactly that. So integer widths are mutually
# compatible here, but HUGEINT is never acceptable.
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_SCALAR = {
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


def compatible(spark_t: str, duck_t: str) -> bool:
    spark_t = spark_t.lower()
    duck_t = duck_t.upper()
    if spark_t in _SCALAR:
        return duck_t in _SCALAR[spark_t]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", spark_t)
    if m:
        # exact precision+scale match required: the arrow buffers differ
        return duck_t == f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"array<(.+)>", spark_t)
    if m:
        inner = m.group(1)
        dm = re.fullmatch(r"(.+)\[\]", duck_t)
        return bool(dm) and compatible(inner, dm.group(1))
    if spark_t.startswith("map<") or spark_t.startswith("struct<"):
        return duck_t.startswith("MAP") or duck_t.startswith("STRUCT")
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            stypes = dict(sdf.dtypes)
            rel = con.sql(spec.oracle)
            dtypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # surface, don't mask
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        if sorted(stypes) != sorted(dtypes):
            print(f"{name}: column sets differ spark={sorted(stypes)} duck={sorted(dtypes)}")
            bad += 1
            continue
        for col, st in stypes.items():
            if not compatible(st, dtypes[col]):
                print(f"{name}.{col}: spark={st} duck={dtypes[col]}")
                bad += 1
    con.close()
    print(f"typecheck: {bad} mismatched columns/queries")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
