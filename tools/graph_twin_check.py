"""sf1 cross-check for hits_order_part_scores and
bfs_hop_profile_copurchase, whose DuckDB oracles exceed the
container's disk at sf1 (VERDICT r10 item 4; the round-10 sweep
bounded them with AS MATERIALIZED but the materialized intermediates
still spill past the box at sf1).

Pattern ported from tools/containment_twin_check.py: the ORACLE'S OWN
formulation — the unrolled SQL chain the driver runs through DuckDB at
sf0.01 — re-executed INDEPENDENTLY in Spark, step by step over temp
views with each intermediate localCheckpoint-materialized (the exact
role AS MATERIALIZED plays in DuckDB), then compared value-for-value
against the production DataFrame plans. Different authorship path
(oracle SQL text -> spark.sql per step) vs the production DataFrame
chains, same closed-form spec; a bug in either side breaks the
zero-mismatch compare.

Usage: python tools/graph_twin_check.py [--sf-dir .fixtures/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession

from flinkstreametl_spark.plans import REGISTRY
from flinkstreametl_spark.plans.graph_ext import (
    _BFS_HOPS,
    _HITS_ITERS,
    _HITS_SCALE,
    _HITS_TOPK,
)
from flinkstreametl_spark.sources.parquet import load_table


def hits_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_hits_oracle()'s unrolled chain, one spark.sql per CTE: each
    MATERIALIZED intermediate becomes a localCheckpoint-pinned temp
    view, Spark's DIV standing in for DuckDB's // (identical integral
    quotients on positive BIGINT)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("tw_lineitem")
    e = spark.sql(
        "SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM tw_lineitem"
    ).localCheckpoint()
    e.createOrReplaceTempView("tw_e")
    a = spark.sql(
        f"SELECT DISTINCT p AS node, CAST({_HITS_SCALE} AS BIGINT) AS s FROM tw_e"
    ).localCheckpoint()
    a.createOrReplaceTempView("tw_a")
    for _ in range(_HITS_ITERS):
        hraw = spark.sql(
            "SELECT e.o AS node, CAST(SUM(a.s) AS BIGINT) AS raw"
            " FROM tw_e e JOIN tw_a a ON a.node = e.p GROUP BY e.o"
        ).localCheckpoint()
        hraw.createOrReplaceTempView("tw_hraw")
        h = spark.sql(
            f"SELECT node, raw * {_HITS_SCALE} DIV (SELECT MAX(raw) FROM tw_hraw) AS s"
            " FROM tw_hraw"
        ).localCheckpoint()
        h.createOrReplaceTempView("tw_h")
        araw = spark.sql(
            "SELECT e.p AS node, CAST(SUM(h.s) AS BIGINT) AS raw"
            " FROM tw_e e JOIN tw_h h ON h.node = e.o GROUP BY e.p"
        ).localCheckpoint()
        araw.createOrReplaceTempView("tw_araw")
        a = spark.sql(
            f"SELECT node, raw * {_HITS_SCALE} DIV (SELECT MAX(raw) FROM tw_araw) AS s"
            " FROM tw_araw"
        ).localCheckpoint()
        a.createOrReplaceTempView("tw_a")
    return spark.sql(
        f"""
SELECT side, node, score_fp, rk FROM (
    SELECT 'authority' AS side, node, CAST(s AS BIGINT) AS score_fp,
           CAST(row_number() OVER (ORDER BY s DESC, node) AS BIGINT) AS rk
    FROM tw_a
) x WHERE rk <= {_HITS_TOPK}
UNION ALL
SELECT side, node, score_fp, rk FROM (
    SELECT 'hub' AS side, node, CAST(s AS BIGINT) AS score_fp,
           CAST(row_number() OVER (ORDER BY s DESC, node) AS BIGINT) AS rk
    FROM tw_h
) y WHERE rk <= {_HITS_TOPK}
"""
    )


def bfs_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_bfs_oracle()'s unrolled hop chain, one spark.sql per level with
    the visited union maintained as its own pinned view (the oracle's
    growing `vprev` union, materialized instead of re-expanded)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("tw_lineitem")
    pairs = spark.sql(
        """
SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                greatest(a.l_partkey, b.l_partkey) AS v
FROM tw_lineitem a JOIN tw_lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""
    ).localCheckpoint()
    pairs.createOrReplaceTempView("tw_pairs")
    spark.sql(
        "SELECT u AS a, v AS b FROM tw_pairs UNION ALL SELECT v, u FROM tw_pairs"
    ).localCheckpoint().createOrReplaceTempView("tw_edges")
    lvl = spark.sql("SELECT CAST(MIN(u) AS BIGINT) AS node FROM tw_pairs").localCheckpoint()
    visited = lvl
    visited.createOrReplaceTempView("tw_visited")
    levels = [lvl]
    for _ in range(1, _BFS_HOPS + 1):
        lvl.createOrReplaceTempView("tw_prev")
        nxt = spark.sql(
            "SELECT DISTINCT e.b AS node FROM tw_edges e JOIN tw_prev p ON e.a = p.node"
            " WHERE e.b NOT IN (SELECT node FROM tw_visited)"
        ).localCheckpoint()
        levels.append(nxt)
        visited = visited.union(nxt).distinct().localCheckpoint()
        visited.createOrReplaceTempView("tw_visited")
        lvl = nxt
    for i, df in enumerate(levels):
        df.selectExpr(f"CAST({i} AS BIGINT) AS level", "node").createOrReplaceTempView(
            f"tw_l{i}"
        )
    lv = " UNION ALL ".join(f"SELECT level, node FROM tw_l{i}" for i in range(len(levels)))
    return spark.sql(
        f"""
WITH lv AS ({lv})
SELECT CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_first_reached,
       CAST(SUM(COUNT(*)) OVER (ORDER BY level) AS BIGINT) AS cum_reached
FROM lv GROUP BY level
"""
    )


def _compare(name: str, prod_rows, twin_rows, key) -> bool:
    prod = {key(r): tuple(r) for r in prod_rows}
    twin = {key(r): tuple(r) for r in twin_rows}
    only_prod = set(prod) - set(twin)
    only_twin = set(twin) - set(prod)
    val_mismatch = [k for k in set(prod) & set(twin) if prod[k] != twin[k]]
    ok = bool(prod) and not only_prod and not only_twin and not val_mismatch
    print(
        f"{name}: rows={len(prod)} only_prod={len(only_prod)} "
        f"only_twin={len(only_twin)} val_mismatch={len(val_mismatch)} "
        f"-> {'OK' if ok else 'FAIL'}"
    )
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".fixtures/sf1")
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for name, twin_fn, key in [
        ("hits_order_part_scores", hits_twin, lambda r: (r.side, r.rk)),
        ("bfs_hop_profile_copurchase", bfs_twin, lambda r: r.level),
    ]:
        t0 = time.perf_counter()
        prod_rows = REGISTRY[name].fn(spark, args.sf_dir).collect()
        t1 = time.perf_counter()
        twin_rows = twin_fn(spark, args.sf_dir).collect()
        t2 = time.perf_counter()
        print(f"{name}: prod_s={t1 - t0:.1f} twin_s={t2 - t1:.1f}")
        ok = _compare(name, prod_rows, twin_rows, key) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
