"""sf1 cross-check for containment_dup_pairs when the DuckDB oracle
exceeds the box: the oracle's fully RELATIONAL formulation (exploded
(doc, shingle) joins, no arrays) re-implemented in Spark as an
INDEPENDENT twin of the production array-based plan, and compared
row-for-row.

Why this exists: the registered DuckDB oracle is the driver gate at
sf0.01 and passes there; at sf1 its candidate-dedup + overlap join
spills >80 GB and cannot complete in this container (round-10 sweep
note). The production Spark plan finishes sf1 in ~100 s, so the gap is
oracle-side resources, not engine correctness — this script closes the
sf1 evidence gap with a within-Spark dual implementation: different
join/verification shape (explode + count join vs array_intersect on
pinned sets), same closed-form spec.

Usage: python tools/containment_twin_check.py [--sf-dir .fixtures/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.operators import text as X
from flinkstreametl_spark.plans import REGISTRY
from flinkstreametl_spark.plans.corpus_ext import (
    _CONT_CAP,
    _CONT_MIN,
    _CONT_TAU_DEN,
    _CONT_TAU_NUM,
)
from flinkstreametl_spark.sources.parquet import load_table


def relational_twin(spark: SparkSession, sf_dir: str):
    """The oracle's exploded-join formulation, in Spark: shingle rows,
    df, prefix pigeonhole, candidate equi-join, overlap = COUNT over
    the shared-shingle join (never array ops)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", X.tokens("text").alias("toks")).filter(F.size("toks") >= 3)
    sh = (
        base.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks)-3),"
                    " i -> concat_ws('_', toks[i], toks[i+1], toks[i+2]))"
                )
            ).alias("s"),
        )
        .distinct()
        .localCheckpoint()
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    dfc = sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ranked = (
        sh.join(dfc, "s")
        .join(sz, "doc_id")
        .withColumn("rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")))
    )
    t_of_n = F.expr(f"(n * {_CONT_TAU_NUM} + {_CONT_TAU_DEN} - 1) div {_CONT_TAU_DEN}")
    pre = ranked.filter(
        (F.col("n") >= _CONT_MIN)
        & (F.col("rn") <= F.col("n") - t_of_n + 1)
        & (F.col("df") <= _CONT_CAP)
    ).select(F.col("doc_id").alias("doc_a"), "s")
    idx = (
        sh.join(dfc, "s")
        .filter(F.col("df") <= _CONT_CAP)
        .select(F.col("doc_id").alias("doc_b"), "s")
    )
    cand = (
        pre.join(idx, "s")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ov = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    return (
        ov.join(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .filter(F.col("overlap") * _CONT_TAU_DEN >= F.col("n_a") * _CONT_TAU_NUM)
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "overlap",
            (F.col("overlap").cast("double") / F.col("n_a").cast("double")).alias("containment"),
        )
    )


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
    t0 = time.perf_counter()
    prod = {
        (r.doc_a, r.doc_b): (r.n_a, r.overlap, r.containment)
        for r in REGISTRY["containment_dup_pairs"].fn(spark, args.sf_dir).collect()
    }
    t1 = time.perf_counter()
    twin = {
        (r.doc_a, r.doc_b): (r.n_a, r.overlap, r.containment)
        for r in relational_twin(spark, args.sf_dir).collect()
    }
    t2 = time.perf_counter()
    only_prod = set(prod) - set(twin)
    only_twin = set(twin) - set(prod)
    val_mismatch = [k for k in set(prod) & set(twin) if prod[k] != twin[k]]
    ok = not only_prod and not only_twin and not val_mismatch and prod
    print(
        f"pairs={len(prod)} prod_s={t1 - t0:.1f} twin_s={t2 - t1:.1f} "
        f"only_prod={len(only_prod)} only_twin={len(only_twin)} "
        f"val_mismatch={len(val_mismatch)} -> {'OK' if ok else 'FAIL'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
