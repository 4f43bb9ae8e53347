"""Scalable exact global ranking (VERDICT r10 item 3 / ADVICE r10).

``row_number() OVER (ORDER BY ...)`` with no partition spec funnels
the whole table through ONE task — fine at fixture scale, a
single-core sort of the corpus at 100 TB. The classical two-phase
rewrite used here: range-repartition on the order key (a distributed
sort, every task sorts only its slice), rank locally with a
PARTITIONED window, then lift local ranks to global ranks with the
per-partition count prefix sums — a <=P-row driver collect, the same
parameter-sized pattern the graph/ANN operators use.

Range partitions are non-overlapping in key order, so
``global rank = offset[pid] + local rank`` wherever the sampled range
boundaries land: boundary placement affects load balance only, never
rank values. With a total order (unique key) the result is therefore
bit-identical to the unpartitioned window and deterministic; with ties
the rank PERMUTATION within a tie group is arbitrary either way, so
any value-at-rank or tile-of-row consumer sees identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(df: DataFrame, order_cols: list[str], out_col: str = "_rn") -> DataFrame:
    """Return ``df`` (localCheckpoint-pinned) plus a 1-based exact
    global ``row_number`` over ``order_cols`` named ``out_col``,
    computed without an unpartitioned window.

    The repartitioned input is pinned BEFORE the count collect: the
    range exchange samples boundaries per job, so the counts job and
    downstream consumers must see one frozen partitioning, not two
    independently sampled ones."""
    spark = df.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    keyed = (
        df.repartitionByRange(nparts, *[F.col(c) for c in order_cols])
        .withColumn("_gr_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        (r["_gr_pid"], r["c"])
        for r in keyed.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    off_map = F.create_map(*[F.lit(v) for pid_off in offsets.items() for v in pid_off])
    lw = Window.partitionBy("_gr_pid").orderBy(*order_cols)
    rank: Column = F.row_number().over(lw) + F.coalesce(
        off_map[F.col("_gr_pid")], F.lit(0)
    )
    return keyed.withColumn(out_col, rank.cast("long")).drop("_gr_pid")
