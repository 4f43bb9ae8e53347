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


def with_global_rank(df: DataFrame, order_cols: list, out_col: str = "_rn") -> DataFrame:
    """Return ``df`` (localCheckpoint-pinned) plus a 1-based exact
    global ``row_number`` over ``order_cols`` (names or Column sort
    expressions, e.g. ``F.col("x").desc()``) named ``out_col``,
    computed without an unpartitioned window.

    The repartitioned input is pinned BEFORE the count collect: the
    range exchange samples boundaries per job, so the counts job and
    downstream consumers must see one frozen partitioning, not two
    independently sampled ones."""
    spark = df.sparkSession
    exprs = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    keyed = (
        df.repartitionByRange(nparts, *exprs)
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
    lw = Window.partitionBy("_gr_pid").orderBy(*exprs)
    rank: Column = F.row_number().over(lw) + F.coalesce(
        off_map[F.col("_gr_pid")], F.lit(0)
    )
    return keyed.withColumn(out_col, rank.cast("long")).drop("_gr_pid")


def ntile_from_rank(rank: Column, total: int, n: int) -> Column:
    """NTILE(``n``) as a closed form over a 1-based exact global rank:
    with q, rem = divmod(total, n), the first ``rem`` tiles hold q+1
    rows. Bit-identical to the SQL NTILE the oracles state."""
    q, rem = divmod(total, n)
    big_cut = rem * (q + 1)
    return F.when(
        rank <= F.lit(big_cut), F.floor((rank - 1) / F.lit(q + 1)) + 1
    ).otherwise(
        F.lit(rem) + F.floor((rank - F.lit(big_cut) - 1) / F.lit(max(q, 1))) + 1
    )


def with_running_sum(
    df: DataFrame, order_cols: list, value_col: str, out_col: str
) -> DataFrame:
    """Exact running ``SUM(value_col)`` over the total order
    ``order_cols`` without an unpartitioned window — the sweep-line /
    prefix-scan primitive. Same two-phase shape as ``with_global_rank``
    but the driver-collected per-partition summaries carry VALUE totals
    instead of row counts, so the lift adds each earlier partition's
    sum. ``order_cols`` must form a total order or the per-row running
    values inside a tie group are order-ambiguous."""
    spark = df.sparkSession
    exprs = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)
    keyed = (
        df.repartitionByRange(nparts, *exprs)
        .withColumn("_rs_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = sorted(
        (r["_rs_pid"], r["t"])
        for r in keyed.groupBy("_rs_pid").agg(F.sum(value_col).alias("t")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, t in totals:
        offsets[pid] = acc
        acc += t
    off_map = F.create_map(*[F.lit(v) for pid_off in offsets.items() for v in pid_off])
    lw = (
        Window.partitionBy("_rs_pid")
        .orderBy(*exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run: Column = F.sum(value_col).over(lw) + F.coalesce(
        off_map[F.col("_rs_pid")], F.lit(0)
    )
    return keyed.withColumn(out_col, run.cast("long")).drop("_rs_pid")


def with_ntile(df: DataFrame, n: int, order_cols: list, out_col: str) -> DataFrame:
    """Exact NTILE(``n``) over the total order ``order_cols`` without an
    unpartitioned window: ``with_global_rank`` + the closed form.
    ``order_cols`` may be column names or Column expressions (they must
    form a total order for the tile assignment to be deterministic)."""
    ranked = with_global_rank(df, order_cols, "_nt_rank")
    total = ranked.count()  # checkpointed inside with_global_rank — cheap
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("_nt_rank"), total, n).cast("int")
    ).drop("_nt_rank")
