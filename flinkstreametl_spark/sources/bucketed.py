"""Bucketed (pre-partitioned, co-located) tables: the storage-side
answer to the biggest 100 TB cost in this engine — the fact-fact shuffle.

A join of two 100 TB-scale tables hash-partitions BOTH sides on the key
at query time (two full network shuffles) unless the data is already
laid out that way. Writing both tables bucketed by the join key with the
same bucket count makes every future join/aggregation on that key
shuffle-free: Spark maps bucket i of the left table to bucket i of the
right and sort-merge-joins partition-locally. The write pays the shuffle
ONCE; every downstream query skips it.

The reference has no storage layer at all (it streams row-by-row into
JDBC, SinkToMySQL.java:57-65), so this is pure [EXT] — but it is the
difference between a plan that survives 1000 executors and one that
doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist `df` as a bucketed managed table: hash-bucketed and
    (optionally) sorted by the key inside each bucket — sorted buckets
    additionally eliminate the sort phase of downstream sort-merge
    joins, leaving a pure streaming merge."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
