"""Bucketed co-located join: proves the shuffle is eliminated — the
storage-layout optimization a 100 TB deployment relies on (docs/SCALE.md).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flinkstreametl_spark.sources.bucketed import write_bucketed
from flinkstreametl_spark.sources.parquet import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, "li_bkt", "l_orderkey", 8, path=str(tmp_path / "li"))
    write_bucketed(orders, "ord_bkt", "o_orderkey", 8, path=str(tmp_path / "ord"))
    yield "li_bkt", "ord_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    """Join of two tables bucketed on the join key with equal bucket
    counts must contain NO Exchange (shuffle) in the physical plan."""
    li_t, ord_t = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the test exercises the bucketed path, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(li_t).join(
            spark.table(ord_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness unchanged
        n_bucketed = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    n_plain = (
        spark.table(li_t)
        .join(F.broadcast(spark.table(ord_t)), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n_bucketed == n_plain


def test_bucketed_groupby_no_shuffle(spark, bucketed_pair):
    """Aggregation on the bucket key also skips its shuffle: the
    HashAggregate runs bucket-locally."""
    li_t, _ = bucketed_pair
    agg = spark.table(li_t).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
