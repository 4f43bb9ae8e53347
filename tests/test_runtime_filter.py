"""AQE runtime bloom-filter join (Spark's runtime semi-join reduction).

At 100 TB the dominant join cost is scanning and shuffling fact rows
that a selective dimension filter would discard AFTER the shuffle.
Spark's runtime bloom filter builds a filter from the already-filtered
build side and injects it into the fact scan as
``bloom_filter_might_contain`` — rows drop BEFORE the exchange, cutting
shuffle bytes by the dim filter's selectivity.

The feature is on by default (`spark.sql.optimizer.runtime.bloomFilter.
enabled=true`) but guarded by an application-side scan-size threshold
of 10 GiB — correct in production (the filter only pays for itself on
big scans), never reachable on CI fixtures. These tests drop the
thresholds to prove the wiring end to end: the filter appears in the
optimized plan, and the filtered result equals the plain join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flinkstreametl_spark.sources.parquet import load_table

_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # force a non-broadcast join so the runtime filter has a shuffle to save
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def runtime_filter_conf(spark):
    old = {}
    for k, v in _CONF.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_orderpriority"
    )


def test_bloom_filter_injected_into_fact_scan(spark, sf_dir, runtime_filter_conf):
    plan = _join(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan and "bloom_filter_agg" in plan, plan[:2000]


def test_bloom_filtered_join_matches_plain_join(spark, sf_dir, runtime_filter_conf):
    filtered = sorted(tuple(r) for r in _join(spark, sf_dir).collect())
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        plain = sorted(tuple(r) for r in _join(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert filtered == plain and len(filtered) > 0
