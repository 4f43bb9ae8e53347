"""Source/sink format breadth (SURVEY.md §2.1): beyond parquet, the
engine reads/writes ORC, CSV, and JSON-lines with schema fidelity —
the formats available without external connector jars (Kafka and JDBC
stay behind gated readers since the container ships no broker/driver;
sources/cdc.py's file replay shares the Kafka path's plan)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flinkstreametl_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").limit(200).cache()


def _assert_same(df_a, df_b):
    assert [f.simpleString() for f in df_a.schema.fields] == [
        f.simpleString() for f in df_b.schema.fields
    ]
    a = sorted(map(tuple, df_a.collect()))
    b = sorted(map(tuple, df_b.collect()))
    assert a == b


def test_orc_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "orders_orc")
    sample.write.orc(p)
    _assert_same(sample, spark.read.orc(p))


def test_csv_roundtrip_with_schema(spark, sample, tmp_path):
    """CSV is schemaless; reading back with the writer's schema (and
    timestamp format) must be lossless for these types."""
    p = str(tmp_path / "orders_csv")
    sample.write.option("header", True).option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(p)
    back = (
        spark.read.schema(sample.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(p)
    )
    _assert_same(sample, back)


def test_jsonl_roundtrip_with_schema(spark, sample, tmp_path):
    p = str(tmp_path / "orders_json")
    sample.write.json(p)
    _assert_same(sample, spark.read.schema(sample.schema).json(p))


def test_partitioned_parquet_prunes(spark, sample, tmp_path):
    """Hive-style partitioned layout: a partition-column predicate must
    prune directories at planning time (PartitionFilters, not a full
    scan) — the 100 TB date-pruning pattern."""
    p = str(tmp_path / "orders_part")
    sample.withColumn("status", F.col("o_orderstatus")).write.partitionBy("status").parquet(p)
    df = spark.read.parquet(p).filter(F.col("status") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(status" in plan.replace("#", " #").replace("  ", " ") or (
        "PartitionFilters" in plan and "status" in plan.split("PartitionFilters")[1][:200]
    ), plan
    n_pruned = df.count()
    n_full = sample.filter(F.col("o_orderstatus") == "F").count()
    assert n_pruned == n_full
