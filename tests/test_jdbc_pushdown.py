"""S2 JDBC pushdown (sources/jdbc.py): the constructed pushed-down
query must be (a) the reference's documented SQL shape and (b)
semantically identical to the Spark-side dim_3way plan — proven by
executing the generated SQL in DuckDB (standing in for the database
that would run the pushed query) against the same fixture tables."""

from __future__ import annotations

import duckdb
import pytest

from flinkstreametl_spark.operators.joins import dim_3way
from flinkstreametl_spark.sources.jdbc import (
    fixture_dim_query,
    jdbc_reader_options,
    partition_options,
    pushdown_join_query,
    read_jdbc_dim,
    reference_dim_query,
)
from flinkstreametl_spark.sources.parquet import load_table


def test_reference_query_shape():
    q = reference_dim_query()
    assert q.startswith("SELECT ")
    # CreateJDBCInputFormat.java:28-31 structure: address ⟕ location ⟕ region
    assert "FROM t_meeting_address tma" in q
    assert "LEFT JOIN t_meeting_location tml ON tma.location = tml.code" in q
    assert "LEFT JOIN t_meeting_region tmr ON tml.region_id = tmr.id" in q
    assert "tml.id AS location_id" in q


def test_pushdown_query_matches_spark_side_join(spark, sf_dir):
    """DuckDB executes the generated pushdown SQL; Spark executes the
    engine-side dim_3way plan. Same rows = the pushed and in-engine
    forms of J2 are interchangeable."""
    con = duckdb.connect()
    for t in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_rows = sorted(map(tuple, con.sql(fixture_dim_query()).fetchall()))

    dfs = {t: load_table(spark, sf_dir, t) for t in ("customer", "nation", "region")}
    spark_df = dim_3way(dfs["customer"], dfs["nation"], dfs["region"])
    assert spark_df.columns == ["dim_key", "dim_name", "segment", "nation_name", "region_name"]
    spark_rows = sorted(tuple(r) for r in spark_df.collect())
    assert spark_rows == duck_rows


def test_reader_option_wiring():
    opts = jdbc_reader_options("jdbc:mysql://master/canal_test", "SELECT 1", driver="com.mysql.jdbc.Driver")
    assert opts["url"] == "jdbc:mysql://master/canal_test"
    assert opts["query"] == "SELECT 1"
    assert opts["driver"] == "com.mysql.jdbc.Driver"
    with pytest.raises(ValueError):
        jdbc_reader_options("mysql://no-scheme", "SELECT 1")


def test_partition_option_wiring():
    opts = partition_options("c_custkey", 1, 150_000, 32)
    assert opts == {
        "partitionColumn": "c_custkey",
        "lowerBound": "1",
        "upperBound": "150000",
        "numPartitions": "32",
    }
    with pytest.raises(ValueError):
        partition_options("k", 10, 10, 4)
    with pytest.raises(ValueError):
        partition_options("k", 0, 10, 0)


def test_builder_rejects_empty_projection():
    with pytest.raises(ValueError):
        pushdown_join_query(("t", "a"), [], [])


def test_gated_reader_builds_options(spark):
    """The gated read path must at least construct its reader without a
    database — failure comes only at load() against a live server."""
    reader_opts = jdbc_reader_options("jdbc:postgresql://h/db", reference_dim_query())
    assert set(reader_opts) == {"url", "query"}
    assert read_jdbc_dim.__doc__ and "gated" in read_jdbc_dim.__doc__
