"""Schema evolution on the read path: a table accreted by micro-batches
gains a column mid-stream (the Canal ALTER TABLE case the reference's
fixed RowTypeInfo cannot survive — CreateJDBCInputFormat.java:33 pins a
5-type array at compile time). Parquet + mergeSchema reads old and new
files as one relation with NULLs where the column predates its
addition."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_reads_old_and_new_files(spark, tmp_path):
    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "M001"), (2, "M002")], "meeting_id LONG, meeting_code STRING")
    v1.write.mode("append").parquet(out)
    v2 = spark.createDataFrame(
        [(3, "M003", "beijing")], "meeting_id LONG, meeting_code STRING, city STRING"
    )
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"meeting_id", "meeting_code", "city"}
    rows = {r.meeting_id: r.city for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "beijing"}


def test_default_read_uses_single_footer(spark, tmp_path):
    """Without mergeSchema Spark picks one footer's schema — documents
    why the ingest layer must opt in when upstream DDL can evolve."""
    out = str(tmp_path / "evolving2")
    spark.createDataFrame([(1,)], "a LONG").write.mode("append").parquet(out)
    spark.createDataFrame([(2, "x")], "a LONG, b STRING").write.mode("append").parquet(out)
    cols = set(spark.read.parquet(out).columns)
    # either footer may win the race; the point is the union does NOT
    # happen without the option
    assert cols in ({"a"}, {"a", "b"})
    merged_cols = set(spark.read.option("mergeSchema", "true").parquet(out).columns)
    assert merged_cols == {"a", "b"}


def test_evolved_column_filters_and_aggregates(spark, tmp_path):
    """The evolved relation is a first-class input: filters on the new
    column prune NULL-backed old files' rows, aggregates group over the
    union."""
    out = str(tmp_path / "evolving3")
    spark.createDataFrame([(i, f"M{i:03d}") for i in range(5)], "meeting_id LONG, meeting_code STRING").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(10, "M010", "beijing"), (11, "M011", "shanghai"), (12, "M012", "beijing")],
        "meeting_id LONG, meeting_code STRING, city STRING",
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    by_city = {
        r.city: r.n
        for r in merged.groupBy("city").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_city == {None: 5, "beijing": 2, "shanghai": 1}
    assert merged.filter(F.col("city") == "beijing").count() == 2
