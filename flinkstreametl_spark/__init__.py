"""flinkstreametl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference repo
``liwei199411/FlinkStreamETL`` (a Flink 1.9 real-time ETL job), rebuilt
Spark-first on DataFrame / Catalyst / Structured Streaming.

Layout
------
- ``session``    : SparkSession builder with scale-aware defaults
- ``schemas``    : explicit StructTypes (Canal CDC envelope, meeting domain,
                   driver fixture tables)
- ``sources``    : parquet/CDC-replay/JDBC/Kafka readers (heavy deps gated)
- ``operators``  : the operator library (CDC transforms, joins, aggregates,
                   windows, set ops, dedup, similarity, text analysis,
                   multimodal plumbing)
- ``plans``      : named query registry — every operator exposed as a
                   (spark_fn, oracle_sql) pair consumed by
                   ``__spark_entry__.py`` and the test harness
- ``streaming``  : Structured Streaming pipelines (CDC ingest, windowed
                   aggregation, upsert sinks)

The reference computes per-region meeting analytics from a Canal-CDC
Kafka stream joined to a JDBC dimension snapshot
(``/root/reference/src/main/java/com/Main.java``). Everything here is a
re-expression of those semantics — plus the capability extensions listed
in SURVEY.md §2.9 — in idiomatic PySpark.
"""

__version__ = "0.1.0"
