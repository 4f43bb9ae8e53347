"""Reference-parity queries (SURVEY.md §2.2-§2.3, §2.7-§2.8) mapped onto
the driver fixture tables per FIXTURES.md §B:

    events   ≈ t_meeting_info CDC feed   (stream/fact)
    customer ≈ t_meeting_address          (level-1 dim)
    nation   ≈ t_meeting_location         (level-2 dim)
    region   ≈ t_meeting_region           (level-3 dim)

Every query here has a DuckDB oracle. The Canal-envelope versions of the
same operators (exact reference schemas) run in tests/test_cdc.py over
the golden fixture replay — they need the envelope JSON, which the
driver's fixture tables don't carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkstreametl_spark.operators.cdc import latest_by_key
from flinkstreametl_spark.operators.joins import dim_3way, enrich
from flinkstreametl_spark.plans.registry import register
from flinkstreametl_spark.sources.parquet import load_table


@register(
    "flagship_enrich",
    tags=("reference", "J1", "J2", "F1", "bench"),
    oracle="""
SELECT e.event_id,
       e.event_type,
       c.c_custkey   AS dim_key,
       c.c_name      AS dim_name,
       c.c_mktsegment AS segment,
       n.n_name      AS nation_name,
       r.r_name      AS region_name
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE e.event_type = 'purchase'
""",
)
def flagship_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference centerpiece reshaped onto fixtures: CDC-style filter
    (F1, JsonFilter.java:23-26) -> stream-to-static LEFT join against the
    3-way dim (J1+J2, JoinedSQLQuery.java:6-10 +
    CreateJDBCInputFormat.java:28-31) -> enriched projection mirroring
    meeting_result (model/Meeting.java:13-18).

    Plan shape at scale: fact scan with pushed filter, dim built from
    three broadcast joins, enrich join broadcast — zero fact shuffles.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    dim = dim_3way(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )
    return enrich(events, dim, "user_id", "dim_key").select(
        "event_id", "event_type", "dim_key", "dim_name", "segment", "nation_name", "region_name"
    )


@register(
    "dim_3way_join",
    tags=("reference", "J2"),
    oracle="""
SELECT c.c_custkey    AS dim_key,
       c.c_name       AS dim_name,
       c.c_mktsegment AS segment,
       n.n_name       AS nation_name,
       r.r_name       AS region_name
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def dim_3way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — the dimension-build 3-way left join the reference pushes into
    MySQL (CreateJDBCInputFormat.java:28-31); here Spark computes it with
    two broadcast joins."""
    return dim_3way(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "cdc_filter_project",
    tags=("reference", "F1", "F2", "F3", "E7"),
    oracle="""
SELECT event_id,
       user_id,
       event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       CAST(value AS DOUBLE) AS value
FROM events
WHERE event_type IN ('click', 'view')
""",
)
def cdc_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-style conjunctive filter + F3 typed projection + E7 JSON field
    extraction (the fixture analogue of the envelope parse,
    JsonFilter.java:24-26,47-54) — filter and pruning push to the scan."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type").isin("click", "view")).select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.col("value").cast("double").alias("value"),
    )


@register(
    "temporal_active_filter",
    tags=("reference", "F6", "E1", "E2"),
    oracle="""
SELECT event_id, user_id, event_type, ts
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
""",
)
def temporal_active_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — the reference's intended 'meeting currently in progress'
    interval predicate (Main.java:102-106, commented). LOCALTIMESTAMP is
    nondeterministic, so per SURVEY.md §7 hard-part (5) the 'now' window
    is parameterized as literals for testability."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).select("event_id", "user_id", "event_type", "ts")


@register(
    "timestamp_parse_roundtrip",
    tags=("reference", "E1", "E8"),
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts_parsed
FROM events
""",
)
def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — TO_TIMESTAMP(string) parsing (Main.java:104-106): the
    reference carries datetimes as strings (JsonFilter.java:51-52) and
    parses at query time; we round-trip ts through the same
    'yyyy-MM-dd HH:mm:ss' format."""
    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return events.select(
        "event_id",
        F.date_format("ts", fmt).alias("ts_str"),
        F.to_timestamp(F.date_format("ts", fmt), fmt).alias("ts_parsed"),
    )


@register(
    "replace_upsert_latest",
    tags=("reference", "F4", "T2", "S3"),
    oracle="""
SELECT event_id, user_id, event_type, value, ts
FROM (
    SELECT e.*,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e
) t
WHERE rn = 1
""",
)
def replace_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/T2 — REPLACE-INTO upsert semantics (SinkToMySQL.java:35) as a
    batch-expressible operator: last-write-wins per key ordered by event
    time (the dedup foreachBatch applies before writing; SURVEY.md §7
    hard part (3))."""
    events = load_table(spark, sf_dir, "events")
    return latest_by_key(events, ["user_id"], ["ts", "event_id"]).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )


@register(
    "changelog_op_column",
    tags=("reference", "T2", "F4"),
    oracle="""
SELECT event_id,
       user_id,
       event_type,
       CASE WHEN event_type = 'error' THEN '-D' ELSE '+I' END AS op
FROM events
WHERE event_type <> 'error'
""",
)
def changelog_op_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/F4 — retract-stream emulation: materialize a changelog `op`
    column (+I accumulate / -D retract, Main.java:122-132) and keep only
    accumulates, as the reference's ProcessFunction does for f0==true."""
    events = load_table(spark, sf_dir, "events")
    with_op = events.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("-D")).otherwise(F.lit("+I"))
    )
    return with_op.filter(F.col("op") == "+I").select("event_id", "user_id", "event_type", "op")


@register(
    "flagship_enrich_sql",
    tags=("reference", "J1", "J2", "sql-api"),
    oracle="""
SELECT e.event_id,
       e.event_type,
       c.c_custkey   AS dim_key,
       c.c_name      AS dim_name,
       c.c_mktsegment AS segment,
       n.n_name      AS nation_name,
       r.r_name      AS region_name
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE e.event_type = 'purchase'
""",
)
def flagship_enrich_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship via the SQL-TEXT entry point — the reference's actual
    query path (register tables, run SQL strings: tEnv.registerDataStream
    + tEnv.sqlQuery(JoinedSQLQuery.Query), Main.java:91-100). Views are
    registered per-query and the join is the literal SQL shape of
    JoinedSQLQuery.java:6-10 widened to the 3-way dim; Catalyst produces
    the same broadcast plan as the DataFrame form (flagship_enrich), so
    both API surfaces are first-class."""
    for t in ("events", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(c, n, r) */
               e.event_id, e.event_type,
               c.c_custkey AS dim_key, c.c_name AS dim_name,
               c.c_mktsegment AS segment,
               n.n_name AS nation_name, r.r_name AS region_name
        FROM v_events e
        LEFT JOIN v_customer c ON e.user_id = c.c_custkey
        LEFT JOIN v_nation n   ON c.c_nationkey = n.n_nationkey
        LEFT JOIN v_region r   ON n.n_regionkey = r.r_regionkey
        WHERE e.event_type = 'purchase'
        """
    )
