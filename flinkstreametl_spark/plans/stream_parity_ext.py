"""[EXT] Driver-facing stream-parity queries: the REAL Structured
Streaming engine in the loop, graded against batch-SQL oracles.

The reference's centerpiece is a stream join (``JoinedSQLQuery.java:6-10``
joins two Kafka-backed stream tables); rounds 1-9 proved the repo's
stream-stream interval join at the unit/plan level
(``streaming/pipeline.py stream_stream_interval_join``,
``tests/test_streaming.py``) but no driver-graded query ever put the
actual micro-batch engine — file source, watermark propagation, join
state eviction, exactly-once file sink — in the execution path the
DuckDB oracle checks. These queries do: the fixture tables are
re-chunked into event-time-ordered micro-batch files, drained with
``Trigger.AvailableNow``, and the STREAMING output (not a batch
re-statement of it) is aggregated and hash-compared against the
one-shot batch SQL.

Why the parity is exact and not luck:

* Chunks are event-time tertiles with pinned, strictly increasing
  file mtimes, so the file source processes them in event-time order
  and NO row is ever late relative to the 30-minute watermark — the
  late-drop path stays cold (tests/test_streaming.py exercises it
  hot).
* The watermark DOES advance between micro-batches (the tertile
  boundaries are ~10 days apart at every SF), so buffered join rows
  from batch k are genuinely evicted before batch k+2 — the
  state-eviction law runs for real. Eviction is output-safe for the
  inner interval join because a right row in batch k+1 can only match
  left rows within 1 hour of the tertile boundary, and those are
  strictly inside the 30-minute-watermark retention bound (left row
  evicted iff watermark > left.ts + 1h; watermark after batch k is
  maxTs(k) - 30min, and candidate lefts have ts >= maxTs(k) - 1h).
* The inner join emits each match exactly once regardless of
  micro-batch placement, so the drained streaming output row set
  equals the batch join row set — which is what the oracle states.

100 TB story: this is the shape that holds on a real cluster — state
per key bounded by the interval + watermark (never the stream
history), event-time chunking == Kafka partitions' rough time order,
and the file sink's transactional log == the exactly-once output
contract. The fixture prep (chunk/rewrite) is test scaffolding; the
operator under test is the production one, unchanged.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.operators import text as X
from flinkstreametl_spark.plans.registry import register
from flinkstreametl_spark.sources.parquet import load_table
from flinkstreametl_spark.streaming.bloom_ingest import _h as bloom_h
from flinkstreametl_spark.streaming.pipeline import stream_stream_interval_join

_SSJ_CHUNKS = 3
_SSJ_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG"


def _write_ts_chunks(df: DataFrame, out_dir: str, n: int) -> None:
    """Split ``df`` into ``n`` event-time-ordered chunk files with
    strictly increasing mtimes, so the streaming file source replays
    them as in-order micro-batches (the Kafka-partition time-order
    analogue). ntile over a total order (ts, event_id) makes the split
    deterministic under any input partitioning."""
    os.makedirs(out_dir, exist_ok=True)
    staged = df.withColumn("_b", F.ntile(n).over(Window.orderBy("ts", "event_id")))
    base_mtime = 1_600_000_000
    for i in range(1, n + 1):
        stage = os.path.join(out_dir, f"_stage{i}")
        staged.filter(F.col("_b") == i).drop("_b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(f for f in sorted(os.listdir(stage)) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"b{i}.parquet")
        os.replace(os.path.join(stage, part), dst)
        shutil.rmtree(stage)
        os.utime(dst, (base_mtime + 10 * i, base_mtime + 10 * i))


_SSJ_ORACLE = """
WITH pr AS (
    SELECT l.user_id,
           l.event_id AS left_event_id,
           epoch_us(r.ts) - epoch_us(l.ts) AS delta_us
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND r.ts > l.ts
     AND r.ts <= l.ts + INTERVAL 1 HOUR
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT left_event_id) AS BIGINT) AS n_left_matched,
       CAST(SUM(delta_us) AS BIGINT) AS sum_delta_us,
       CAST(MAX(delta_us) AS BIGINT) AS max_delta_us
FROM pr
GROUP BY user_id
"""


@register(
    "stream_stream_join_replay",
    tags=("ext", "streaming", "join", "parity"),
    oracle=_SSJ_ORACLE,
)
def stream_stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join through the REAL micro-batch engine:
    the events table arrives as 3 event-time-ordered micro-batch files
    on BOTH sides of ``stream_stream_interval_join`` (the production
    operator, unchanged — same-user pairs within (0, 1h], 30-minute
    watermarks bounding join state), drained with Trigger.AvailableNow
    into an exactly-once parquet file sink. The drained pair stream is
    then aggregated per user and must hash-match the one-shot batch
    join the oracle states — the stream==batch parity law for the
    reference's centerpiece join shape (JoinedSQLQuery.java:6-10),
    with watermark state-eviction actually firing between batches (the
    module docstring carries the eviction-is-output-safe proof)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    tmp = tempfile.mkdtemp(prefix="ssj_replay_")
    try:
        for side in ("left", "right"):
            _write_ts_chunks(ev, os.path.join(tmp, side), _SSJ_CHUNKS)

        left = (
            spark.readStream.schema(_SSJ_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(tmp, "left"))
        )
        right = (
            spark.readStream.schema(_SSJ_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(tmp, "right"))
        )
        joined = stream_stream_interval_join(
            left, right, watermark="30 minutes", max_delay_expr="INTERVAL 1 HOUR"
        )
        out_dir = os.path.join(tmp, "out")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(tmp, "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        pairs = spark.read.parquet(out_dir)
        delta = F.unix_micros(F.col("right_ts")) - F.unix_micros(F.col("left_ts"))
        # localCheckpoint pins the (<= |users|)-row result so the
        # fixture tempdir can be deleted before the caller collects.
        return (
            pairs.withColumn("delta_us", delta)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.countDistinct("left_event_id").cast("long").alias("n_left_matched"),
                F.sum("delta_us").cast("long").alias("sum_delta_us"),
                F.max("delta_us").cast("long").alias("max_delta_us"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --- bloom saturation audit --------------------------------------------------
# The ingest loop's filter-health signal (streaming/bloom_ingest.py
# returns bloom_fill_ppm per batch — ADVICE r8 closure) as a driver-
# graded query: replay the history growing in 4 cumulative stages and
# report the saturation curve an operator would watch to schedule the
# rebuild-from-history resize. Audit width is 2^12 (vs the loop's
# 2^20) so the curve is VISIBLE at fixture scale — the hash
# construction is the loop's own `_h`, parameterized, not a copy.
_SAT_M = 1 << 12
_SAT_STAGES = 4

_SAT_H_SQL = {
    salt: f"CAST(concat('0x', substr(md5('{salt}' || fp), 1, 8)) AS BIGINT) % {_SAT_M}"
    for salt in ("a", "b")
}

_SAT_ORACLE = f"""
WITH d AS (
    SELECT doc_id, {X.sql_fingerprint('text')} AS fp FROM documents
), st AS (
    SELECT s.stage, d.fp
    FROM d, (SELECT unnest(range(1, {_SAT_STAGES + 1})) AS stage) s
    WHERE d.doc_id % {_SAT_STAGES} < s.stage
), pos AS (
    SELECT stage, fp, {_SAT_H_SQL['a']} AS b FROM st
    UNION ALL
    SELECT stage, fp, {_SAT_H_SQL['b']} AS b FROM st
), agg AS (
    SELECT stage,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_keys,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS bits_set
    FROM pos GROUP BY stage
)
SELECT CAST(stage AS BIGINT) AS stage, n_keys, bits_set,
       CAST(bits_set * 1000000 // {_SAT_M} AS BIGINT) AS fill_ppm,
       CAST(bits_set * bits_set * 1000000 // ({_SAT_M} * {_SAT_M}) AS BIGINT) AS pred_fpr_ppm
FROM agg
"""


@register(
    "bloom_saturation_audit",
    tags=("ext", "streaming", "dedup", "audit"),
    oracle=_SAT_ORACLE,
)
def bloom_saturation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter saturation curve for the bloom-fronted dedup ingest
    (streaming/bloom_ingest.py): the history fingerprint set grows in
    4 cumulative stages (docs with doc_id % 4 < stage — the replay
    shape), and each stage reports distinct keys, set bits, fill in
    ppm of the filter width, and the k=2 predicted false-positive rate
    (fill², the signal that schedules the rebuild-from-history
    resize). Hash positions come from the ingest loop's own salted-md5
    `_h`, so the audit measures the production filter's arithmetic,
    not a model of it.

    Plan shape / 100 TB story: one scan computes every stage — the
    (fp, bit) projection is exploded across the 4 stage tags map-side
    and reduced by one hash aggregate; state is bounded by
    stages x filter width (16k rows here), never by the corpus. The
    fill/FPR math is exact BIGINT (bits² x 1e6 tops out at ~2^44)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", X.fingerprint("text").alias("fp")
    )
    pos = docs.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(bloom_h("a", F.col("fp"), _SAT_M), bloom_h("b", F.col("fp"), _SAT_M))
        ).alias("b"),
    )
    stage = F.explode(F.array([F.lit(s) for s in range(1, _SAT_STAGES + 1)])).alias("stage")
    staged = pos.select("doc_id", "fp", "b", stage).filter(
        F.col("doc_id") % _SAT_STAGES < F.col("stage")
    )
    return (
        staged.groupBy(F.col("stage").cast("long").alias("stage"))
        .agg(
            F.countDistinct("fp").cast("long").alias("n_keys"),
            F.countDistinct("b").cast("long").alias("bits_set"),
        )
        .select(
            "stage",
            "n_keys",
            "bits_set",
            F.expr(f"CAST(bits_set * 1000000 DIV {_SAT_M} AS BIGINT)").alias("fill_ppm"),
            F.expr(
                f"CAST(bits_set * bits_set * 1000000 DIV ({_SAT_M} * {_SAT_M}) AS BIGINT)"
            ).alias("pred_fpr_ppm"),
        )
    )
