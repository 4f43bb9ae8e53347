"""Streaming semantics tests (SURVEY.md §5.2 item 4): T1 exactly-once /
restart resume, T2 append==batch equivalence on append-only input,
T5 watermarked windowed aggregation, T6 proctime."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from flinkstreametl_spark.sources.cdc import write_golden_jsonl
from flinkstreametl_spark.sources.parquet import load_table
from flinkstreametl_spark.streaming.pipeline import (
    run_cdc_batch,
    run_cdc_stream,
    windowed_event_counts,
)
from flinkstreametl_spark.streaming.sinks import KeyedParquetUpsertSink


@pytest.fixture()
def golden_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    write_golden_jsonl(str(src / "canal_events.jsonl"))
    return tmp_path


def _result(spark, sink):
    df = sink.read(spark)
    return {r.meeting_id: (r.meetingroom_id, r.city) for r in df.collect()}


def test_stream_equals_batch(spark, golden_dir):
    """The streaming pipeline (availableNow drain + foreachBatch upsert)
    must produce exactly the batch result keyed last-write-wins."""
    sink = KeyedParquetUpsertSink(str(golden_dir / "out"), ["meeting_id"], ["_es", "_ts"])
    q = run_cdc_stream(spark, str(golden_dir / "src"), sink, str(golden_dir / "ckpt"))
    q.awaitTermination(120)

    batch = run_cdc_batch(spark, str(golden_dir / "src"), types=("INSERT", "UPDATE"))
    from flinkstreametl_spark.operators.cdc import latest_by_key

    expected = {
        r.meeting_id: (r.meetingroom_id, r.city)
        for r in latest_by_key(batch, ["meeting_id"], ["_es", "_ts"]).collect()
    }
    assert _result(spark, sink) == expected
    assert expected[101] == (3, "South")  # UPDATE won


def test_restart_resume_no_reprocess(spark, golden_dir):
    """T1 — restarting from the same checkpoint must not duplicate or
    change results (offsets are committed; upsert is idempotent)."""
    sink = KeyedParquetUpsertSink(str(golden_dir / "out"), ["meeting_id"], ["_es", "_ts"])
    ckpt = str(golden_dir / "ckpt")
    q1 = run_cdc_stream(spark, str(golden_dir / "src"), sink, ckpt)
    q1.awaitTermination(120)
    first = _result(spark, sink)

    # restart: no new files -> no new data, result unchanged
    q2 = run_cdc_stream(spark, str(golden_dir / "src"), sink, ckpt)
    q2.awaitTermination(120)
    assert _result(spark, sink) == first


def test_incremental_new_file_upserts(spark, golden_dir):
    """New file after first drain: only the new envelope is processed;
    its UPDATE overwrites the existing key (REPLACE semantics)."""
    import json

    from flinkstreametl_spark.sources.cdc import _meeting_row, envelope

    sink = KeyedParquetUpsertSink(str(golden_dir / "out"), ["meeting_id"], ["_es", "_ts"])
    ckpt = str(golden_dir / "ckpt")
    run_cdc_stream(spark, str(golden_dir / "src"), sink, ckpt).awaitTermination(120)

    late = envelope(99, "UPDATE", [_meeting_row(102, 3, "2020-01-01 09:30:00", "2020-01-01 12:00:00")])
    with open(golden_dir / "src" / "late.jsonl", "w") as f:
        f.write(json.dumps(late) + "\n")
    run_cdc_stream(spark, str(golden_dir / "src"), sink, ckpt).awaitTermination(120)

    assert _result(spark, sink)[102] == (3, "South")


def test_windowed_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    """T5 — watermarked tumbling windows over the events fixture, run as
    a stream (availableNow + memory sink, append mode): closed windows
    must match the batch computation."""
    import datetime

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in windowed_event_counts(events).collect()
    }

    # Feed files in TIME order (early half, then late half) so the
    # watermark advances between micro-batches without creating late
    # data: every window ending before the split is complete when the
    # watermark closes it. Random splits would (correctly) drop
    # stragglers as late and yield partial windows.
    split = datetime.datetime(2024, 1, 15)
    src_dir = tmp_path / "events_dir"
    src_dir.mkdir()
    early = events.filter(F.col("ts") < F.lit(split))
    late = events.filter(F.col("ts") >= F.lit(split))
    early.coalesce(1).write.parquet(str(src_dir / "f1"))

    stream_src = spark.readStream.schema(events.schema).option("recursiveFileLookup", "true").parquet(str(src_dir))
    agg = windowed_event_counts(stream_src)
    q = agg.writeStream.outputMode("append").format("memory").queryName("winout").start()
    try:
        q.processAllAvailable()
        late.coalesce(1).write.parquet(str(src_dir / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM winout").collect()
    }
    closed = {k: v for k, v in batch.items() if k[0] < split - datetime.timedelta(minutes=30)}
    assert closed
    for k, v in closed.items():
        assert got[k] == v, f"window {k}: stream={got.get(k)} batch={v}"
    for k, v in got.items():
        assert batch[k] == v


def test_proctime_attribute(spark, golden_dir):
    """T6 — proctime column materializes as a timestamp at evaluation."""
    from flinkstreametl_spark.streaming.pipeline import proctime_meetings

    raw = spark.read.text(str(golden_dir / "src"))
    df = proctime_meetings(raw)
    row = df.select("proctime").first()
    assert row.proctime is not None
