"""ProgressRecorder (streaming/monitor.py): per-batch telemetry via
StreamingQueryListener during a deterministic availableNow drain."""

from __future__ import annotations

import json
import time

import pytest

from flinkstreametl_spark.streaming.monitor import ProgressRecorder


def test_progress_recorder_captures_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        for i in range(50):
            f.write(json.dumps({"user_id": i % 5, "value": float(i)}) + "\n")

    rec = ProgressRecorder(query_name="monitored_q")
    spark.streams.addListener(rec)
    try:
        stream = spark.readStream.schema("user_id LONG, value DOUBLE").json(str(src))
        q = (
            stream.groupBy("user_id")
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("monitored_q")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener bus is async; give it a moment to flush
        for _ in range(50):
            if rec.progress and rec.terminated:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(rec)

    assert rec.total_input_rows() == 50
    assert all(p["batchId"] is not None for p in rec.progress)
    assert any(p["durationMs"] for p in rec.progress)
    assert rec.terminated


def test_progress_recorder_filters_by_name(spark):
    rec = ProgressRecorder(query_name="some_other_query")

    class _Evt:
        class progress:
            json = json.dumps({"name": "not_it", "batchId": 1, "numInputRows": 7})

    rec.onQueryProgress(_Evt)
    assert rec.progress == []
    rec2 = ProgressRecorder()
    rec2.onQueryProgress(_Evt)
    assert rec2.total_input_rows() == 7
