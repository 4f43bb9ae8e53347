"""Custom stateful streaming operators (applyInPandasWithState):
cross-batch dedup and running counts with keyed state."""

from __future__ import annotations

import json

from flinkstreametl_spark.streaming.stateful import (
    streaming_dedup_first_seen,
    streaming_running_counts,
)

SCHEMA = "k STRING, v LONG"


def _write_batch(path, rows):
    with open(path, "w") as f:
        for k, v in rows:
            f.write(json.dumps({"k": k, "v": v}) + "\n")


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b1.jsonl", [("a", 1), ("a", 2), ("b", 3)])

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    deduped = streaming_dedup_first_seen(stream, "k")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {(r.k, r.v) for r in spark.sql("SELECT * FROM dedup_out").collect()}
        # one row per key; 'a' kept exactly one of its two rows
        assert {k for k, _ in first} == {"a", "b"}
        assert len(first) == 2

        # second batch: existing keys suppressed, new key emitted once
        _write_batch(src / "b2.jsonl", [("a", 9), ("c", 7), ("c", 8)])
        q.processAllAvailable()
        both = {(r.k, r.v) for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert {k for k, _ in both} == {"a", "b", "c"}
        assert len(both) == 3
        assert ("a", 9) not in both  # cross-batch suppression
    finally:
        q.stop()


def test_streaming_running_counts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b1.jsonl", [("a", 1), ("a", 2), ("b", 3)])

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    counts = streaming_running_counts(stream, "k")
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName("counts_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(src / "b2.jsonl", [("a", 4), ("c", 5)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM counts_out").collect()
        latest = {}
        for r in rows:  # memory sink appends updates; last write per key wins
            latest[r.key] = r.n_total
        assert latest == {"a": 3, "b": 1, "c": 1}
    finally:
        q.stop()
