"""FanoutSink: one stream feeding multiple exactly-once destinations
from a single foreachBatch (the reference's MySQL + Greenplum dual-sink
wiring, Main.java:143-148, as one Spark query instead of two jobs)."""

from __future__ import annotations

import pytest

from flinkstreametl_spark.sources.cdc import write_golden_jsonl
from flinkstreametl_spark.streaming.pipeline import run_cdc_stream
from flinkstreametl_spark.streaming.sinks import (
    FanoutSink,
    IncrementalAggSink,
    KeyedParquetUpsertSink,
)


@pytest.fixture()
def golden_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    write_golden_jsonl(str(src / "canal_events.jsonl"))
    return tmp_path


def _sinks(golden_dir):
    upsert = KeyedParquetUpsertSink(str(golden_dir / "out_a"), ["meeting_id"], ["_es", "_ts"])
    agg = IncrementalAggSink(str(golden_dir / "out_b"), ["city"], "meeting_id")
    return upsert, agg


def test_fanout_delivers_to_both_sinks(spark, golden_dir):
    upsert, agg = _sinks(golden_dir)
    fan = FanoutSink(upsert, agg)
    q = run_cdc_stream(spark, str(golden_dir / "src"), fan, str(golden_dir / "ckpt"))
    q.awaitTermination(120)

    rows_a = upsert.read(spark).collect()
    assert len(rows_a) > 0
    agg_rows = {r.city: r.n for r in agg.read(spark).collect()}
    # the keyed table and the aggregate view describe the same stream
    from collections import Counter

    expect = Counter(r.city for r in rows_a)
    # IncrementalAggSink counts raw batch rows (pre-upsert-dedup), so
    # every upsert key must be present with at least its final count
    assert set(agg_rows) == set(expect)
    assert all(agg_rows[c] >= n for c, n in expect.items())


def test_fanout_batch_replay_is_exactly_once(spark, golden_dir):
    """Replaying the same batch through the fanout (crash-between-
    children model) must not change either destination: the upsert
    re-merges identically, the agg sink's batch-id marker skips."""
    upsert, agg = _sinks(golden_dir)
    fan = FanoutSink(upsert, agg)
    q = run_cdc_stream(spark, str(golden_dir / "src"), fan, str(golden_dir / "ckpt"))
    q.awaitTermination(120)

    def snap(df):
        from collections import Counter

        return Counter(tuple(r) for r in df.collect())

    before_a = snap(upsert.read(spark))
    before_b = snap(agg.read(spark))

    # replay the last applied batch verbatim
    replay = upsert.read(spark)
    last_id = agg._applied_batch_id()
    assert last_id is not None
    fan.process_batch(replay, last_id)

    assert snap(upsert.read(spark)) == before_a
    assert snap(agg.read(spark)) == before_b
