"""transformWithStateInPandas (Spark 4 stateful API): cross-batch
running totals with typed value state.

The streaming execution of this operator needs the protobuf package
(PySpark's transformWithState state-server protocol), which this CI
container doesn't ship — so the end-to-end run is skipif-gated, and the
processor logic + plan construction are verified directly (the same
gating discipline as the Kafka source/sink). Gate re-checked
2026-08-15 (round 9): still no google.protobuf module and no broker in
the image; the skips stand."""

from __future__ import annotations

import importlib.util
import json

import pandas as pd
import pytest

from flinkstreametl_spark.streaming.tws import (
    RunningTotalsProcessor,
    rocksdb_conf,
    streaming_user_running_totals,
)

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAS_PROTOBUF = False

SCHEMA = "user_id LONG, value DOUBLE"


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.ttls = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttls[name] = ttlDurationMs
        return self.states.setdefault(name, _FakeValueState())


def test_processor_logic_across_batches():
    """Two micro-batches through handleInputRows accumulate (n, total)
    in value state and emit the refreshed row each time."""
    p = RunningTotalsProcessor(ttl_ms=60_000)
    handle = _FakeHandle()
    p.init(handle)
    assert handle.ttls["agg"] == 60_000

    out1 = pd.concat(p.handleInputRows((1,), iter([pd.DataFrame({"value": [10.0, 5.0]})]), None))
    assert out1.to_dict("records") == [{"user_id": 1, "n_events": 2, "total_value": 15.0}]

    out2 = pd.concat(p.handleInputRows((1,), iter([pd.DataFrame({"value": [2.0]})]), None))
    assert out2.to_dict("records") == [{"user_id": 1, "n_events": 3, "total_value": 17.0}]

    # independent key starts fresh state? (state here is per-operator in
    # the fake; the real engine scopes it per key — this asserts the
    # processor reads only what the handle returns)
    p2 = RunningTotalsProcessor()
    h2 = _FakeHandle()
    p2.init(h2)
    assert h2.ttls["agg"] is None
    out3 = pd.concat(p2.handleInputRows((2,), iter([pd.DataFrame({"value": [1.0]})]), None))
    assert out3.to_dict("records") == [{"user_id": 2, "n_events": 1, "total_value": 1.0}]


def test_plan_construction(spark, tmp_path):
    """The TransformWithStateInPandas node must build on a streaming
    relation with the declared output schema (no execution needed)."""
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_user_running_totals(stream, ttl_ms=1000)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["user_id", "n_events", "total_value"]
    assert "transformwithstateinpyspark" in out._jdf.queryExecution().logical().toString().lower()


def _write_batch(path, rows):
    with open(path, "w") as f:
        for u, v in rows:
            f.write(json.dumps({"user_id": u, "value": v}) + "\n")


def test_ttl_switches_time_mode(spark, tmp_path):
    """ttl_ms=None keeps timeMode=None; a set TTL must switch the node
    to ProcessingTime — Spark rejects TTL under NoTime at query start
    (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL)."""
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    plan_ttl = streaming_user_running_totals(stream, ttl_ms=1000)._jdf.queryExecution().logical().toString()
    plan_none = streaming_user_running_totals(stream)._jdf.queryExecution().logical().toString()
    assert "ProcessingTime" in plan_ttl
    assert "ProcessingTime" not in plan_none


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="transformWithState state server needs protobuf")
def test_tws_ttl_end_to_end(spark, tmp_path):
    """TTL path against the real engine: with a set ttl_ms the query must
    start (ProcessingTime mode) and accumulate across batches arriving
    well inside the TTL window."""
    key, val = rocksdb_conf()
    old = spark.conf.get(key, None)
    spark.conf.set(key, val)
    try:
        src = tmp_path / "src"
        src.mkdir()
        _write_batch(src / "b1.jsonl", [(1, 10.0)])
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        totals = streaming_user_running_totals(stream, ttl_ms=3_600_000)
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_ttl_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(src / "b2.jsonl", [(1, 2.0)])
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("SELECT * FROM tws_ttl_out").collect():
                latest[r.user_id] = (r.n_events, r.total_value)
            assert latest == {1: (2, 12.0)}
        finally:
            q.stop()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="transformWithState state server needs protobuf")
def test_tws_running_totals_end_to_end(spark, tmp_path):
    key, val = rocksdb_conf()
    old = spark.conf.get(key, None)
    spark.conf.set(key, val)
    try:
        src = tmp_path / "src"
        src.mkdir()
        _write_batch(src / "b1.jsonl", [(1, 10.0), (1, 5.0), (2, 1.0)])
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        totals = streaming_user_running_totals(stream)
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(src / "b2.jsonl", [(1, 2.0), (3, 7.0)])
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("SELECT * FROM tws_out").collect():
                latest[r.user_id] = (r.n_events, r.total_value)
            assert latest == {1: (3, 17.0), 2: (1, 1.0), 3: (1, 7.0)}
        finally:
            q.stop()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_ewma_processor_stream_equals_batch_fold():
    """The cross-batch EWMA equals the one-shot fold over the full
    ordered sequence EXACTLY (same IEEE op order), however the rows are
    split into micro-batches — including out-of-order rows WITHIN a
    batch (the in-batch sort restores (ts, event_id) order)."""
    from flinkstreametl_spark.streaming.tws import EwmaProcessor

    rows = [  # (event_id, ts-second, value)
        (1, 10, 4.0),
        (2, 20, 8.0),
        (3, 20, 1.5),
        (4, 35, 2.0),
        (5, 40, 16.0),
        (6, 55, 0.25),
    ]

    def fold(seq):
        y, n = None, 0
        for _, _, v in sorted(seq, key=lambda r: (r[1], r[0])):
            y = v if n == 0 else 0.25 * v + 0.75 * y
            n += 1
        return n, y

    def run(batches):
        p = EwmaProcessor()
        h = _FakeHandle()
        p.init(h)
        last = None
        for b in batches:
            pdf = pd.DataFrame(
                {"event_id": [r[0] for r in b], "ts": [r[1] for r in b], "value": [r[2] for r in b]}
            )
            last = pd.concat(p.handleInputRows((7,), iter([pdf]), None))
        return last.to_dict("records")[0]

    expected_n, expected_y = fold(rows)
    for split in ([rows], [rows[:2], rows[2:5], rows[5:]], [[r] for r in rows]):
        # shuffle inside each batch: the processor must re-sort
        got = run([list(reversed(b)) for b in split])
        assert got["n_events"] == expected_n
        assert got["ewma_value"] == expected_y  # exact, not approx
        assert got["user_id"] == 7


def test_ewma_processor_rejects_bad_alpha():
    from flinkstreametl_spark.streaming.tws import EwmaProcessor

    with pytest.raises(ValueError):
        EwmaProcessor(alpha=0.0)
    with pytest.raises(ValueError):
        EwmaProcessor(alpha=1.5)


@pytest.mark.skipif(not _HAS_PROTOBUF, reason="transformWithState needs protobuf")
def test_streaming_ewma_end_to_end(spark, tmp_path):
    """Gated like the running-totals e2e: real micro-batch execution
    when the protobuf wire protocol is available."""
    import flinkstreametl_spark.streaming.tws as tws

    from pyspark.sql import functions as F

    src = tmp_path / "in"
    src.mkdir()
    df0 = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 2.0)], "event_id LONG, user_id LONG, value DOUBLE"
    ).withColumn("ts", F.lit(0).cast("timestamp"))
    df0.write.json(str(src / "b0"))
    stream = (
        spark.readStream.schema("event_id LONG, user_id LONG, value DOUBLE, ts TIMESTAMP")
        .json(str(src / "*"))
    )
    out = tws.streaming_user_value_ewma(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_e2e")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r.ewma_value for r in spark.sql("SELECT * FROM ewma_e2e").collect()}
    assert got[1] == 0.25 * 2.0 + 0.75 * 10.0
