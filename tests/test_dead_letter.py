"""Dead-letter routing for corrupt CDC envelopes (operators/cdc.py
split_dead_letters): malformed input quarantines with error metadata
instead of failing the job — the reference's unguarded fastjson parse
(JsonFilter.java:24) crash-loops on one bad record."""

from __future__ import annotations

import json

from flinkstreametl_spark.operators.cdc import cdc_event_filter, split_dead_letters
from flinkstreametl_spark.sources.cdc import _meeting_row, envelope, read_cdc_file_batch


def _write_mixed(path):
    lines = [
        json.dumps(envelope(1, "INSERT", [_meeting_row(1, 2, "2020-01-01 09:00:00", "2020-01-01 10:00:00")])),
        "{not valid json at all",
        json.dumps({"some": "other", "shape": [1, 2, 3]}),
        json.dumps(envelope(2, "INSERT", [_meeting_row(2, 3, "2020-01-01 11:00:00", "2020-01-01 12:00:00")])),
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_split_routes_good_and_dead(spark, tmp_path):
    src = tmp_path / "mixed.jsonl"
    _write_mixed(src)
    raw = read_cdc_file_batch(spark, str(src))
    good, dead = split_dead_letters(raw)

    good_rows = good.filter(cdc_event_filter()).collect()
    assert {r.id for r in good_rows} == {1, 2}

    dead_rows = dead.collect()
    by_raw = {r.raw_value: r.error for r in dead_rows}
    # broken syntax and the empty line -> UNPARSEABLE; {"some": "other"}
    # parses but lacks Canal required fields -> MISSING_REQUIRED_FIELDS
    assert by_raw["{not valid json at all"] == "UNPARSEABLE_JSON"
    assert by_raw[""] == "UNPARSEABLE_JSON"
    assert by_raw['{"some": "other", "shape": [1, 2, 3]}'] == "MISSING_REQUIRED_FIELDS"
    assert all(r.quarantined_at is not None for r in dead_rows)


def test_no_row_lost_or_duplicated(spark, tmp_path):
    src = tmp_path / "mixed.jsonl"
    _write_mixed(src)
    raw = read_cdc_file_batch(spark, str(src))
    good, dead = split_dead_letters(raw)
    # 5 input lines (the text source keeps the empty one) split 2 good / 3 dead
    assert raw.count() == good.count() + dead.count() == 5
    assert good.count() == 2
    assert dead.count() == 3


def test_streaming_crash_between_ledger_writes_keeps_rates_exact(spark, tmp_path):
    """The stream_dead_letter_replay safety argument, exercised with a
    real crash: a batch dies AFTER the good-ledger append but BEFORE
    the quarantine append, the restarted stream re-delivers the whole
    batch (foreachBatch at-least-once), so the good ledger holds that
    batch twice and the quarantine once — and the identity-keyed final
    readout is STILL exact. This is the crash-between-children
    composition rule (FanoutSink's) driving the observability path."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from flinkstreametl_spark.operators.cdc import split_dead_letters

    src = tmp_path / "in"
    src.mkdir()
    # 30 records under the replay's corruption law, two micro-batch files
    def line(i: int) -> str:
        if i % 7 == 3:
            return _json.dumps({"id": i, "table": "t_meeting_info"})[:-6]  # truncated
        if i % 7 == 5:
            return _json.dumps({"event_id": i})  # wrong shape
        return _json.dumps({"id": i, "table": "t_meeting_info", "type": "INSERT"})

    for b, rng in ((1, range(0, 15)), (2, range(15, 30))):
        p = src / f"b{b}.txt"
        p.write_text("\n".join(line(i) for i in rng) + "\n")
        os.utime(p, (1_600_000_000 + 10 * b, 1_600_000_000 + 10 * b))

    good_dir, dead_dir = str(tmp_path / "good"), str(tmp_path / "dead")
    bomb = tmp_path / "bomb_armed"
    bomb.touch()

    def route(batch_df, batch_id):
        batch_df.cache()
        try:
            good, dead = split_dead_letters(batch_df)
            good.select("id").write.mode("append").parquet(good_dir)
            if batch_id == 1 and bomb.exists():
                bomb.unlink()  # crash exactly once, between the two appends
                raise RuntimeError("injected crash between ledger writes")
            dead.select("raw_value", "error").write.mode("append").parquet(dead_dir)
        finally:
            batch_df.unpersist()

    def run():
        return (
            spark.readStream.option("maxFilesPerTrigger", 1)
            .text(str(src))
            .writeStream.foreachBatch(route)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run().awaitTermination()
    assert not bomb.exists(), "the injected crash never fired"
    run().awaitTermination()  # restart: batch 1 redelivered in full

    good = spark.read.schema("id LONG").parquet(good_dir)
    dead = spark.read.schema("raw_value STRING, error STRING").parquet(dead_dir)
    # the crashed batch's good rows really are double-appended...
    assert good.count() > good.select("id").distinct().count()
    # ...and the identity-keyed readout is still the closed form:
    n_good = good.select("id").distinct().count()
    by_err = {
        r["error"]: r["n"]
        for r in dead.groupBy("error")
        .agg(F.countDistinct("raw_value").alias("n"))
        .collect()
    }
    want_dead = {i % 7 for i in range(30)}  # law classes present
    assert n_good == sum(1 for i in range(30) if i % 7 not in (3, 5))
    assert by_err["UNPARSEABLE_JSON"] == sum(1 for i in range(30) if i % 7 == 3)
    assert by_err["MISSING_REQUIRED_FIELDS"] == sum(1 for i in range(30) if i % 7 == 5)
