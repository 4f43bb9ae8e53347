"""Bloom-fronted streaming exact dedup (streaming/bloom_ingest.py):
the stream must keep exactly one row per fingerprint across batches
(first batch wins), the bloom front must never false-negative, the
probe side must shrink to |dups| + fpr·|new|, and the accepted->bits->
history write order must survive a crash between the appends."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flinkstreametl_spark.operators import text as X
from flinkstreametl_spark.sources.parquet import load_table
from flinkstreametl_spark.streaming.bloom_ingest import (
    ACCEPTED_SUBDIR,
    BITS_SUBDIR,
    HISTORY_SUBDIR,
    bloom_positions,
    process_batch,
    run_bloom_stream,
)


def _docs_rows(spark, sf_dir, n=120):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
        .collect()
    )


def _write_jsonl(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")


def _fps(spark, rows):
    return {
        r.fp
        for r in spark.createDataFrame(rows).select(X.fingerprint("text").alias("fp")).collect()
    }


def test_stream_accepts_exactly_the_distinct_fingerprints(spark, sf_dir, tmp_path):
    rows = _docs_rows(spark, sf_dir)
    src = tmp_path / "src"
    src.mkdir()
    # the third file RE-DELIVERS the first one's docs
    _write_jsonl(src / "a.jsonl", rows[:40])
    _write_jsonl(src / "b.jsonl", rows[40:80])
    _write_jsonl(src / "c.jsonl", rows[80:] + rows[:40])

    state = str(tmp_path / "state")
    q = run_bloom_stream(spark, str(src), state)
    q.awaitTermination(120)

    accepted = spark.read.parquet(os.path.join(state, ACCEPTED_SUBDIR))
    history = spark.read.parquet(os.path.join(state, HISTORY_SUBDIR))
    expect = _fps(spark, rows)
    assert {r.fp for r in accepted.collect()} == expect
    assert accepted.count() == len(expect), "exactly one accepted row per fingerprint"
    assert {r.fp for r in history.collect()} == expect


def test_bits_superset_of_history_and_redelivery_noop(spark, sf_dir, tmp_path):
    rows = _docs_rows(spark, sf_dir, n=80)
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(rows[:50])
    b2 = spark.createDataFrame(rows[30:])  # overlaps b1 by 20 docs

    s1 = process_batch(spark, b1, state, batch_id=0)
    assert s1["n_new"] == s1["n_batch"] == 50
    assert s1["n_probed"] == 0, "empty filter: everything is a fast-path miss"

    s2 = process_batch(spark, b2, state, batch_id=1)
    assert s2["n_new"] == 30
    # every true duplicate MUST bloom-pass (no false negatives)
    assert s2["n_probed"] >= 20

    # the invariant that makes the write order safe
    history = spark.read.parquet(os.path.join(state, HISTORY_SUBDIR))
    bits = {r.b for r in spark.read.parquet(os.path.join(state, BITS_SUBDIR)).collect()}
    needed = {r.b for r in bloom_positions(history.select("fp")).collect()}
    assert needed <= bits

    # full redelivery: nothing new, nothing appended
    before = spark.read.parquet(os.path.join(state, ACCEPTED_SUBDIR)).count()
    s3 = process_batch(spark, spark.createDataFrame(rows), state, batch_id=2)
    assert s3["n_new"] == 0
    assert s3["n_probed"] == s3["n_batch"], "all redelivered rows bloom-pass"
    assert spark.read.parquet(os.path.join(state, ACCEPTED_SUBDIR)).count() == before


def test_probe_side_is_bounded_by_dups_plus_fpr(spark, sf_dir, tmp_path):
    rows = _docs_rows(spark, sf_dir)
    state = str(tmp_path / "state")
    process_batch(spark, spark.createDataFrame(rows[:60]), state, batch_id=0)
    s = process_batch(
        spark, spark.createDataFrame(rows[40:]), state, batch_id=1
    )  # 20 dups, 60 new
    # 60 history keys in a 2^20-bit / k=2 filter: fpr is negligible —
    # the probe side is the duplicates, maybe +1 straggler
    assert s["n_probed"] <= 20 + 2
    assert s["n_bloom_miss"] >= 58


def test_crash_between_appends_recovers_without_duplicates(spark, sf_dir, tmp_path):
    rows = _docs_rows(spark, sf_dir, n=60)
    state = str(tmp_path / "state")
    process_batch(spark, spark.createDataFrame(rows[:30]), state, batch_id=0)

    # simulate batch 1 crashing AFTER accepted+bits, BEFORE history:
    # replicate process_batch's write order up to the crash point
    b2_rows = rows[20:]  # 10 dups + 30 new
    batch = (
        spark.createDataFrame(b2_rows)
        .withColumn("fp", X.fingerprint("text"))
        .dropDuplicates(["fp"])
        .localCheckpoint()
    )
    history = spark.read.parquet(os.path.join(state, HISTORY_SUBDIR))
    new = batch.join(history, "fp", "left_anti").localCheckpoint()
    new.write.mode("append").parquet(os.path.join(state, ACCEPTED_SUBDIR))
    bits = spark.read.parquet(os.path.join(state, BITS_SUBDIR))
    bloom_positions(new.select("fp")).join(bits, "b", "left_anti").write.mode("append").parquet(
        os.path.join(state, BITS_SUBDIR)
    )
    # CRASH here: history never written. The replay must re-accept the
    # 30 new docs (at-least-once on the accepted sink, deduped by fp
    # downstream) and must NOT lose them to the pre-written bits (the
    # bloom false-positive path is an exact probe, not a drop).
    s = process_batch(spark, spark.createDataFrame(b2_rows), state, batch_id=1)
    assert s["n_new"] == 30, "pre-crash bits must not swallow the replayed docs"
    assert s["n_probed"] == s["n_batch"], "their bits are set, so they all probe"

    history = spark.read.parquet(os.path.join(state, HISTORY_SUBDIR))
    assert history.count() == history.select("fp").distinct().count() == 60
    # accepted carries the double-emit (30 crash-run + 30 replay), the
    # documented at-least-once contract — key set still exact
    accepted = spark.read.parquet(os.path.join(state, ACCEPTED_SUBDIR))
    assert {r.fp for r in accepted.collect()} == _fps(spark, rows)


def test_compaction_preserves_state_and_dedup(spark, sf_dir, tmp_path):
    from flinkstreametl_spark.streaming.bloom_ingest import compact_state

    rows = _docs_rows(spark, sf_dir, n=90)
    state = str(tmp_path / "state")
    for i, lo in enumerate(range(0, 90, 30)):
        process_batch(spark, spark.createDataFrame(rows[lo : lo + 30]), state, batch_id=i)
    hist_before = {r.fp for r in spark.read.parquet(os.path.join(state, HISTORY_SUBDIR)).collect()}
    bits_before = {r.b for r in spark.read.parquet(os.path.join(state, BITS_SUBDIR)).collect()}

    compact_state(spark, state)
    assert {
        r.fp for r in spark.read.parquet(os.path.join(state, HISTORY_SUBDIR)).collect()
    } == hist_before
    assert {
        r.b for r in spark.read.parquet(os.path.join(state, BITS_SUBDIR)).collect()
    } == bits_before
    import glob

    assert len(glob.glob(os.path.join(state, BITS_SUBDIR, "*.parquet"))) == 1

    # the compacted state still dedups: full redelivery is a no-op
    s = process_batch(spark, spark.createDataFrame(rows), state, batch_id=99)
    assert s["n_new"] == 0 and s["n_probed"] == s["n_batch"]


def test_saturation_stat_reports_monotone_fill(spark, sf_dir, tmp_path):
    """process_batch returns the set-bit count / fill ppm of the filter
    so operators can schedule the rebuild-resize before the fast path
    silently degrades (ADVICE r8). Fill grows monotonically with new
    keys and matches the on-disk bits table."""
    from flinkstreametl_spark.streaming.bloom_ingest import BITS_SUBDIR, BLOOM_M

    def _batch(lo, hi):
        return (
            load_table(spark, sf_dir, "documents")
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id", "text")
        )

    state = str(tmp_path / "state")
    r0 = process_batch(spark, _batch(0, 200), state, batch_id=0)
    r1 = process_batch(spark, _batch(200, 400), state, batch_id=1)
    assert 0 < r0["bloom_bits_set"] <= r1["bloom_bits_set"]
    assert r1["bloom_fill_ppm"] == r1["bloom_bits_set"] * 1_000_000 // BLOOM_M
    on_disk = spark.read.parquet(f"{state}/{BITS_SUBDIR}").distinct().count()
    assert r1["bloom_bits_set"] == on_disk
    # Redelivery adds no keys, so the fill must not move.
    r2 = process_batch(spark, _batch(200, 400), state, batch_id=2)
    assert r2["bloom_bits_set"] == r1["bloom_bits_set"]
