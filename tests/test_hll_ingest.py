"""Streaming HLL maintenance invariants: incremental == batch at the
REGISTER level (bit-identical, not approximate), redelivery no-op by
idempotence, crash-before-flip recovery, and the bounded-state law.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flinkstreametl_spark.plans.sketch_ext import HLL_M, hll_registers, hll_sketch
from flinkstreametl_spark.streaming import hll_ingest as H
from flinkstreametl_spark.streaming.versioned import current_version, version_dir


def _events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


def _batches(df, n):
    rows = df.collect()
    step = (len(rows) + n - 1) // n
    return [rows[i : i + step] for i in range(0, len(rows), step)]


def _regs_on_disk(spark, state_dir):
    reg_root = os.path.join(state_dir, H.REGISTERS_SUBDIR)
    ver = current_version(reg_root)
    df = spark.read.parquet(version_dir(reg_root, ver))
    return sorted((r.grp, r.bucket, r.rho) for r in df.collect())


def test_incremental_equals_batch_registers(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "hll")
    for i, chunk in enumerate(_batches(ev, 4)):
        bdf = spark.createDataFrame(chunk, ev.schema)
        H.process_batch(spark, bdf, state, batch_id=i)
    want = sorted(
        (r.grp, r.bucket, r.rho) for r in hll_registers(ev).collect()
    )
    assert _regs_on_disk(spark, state) == want


def test_redelivery_is_noop(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "hll")
    chunks = _batches(ev, 3)
    for i, chunk in enumerate(chunks):
        H.process_batch(spark, spark.createDataFrame(chunk, ev.schema), state, batch_id=i)
    before = _regs_on_disk(spark, state)
    # Redeliver batch 1 (at-least-once): max-merge must not move.
    H.process_batch(spark, spark.createDataFrame(chunks[1], ev.schema), state, batch_id=99)
    assert _regs_on_disk(spark, state) == before


def test_crash_before_flip_recovers(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "hll")
    chunks = _batches(ev, 2)
    H.process_batch(spark, spark.createDataFrame(chunks[0], ev.schema), state, batch_id=0)
    reg_root = os.path.join(state, H.REGISTERS_SUBDIR)
    live = current_version(reg_root)
    # Simulate a crash mid-batch-1: the new version directory was
    # written but CURRENT never flipped.
    orphan = version_dir(reg_root, live + 1)
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-garbage.parquet"), "wb") as f:
        f.write(b"torn")
    # Replay batch 1: must sweep the orphan, merge onto v{live}, and
    # land exactly where a crash-free run would.
    H.process_batch(spark, spark.createDataFrame(chunks[1], ev.schema), state, batch_id=1)
    want = sorted((r.grp, r.bucket, r.rho) for r in hll_registers(ev).collect())
    assert _regs_on_disk(spark, state) == want


def test_state_bounded_and_timeline_grows(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    state = str(tmp_path / "hll")
    n_groups = ev.select("event_type").distinct().count()
    stats = []
    for i, chunk in enumerate(_batches(ev, 3)):
        stats.append(
            H.process_batch(spark, spark.createDataFrame(chunk, ev.schema), state, batch_id=i)
        )
    for s in stats:
        assert s["n_register_rows"] <= n_groups * HLL_M
    # Register rows only grow (buckets are never evicted)...
    rows = [s["n_register_rows"] for s in stats]
    assert rows == sorted(rows)
    # ...and the timeline holds one row per (batch, group) present.
    tl = spark.read.parquet(os.path.join(state, H.TIMELINE_SUBDIR))
    per_batch = {r.batch_id: r.cnt for r in tl.groupBy("batch_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(per_batch) == {0, 1, 2}
    # Final timeline estimate == the batch sketch's estimate.
    final = {r.grp: r.s_scaled for r in tl.filter(F.col("batch_id") == 2).collect()}
    want = {r.grp: r.s_scaled for r in hll_sketch(ev).collect()}
    assert final == want


def test_stream_drain_matches_batch(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir).limit(400)
    src = tmp_path / "src"
    src.mkdir()
    rows = ev.collect()
    for i in range(2):
        with open(src / f"b{i}.jsonl", "w") as f:
            for r in rows[i * 200 : (i + 1) * 200]:
                f.write(json.dumps({"event_id": r.event_id, "user_id": r.user_id, "event_type": r.event_type}) + "\n")
    state = str(tmp_path / "hll")
    q = H.run_hll_stream(spark, str(src), state)
    q.awaitTermination(120)
    want = sorted((r.grp, r.bucket, r.rho) for r in hll_registers(spark.createDataFrame(rows, ev.schema)).collect())
    assert _regs_on_disk(spark, state) == want
