"""Pins the join-state eviction law the stream_state_metrics_replay
oracle states (plans/stream_parity_ext.py), with rows placed EXACTLY
on the eviction thresholds — the only way to distinguish inclusive
from strict boundaries, which fixture-spaced data never hits.

Law under test (interval join ``r.ts > l.ts AND r.ts <= l.ts + 1h``,
30-minute watermark): during a batch with watermark wm,
  * LEFT  rows kept iff  l.ts >= wm - 1h   (non-strict: the matching
    bound r.ts <= l.ts + 1h is non-strict, so r at exactly wm can
    still match l at exactly wm - 1h);
  * RIGHT rows kept iff  r.ts >  wm        (strict: r.ts > l.ts is
    strict, so r at exactly wm can never match a future l >= wm).
The alternative assignment (left strict / right inclusive) predicts a
DIFFERENT numRowsTotal sequence on this fixture — the test separates
them, so a Spark-version change in eviction strictness fails here
before it fails the driver hash.

``run_boundary_replay`` / ``EXPECTED_BOUNDARY_SEQUENCE`` are shared
with tests/test_state_rocksdb.py, which re-runs the identical fixture
under the RocksDB provider: provider-independence of the law is
enforced by sharing one spelling, not by a copy that could drift.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from flinkstreametl_spark.plans.stream_parity_ext import (
    _SSJ_SCHEMA,
    _one_file,
    _state_partitions,
    _state_store_provider,
)
from flinkstreametl_spark.streaming.pipeline import stream_stream_interval_join


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# Per batch: (numInputRows, watermark, numRowsTotal, numRowsRemoved).
# Batch 2 (wm 11:30): left keeps {e1, e2, e3} (e1 at the boundary
# KEPT -> inclusive), right keeps {e3} only (e2 at the boundary
# REMOVED -> strict): 4 survivors + 2 new = 6. The swapped law would
# keep left {e2,e3} / right {e2,e3} = 6 too — batch 3 separates them:
# Batch 3 (wm 12:30): left keeps {e2, e3, e10}, right keeps {e10}
# -> total 4, removed 2. Swapped law: left {e3, e10} strict at 11:30
# drops e2; right at 12:30 inclusive keeps none of {e2, e3} -> total
# 3, removed 3. Distinct.
EXPECTED_BOUNDARY_SEQUENCE = [
    (8, "1970-01-01T00:00:00.000Z", 8, 0),
    (2, "2024-01-01T11:30:00.000Z", 6, 4),
    (0, "2024-01-01T12:30:00.000Z", 4, 2),
]


def run_boundary_replay(spark, provider: str | None = None):
    """Run the threshold-exact boundary fixture through the production
    interval join (optionally under a non-default state-store
    provider) and return (sequence, progress): the per-batch
    (input, watermark, total, removed) tuples plus the raw progress
    entries for provider-specific assertions.

    Fixture: batch 1 max event = 12:00:00.000 -> watermark for batch 2
    is exactly 11:30:00.000. Probes in batch 1 (same file both sides):
      e0 09:00:00  evicted from both sides under any law
      e1 10:30:00  == wm - 1h exactly  (left-threshold boundary)
      e2 11:30:00  == wm exactly       (right-threshold boundary)
      e3 12:00:00  the max
    """
    rows1 = [
        (0, _t("2024-01-01 09:00:00"), 0),
        (1, _t("2024-01-01 10:30:00"), 1),
        (2, _t("2024-01-01 11:30:00"), 2),
        (3, _t("2024-01-01 12:00:00"), 3),
    ]
    rows2 = [(10, _t("2024-01-01 13:00:00"), 10)]
    tmp = tempfile.mkdtemp(prefix="evict_law_")
    try:
        for side in ("left", "right"):
            d = os.path.join(tmp, side)
            os.makedirs(d)
            _one_file(
                spark.createDataFrame(rows1, _SSJ_SCHEMA),
                os.path.join(d, "b1.parquet"),
                1_600_000_000,
            )
            _one_file(
                spark.createDataFrame(rows2, _SSJ_SCHEMA),
                os.path.join(d, "b2.parquet"),
                1_600_000_010,
            )
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
        import contextlib

        with contextlib.ExitStack() as stack:
            stack.enter_context(_state_partitions(spark, 4))
            if provider is not None:
                stack.enter_context(_state_store_provider(spark, provider))
            q = (
                joined.writeStream.format("parquet")
                .option("path", os.path.join(tmp, "out"))
                .option("checkpointLocation", os.path.join(tmp, "_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        prog = sorted(q.recentProgress, key=lambda p: p["batchId"])
        got = [
            (
                p["numInputRows"],
                p["eventTime"]["watermark"],
                p["stateOperators"][0]["numRowsTotal"],
                p["stateOperators"][0]["numRowsRemoved"],
            )
            for p in prog
        ]
        return got, prog
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_eviction_boundary_strictness(spark):
    got, _prog = run_boundary_replay(spark)
    assert got == EXPECTED_BOUNDARY_SEQUENCE
