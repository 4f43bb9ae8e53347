"""RocksDB state-store provider twin (round 14, VERDICT r13 item 3).

Three things the driver's oracle hash cannot isolate on its own:
  1. the provider pin actually ENGAGES (a silent fallback to the
     HDFS-backed provider would produce the same row counters);
  2. `_state_store_provider` restores the session conf even when the
     body raises;
  3. eviction semantics are provider-INDEPENDENT at boundary
     exactness — the same threshold-exact fixture
     test_state_metrics_law pins on the default provider yields the
     identical numRowsTotal/numRowsRemoved sequence under RocksDB.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest

from flinkstreametl_spark.plans.stream_parity_ext import (
    _ROCKSDB_PROVIDER,
    _SSJ_SCHEMA,
    _one_file,
    _state_partitions,
    _state_store_provider,
)
from flinkstreametl_spark.streaming.pipeline import stream_stream_interval_join

_KEY = "spark.sql.streaming.stateStore.providerClass"


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_provider_conf_restored_on_failure(spark):
    prev = spark.conf.get(_KEY)
    with pytest.raises(RuntimeError, match="boom"):
        with _state_store_provider(spark, _ROCKSDB_PROVIDER):
            assert spark.conf.get(_KEY) == _ROCKSDB_PROVIDER
            raise RuntimeError("boom")
    assert spark.conf.get(_KEY) == prev


def test_rocksdb_eviction_matches_default_provider_law(spark):
    # Same fixture as test_state_metrics_law (rows EXACTLY on the
    # eviction thresholds), run under the RocksDB provider: the store
    # engine may change memory layout and checkpoint format, never
    # which rows are kept. The payload must also carry rocksdb custom
    # metrics — the proof the pin engaged.
    rows1 = [
        (0, _t("2024-01-01 09:00:00"), 0),
        (1, _t("2024-01-01 10:30:00"), 1),
        (2, _t("2024-01-01 11:30:00"), 2),
        (3, _t("2024-01-01 12:00:00"), 3),
    ]
    rows2 = [(10, _t("2024-01-01 13:00:00"), 10)]
    tmp = tempfile.mkdtemp(prefix="evict_rocks_")
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
        with _state_partitions(spark, 4), _state_store_provider(spark, _ROCKSDB_PROVIDER):
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
        # The exact sequence test_state_metrics_law pins on the
        # default provider (inclusive left / strict right thresholds).
        assert got == [
            (8, "1970-01-01T00:00:00.000Z", 8, 0),
            (2, "2024-01-01T11:30:00.000Z", 6, 4),
            (0, "2024-01-01T12:30:00.000Z", 4, 2),
        ]
        for p in prog:
            cm = p["stateOperators"][0]["customMetrics"]
            assert "rocksdbNumReplayChangelogFiles" in cm, (
                "no rocksdb custom metrics in the progress payload — "
                "the provider pin did not engage"
            )
            assert cm["rocksdbNumReplayChangelogFiles"] == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
