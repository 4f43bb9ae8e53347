"""RocksDB state-store provider twin (round 14, VERDICT r13 item 3).

Three things the driver's oracle hash cannot isolate on its own:
  1. the provider pin actually ENGAGES (a silent fallback to the
     HDFS-backed provider would produce the same row counters);
  2. `_state_store_provider` restores the session conf even when the
     body raises;
  3. eviction semantics are provider-INDEPENDENT at boundary
     exactness — the SAME threshold-exact fixture
     test_state_metrics_law pins on the default provider
     (run_boundary_replay — one shared spelling, so the fixtures
     cannot drift apart) yields the identical
     numRowsTotal/numRowsRemoved sequence under RocksDB.
"""

from __future__ import annotations

import pytest

from flinkstreametl_spark.plans.stream_parity_ext import (
    _ROCKSDB_PROVIDER,
    _state_store_provider,
)
from test_state_metrics_law import EXPECTED_BOUNDARY_SEQUENCE, run_boundary_replay

_KEY = "spark.sql.streaming.stateStore.providerClass"


def test_provider_conf_restored_on_failure(spark):
    prev = spark.conf.get(_KEY)
    with pytest.raises(RuntimeError, match="boom"):
        with _state_store_provider(spark, _ROCKSDB_PROVIDER):
            assert spark.conf.get(_KEY) == _ROCKSDB_PROVIDER
            raise RuntimeError("boom")
    assert spark.conf.get(_KEY) == prev


def test_rocksdb_eviction_matches_default_provider_law(spark):
    # The store engine may change memory layout and checkpoint format,
    # never which rows are kept. The payload must also carry rocksdb
    # custom metrics — the proof the pin engaged.
    got, prog = run_boundary_replay(spark, provider=_ROCKSDB_PROVIDER)
    assert got == EXPECTED_BOUNDARY_SEQUENCE
    for p in prog:
        cm = p["stateOperators"][0]["customMetrics"]
        assert "rocksdbNumReplayChangelogFiles" in cm, (
            "no rocksdb custom metrics in the progress payload — "
            "the provider pin did not engage"
        )
        assert cm["rocksdbNumReplayChangelogFiles"] == 0
