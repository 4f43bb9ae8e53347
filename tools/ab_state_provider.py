"""A/B the streaming state-store provider for the interval-join replay
(VERDICT r14 item 4).

Runs the production interval-join replay engine phase
(`stream_parity_ext._run_ssj_replay` — the exact
stream_stream_join_replay pipeline) alternately under the default
HDFSBackedStateStoreProvider and RocksDBStateStoreProvider in ONE
session, N rounds, and prints per-round wall-clock. Interleaving
inside one session controls for the sandbox's hypervisor noise
windows; the JVM/JIT warms on round 0 (discard it).

Usage:
  python tools/ab_state_provider.py [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkstreametl_spark.plans import stream_parity_ext as SP  # noqa: E402
from flinkstreametl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark("ab-state-provider")
    out: dict[str, list[float]] = {"hdfs": [], "rocksdb": []}
    for i in range(args.rounds):
        for tag, provider in (("hdfs", None), ("rocksdb", SP._ROCKSDB_PROVIDER)):
            t0 = time.perf_counter()
            progress = SP._run_ssj_replay(spark, SF_DIR, provider=provider)
            dt = round(time.perf_counter() - t0, 4)
            out[tag].append(dt)
            n_rows = sum(p["stateOperators"][0]["numRowsTotal"] >= 0 for p in progress)
            print(f"# round {i} {tag}: {dt:.2f}s ({n_rows} batches)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
