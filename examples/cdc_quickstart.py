"""Quickstart: the reference pipeline end to end on this engine.

Replays a Canal/MySQL-binlog CDC feed (golden JSONL standing in for the
Kafka topic — swap in ``sources/cdc.read_cdc_kafka`` with real brokers),
filters/flattens the envelopes, enriches via the broadcast
meeting-room dimension, and delivers exactly-once keyed upserts to a
parquet table (REPLACE-INTO semantics; on a cluster, the same plan
against Delta/Iceberg MERGE).

Run: python examples/cdc_quickstart.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path


def main(workdir: str | None = None) -> int:
    from flinkstreametl_spark.session import get_spark
    from flinkstreametl_spark.sources.cdc import write_golden_jsonl
    from flinkstreametl_spark.streaming.pipeline import run_cdc_stream
    from flinkstreametl_spark.streaming.sinks import KeyedParquetUpsertSink

    root = Path(workdir) if workdir else Path(tempfile.mkdtemp(prefix="cdc_quickstart_"))
    src = root / "src"
    src.mkdir(parents=True, exist_ok=True)
    write_golden_jsonl(str(src / "canal_events.jsonl"))

    spark = get_spark("cdc-quickstart")
    sink = KeyedParquetUpsertSink(str(root / "meetings"), ["meeting_id"], ["_es", "_ts"])
    query = run_cdc_stream(spark, str(src), sink, str(root / "ckpt"))
    query.awaitTermination(120)

    table = sink.read(spark)
    if table is None:  # stream produced no committed batch
        print("no output table was written")
        return 1
    final = table.orderBy("meeting_id")
    print(f"upserted table at {root / 'meetings'}:")
    final.show(truncate=False)
    n = final.count()
    print(f"{n} current meeting rows (latest state per key, deletes applied)")
    return 0 if n > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else None))
