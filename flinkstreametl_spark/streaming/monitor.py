"""Streaming observability: query-progress capture.

The reference's only runtime visibility is ``print()`` sinks
(``Main.java:134,146``); its README points dashboards at the OUTPUT
tables instead of at the pipeline. Spark exposes per-micro-batch
telemetry through ``StreamingQueryListener`` — rows/sec, batch
durations, watermark lag, state-store sizes — which is what a
production deployment alarms on. ``ProgressRecorder`` captures that
stream of progress events in-process; the same numbers go to the
Spark UI / metrics sinks on a cluster.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects per-batch progress for queries whose name matches
    ``query_name`` (None = all). Thread-safe: listener callbacks arrive
    on Spark's listener bus thread.

    Fields kept per batch: batchId, numInputRows, inputRowsPerSecond,
    processedRowsPerSecond, durationMs (full map), and sink description
    — the set a throughput/backpressure alarm needs.
    """

    def __init__(self, query_name: str | None = None):
        self.query_name = query_name
        self._lock = threading.Lock()
        self.progress: list[dict] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        if self.query_name is not None and p.get("name") != self.query_name:
            return
        with self._lock:
            self.progress.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows", 0),
                    "inputRowsPerSecond": p.get("inputRowsPerSecond"),
                    "processedRowsPerSecond": p.get("processedRowsPerSecond"),
                    "durationMs": p.get("durationMs", {}),
                    "sink": (p.get("sink") or {}).get("description"),
                }
            )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append(str(event.id))

    def total_input_rows(self) -> int:
        with self._lock:
            return sum(p["numInputRows"] for p in self.progress)
