"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.8; the extensibility surface the reference exercises with
raw ProcessFunctions, Main.java:123-133).

State is keyed and watermark/timeout-bounded — the Spark analogue of the
reference's idle-state retention (T3, ``Main.java:57``
setIdleStateRetentionTime(1d, 2d)): state for keys not seen within the
timeout is dropped instead of growing without bound.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flinkstreametl_spark.operators.windows import ensure_event_time


def streaming_dedup_first_seen(
    df: DataFrame,
    key_col: str,
    *,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch exactly-first dedup: emit each key's first-seen row
    once, suppress every later occurrence — the streaming form of the
    exact-dedup sweep (operators/dedup.py) with bounded keyed state.

    One boolean of state per key; with `state_ttl_ms` set, idle keys
    expire (processing-time timeout), trading perfect dedup for bounded
    state — exactly the reference's idle-state-retention trade (T3).
    """
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms else GroupStateTimeout.NoTimeout

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            first = None
            for pdf in pdfs:
                if len(pdf) and first is None:
                    first = pdf.head(1)
            state.update((True,))
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
            if first is not None:
                yield first
        else:
            for _ in pdfs:  # drain
                pass
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)

    return df.groupBy(key_col).applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema, outputMode="append", timeoutConf=timeout
    )


def streaming_running_counts(df: DataFrame, key_col: str) -> DataFrame:
    """Per-key running event count carried in keyed state — the minimal
    custom stateful aggregate (what the reference's implied occupancy
    counter would need in continuous mode)."""
    out_schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("n_total", T.LongType())]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"key": [str(key[0])], "n_total": [n]})

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_within_watermark(
    df: DataFrame, key_cols: list[str], *, ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """Built-in watermark-bounded streaming dedup
    (``dropDuplicatesWithinWatermark``): a key's dedup state lives only
    until the watermark passes its event time + `delay`, so state is
    bounded by the watermark horizon instead of growing forever — the
    engine-native counterpart of ``streaming_dedup_first_seen``'s
    processing-time TTL, and the direct Spark form of the reference's
    idle-state retention (Main.java:57, SURVEY.md T3). Prefer this when
    duplicates arrive close together in event time (CDC retries,
    at-least-once sources); use the custom operator when "first ever
    seen" must hold across unbounded time."""
    return ensure_event_time(df, ts_col).withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)
