"""[EXT] Analytic-window composite operators: sessionization and as-of
join (SURVEY.md §2.9; "Common OLAP patterns" in the public Spark docs).

Both are built from windows + unions only — no cross joins, no Python:

- sessionize: gap-detection via lag() + conditional running sum. One
  shuffle on the session key; state is a single row per (key, row).
- as-of join: the union-window technique — interleave both relations on
  the time axis, then carry the last-seen right-side row forward with
  last(ignorenulls). Cost = one shuffle + sort on (key, time), which
  beats the naive range-join cross product at any scale; at 100 TB this
  is the only shape that works without an interval index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def epoch_seconds(df: DataFrame, ts_col: str) -> F.Column:
    """Epoch seconds for a timestamp column, robust to both TIMESTAMP
    (LTZ) and TIMESTAMP_NTZ physical types (parquet written without
    isAdjustedToUTC reads as NTZ under Spark's inferTimestampNTZ, and
    NTZ forbids a direct CAST(.. AS BIGINT)). NTZ is measured against a
    naive 1970-01-01 anchor, which is timezone-independent and matches
    DuckDB's epoch() over naive timestamps."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})")
    return F.col(ts_col).cast("long")


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Cast a TIMESTAMP_NTZ event-time column to TIMESTAMP: Spark's
    watermarks reject NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Under
    the session's UTC timezone (session.py) the cast is the naive-as-UTC
    reading, identical to the DuckDB oracle's interpretation. No-op for
    columns already TIMESTAMP."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def epoch_micros(df: DataFrame, ts_col: str) -> F.Column:
    """Epoch microseconds, robust to TIMESTAMP vs TIMESTAMP_NTZ (same
    rationale as ``epoch_seconds``; unix_micros() rejects NTZ input)."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})")
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds `gap_seconds`. Returns the
    input plus a `session_id` column (1-based per key, deterministic).

    The epoch-seconds conversion is materialized ONCE into a projected
    column before the window: window/HOF expression trees get no
    common-subexpression elimination, so using the raw ``timestampdiff``
    expression as both the lag operand and the current-row operand would
    evaluate it twice per row (measured 1.5× on the sessionize bench
    after the NTZ-robust conversion replaced a plain cast)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    with_sec = df.withColumn("_sec", epoch_seconds(df, ts_col))
    gap = F.col("_sec") - F.lag("_sec").over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        with_sec.withColumn("_new", is_new)
        .withColumn("session_id", F.sum("_new").over(run))
        .drop("_new", "_sec")
    )


def _asof_union_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str,
    *,
    descending: bool,
    right_first_on_tie: bool,
    lowest_tb_wins: bool,
) -> DataFrame:
    """Shared union-window as-of core (both directions):

      1. tag both inputs and union on (key, t);
      2. sort each key's timeline by (t [asc|desc], tag, tie_break) —
         the tag order decides whether right rows at the SAME t are
         visible to the left row (right-first) or hidden (left-first),
         and the tie_break polarity decides which of several right rows
         sharing one t wins the carry (the LAST in frame order wins);
      3. last(right_col, ignorenulls=True) over the growing frame
         carries the nearest qualifying right values;
      4. keep left rows.
    """
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_tag", F.lit(1)).withColumn("_tb", F.lit(None).cast("long"))
    rt = right.select(
        F.col(right_key).alias(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(tie_break).cast("long").alias("_tb"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    lcols = [f for f in left.columns]
    lt2 = lt.select(
        *lcols, "_t", "_tag", "_tb", *[F.lit(None).cast(rt.schema[f"_r_{c}"].dataType).alias(f"_r_{c}") for c in right_cols]
    )
    rt2 = rt.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != key else F.col(key) for c in lcols],
        "_t",
        "_tag",
        "_tb",
        *[F.col(f"_r_{c}") for c in right_cols],
    )
    unioned = lt2.unionByName(rt2)
    t_order = F.col("_t").desc() if descending else F.col("_t").asc()
    tag_order = F.col("_tag").asc() if right_first_on_tie else F.col("_tag").desc()
    tb_order = F.col("_tb").desc_nulls_last() if lowest_tb_wins else F.col("_tb").asc_nulls_last()
    w = (
        Window.partitionBy(key)
        .orderBy(t_order, tag_order, tb_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_tag",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c if c != key else f"asof_{c}") for c in right_cols],
    )
    return carried.filter(F.col("_tag") == 1).drop("_tag")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right_ts <= left_ts on the same key (ties on right_ts broken by the
    highest `tie_break`); exact timestamp matches are visible. See
    :func:`_asof_union_window` for the machinery."""
    return _asof_union_window(
        left, right, key, right_key, left_ts, right_ts, right_cols, tie_break,
        descending=False, right_first_on_tie=True, lowest_tb_wins=False,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str,
    *,
    allow_exact_matches: bool = False,
) -> DataFrame:
    """Forward as-of join (pandas ``merge_asof(direction='forward')``):
    for each left row, the EARLIEST right row with right_ts > left_ts
    (>= when ``allow_exact_matches``) on the same key — the attribution
    primitive ("first conversion after this touchpoint").

    Same union-window machinery as :func:`asof_join`
    (:func:`_asof_union_window`), scanned in DESCENDING time order so
    the carried value is the nearest FOLLOWING right row. At equal
    timestamps the tag ordering decides visibility: right rows sort
    before left rows (visible) when exact matches are allowed, after
    them (invisible) when the match must be strict. Ties on right_ts
    are broken toward the LOWEST ``tie_break`` so both engines pick the
    same row. One shuffle (the key window); no range cross join, so a
    hot key costs O(its rows), not O(rows^2)."""
    return _asof_union_window(
        left, right, key, right_key, left_ts, right_ts, right_cols, tie_break,
        descending=True, right_first_on_tie=allow_exact_matches, lowest_tb_wins=True,
    )


def ewma_fold(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.25,
) -> DataFrame:
    """Per-key EWMA (y_n = alpha*x_n + (1-alpha)*y_{n-1}, seeded with
    the first value) as a deterministic sequential left fold:
    ``aggregate`` over ``array_sort(collect_list(struct(order, x)))``.
    collect_list order is partition-dependent; the sort restores a
    total order, so the fold — and every intermediate double — is
    identical under any partitioning. Returns one row per key:
    (*keys, n_points, last_order, ewma).

    ``order_col`` must be unique per key (it is the sort's total-order
    key). For CROSS-ENGINE bit-equality pick a dyadic alpha (0.25,
    0.5, 0.375...): non-dyadic literals like 0.3 convert to double
    differently through DuckDB's decimal path (see
    plans/timeseries_ext.py). Fold length is the per-key series —
    aggregate to a bounded grain (daily, hourly) first; the streaming
    twin for unbounded per-event series is streaming/tws.py
    EwmaProcessor."""
    arr = F.array_sort(F.collect_list(F.struct(order_col, value_col)))
    grouped = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.max(order_col).alias("last_order"),
        arr.alias("_arr"),
    )
    xs = F.transform(F.col("_arr"), lambda s: s[value_col].cast("double"))
    grouped = grouped.withColumn("_xs", xs)
    ewma = F.aggregate(
        F.slice(F.col("_xs"), F.lit(2), F.size("_xs") - F.lit(1)),
        F.element_at(F.col("_xs"), 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return grouped.select(*key_cols, "n_points", "last_order", ewma.alias("ewma"))
