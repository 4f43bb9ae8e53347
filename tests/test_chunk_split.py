"""Laws for the scalable micro-batch chunk split (VERDICT r10 item 3):
``_ntile_chunks`` must (a) reproduce the exact NTILE(n) the replay
oracles state in SQL — same tile per row as the single-partition
global-sort Window it replaced — (b) be deterministic across
invocations (range-boundary sampling must not leak into membership),
and (c) keep the plan free of the unpartitioned-Window funnel."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flinkstreametl_spark.plans.stream_parity_ext import _ntile_chunks
from flinkstreametl_spark.sources.parquet import load_table


def _tiles(df, n, order_cols):
    return {
        tuple(r[c] for c in order_cols): r["_b"]
        for r in _ntile_chunks(df, n, order_cols).collect()
    }


def test_matches_global_ntile_exactly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    got = _tiles(ev, 3, ["ts", "event_id"])
    want = {
        (r["ts"], r["event_id"]): r["_b"]
        for r in ev.withColumn(
            "_b", F.ntile(3).over(Window.orderBy("ts", "event_id"))
        ).collect()
    }
    assert got == want and got


def test_deterministic_across_invocations(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    assert _tiles(ev, 3, ["ts", "event_id"]) == _tiles(ev, 3, ["ts", "event_id"])


def test_uneven_and_tiny_totals(spark):
    # total < n: NTILE gives one row per tile for the first `total`
    # tiles; total % n != 0: the first rem tiles hold one extra row.
    two = spark.createDataFrame([(1,), (2,)], "k LONG")
    assert _tiles(two, 3, ["k"]) == {(1,): 1, (2,): 2}
    seven = spark.createDataFrame([(i,) for i in range(7)], "k LONG")
    got = _tiles(seven, 3, ["k"])
    assert got == {(0,): 1, (1,): 1, (2,): 1, (3,): 2, (4,): 2, (5,): 3, (6,): 3}


def test_no_unpartitioned_window_in_plan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    plan = _ntile_chunks(ev, 3, ["ts", "event_id"])._jdf.queryExecution().executedPlan().toString()
    # The window in the plan must be partitioned by _pid — an empty
    # partition spec would resurrect the single-task global sort.
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line, f"unpartitioned window resurfaced: {line}"


def test_with_ntile_desc_matches_window_ntile(spark, sf_dir):
    from flinkstreametl_spark.operators.ranks import with_ntile
    from flinkstreametl_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    got = {
        r["event_id"]: r["_q"]
        for r in with_ntile(
            ev, 4, [F.col("value").desc(), F.col("event_id")], "_q"
        ).collect()
    }
    want = {
        r["event_id"]: r["_q"]
        for r in ev.withColumn(
            "_q", F.ntile(4).over(Window.orderBy(F.col("value").desc(), "event_id"))
        ).collect()
    }
    assert got == want and got


def test_with_running_sum_matches_window_scan(spark, sf_dir):
    from flinkstreametl_spark.operators.ranks import with_running_sum
    from flinkstreametl_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (F.col("event_id") % 5 - 2).cast("long").alias("d")
    )
    got = {
        r["event_id"]: r["run"]
        for r in with_running_sum(ev, ["event_id"], "d", "run").collect()
    }
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["event_id"]: r["run"]
        for r in ev.withColumn("run", F.sum("d").over(w)).collect()
    }
    assert got == want and got


def test_with_running_sum_rejects_non_integral_values(spark):
    from flinkstreametl_spark.operators.ranks import with_running_sum

    df = spark.createDataFrame([(1, 1.5), (2, 2.5)], "k LONG, v DOUBLE")
    import pytest

    with pytest.raises(TypeError, match="integral"):
        with_running_sum(df, ["k"], "v", "run")


def test_with_running_sum_survives_all_null_partition(spark):
    from flinkstreametl_spark.operators.ranks import with_running_sum

    rows = [(i, None if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "k LONG, v LONG")
    out = {r["k"]: r["run"] for r in with_running_sum(df, ["k"], "v", "run").collect()}
    assert out[99] == 50 and out[0] == 0  # leading nulls scan to 0, tail sums


def test_prefix_sum_small_guards_fire(spark):
    # VERDICT r11 item 4 / ADVICE r11: the O(k^2) triangle join must
    # refuse corpus-sized frames and tie-ambiguous keys loudly.
    import pytest

    from flinkstreametl_spark.operators.ranks import (
        PREFIX_SUM_MAX_ROWS,
        prefix_sum_small,
    )

    big = spark.range(PREFIX_SUM_MAX_ROWS + 1).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    with pytest.raises(ValueError, match="cap"):
        prefix_sum_small(big, "k", "v", "cum")

    dup = spark.createDataFrame([(1, 10), (1, 10), (2, 5)], "k LONG, v LONG")
    with pytest.raises(ValueError, match="unique"):
        prefix_sum_small(dup, "k", "v", "cum")

    withnull = spark.createDataFrame([(1, 10), (None, 5)], "k LONG, v LONG")
    with pytest.raises(ValueError, match="unique"):
        prefix_sum_small(withnull, "k", "v", "cum")


def test_prefix_sum_small_still_exact_under_guard(spark):
    from flinkstreametl_spark.operators.ranks import prefix_sum_small

    df = spark.createDataFrame([(3, 30), (1, 10), (2, 20)], "k LONG, v LONG")
    out = {r["k"]: r["cum"] for r in prefix_sum_small(df, "k", "v", "cum").collect()}
    assert out == {1: 10, 2: 30, 3: 60}


def test_ntile_closed_form_is_integral(spark):
    # ADVICE r11: the tile index must be computed with integral `div`,
    # not double division — assert no cast-to-double of the rank feeds
    # the tile arithmetic by checking dtype end-to-end on a frame big
    # enough to exercise both when-branches.
    from flinkstreametl_spark.operators.ranks import with_ntile

    df = spark.range(11).select(F.col("id").alias("k"))
    out = with_ntile(df, 4, ["k"], "q")
    assert dict(out.dtypes)["q"] == "int"
    got = {r["k"]: r["q"] for r in out.collect()}
    want = {
        r["k"]: r["q"]
        for r in df.withColumn("q", F.ntile(4).over(Window.orderBy("k"))).collect()
    }
    assert got == want
