"""Semantic checks for plans/orderstats_ext.py and the round-5
time-series additions: oracle parity proves Spark == DuckDB; these
prove both equal an independently-written python reference (guards
against a shared misreading), plus the plan-shape claims."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from flinkstreametl_spark.sources.parquet import load_table


def test_equidepth_bounds_match_sorted_python(spark, sf_dir):
    from flinkstreametl_spark.plans.orderstats_ext import equidepth_totalprice_bounds

    vals = sorted(
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    )
    n = len(vals)
    got = {r.decile: r for r in equidepth_totalprice_bounds(spark, sf_dir).collect()}
    assert set(got) == set(range(1, 10))
    for i in range(1, 10):
        rank = (i * n + 9) // 10
        assert got[i].target_rank == rank
        assert got[i].boundary == vals[rank - 1]  # rank is 1-based


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    from flinkstreametl_spark.plans.orderstats_ext import pareto_frontier_parts

    rows = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    pts = [(r.p_partkey, r.p_retailprice, r.p_size) for r in rows]

    def dominated(x):
        return any(
            y[1] <= x[1] and y[2] >= x[2] and (y[1] < x[1] or y[2] > x[2]) for y in pts
        )

    expected = {x for x in pts if not dominated(x)}
    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in pareto_frontier_parts(spark, sf_dir).collect()
    }
    assert got == expected and expected
    # every frontier member must strictly beat all cheaper parts on size
    for _, price, size in got:
        cheaper_best = max((y[2] for y in pts if y[1] < price), default=-1)
        assert size > cheaper_best


def test_mode_tie_break_is_deterministic(spark):
    from flinkstreametl_spark.plans.orderstats_ext import mode_brand_per_type

    import os
    import tempfile

    rows = [("T1", "B2"), ("T1", "B2"), ("T1", "B1"), ("T1", "B1"), ("T1", "B3")]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, "p_type string, p_brand string").withColumn(
        "p_partkey", F.monotonically_increasing_id()
    ).withColumn("p_name", F.lit("x")).withColumn("p_size", F.lit(1)).withColumn(
        "p_retailprice", F.lit(1.0)
    ).write.parquet(os.path.join(tmp, "part.parquet"))
    out = mode_brand_per_type(spark, tmp).collect()
    # B1 and B2 tie at 2; the lexicographically smaller brand wins
    assert len(out) == 1 and out[0].p_brand == "B1" and out[0].n_parts == 2


def test_capped_balance_matches_iterative_python(spark, sf_dir):
    from flinkstreametl_spark.operators.windows import epoch_micros
    from flinkstreametl_spark.plans.timeseries_ext import capped_balance_daily

    events = load_table(spark, sf_dir, "events")
    day = (epoch_micros(events, "ts") / F.lit(86_400_000_000)).cast("long")
    raw = events.select(
        "event_type", day.alias("day"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("v"),
    ).collect()
    acc: dict[tuple, int] = defaultdict(int)
    for r in raw:
        acc[(r.event_type, r.day)] += r.v
    series: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (et, d), s in acc.items():
        series[et].append((d, s))
    got = {r.event_type: r for r in capped_balance_daily(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, days in series.items():
        days.sort()
        n, total = len(days), sum(s for _, s in days)
        bal = peak = 0
        for _, s in days:
            d = n * s - total
            peak = max(peak, bal + d)
            bal = max(0, bal + d)
        assert got[et].final_buffer_scaled == bal
        assert got[et].peak_buffer_scaled == peak
        assert got[et].n_days == n and got[et].last_day == days[-1][0]


def test_streaks_match_python(spark, sf_dir):
    from flinkstreametl_spark.operators.windows import epoch_micros
    from flinkstreametl_spark.plans.timeseries_ext import user_activity_streaks

    events = load_table(spark, sf_dir, "events")
    day = (epoch_micros(events, "ts") / F.lit(86_400_000_000)).cast("long")
    per_user: dict[int, set[int]] = defaultdict(set)
    for r in events.select("user_id", day.alias("day")).collect():
        per_user[r.user_id].add(r.day)
    got = {r.user_id: r for r in user_activity_streaks(spark, sf_dir).collect()}
    assert set(got) == set(per_user)
    for uid, days in per_user.items():
        ds = sorted(days)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[uid].n_active_days == len(ds)
        assert got[uid].n_streaks == len(streaks)
        assert got[uid].longest_streak == max(streaks)


def test_cumulative_users_monotone_and_total(spark, sf_dir):
    from flinkstreametl_spark.plans.timeseries_ext import cumulative_unique_users

    events = load_table(spark, sf_dir, "events")
    n_users = events.select("user_id").distinct().count()
    rows = sorted(
        cumulative_unique_users(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows[-1].cum_users == n_users
    run = 0
    for r in rows:
        run += r.n_new_users
        assert r.cum_users == run


def test_topk_with_ties_includes_all_tied_rows(spark, sf_dir):
    from flinkstreametl_spark.plans.orderstats_ext import topk_with_ties_orders

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    ).collect()
    by_prio = defaultdict(list)
    for r in rows:
        by_prio[r.o_orderpriority].append((r.o_totalprice, r.o_orderkey))
    got = defaultdict(set)
    for r in topk_with_ties_orders(spark, sf_dir).collect():
        got[r.o_orderpriority].add(r.o_orderkey)
    for prio, vs in by_prio.items():
        vals = sorted({v for v, _ in vs}, reverse=True)[:3]
        expected = {k for v, k in vs if v in vals}
        assert got[prio] == expected


def test_weighted_median_matches_python(spark, sf_dir):
    from flinkstreametl_spark.plans.orderstats_ext import weighted_median_quantity

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    acc = defaultdict(lambda: defaultdict(int))
    for r in rows:
        acc[r.l_returnflag][r.l_extendedprice] += int(r.l_quantity)
    got = {r.l_returnflag: r for r in weighted_median_quantity(spark, sf_dir).collect()}
    for flag, wmap in acc.items():
        total = sum(wmap.values())
        cum = 0
        for v in sorted(wmap):
            cum += wmap[v]
            if 2 * cum >= total:
                break
        assert got[flag].weighted_median_price == v
        assert got[flag].total_weight == total


def test_pit_status_matches_python(spark, sf_dir):
    """Backward as-of dimension lookup vs a brute-force python scan
    (newest order with date <= shipdate, ties by highest orderkey)."""
    from flinkstreametl_spark.plans.warehouse_ext import scd2_point_in_time_status

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"
    ).collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append(o)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    ).collect()
    okey_to_cust = {o.o_orderkey: o.o_custkey for o in orders}

    out = scd2_point_in_time_status(spark, sf_dir).collect()
    assert len(out) == len(li)
    checked = 0
    for r in out[:500]:
        cands = [
            o for o in by_cust[r.o_custkey] if o.o_orderdate <= r.l_shipdate
        ]
        if not cands:
            assert r.status_at_ship is None and r.status_since is None
        else:
            best = max(cands, key=lambda o: (o.o_orderdate, o.o_orderkey))
            assert r.status_at_ship == best.o_orderstatus
            assert r.status_since == best.o_orderdate
        assert okey_to_cust[r.l_orderkey] == r.o_custkey
        checked += 1
    assert checked == min(500, len(out))


def test_dau_mau_matches_python(spark, sf_dir):
    from flinkstreametl_spark.operators.windows import epoch_micros
    from flinkstreametl_spark.plans.timeseries_ext import dau_mau_stickiness

    events = load_table(spark, sf_dir, "events")
    day = (epoch_micros(events, "ts") / F.lit(86_400_000_000)).cast("long")
    active = defaultdict(set)
    for r in events.select("user_id", day.alias("day")).collect():
        active[r.day].add(r.user_id)
    max_day = max(active)
    got = {r.day: r for r in dau_mau_stickiness(spark, sf_dir).collect()}
    assert set(got) == set(active)
    for d, users in active.items():
        mau = set()
        for back in range(28):
            mau |= active.get(d - back, set())
        assert got[d].dau == len(users)
        assert got[d].mau28 == len(mau)
        assert got[d].stickiness == len(users) / len(mau)
