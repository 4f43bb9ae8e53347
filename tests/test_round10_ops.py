"""Round-10-queue operator invariants (the laws oracle parity can't
state): cohort offset-0 is total by definition, the funnel only
shrinks, Benford shares floor-sum to one, and Mann-Whitney U obeys
U_s + U_rest = 2·n_s·n_rest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY

# Explicit module imports so these tests stand alone even while a
# round's additions are still being wired into plans/__init__.
from flinkstreametl_spark.plans import eval_ext  # noqa: F401


def test_cohort_offset_zero_is_full_retention(spark, sf_dir):
    rows = REGISTRY["cohort_retention_matrix"].fn(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0 and 0 < r.n_active <= r.n_cohort
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets, f"cohort {cohort} lost its seeding week"
        r0 = offsets[0]
        assert r0.n_active == r0.n_cohort and r0.retention_bp == 10000
    # Cohort sizes partition the user base: every user joins exactly one.
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(offsets[0].n_cohort for offsets in by_cohort.values()) == n_users


def test_funnel_only_shrinks_and_is_ordered(spark, sf_dir):
    [r] = REGISTRY["funnel_conversion_steps"].fn(spark, sf_dir).collect()
    assert r.n_users >= r.n_view >= r.n_click >= r.n_purchase > 0
    assert r.click_bp <= 10000 and r.purchase_bp <= 10000 and r.funnel_bp <= min(r.click_bp, r.purchase_bp)
    # The ordered funnel can only be tighter than the unordered one.
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    unordered = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("k"))
        .filter(F.col("k") == 3)
        .count()
    )
    assert r.n_purchase <= unordered


def test_benford_shares_floor_sum_to_one(spark, sf_dir):
    rows = REGISTRY["benford_first_digit_audit"].fn(spark, sf_dir).collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == n_li
    total_ppm = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) < total_ppm <= 1_000_000, "floor-div shares must sum to just under 1e6"
    for r in rows:
        assert r.dev_ppm == abs(r.share_ppm - r.benford_ppm)


def test_mannwhitney_u_complement_law(spark, sf_dir):
    rows = REGISTRY["mannwhitney_source_lengths"].fn(spark, sf_dir).collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    ties = {r.tie_correction for r in rows}
    assert len(ties) == 1, "the tie term is corpus-global"
    for r in rows:
        assert r.n_s + r.n_rest == n_docs
        assert r.u_s_x2 + r.u_rest_x2 == 2 * r.n_s * r.n_rest
        assert 0 <= r.u_s_x2 <= 2 * r.n_s * r.n_rest


def test_holt_forecast_identity_and_constant_series(spark, sf_dir):
    rows = REGISTRY["holt_linear_forecast_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_days > 0
        assert r.forecast_7d == r.level + 7.0 * r.trend
    # A constant series fits level == the constant and trend == 0.
    from flinkstreametl_spark.plans.timeseries_ext import holt_linear_forecast_daily
    import flinkstreametl_spark.plans.timeseries_ext as TS

    const = spark.createDataFrame(
        [("x", d, 5.0) for d in range(20)], "event_type STRING, day LONG, x DOUBLE"
    )
    orig = TS._daily
    try:
        TS._daily = lambda s, p: const.select(
            "event_type", "day", (F.col("x") * 1_000_000).cast("long").alias("s_fp")
        )
        [r] = holt_linear_forecast_daily(spark, sf_dir).collect()
        assert r.level == 5.0 and r.trend == 0.0 and r.forecast_7d == 5.0
    finally:
        TS._daily = orig


def test_acf_lag_coverage_and_bounds(spark, sf_dir):
    rows = REGISTRY["acf_daily_lags"].fn(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert 1 <= r.lag <= 7
        assert 0 < r.n_pairs <= r.n_days - r.lag
        assert abs(r.acf) <= 1.05, f"ACF far out of range at lag {r.lag}: {r.acf}"
    for t, rs in by_type.items():
        assert sorted(x.lag for x in rs) == list(range(1, 8)), f"{t} missing lags"


def test_backlog_conservation(spark, sf_dir):
    rows = sorted(
        REGISTRY["orders_backlog_daily"].fn(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n_closed = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey").distinct().count()
    )
    assert sum(r.n_opened for r in rows) == n_orders
    assert sum(r.n_closed for r in rows) == n_closed
    # The cumsum's last row carries the never-closed residue exactly.
    assert rows[-1].backlog == n_orders - n_closed
    run = 0
    for r in rows:
        run += r.n_opened - r.n_closed
        assert r.backlog == run


def test_burstiness_bounds_and_gap_accounting(spark, sf_dir):
    rows = REGISTRY["inter_arrival_burstiness"].fn(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = {r.user_id: r.cnt for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for r in rows:
        assert r.n_gaps == per_user[r.user_id] - 1
        assert -1.0 <= r.burstiness <= 1.0
        # Cauchy-Schwarz: n·Σg² >= (Σg)², so the sqrt argument is valid.
        assert r.n_gaps * r.sum_gap_sq >= r.sum_gap_s * r.sum_gap_s


def test_bm25_mrr_self_retrieval(spark, sf_dir):
    rows = REGISTRY["bm25_mrr_eval"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.self_rank <= 10
        if r.self_rank:
            assert r.rr_fp == 1_000_000 // r.self_rank
        else:
            assert r.rr_fp == 0
    # Keyterm (top-tf) queries retrieve their source doc on this corpus
    # — the property the keyterm redesign bought (title queries scored
    # near-zero on the 31-token vocabulary).
    found = sum(1 for r in rows if r.self_rank)
    assert found == 20


def test_cluster_quality_spread_histogram(spark, sf_dir):
    rows = REGISTRY["dedup_cluster_quality_spread"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.spread <= 9
        assert r.n_docs >= 2 * r.n_clusters, "clusters have >= 2 members by construction"


def test_percentile_bands_ordered(spark, sf_dir):
    rows = REGISTRY["value_percentile_bands"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = {r.event_type: r.cnt for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert {r.event_type for r in rows} == set(counts)
    for r in rows:
        assert r.n == counts[r.event_type]
        assert r.p50_fp <= r.p90_fp <= r.p99_fp
