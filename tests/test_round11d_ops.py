"""Round-11-queue (fourth wave) operator invariants: Pettitt's
antisymmetry bound, assortativity's correlation range, and a-priori's
downward-closure law checked against the unpruned brute force.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY


def test_pettitt_stat_bounds(spark, sf_dir):
    rows = REGISTRY["pettitt_changepoint_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.k_stat == abs(r.u_at_change)
        # |U_t| <= t*(n-t) <= n^2/4 for a sign-sum over prefix pairs.
        assert 0 <= r.k_stat <= r.n_days * r.n_days / 4
        assert 0 <= r.change_day


def test_pettitt_last_prefix_is_zero(spark, sf_dir):
    """V_t is antisymmetric over pairs, so the full-series prefix sum
    U_n must be exactly 0 — rebuilt here from the daily grain."""
    from flinkstreametl_spark.plans.timeseries_ext import _daily

    daily = _daily(spark, sf_dir).select("event_type", "day", "s_fp")
    a, b = daily.alias("a"), daily.alias("b")
    sign = (
        F.when(F.col("a.s_fp") > F.col("b.s_fp"), 1)
        .when(F.col("a.s_fp") < F.col("b.s_fp"), -1)
        .otherwise(0)
    )
    tot = (
        a.join(b, F.col("a.event_type") == F.col("b.event_type"))
        .groupBy(F.col("a.event_type"))
        .agg(F.sum(sign).alias("u_n"))
        .collect()
    )
    assert tot and all(r.u_n == 0 for r in tot)


def test_assortativity_in_range(spark, sf_dir):
    rows = REGISTRY["degree_assortativity_copurchase"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_directed_edges > 0 and r.n_directed_edges % 2 == 0
    if r.assortativity is not None:
        assert -1.0 <= r.assortativity <= 1.0


def test_apriori_matches_bruteforce_and_closure(spark, sf_dir):
    rows = REGISTRY["apriori_triple_itemsets"].fn(spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a, b, c = baskets.alias("a"), baskets.alias("b"), baskets.alias("c")
    brute = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("b.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
            F.col("c.l_partkey").alias("p3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    want = {(r.p1, r.p2, r.p3): r.n for r in brute}
    got = {(r.p1, r.p2, r.p3): r.n_support for r in rows}
    assert got == want, "a-priori pruning must not change the answer"
    # Downward closure: every sub-pair of a frequent triple is frequent.
    pair_n = {
        (r.p1, r.p2): r.n
        for r in (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    for (p1, p2, p3), n in got.items():
        for sub in ((p1, p2), (p1, p3), (p2, p3)):
            assert pair_n[sub] >= n


def test_cramers_v_range_and_chi2_nonneg(spark, sf_dir):
    rows = REGISTRY["cramers_v_lang_source"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.chi2_ppm >= 0
    assert 0.0 <= r.cramers_v <= 1.0 + 1e-9
    assert r.dof == (r.n_langs - 1) * (r.n_sources - 1)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert r.n_docs == docs.count()


def test_k_anonymity_laws(spark, sf_dir):
    rows = REGISTRY["k_anonymity_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert r.n_rows == cust.count()
    assert 1 <= r.k_min
    assert 0 <= r.n_rows_below_k <= r.n_rows
    assert 0 <= r.below_k_bp <= 10000
    assert 1 <= r.l_min <= 5  # five TPC-H market segments
    assert 0 <= r.n_groups_l1 <= r.n_groups
    # Every group holds >= k_min rows, so groups * k_min <= rows.
    assert r.n_groups * r.k_min <= r.n_rows


def test_forecast_backtest_laws(spark, sf_dir):
    rows = REGISTRY["forecast_naive_backtest"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_origins >= 1
        assert r.naive_mae_fp >= 0 and r.snaive_mae_fp >= 0
        # sMAPE in [0, 2e6] ppm by construction.
        assert 0 <= r.naive_smape_ppm <= 2_000_000
        assert 0 <= r.snaive_smape_ppm <= 2_000_000


def test_simplified_silhouette_laws(spark, sf_dir):
    rows = REGISTRY["simplified_silhouette_by_cluster"].fn(spark, sf_dir).collect()
    assert rows
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == emb_n
    for r in rows:
        # a is the nearest centroid by assignment, so s >= 0 < 1e6.
        assert 0 <= r.min_sil_ppm <= r.mean_sil_ppm < 1_000_000
    # Cluster ids match the kmeans census.
    census = {c.cluster: c.n_members for c in REGISTRY["kmeans_cluster_sizes"].fn(spark, sf_dir).collect()}
    assert {r.cluster: r.n_members for r in rows} == census


def test_mann_kendall_laws(spark, sf_dir):
    rows = REGISTRY["mann_kendall_trend_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r.n_days
        # |S| <= C(n, 2), and Var(S)*18 <= n(n-1)(2n+5).
        assert abs(r.s_stat) <= n * (n - 1) // 2
        assert 0 < r.var_s_x18 <= n * (n - 1) * (2 * n + 5)
        # z carries S's sign (continuity correction shrinks toward 0).
        if r.s_stat > 1:
            assert r.z_stat > 0
        if r.s_stat < -1:
            assert r.z_stat < 0


def test_bfs_hop_profile_laws(spark, sf_dir):
    rows = sorted(
        REGISTRY["bfs_hop_profile_copurchase"].fn(spark, sf_dir).collect(),
        key=lambda r: r.level,
    )
    assert rows[0].level == 0 and rows[0].n_first_reached == 1
    cum = 0
    for r in rows:
        cum += r.n_first_reached
        assert r.cum_reached == cum
        assert r.n_first_reached > 0  # empty frontiers emit no row
    # Reached set never exceeds the node count of the graph.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_nodes = li.select("l_partkey").distinct().count()
    assert rows[-1].cum_reached <= n_nodes


def test_funnel_latency_laws(spark, sf_dir):
    rows = {r.measure: r for r in REGISTRY["funnel_latency_percentiles"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"total", "view_to_click", "click_to_purchase"}
    n = {r.n_converters for r in rows.values()}
    assert len(n) == 1  # same converter population for all measures
    for r in rows.values():
        assert 0 <= r.p50_s <= r.p90_s
    # Steps decompose the total: p50s need not add up, but maxima bound.
    assert rows["total"].p90_s >= max(rows["view_to_click"].p50_s, rows["click_to_purchase"].p50_s)
    # Converter count matches the ordered funnel's purchase stage.
    fun = REGISTRY["funnel_conversion_steps"].fn(spark, sf_dir).collect()[0]
    assert rows["total"].n_converters == fun.n_purchase


def test_markov_stationary_laws(spark, sf_dir):
    rows = REGISTRY["markov_stationary_event_mix"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    s = sum(r.stationary_ppm for r in rows)
    # Fixed-point flooring leaks a little mass per step, never gains.
    assert 990_000 <= s <= 1_000_000
    e = sum(r.empirical_ppm for r in rows)
    assert 999_995 <= e <= 1_000_000
    for r in rows:
        assert r.stationary_ppm >= 0


def test_quality_gates_kappa_laws(spark, sf_dir):
    rows = REGISTRY["quality_gates_kappa"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert r.n_docs == docs.count()
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n_docs
    assert 0 <= r.agree_bp <= 10000
    if r.kappa is not None:
        assert -1.0 <= r.kappa <= 1.0
    # Marginals match the individual gates' keep counts.
    gopher_keeps = REGISTRY["gopher_quality_gate"].fn(spark, sf_dir).filter("keep").count()
    assert r.n11 + r.n10 == gopher_keeps


def test_hhi_laws(spark, sf_dir):
    rows = REGISTRY["hhi_revenue_by_nation"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 1e6/n <= HHI <= 1e6 (floor can dip the lower bound by 1).
        assert 1_000_000 // r.n_customers - 1 <= r.hhi_ppm <= 1_000_000
        assert r.total_cents > 0


def test_bootstrap_ci_laws(spark, sf_dir):
    rows = REGISTRY["bootstrap_mean_doclen_ci"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_boot == 100
        assert r.ci_lo_fp <= r.ci_hi_fp
        # The point estimate should sit inside (or at worst graze) the
        # 90% interval on any non-adversarial fixture.
        assert r.ci_lo_fp <= r.mean_chars_fp <= r.ci_hi_fp
        assert r.n_docs > 0
