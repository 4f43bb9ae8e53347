"""Round-11-queue operator invariants: Holt-Winters fixes a constant
series exactly, HITS max-normalization pins the top score to SCALE,
and the flag-propagation audit's counters obey containment laws.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY


def test_holt_winters_forecast_identity_and_constant_series(spark, sf_dir):
    rows = REGISTRY["holt_winters_seasonal_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.forecast_1 == r.level + r.trend + r.season_next
    import flinkstreametl_spark.plans.timeseries_ext as TS

    const = spark.createDataFrame(
        [("x", d, 7.0) for d in range(21)], "event_type STRING, day LONG, x DOUBLE"
    )
    orig = TS._daily
    try:
        TS._daily = lambda s, p: const.select(
            "event_type", "day", (F.col("x") * 1_000_000).cast("long").alias("s_fp")
        )
        [r] = TS.holt_winters_seasonal_daily(spark, sf_dir).collect()
        assert r.level == 7.0 and r.trend == 0.0 and r.season_next == 0.0
        assert r.forecast_1 == 7.0
    finally:
        TS._daily = orig


def test_hits_sides_ranked_and_normalized(spark, sf_dir):
    rows = REGISTRY["hits_order_part_scores"].fn(spark, sf_dir).collect()
    sides = {}
    for r in rows:
        sides.setdefault(r.side, []).append(r)
    assert set(sides) == {"authority", "hub"}
    for side, rs in sides.items():
        assert [r.rk for r in sorted(rs, key=lambda x: x.rk)] == list(range(1, 16))
        scores = [r.score_fp for r in sorted(rs, key=lambda x: x.rk)]
        assert scores == sorted(scores, reverse=True)
        assert scores[0] == 1_000_000, f"{side}: max-normalization pins rank 1 to SCALE"
        assert all(0 < s <= 1_000_000 for s in scores)


def test_flag_propagation_containment(spark, sf_dir):
    [r] = REGISTRY["dedup_flag_propagation_audit"].fn(spark, sf_dir).collect()
    assert r.n_clusters >= r.n_clusters_any_flag >= r.n_canonical_flagged >= 0
    # A flagged canonical implies a flagged cluster, so flagged
    # clusters partition exactly into kept-flag vs dropped-flag.
    assert r.n_flags_dropped == r.n_clusters_any_flag - r.n_canonical_flagged
    # The restricted-source flag is non-degenerate on the fixtures.
    assert r.n_docs_flagged > 0
