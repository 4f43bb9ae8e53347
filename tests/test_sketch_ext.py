"""Sketch-operator invariants: HLL register/estimate laws and the
Count-Min overcount law, plus the mergeability property both sketches'
100 TB story rests on (partition count must not change the sketch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY
from flinkstreametl_spark.plans.sketch_ext import HLL_M, _HLL_RHO_MAX


def test_hll_register_and_error_laws(spark, sf_dir):
    rows = REGISTRY["hll_distinct_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_buckets <= HLL_M
        # Harmonic sum bounds: every observed bucket contributes in
        # [1, 2^50], every empty one exactly 2^51.
        lo = r.n_buckets + (HLL_M - r.n_buckets) * (1 << _HLL_RHO_MAX)
        hi = HLL_M * (1 << _HLL_RHO_MAX)
        assert lo <= r.s_scaled <= hi
        assert r.n_exact > 0 and r.hll_est > 0
        assert r.method in ("lc", "raw")
        # Both branches hold ~3% standard error in their regime; 4
        # sigma is a generous, deterministic-fixture-safe band.
        assert abs(r.err_bp) < 1300, f"{r.event_type}[{r.method}]: {r.err_bp} bp off exact"


def test_hll_sketch_partition_invariant(spark, sf_dir):
    """max(rho) per bucket is a commutative/idempotent merge — the
    sketch must be bit-identical under any input partitioning."""
    from flinkstreametl_spark.plans.sketch_ext import hll_sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    outs = []
    for n in (1, 13):
        outs.append(sorted(tuple(r) for r in hll_sketch(ev.repartition(n)).collect()))
    assert outs[0] == outs[1]


def test_hll_sketch_replay_idempotent(spark, sf_dir):
    """Re-adding the same keys (at-least-once redelivery) must not move
    a single register: union(events, events) -> identical sketch."""
    from flinkstreametl_spark.plans.sketch_ext import hll_sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = sorted(tuple(r) for r in hll_sketch(ev).collect())
    b = sorted(tuple(r) for r in hll_sketch(ev.unionAll(ev)).collect())
    assert a == b


def test_cms_overcount_law(spark, sf_dir):
    rows = REGISTRY["cms_heavy_hitters_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # CMS point estimates never undercount.
        assert r.over_cnt >= 0
        assert r.cms_est == r.exact_cnt + r.over_cnt
        assert r.exact_cnt > 0


def test_cms_estimate_upper_bound(spark, sf_dir):
    """min over d rows is bounded by total mass: no cell can exceed the
    corpus token count (sanity on the counter arithmetic)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim("text")), r"\s+"))).alias("n")
    ).collect()[0].n
    rows = REGISTRY["cms_heavy_hitters_audit"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.cms_est <= total


def test_quantile_sketch_one_bin_error_law(spark, sf_dir):
    """Grid-sketch construction law: the rank-r value lies in the first
    bin whose cumulative count reaches r, and the estimate is that
    bin's LOWER edge — so 0 <= true - est <= one bin width, always."""
    rows = REGISTRY["quantile_sketch_audit"].fn(spark, sf_dir).collect()
    assert sorted(r.q for r in rows) == [50, 90, 99]
    for r in rows:
        assert 0 <= r.true_fp - r.est_fp <= r.bound_fp
        assert r.err_fp == r.true_fp - r.est_fp
        assert r.n > 0
