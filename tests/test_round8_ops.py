"""Round-8 operator invariants (the laws oracle parity can't state):
water-filling allocation identities, matryoshka recall monotonicity,
n-gram repetition bounds, and the staleness audit's anchors."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY


def test_domain_budget_allocation_laws(spark, sf_dir):
    out = REGISTRY["domain_budget_allocation"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "allocation must cover every source"
    total_supply = sum(r.supply_tokens for r in rows)
    budget = (total_supply * 3) // 5
    # exact budget exhaustion, never over-allocation
    assert sum(r.alloc_tokens for r in rows) == budget
    for r in rows:
        assert 0 <= r.alloc_tokens <= r.supply_tokens
    # capped sources all land within 1 token of one another (water level)
    capped = [r.alloc_tokens for r in rows if r.capped]
    if capped:
        assert max(capped) - min(capped) <= 1
        # every uncapped supply sits at or below the water level
        uncapped = [r.supply_tokens for r in rows if not r.capped]
        assert all(s <= min(capped) for s in uncapped)


def test_mrl_truncation_recall_laws(spark, sf_dir):
    rows = {r.dim: r for r in REGISTRY["mrl_truncation_recall"].fn(spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32, 64}
    # full width IS the truth: exact recall by construction
    assert rows[64].recall_at_10 == 1.0
    for d in rows:
        assert 0.0 <= rows[d].recall_at_10 <= 1.0
        assert rows[d].n_overlap <= 50


def test_ngram_repetition_stats_bounds(spark, sf_dir):
    out = REGISTRY["ngram_repetition_stats"].fn(spark, sf_dir)
    rows = out.collect()
    n_docs = out.sparkSession.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs  # every doc gets a verdict
    for r in rows:
        assert 0.0 < r.top2_char_frac <= 1.0
        assert 0.0 <= r.dup3_char_frac <= 1.0
        assert r.top2_count >= 1
    # thresholds sit inside the fixture distribution: both outcomes occur
    keeps = {r.keep for r in rows}
    assert keeps == {True, False}


def test_ann_staleness_audit_anchors(spark, sf_dir):
    rows = REGISTRY["ann_index_staleness_audit"].fn(spark, sf_dir).collect()
    by = {(r.index_state, r.nprobe): r for r in rows}
    assert set(by) == {(s, n) for s in ("stale", "refit") for n in (1, 2, 4, 8)}
    # nprobe = k scans every cluster: exact recall for BOTH index states
    assert by[("stale", 8)].recall_at_10 == 1.0
    assert by[("refit", 8)].recall_at_10 == 1.0
    # recall is monotone in nprobe within each state (supersets of candidates)
    for state in ("stale", "refit"):
        seq = [by[(state, n)].recall_at_10 for n in (1, 2, 4, 8)]
        assert seq == sorted(seq)
        cand = [by[(state, n)].n_candidates for n in (1, 2, 4, 8)]
        assert cand == sorted(cand)
