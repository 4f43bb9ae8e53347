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


def test_pca_power_topcomp_is_the_principal_axis(spark, sf_dir):
    """Oracle parity proves cross-engine identity; this proves the
    answer is actually PCA — the fixed-point vector must align with
    numpy's exact top eigenvector of the centered covariance."""
    import numpy as np

    rows = REGISTRY["pca_power_topcomp"].fn(spark, sf_dir).collect()
    assert [r.pos for r in rows] == list(range(1, 65))
    v = np.array([r.comp_fp for r in rows], dtype=np.float64)
    # renormalized to |v|_inf = 2^20 every step, including the last
    assert int(np.max(np.abs(v))) == 1 << 20

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").orderBy("vec_id").collect()
    x = np.array([r.embedding for r in emb], dtype=np.float64)
    xc = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(xc.T @ xc)
    top = evecs[:, -1]
    cos = abs(float(v @ top)) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, f"fixed-point component misaligned with numpy PCA: cos={cos}"


def test_hard_negative_mining_matches_numpy(spark, sf_dir):
    """Independent recompute: for every anchor, the mined negatives
    must be exactly numpy's top-5 different-label vectors by cosine
    (ties broken by neighbor_id, as the query pins)."""
    import numpy as np

    out = REGISTRY["hard_negative_mining"].fn(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in emb])
    labels = np.array([r.label for r in emb])
    x = np.array([r.embedding for r in emb], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    by_anchor: dict[int, list] = {}
    for r in out:
        assert r.anchor_label != r.neighbor_label
        assert -1.0 <= r.cosine <= 1.0
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == set(range(20))
    for aid, rows in by_anchor.items():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == [1, 2, 3, 4, 5]
        a = int(np.where(ids == aid)[0][0])
        mask = labels != labels[a]
        sims = xn[mask] @ xn[a]
        cand_ids = ids[mask]
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], cand_ids[i]))[:5]
        assert [r.neighbor_id for r in rows] == [int(cand_ids[i]) for i in order]


def test_containment_dup_pairs_matches_bruteforce(spark, sf_dir):
    """With the df cap not binding at test scale, prefix filtering must
    lose nothing: the output equals the brute-force all-pairs
    containment computed in Python sets."""
    import re

    out = REGISTRY["containment_dup_pairs"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()
    sh = {}
    for r in docs:
        toks = re.split(r"\s+", r.text.strip().lower())
        if len(toks) >= 3:
            sh[r.doc_id] = {"_".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    expect = {}
    for a, sa in sh.items():
        if len(sa) < 8:
            continue
        for b, sb in sh.items():
            if a == b:
                continue
            o = len(sa & sb)
            if 2 * o >= len(sa):
                expect[(a, b)] = (len(sa), o)
    got = {(r.doc_a, r.doc_b): (r.n_a, r.overlap) for r in out}
    assert got == expect
    for r in out:
        assert abs(r.containment - r.overlap / r.n_a) < 1e-12
        assert r.containment >= 0.5
