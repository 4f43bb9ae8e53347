"""Round-11-queue (second wave) operator invariants: JL ratios center
on 1e6 with the k=16 spread, the dataset card cross-checks against
direct aggregates, and the survival curve is a monotone suffix sum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY


def test_jl_ratio_centers_on_unity(spark, sf_dir):
    rows = REGISTRY["jl_distortion_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == 120, "16-vector panel -> C(16,2) pairs"
    for r in rows:
        assert r.vec_a < r.vec_b and r.d_orig_fp > 0 and r.d_proj_fp >= 0
        assert r.ratio_ppm == r.d_proj_fp * 62500 // r.d_orig_fp
    mean = sum(r.ratio_ppm for r in rows) / len(rows)
    # E[ratio] = 1e6; at k = 16 the per-pair sd is ~sqrt(2/16) ~ 0.35e6,
    # so the 120-pair mean sits well inside this band.
    assert 700_000 < mean < 1_300_000, f"JL mean ratio off: {mean}"


def test_dataset_card_cross_checks(spark, sf_dir):
    from flinkstreametl_spark.operators import text as X

    [r] = REGISTRY["dataset_card_summary"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert r.n_docs == docs.count()
    assert r.n_langs == docs.select("lang").distinct().count()
    assert r.n_sources == docs.select("source").distinct().count()
    n_tok = docs.select(F.explode(X.tokens("text"))).count()
    assert r.n_tokens == n_tok
    assert r.tokens_per_doc_x100 == n_tok * 100 // r.n_docs
    assert 0 <= r.exact_dup_rate_bp <= 10000
    assert 0 <= r.mean_quality_x100 <= 900


def test_survival_curve_monotone_suffix(spark, sf_dir):
    rows = sorted(
        REGISTRY["churn_cohort_survival"].fn(spark, sf_dir).collect(),
        key=lambda r: r.lifetime_days,
    )
    assert rows
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    )
    assert rows[0].n_surviving == n_users, "everyone survives past the minimum lifetime"
    assert sum(r.n_users for r in rows) == n_users
    surv = [r.n_surviving for r in rows]
    assert surv == sorted(surv, reverse=True)
    # Suffix-sum law: surviving(t) = surviving(next) + n_users(t).
    for cur, nxt in zip(rows, rows[1:]):
        assert cur.n_surviving == nxt.n_surviving + cur.n_users
