"""Round-11-queue (third wave) operator invariants: containment bounds
and direction, burstiness >= 1 by construction, and time-decay
attribution's value-conservation law.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY


def test_containment_bounds_and_candidate_coverage(spark, sf_dir):
    rows = REGISTRY["neardup_containment_pairs"].fn(spark, sf_dir).collect()
    assert rows
    from flinkstreametl_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_pairs = D.minhash_lsh_pairs(docs, threshold=0.6).count()
    assert len(rows) == n_pairs, "one containment row per emitted candidate pair"
    for r in rows:
        assert 0 < r.n_common <= min(r.size_a, r.size_b)
        assert r.containment_ab_fp == r.n_common * 1_000_000 // r.size_a
        assert r.containment_ba_fp == r.n_common * 1_000_000 // r.size_b
        # The smaller set is always at least as contained as the larger.
        if r.size_a < r.size_b:
            assert r.containment_ab_fp >= r.containment_ba_fp


def test_burstiness_at_least_one(spark, sf_dir):
    rows = REGISTRY["term_burstiness_top50"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    vals = [r.burstiness_x100 for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r.df >= 5 and r.cf >= r.df
        assert r.burstiness_x100 >= 100, "cf >= df forces burstiness >= 1"


def test_time_decay_conserves_attributed_value(spark, sf_dir):
    rows = REGISTRY["time_decay_attribution_daily"].fn(spark, sf_dir).collect()
    assert rows
    # Independent recomputation of the attributed-purchase total: every
    # purchase with >= 1 click in its 30-minute lookback pays out its
    # exact fixed-point value, regardless of the weighting scheme.
    from flinkstreametl_spark.operators.windows import epoch_micros

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_id", "user_id", "event_type", epoch_micros(ev, "ts").alias("us"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("v"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("us").alias("cus")
    )
    p = e.filter(F.col("event_type") == "purchase")
    attributed = (
        p.join(
            c,
            (F.col("cu") == F.col("user_id"))
            & (F.col("cus") < F.col("us"))
            & (F.col("cus") >= F.col("us") - 30 * 60 * 1_000_000),
            "left_semi",
        )
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    assert sum(r.value_fp_received for r in rows) == attributed
    # Linear and time-decay models pay the same purchases, so their
    # totals agree exactly even though per-day splits differ.
    linear = REGISTRY["multitouch_attribution_daily"].fn(spark, sf_dir).collect()
    assert sum(r.value_fp_received for r in linear) == attributed


def test_personalized_pagerank_seeds_and_ordering(spark, sf_dir):
    rows = sorted(
        REGISTRY["personalized_pagerank_copurchase"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rk,
    )
    assert [r.rk for r in rows] == list(range(1, 21))
    scores = [r.rank_fp for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    n_seeds_ranked = sum(1 for r in rows if r.is_seed)
    # Seeds receive all restart mass, so most of the top-20 is seeds
    # plus their strongest neighbors.
    assert n_seeds_ranked >= 5


def test_token_pair_lift_law(spark, sf_dir):
    rows = REGISTRY["token_pair_lift_top50"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r.term_a < r.term_b
        assert r.co_df >= 5 and r.co_df <= min(r.df_a, r.df_b)
    vals = [r.lift_x100 for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_priority_transition_rows_sum_to_one(spark, sf_dir):
    rows = REGISTRY["order_priority_transition_matrix"].fn(spark, sf_dir).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_priority, []).append(r)
        assert r.n <= r.row_n
    for prev, rs in by_prev.items():
        assert sum(r.n for r in rs) == rs[0].row_n
        total_bp = sum(r.share_bp for r in rs)
        assert 10000 - len(rs) < total_bp <= 10000, f"{prev}: floor shares must sum just under 1"


def test_rbo_bounds_and_terms(spark, sf_dir):
    rows = REGISTRY["rbo_rank_agreement"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r.n_common <= 20
        # RBO in [0, 1): the dyadic weights sum to < 1e6 at depth 20.
        assert 0 <= r.rbo_fp < 1_000_000
        if r.n_common == 0:
            assert r.rbo_fp == 0
