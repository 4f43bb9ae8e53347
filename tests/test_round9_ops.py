"""Round-9-queue operator invariants (the laws oracle parity can't
state): bloom filters never false-negative, the decomposition identity
reassembles the series, RRF recomputes from its ranks, link-prediction
candidates are genuinely non-adjacent, Gini hits its boundary cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY


def test_linkpred_candidates_are_nonadjacent_panel_pairs(spark, sf_dir):
    rows = REGISTRY["linkpred_copurchase_scores"].fn(spark, sf_dir).collect()
    assert rows and [r.rk for r in rows] == list(range(1, len(rows) + 1))

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = {
        (r.u, r.v)
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .collect()
    }
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    panel = set(nodes[:100])
    for r in rows:
        assert r.u in panel, "source side must come from the fixed panel"
        assert (min(r.u, r.v), max(r.u, r.v)) not in edges, "candidate must be a NON-edge"
        assert 1 <= r.cn <= min(r.deg_u, r.deg_v)
        assert 0 < r.jaccard_fp <= 1_000_000
        assert r.ra_fp > 0
    # ranking is by RA descending
    ras = [r.ra_fp for r in rows]
    assert ras == sorted(ras, reverse=True)


def test_seasonal_decomposition_identity(spark, sf_dir):
    rows = REGISTRY["seasonal_decompose_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # additive identity: the three components reassemble the series
        assert r.s_fp == r.trend_fp + r.seasonal_fp + r.remainder_fp
        assert r.dow == (r.day + 4) % 7
    # every weekday occurs for every event_type that survived edge-trim
    by_et = {}
    for r in rows:
        by_et.setdefault(r.event_type, set()).add(r.dow)
    for et, dows in by_et.items():
        assert dows == set(range(7)), f"{et} missing weekdays {set(range(7)) - dows}"
    # the seasonal component is the per-(event_type, dow) MEAN of the
    # detrended series: constant across that dow's days and exactly
    # sum(detrended) div count recomputed from the output itself
    cell = {}
    for r in rows:
        key = (r.event_type, r.dow)
        det = r.s_fp - r.trend_fp
        s, n, vals = cell.get(key, (0, 0, set()))
        cell[key] = (s + det, n + 1, vals | {r.seasonal_fp})
    for key, (s, n, vals) in cell.items():
        assert len(vals) == 1, f"{key}: seasonal must be constant per dow"
        # integer div truncates toward zero in both engines
        expect = abs(s) // n if s >= 0 else -(abs(s) // n)
        assert vals == {expect}, f"{key}: seasonal {vals} != {expect}"


def test_dsir_scores_rank_target_like_docs(spark, sf_dir):
    out = REGISTRY["dsir_importance_topk"].fn(spark, sf_dir)
    rows = out.collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw_ids = {r.doc_id for r in docs.filter(F.col("source") != "src0").collect()}
    for r in rows:
        assert r.doc_id in raw_ids, "only raw (non-target) docs are scored"
        assert r.n_grams >= 1
        assert r.avg_ratio_fp > 0
    scores = [r.avg_ratio_fp for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_rrf_recomputes_from_ranks(spark, sf_dir):
    rows = REGISTRY["hybrid_rrf_retrieval"].fn(spark, sf_dir).collect()
    assert rows
    fp, c = 1_000_000, 60
    seen_self = set()
    for r in rows:
        expect = (fp // (c + r.bm25_rk) if r.bm25_rk else 0) + (
            fp // (c + r.dense_rk) if r.dense_rk else 0
        )
        assert r.rrf_fp == expect
        assert r.rrf_fp > 0
        assert 1 <= r.rk <= 10
        if r.query_id == r.doc_id:
            seen_self.add(r.query_id)
    # each query doc retrieves itself (cosine self-sim = 1 -> dense rank 1)
    assert seen_self == {r.query_id for r in rows}


def test_bloom_filter_has_no_false_negatives(spark, sf_dir):
    (r,) = REGISTRY["bloom_prune_fpr_audit"].fn(spark, sf_dir).collect()
    # THE bloom property: every true member passes the filter
    assert r.n_bloom_pass >= r.n_member
    assert r.n_false_pos == r.n_bloom_pass - r.n_member
    assert 0 <= r.fpr_fp <= 1_000_000
    assert 0 < r.n_bits_set <= 8192
    assert r.n_member < r.n_probe


def test_token_gini_boundaries(spark, sf_dir):
    rows = REGISTRY["token_gini_diversity"].fn(spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert len(rows) == len(docs)
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert 0 <= r.gini_fp < 1_000_000
        assert 1 <= r.n_distinct <= r.n_tokens
        if r.n_distinct == 1:
            assert r.gini_fp == 0
    # exact cross-check of one document against pure python
    doc_id, text = sorted(docs.items())[0]
    toks = text.strip().lower().split()
    from collections import Counter

    cnt = Counter(toks)
    n = sum(cnt.values())
    expect = 1_000_000 - sum(v * v for v in cnt.values()) * 1_000_000 // (n * n)
    got = by_id[doc_id]
    assert (got.n_tokens, got.n_distinct, got.gini_fp) == (n, len(cnt), expect)


def test_mutual_knn_pairs_are_reciprocal_and_blocked(spark, sf_dir):
    rows = REGISTRY["mutual_knn_pairs"].fn(spark, sf_dir).collect()
    assert rows
    emb = {r.vec_id: r.label for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()}
    seen = set()
    for r in rows:
        assert r.vec_a < r.vec_b, "canonical orientation"
        assert (r.vec_a, r.vec_b) not in seen
        seen.add((r.vec_a, r.vec_b))
        assert emb[r.vec_a] == emb[r.vec_b] == r.label, "pairs stay inside the label block"
        assert 1 <= r.rk_ab <= 3 and 1 <= r.rk_ba <= 3
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_centroid_drift_counts_and_bounds(spark, sf_dir):
    rows = REGISTRY["embedding_centroid_drift"].fn(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    from collections import Counter

    n_all = Counter(r.label for r in emb)
    n_arr = Counter(r.label for r in emb if r.vec_id % 5 == 0)
    assert {r.label for r in rows} == set(n_all)
    for r in rows:
        assert r.n_base == n_all[r.label] - n_arr[r.label]
        assert r.n_arrivals == n_arr[r.label]
        assert -1.0 - 1e-9 <= r.drift_cosine <= 1.0 + 1e-9
        # arrivals are a 20% same-distribution slice: centroids stay close
        assert r.drift_cosine > 0.5


def test_quality_calibration_reconciles_with_the_gate(spark, sf_dir):
    rows = REGISTRY["quality_calibration_audit"].fn(spark, sf_dir).collect()
    gate = REGISTRY["gopher_quality_gate"].fn(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == len(gate)
    assert sum(r.n_keep for r in rows) == sum(1 for g in gate if g.keep)
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0 <= r.n_keep <= r.n_docs
        assert r.keep_rate_fp == r.n_keep * 1_000_000 // r.n_docs
        assert r.min_gini_fp <= r.max_gini_fp
        if r.bucket < 9:
            assert r.max_gini_fp < (r.bucket + 1) * 100_000


def test_kcore_trajectory_monotone_and_converged(spark, sf_dir):
    rows = sorted(
        REGISTRY["kcore_peeling_profile"].fn(spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert [r.round for r in rows] == list(range(9))
    nodes = [r.n_nodes for r in rows]
    edges = [r.n_edges for r in rows]
    assert nodes == sorted(nodes, reverse=True) and edges == sorted(edges, reverse=True)
    # the fixed unroll must reach the fixpoint (else 8 rounds is too few)
    assert (nodes[-1], edges[-1]) == (nodes[-2], edges[-2])
    # a 3-core has min degree 3: |E| >= 3|V|/2 whenever non-empty
    if nodes[-1]:
        assert 2 * edges[-1] >= 3 * nodes[-1]


def test_dense_decontamination_panel_and_confirm(spark, sf_dir):
    rows = REGISTRY["decontaminate_by_embedding"].fn(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    src = {r.doc_id: r.source for r in docs}
    probe_ids = sorted(d.doc_id for d in docs if d.source == "src0")[:100]
    by_q = {}
    for r in rows:
        assert src[r.query_id] == "src0" and r.query_id in probe_ids
        assert src[r.doc_id] != "src0", "retrieval must stay on the training side"
        assert 1 <= r.rk <= 5
        assert r.n_shared_trigrams >= 0
        by_q.setdefault(r.query_id, []).append(r)
    for q, lst in by_q.items():
        assert len(lst) == 5
        cos = [r.cosine for r in sorted(lst, key=lambda r: r.rk)]
        assert cos == sorted(cos, reverse=True)


def test_kfold_audit_partitions_and_reconciles(spark, sf_dir):
    rows = REGISTRY["stratified_kfold_audit"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs, "folds partition the corpus"
    assert {r.fold for r in rows} == set(range(5))
    for r in rows:
        assert r.skew_bp == r.fold_share_bp - r.global_share_bp
        assert 0 <= r.fold_share_bp <= 10_000 and 0 <= r.global_share_bp <= 10_000


def test_theil_sen_selects_an_actual_pair_slope(spark, sf_dir):
    rows = REGISTRY["theil_sen_trend_daily"].fn(spark, sf_dir).collect()
    assert rows
    from flinkstreametl_spark.plans.timeseries_ext import _daily

    daily = {}
    for d in _daily(spark, sf_dir).collect():
        daily.setdefault(d.event_type, []).append((d.day, d.s_fp))
    for r in rows:
        series = sorted(daily[r.event_type])
        n = len(series)
        assert r.n_slopes == n * (n - 1) // 2
        slopes = sorted(
            ((b[1] - a[1], b[0] - a[0]) for i, a in enumerate(series) for b in series[i + 1 :]),
            key=lambda p: (p[0] / p[1], p[0], p[1]),
        )
        dy, dx = slopes[(r.n_slopes + 1) // 2 - 1]
        assert (r.med_dy, r.med_dx) == (dy, dx)
        q = abs(dy) * 1_000_000 // dx
        assert r.slope_fp == (q if dy >= 0 else -q)


def test_skew_report_matches_bruteforce(spark, sf_dir):
    rows = REGISTRY["join_key_skew_report"].fn(spark, sf_dir).collect()
    from collections import Counter

    counts = Counter(
        r.o_custkey for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    )
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.key, r.n_rows) for r in rows] == expect
    for r in rows:
        assert r.n_keys == len(counts)
        assert r.total_rows == sum(counts.values())
        assert r.skew_ratio_fp == r.n_rows * r.n_keys * 1_000_000 // r.total_rows


def test_rolling_median_matches_python(spark, sf_dir):
    rows = REGISTRY["rolling_median_7d"].fn(spark, sf_dir).collect()
    assert rows
    from flinkstreametl_spark.plans.timeseries_ext import _daily

    daily = {}
    for d in _daily(spark, sf_dir).collect():
        daily.setdefault(d.event_type, []).append((d.day, d.s_fp))
    expect = {}
    for et, series in daily.items():
        series.sort()
        for i in range(3, len(series) - 3):
            win = series[i - 3 : i + 4]
            if win[-1][0] - win[0][0] == 6:
                expect[(et, series[i][0])] = sorted(v for _, v in win)[3]
    got = {(r.event_type, r.day): r.med7_fp for r in rows}
    assert got == expect


def test_source_matrix_reconciles_with_pair_stream(spark, sf_dir):
    rows = REGISTRY["neardup_source_matrix"].fn(spark, sf_dir).collect()
    n_pairs = REGISTRY["minhash_lsh_neardup"].fn(spark, sf_dir).count()
    assert sum(r.n_pairs for r in rows) == n_pairs, "every pair lands in exactly one cell"
    for r in rows:
        assert r.source_a <= r.source_b, "canonical cell orientation"
        assert 0 <= r.n_within <= r.n_pairs
        if r.source_a != r.source_b:
            assert r.n_within == 0
        else:
            assert r.n_within == r.n_pairs


def test_sq8_reconstruction_is_tight(spark, sf_dir):
    rows = REGISTRY["sq8_reconstruction_error"].fn(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n
    for r in rows:
        # 8 bits per dim: reconstruction stays within a few percent
        assert 0.95 < r.recon_cosine <= 1.0 + 1e-9
        assert r.cc_q > 0 and r.qq > 0


def test_dedup_funnel_monotone_and_reconciles(spark, sf_dir):
    rows = REGISTRY["dedup_funnel_by_source"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter

    raw = Counter(r.source for r in docs.select("source").collect())
    assert {r.source for r in rows} == set(raw)
    for r in rows:
        assert r.n_raw == raw[r.source]
        # each stage only removes
        assert r.n_raw >= r.n_gated >= r.n_exact >= r.n_final >= 0
        assert r.survival_bp == r.n_final * 10_000 // r.n_raw


def test_nucleus_sample_laws(spark, sf_dir):
    rows = REGISTRY["nucleus_sample_per_source"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_kept <= r.n_docs
        assert 0 < r.tokens_kept <= r.tokens_total
        # the nucleus reaches p: kept mass >= ceil(0.7 T) (crossing doc included)
        thr = (7 * r.tokens_total + 9) // 10
        assert r.tokens_kept >= thr
        assert r.kept_share_bp == r.tokens_kept * 10_000 // r.tokens_total
        # p = 0.7 of tokens: the nucleus is smaller than the source
        # unless the source is tiny
        if r.n_docs >= 10:
            assert r.n_kept < r.n_docs


def test_trigram_novelty_first_batch_all_new(spark, sf_dir):
    rows = sorted(
        REGISTRY["trigram_novelty_curve"].fn(spark, sf_dir).collect(), key=lambda r: r.batch
    )
    assert [r.batch for r in rows] == list(range(10))
    assert rows[0].novelty_bp == 10_000, "batch 0 is 100% new by construction"
    total_new = sum(r.n_new_grams for r in rows)
    # every gram is new exactly once: sum of new == corpus distinct grams
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n_docs = len(docs)
    grams = set()
    for d in docs:
        toks = d.text.strip().lower().split()
        grams |= {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert total_new == len(grams)
    for r in rows:
        assert 0 <= r.n_new_grams <= r.n_distinct_grams
        assert r.novelty_bp == r.n_new_grams * 10_000 // r.n_distinct_grams


def test_label_disagreement_flags_are_consistent(spark, sf_dir):
    rows = REGISTRY["knn_label_disagreement"].fn(spark, sf_dir).collect()
    assert len(rows) == 50
    labels = {r.vec_id: r.label for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()}
    for r in rows:
        assert r.label == labels[r.anchor_id]
        assert 0 <= r.n_disagree <= 5
        if r.flagged:
            assert r.majority_label != r.label and r.n_disagree >= 3
        if r.n_disagree == 0:
            assert r.majority_label == r.label and not r.flagged
    # the fixture's labels do NOT track cosine geometry (the ivf
    # audits measured label-block recall at 0.08 vs 0.94 for learned
    # clusters) — so the audit should flag most anchors here; this is
    # the audit WORKING, and exactly what it would report about a
    # mislabeled corpus
    assert sum(1 for r in rows if r.flagged) > 25


def test_multitouch_credit_conserves_purchase_value(spark, sf_dir):
    rows = REGISTRY["multitouch_attribution_daily"].fn(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    import datetime as _dt

    def us(ts):
        return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)

    import math

    clicks = sorted(
        (us(e.ts), e.event_id, e.user_id) for e in ev if e.event_type == "click"
    )
    by_user = {}
    for cus, cid, u in clicks:
        by_user.setdefault(u, []).append((cus, cid))
    attributed_total = 0
    for e in ev:
        if e.event_type != "purchase":
            continue
        pus = us(e.ts)
        v = math.floor(e.value * 1_000_000)
        touches = [
            (cus, cid)
            for cus, cid in by_user.get(e.user_id, [])
            if pus - 30 * 60 * 1_000_000 <= cus < pus
        ]
        if touches:
            attributed_total += v
    assert sum(r.value_fp_received for r in rows) == attributed_total, (
        "credit must conserve attributed purchase value to the unit"
    )
    for r in rows:
        assert r.n_clicks <= r.n_touches


def test_twap_bounded_by_day_extremes(spark, sf_dir):
    rows = REGISTRY["time_weighted_avg_daily"].fn(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    import datetime as _dt
    import math

    vals = {}
    for e in ev:
        us = int(e.ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
        day = us // 86_400_000_000
        vals.setdefault((e.event_type, day), []).append(
            (us, math.floor(e.value * 1_000))
        )
    for r in rows:
        series = sorted(vals[(r.event_type, r.day)])
        assert r.n_events == len(series)
        day_end = (r.day + 1) * 86_400_000_000
        assert r.covered_us == day_end - series[0][0]
        v3s = [v for _, v in series]
        assert min(v3s) - 1 <= r.twap_fp3 <= max(v3s)


def test_band_sweep_r2_matches_single_config_audit(spark, sf_dir):
    sweep = {r.rows_per_band: r for r in REGISTRY["lsh_band_sweep_audit"].fn(spark, sf_dir).collect()}
    assert set(sweep) == {1, 2, 4, 8}
    (single,) = REGISTRY["lsh_precision_recall_audit"].fn(spark, sf_dir).collect()
    r2 = sweep[2]
    # the production config's sweep row IS the standing audit's row
    assert (r2.n_truth, r2.n_cand, r2.n_hit) == (single.n_truth, single.n_cand, single.n_hit)
    assert (r2.precision_bp, r2.recall_bp) == (single.precision_bp, single.recall_bp)
    for r in sweep.values():
        assert r.n_hit <= min(r.n_cand, r.n_truth)
        assert r.precision_bp == 10_000 * r.n_hit // max(r.n_cand, 1)
        assert r.recall_bp == 10_000 * r.n_hit // max(r.n_truth, 1)
    # NOTE candidate counts are NOT monotone in r here: banding nests
    # (an r=4 match implies both constituent r=2 matches), but the
    # hot-bucket cap breaks the nest — r=4's two mega-buckets on this
    # near-dup-heavy fixture blow past MAX_BUCKET_SIZE and drop, while
    # r=8's stricter single band stays under it (measured: 1,028 vs
    # 3,147 candidates). That interaction is exactly what the sweep
    # exists to expose before a production (b, r) pick.


def test_langid_confusion_reconciles_with_heuristic(spark, sf_dir):
    rows = REGISTRY["langid_confusion_matrix"].fn(spark, sf_dir).collect()
    pred = REGISTRY["langid_heuristic"].fn(spark, sf_dir).collect()
    from collections import Counter

    expect = Counter((p.labeled_lang, p.predicted_lang) for p in pred)
    got = {(r.labeled_lang, r.predicted_lang): r.n_docs for r in rows}
    assert got == dict(expect), "matrix must be the exact pair census"
    row_tot = Counter(p.labeled_lang for p in pred)
    for r in rows:
        assert r.row_total == row_tot[r.labeled_lang]
        assert r.row_share_bp == r.n_docs * 10_000 // r.row_total
        assert r.is_correct == (r.labeled_lang == r.predicted_lang)
    # every labeled language appears as a row
    assert {r.labeled_lang for r in rows} == set(row_tot)


def test_reconciliation_covers_every_matched_order(spark, sf_dir):
    rows = REGISTRY["orders_reconciliation_audit"].fn(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_matched = (
        orders.join(li.select("l_orderkey").distinct(), orders.o_orderkey == li.l_orderkey)
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_matched, "every joined order lands in one bucket"
    order = {"exact": 0, "<=0.1%": 1, "<=1%": 2, "<=10%": 3, ">10%": 4}
    seen = sorted(rows, key=lambda r: order[r.bucket])
    for r in seen:
        assert r.min_rel_bp <= r.max_rel_bp
    # buckets are disjoint ranges: maxima strictly below the next minimum
    for a, b in zip(seen, seen[1:]):
        assert a.max_rel_bp < b.min_rel_bp


def test_simhash_histogram_is_a_pair_census(spark, sf_dir):
    rows = REGISTRY["simhash_hamming_histogram"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # universe size: pairs with 1 <= doc_b - doc_a <= 25 over dense ids
    expect_pairs = sum(min(25, n_docs - 1 - i) for i in range(n_docs))
    assert sum(r.n_pairs for r in rows) == expect_pairs
    for r in rows:
        assert 0 <= r.hamming <= 16
        assert r.n_pairs > 0
    # the near-dup fixture guarantees some distance<=2 mass AND a body
    # of unrelated pairs farther out — the bimodal gap the pigeonhole
    # search needs
    close = sum(r.n_pairs for r in rows if r.hamming <= 2)
    far = sum(r.n_pairs for r in rows if r.hamming >= 6)
    assert close > 0 and far > 0


def test_label_separation_counts_and_margin(spark, sf_dir):
    rows = REGISTRY["label_separation_audit"].fn(spark, sf_dir).collect()
    from collections import Counter

    labels = Counter(
        r.label for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    )
    assert {r.label for r in rows} == set(labels)
    for r in rows:
        assert r.n_members == labels[r.label]
        assert -1_000_001 <= r.mean_own_fp <= 1_000_000
        assert -1_000_001 <= r.mean_best_other_fp <= 1_000_000
        # margin is the mean of (own - other): within integer-div slack
        # of the difference of the two means
        assert abs(r.mean_margin_fp - (r.mean_own_fp - r.mean_best_other_fp)) <= 2
        assert 0 <= r.n_separated <= r.n_members
    # the fixture's labels don't track cosine geometry — the audit must
    # report weak-to-negative margins (best-of-9-others selection bias
    # pushes the other side up; measured ~-0.02..-0.07), never a strong
    # positive separation it would take real label structure to earn
    assert all(-200_000 < r.mean_margin_fp < 50_000 for r in rows)
    assert all(r.n_separated < r.n_members for r in rows)


def test_error_burn_rate_identities(spark, sf_dir):
    rows = REGISTRY["error_burn_rate_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_errors <= r.n_events
        assert r.error_bp == r.n_errors * 10_000 // r.n_events
        assert 0 <= r.error_bp <= 10_000
        # burn ratio ~ error_bp / error_bp_7d (cross-multiplied exact form)
        if r.error_bp_7d > 0 and r.error_bp > 0:
            approx = r.error_bp * 1_000_000 / r.error_bp_7d
            assert abs(r.burn_ratio_fp - approx) < 0.01 * approx + 2_000
    days = [r.day for r in rows]
    assert days == sorted(days)


def test_value_ks_drift_bounds(spark, sf_dir):
    (r,) = REGISTRY["value_ks_drift"].fn(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert r.n_first + r.n_second == n
    assert abs(r.n_first - r.n_second) <= 1
    assert 0 <= r.ks_bp <= 10_000
    assert 0 <= r.argmax_bin <= 19
    # stationary fixture: the halves share one distribution
    assert r.ks_bp < 1_000


def test_cluster_size_histogram_is_a_partition(spark, sf_dir):
    rows = REGISTRY["neardup_cluster_size_histogram"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs, "clusters partition the corpus"
    assign = REGISTRY["neardup_cluster_assign"].fn(spark, sf_dir).collect()
    from collections import Counter

    sizes = Counter(Counter(a.cluster_id for a in assign).values())
    assert {r.cluster_size: r.n_clusters for r in rows} == dict(sizes)
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_prf_expansion_changes_and_anchors_retrieval(spark, sf_dir):
    prf = REGISTRY["prf_expanded_retrieval"].fn(spark, sf_dir).collect()
    base = REGISTRY["bm25_topk_docs"].fn(spark, sf_dir).collect()
    by_q_prf = {}
    for r in prf:
        assert 1 <= r.rk <= 10 and r.score_fp > 0
        by_q_prf.setdefault(r.query_id, set()).add(r.doc_id)
    by_q_base = {}
    for r in base:
        by_q_base.setdefault(r.query_id, set()).add(r.doc_id)
    assert set(by_q_prf) == set(by_q_base)
    for q in by_q_prf:
        assert len(by_q_prf[q]) == 10
        # expansion keeps the query anchored: substantial overlap with
        # the unexpanded top-10, but the expanded terms may legitimately
        # reorder/replace the tail
        assert len(by_q_prf[q] & by_q_base[q]) >= 5


def test_gap_sensitivity_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["session_gap_sensitivity"].fn(spark, sf_dir).collect(), key=lambda r: r.gap_us
    )
    assert [r.gap_us for r in rows] == [600_000_000, 1_800_000_000, 3_600_000_000]
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    )
    # longer gap -> fewer (or equal) sessions, never below one per user
    sessions = [r.n_sessions for r in rows]
    assert sessions == sorted(sessions, reverse=True)
    for r in rows:
        assert r.n_sessions >= n_users
        assert r.mean_events_per_session_milli == r.n_events * 1000 // r.n_sessions


def test_semantic_histogram_reconciles_with_dedup_pairs(spark, sf_dir):
    rows = REGISTRY["semantic_cosine_histogram"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -20 <= r.bucket <= 19 and r.n_pairs > 0
    # mass at cosine >= 0.3 must equal the production θ=0.3 pair count
    # (bucket floor(cos*20) >= 6 <=> cos >= 0.3)
    above = sum(r.n_pairs for r in rows if r.bucket >= 6)
    n_dedup = REGISTRY["semantic_dedup_pairs"].fn(spark, sf_dir).count()
    assert above == n_dedup


def test_embedding_dim_stats_match_numpy(spark, sf_dir):
    rows = sorted(
        REGISTRY["embedding_dim_stats"].fn(spark, sf_dir).collect(), key=lambda r: r.pos
    )
    import math

    import numpy as np

    embs = np.array(
        [r.embedding for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()],
        dtype=np.float64,
    )
    assert len(rows) == embs.shape[1]
    for r in rows:
        col = embs[:, r.pos - 1]
        x = np.array([math.floor(v * 1_000_000) for v in col], dtype=object)
        n = len(x)
        assert r.n == n
        s1, s2 = int(sum(x)), int(sum(v * v for v in x))
        assert r.mean_fp == (abs(s1) // n if s1 >= 0 else -(abs(s1) // n))
        assert r.var_fp2 == (n * s2 - s1 * s1) // (n * n)
        assert r.min_fp == min(x) and r.max_fp == max(x)
        assert r.is_dead == (r.var_fp2 < 1_000_000)
    # a healthy random-ish embedding space has no dead dims
    assert not any(r.is_dead for r in rows)


def test_source_vocab_overlap_census(spark, sf_dir):
    rows = REGISTRY["source_vocab_overlap"].fn(spark, sf_dir).collect()
    n_sources = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("source").distinct().count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2, "every unordered pair once"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_common <= min(r.n_toks_a, r.n_toks_b)
        union = r.n_toks_a + r.n_toks_b - r.n_common
        assert r.jaccard_bp == r.n_common * 10_000 // union
        assert 0 < r.jaccard_bp <= 10_000


def test_revenue_concentration_laws(spark, sf_dir):
    rows = sorted(
        REGISTRY["revenue_topk_concentration"].fn(spark, sf_dir).collect(), key=lambda r: r.rk
    )
    assert [r.rk for r in rows] == list(range(1, 11))
    revs = [r.rev_u for r in rows]
    assert revs == sorted(revs, reverse=True)
    for r in rows:
        assert 0 <= r.share_bp <= 10_000
        assert r.cum_share_bp >= r.share_bp
    shares = [r.cum_share_bp for r in rows]
    assert shares == sorted(shares), "cumulative share is non-decreasing"
    assert shares[-1] <= 10_000


def test_mad_anomaly_days_match_python(spark, sf_dir):
    rows = REGISTRY["mad_anomaly_days"].fn(spark, sf_dir).collect()
    from flinkstreametl_spark.plans.timeseries_ext import _daily

    series = {}
    for d in _daily(spark, sf_dir).collect():
        series.setdefault(d.event_type, []).append((d.day, d.s_fp))
    import math

    expect = set()
    for et, pts in series.items():
        vals = sorted(v for _, v in pts)
        n = len(vals)
        med = sorted((v, day) for day, v in pts)[math.ceil(0.5 * n) - 1][0]
        devs = sorted(abs(v - med) for _, v in pts)
        mad = devs[math.ceil(0.5 * n) - 1]
        for day, v in pts:
            if abs(v - med) > 3 * mad:
                expect.add((et, day))
    assert {(r.event_type, r.day) for r in rows} == expect
    for r in rows:
        assert r.abs_dev_fp == abs(r.s_fp - r.med_fp)
        assert r.abs_dev_fp > 3 * r.mad_fp


def test_weighted_pagerank_differs_from_unweighted_but_conserves(spark, sf_dir):
    wrows = REGISTRY["pagerank_weighted_copurchase"].fn(spark, sf_dir).collect()
    urows = REGISTRY["pagerank_copurchase"].fn(spark, sf_dir).collect()
    assert len(wrows) == len(urows) == 20
    assert [r.rk for r in sorted(wrows, key=lambda r: r.rk)] == list(range(1, 21))
    for r in wrows:
        assert r.rank_fp > 0
    # weights change the ranking (the fixture's shared-order counts are
    # non-uniform): the two top-20 lists must not be identical in order
    worder = [r.part for r in sorted(wrows, key=lambda r: r.rk)]
    uorder = [r.part for r in sorted(urows, key=lambda r: r.rk)]
    assert worder != uorder, "weighted ranking should differ from unweighted"


def test_forecast_features_match_series(spark, sf_dir):
    rows = REGISTRY["forecast_feature_table"].fn(spark, sf_dir).collect()
    assert rows
    from flinkstreametl_spark.plans.timeseries_ext import _daily

    series = {}
    for d in _daily(spark, sf_dir).collect():
        series.setdefault(d.event_type, {})[d.day] = d.s_fp
    for r in rows:
        s = series[r.event_type]
        assert r.lag1_fp == s[r.day - 1]
        assert r.lag7_fp == s[r.day - 7]
        tr = sum(s[r.day - k] for k in range(1, 8))
        assert r.trail7_mean_fp == (abs(tr) // 7 if tr >= 0 else -(abs(tr) // 7))
        assert r.dow == (r.day + 4) % 7
