"""BM25 retrieval + retrieval-composed decontamination
(plans/retrieval_ext.py): semantic invariants beyond the generic
oracle-parity gate (tests/test_oracle_parity.py covers exactness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY
from flinkstreametl_spark.plans.retrieval_ext import _BM25_NQ, _RET_K


def test_bm25_self_retrieval_and_ranking_laws(spark, sf_dir):
    rows = REGISTRY["bm25_topk_docs"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(_BM25_NQ))
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        # ranks are 1..k dense, scores non-increasing, all positive
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_fp for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)
        # the query doc itself lands in the top ranks (fixtures plant
        # near-duplicates that may legitimately outrank it when shorter;
        # measured self-rank <= 3 across the sf tiers)
        self_rk = [r.rk for r in rs if r.doc_id == qid]
        assert self_rk and self_rk[0] <= 5, (qid, self_rk)


def test_decontaminate_by_retrieval_shape(spark, sf_dir):
    df = REGISTRY["decontaminate_by_retrieval"].fn(spark, sf_dir)
    rows = df.collect()
    n_probes = df.select("query_id").distinct().count()
    assert len(rows) == n_probes * _RET_K
    # retrieval never returns a probe document: the corpus excludes src0
    probe_ids = {r.query_id for r in rows}
    assert not probe_ids & {r.doc_id for r in rows}
    assert all(r.n_shared_trigrams >= 0 for r in rows)
    # the confirm stage separates signals: at least one retrieved pair
    # shares a trigram with its probe (the fixtures' planted overlaps)
    assert any(r.n_shared_trigrams > 0 for r in rows)


def test_bm25_score_matches_reference_formula(spark, sf_dir):
    """Pin the fixed-point spec against a direct Python recomputation
    for one (query, doc) pair, so the formula can't silently drift."""
    from flinkstreametl_spark.sources.parquet import load_table

    toks = {
        r.doc_id: r.text.lower().strip().split()
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    N = len(toks)
    S = sum(len(ts) for ts in toks.values())
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    FP = 1_000_000

    def score(qid, did):
        ts = toks[did]
        dl = len(ts)
        tfc = {}
        for t in ts:
            tfc[t] = tfc.get(t, 0) + 1
        total = 0
        for t in set(toks[qid]):
            if t not in tfc:
                continue
            idf = ((2 * N - 2 * df[t] + 1) * FP) // (2 * df[t] + 1)
            tf_fp = (22 * tfc[t] * S * FP) // (10 * tfc[t] * S + 3 * S + 9 * dl * N)
            total += idf * tf_fp // FP
        return total

    got = {
        (r.query_id, r.doc_id): r.score_fp
        for r in REGISTRY["bm25_topk_docs"].fn(spark, sf_dir).collect()
    }
    for (qid, did), s in got.items():
        assert s == score(qid, did), (qid, did, s, score(qid, did))
