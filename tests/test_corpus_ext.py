"""Tests for the round-2 corpus-analysis operators (plans/corpus_ext.py):
SRP-LSH embedding near-dup, passage dedup, TF-IDF ranking. Oracle
parity for all four queries runs in test_oracle_parity.py; these tests
pin the semantic properties the hash can't express (plan shape, recall,
subset/precision relations).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY
from flinkstreametl_spark.plans.corpus_ext import _SRP_TAU, embedding_srp_pairs


def _bruteforce_pairs(spark, sf_dir, tau):
    """All pairs with exact fixed-point cosine >= tau (no blocking)."""
    from flinkstreametl_spark.operators.similarity import fp
    from flinkstreametl_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
    a, b = ex.alias("a"), ex.alias("b")
    prod = fp(F.col("a.val").cast("double") * F.col("b.val").cast("double"))
    qq = fp(F.col("a.val").cast("double") * F.col("a.val").cast("double"))
    cc = fp(F.col("b.val").cast("double") * F.col("b.val").cast("double"))
    pairs = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .groupBy(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .agg(F.sum(prod).alias("dot"), F.sum(qq).alias("qq"), F.sum(cc).alias("cc"))
    )
    cos = F.col("dot").cast("double") / F.sqrt(F.col("qq").cast("double") * F.col("cc").cast("double"))
    return {(r.vec_a, r.vec_b) for r in pairs.filter(cos >= tau).collect()}


def test_srp_pairs_subset_of_bruteforce_with_recall(spark, sf_dir):
    """Every SRP-emitted pair must pass the same exact-cosine cut the
    brute-force scan applies (precision 1 by construction), and banding
    must retain a nontrivial fraction of the true pairs."""
    srp = {(r.vec_a, r.vec_b) for r in embedding_srp_pairs(spark, sf_dir).collect()}
    brute = _bruteforce_pairs(spark, sf_dir, _SRP_TAU)
    assert srp <= brute
    assert brute, "fixture must contain pairs above tau for the test to bite"
    recall = len(srp) / len(brute)
    # theory for 4 bands x 4 bits at cos 0.3 predicts ~0.42; allow slack
    assert recall > 0.25, f"SRP recall collapsed: {recall:.3f}"


def test_srp_plan_has_no_cross_join(spark, sf_dir):
    """Candidate generation must be the banded equi-join, never a
    cartesian/nested-loop product over vectors."""
    plan = embedding_srp_pairs(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_srp_sketch_deterministic_across_runs(spark, sf_dir):
    """The md5-seeded hyperplanes make the sketch — and therefore the
    emitted pair set — identical run-to-run (no RNG state anywhere)."""
    a = {(r.vec_a, r.vec_b) for r in embedding_srp_pairs(spark, sf_dir).collect()}
    b = {(r.vec_a, r.vec_b) for r in embedding_srp_pairs(spark, sf_dir).collect()}
    assert a == b


def test_passage_dedup_flags_shared_passages(spark, sf_dir):
    """Documents sharing a 16-token window must show n_dup_windows > 0
    on both sides; a fully-unique doc must be clean. Build a crafted
    corpus where doc 1 and 2 share their first window verbatim."""
    shared = " ".join(f"tok{i}" for i in range(16))
    rows = [
        (1, shared + " tail one extra words here alpha beta gamma delta"),
        (2, shared + " completely different continuation of the text zz"),
        (3, " ".join(f"uniq{i}" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    import flinkstreametl_spark.plans.corpus_ext as C
    from flinkstreametl_spark.operators import text as X

    toks = X.tokens("text")
    n_win = F.floor((F.size(toks) + 15) / 16).cast("long")
    w = docs.select("doc_id", toks.alias("toks"), F.explode(F.sequence(F.lit(0), n_win - 1)).alias("wid"))
    wtext = F.array_join(F.slice(F.col("toks"), F.col("wid") * 16 + 1, 16), " ")
    h = w.select("doc_id", F.md5(wtext.cast("binary")).alias("wh"))
    d = h.groupBy("wh").agg(F.count_distinct("doc_id").alias("nd"))
    per_doc = {
        r.doc_id: r.n_dup
        for r in h.join(d, "wh")
        .groupBy("doc_id")
        .agg(F.count(F.when(F.col("nd") >= 2, 1)).alias("n_dup"))
        .collect()
    }
    assert per_doc[1] >= 1 and per_doc[2] >= 1 and per_doc[3] == 0
    assert C  # imported for parity with the registered query's helpers


def test_tfidf_ranks_rare_terms_above_common(spark, sf_dir):
    """A term present in every document (df = N) must never outrank a
    same-tf term that is rarer — the fixed-point score is monotone in
    1/df."""
    out = REGISTRY["tfidf_top_terms"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows and all(1 <= r.rk <= 5 for r in rows)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.rk)
        for hi, lo in zip(doc_rows, doc_rows[1:]):
            assert hi.score_fp >= lo.score_fp


def test_inverted_index_postings_sorted_and_consistent(spark, sf_dir):
    out = REGISTRY["inverted_index_terms"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        # postings is a comma-joined string (no array output columns in
        # driver-windowed queries); sorted numerically before stringify.
        postings = [int(p) for p in r.postings.split(",")]
        assert postings == sorted(postings)
        assert r.df == len(postings) == len(set(postings))
