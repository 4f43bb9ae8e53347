"""Independent python references for the round-6 pipeline planners
(mixture_weights_by_lang, context_length_waste_curve) — guarding
against a shared Spark+DuckDB misreading, the SURVEY §5.2(7) pattern."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from flinkstreametl_spark.plans import REGISTRY
from flinkstreametl_spark.sources.parquet import load_table


def _doc_token_counts(spark, sf_dir):
    """Per-doc (lang, n_tokens) via the engine's own tokenizer column —
    the reference reimplements only the AGGREGATION/weighting math."""
    from flinkstreametl_spark.operators import text as X

    return [
        (r.lang, r.n)
        for r in load_table(spark, sf_dir, "documents")
        .select("lang", F.size(X.tokens("text")).alias("n"))
        .collect()
    ]


def test_mixture_weights_python_reference(spark, sf_dir):
    per_lang: dict[str, list[int]] = defaultdict(list)
    for lang, n in _doc_token_counts(spark, sf_dir):
        per_lang[lang].append(n)
    weights = {
        lang: math.floor(math.sqrt(float(sum(ns))) * 1048576) for lang, ns in per_lang.items()
    }
    total = sum(weights.values())
    expected = {
        lang: (
            len(ns),
            sum(ns),
            weights[lang],
            weights[lang] / total,
            1000000 * weights[lang] // total,
        )
        for lang, ns in per_lang.items()
    }
    got = {
        r.lang: (r.n_docs, r.n_tokens, r.weight_fp, r.share, r.budget_tokens_per_m)
        for r in REGISTRY["mixture_weights_by_lang"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # shares are a probability vector; budgets never exceed the 1M pool
    assert abs(sum(v[3] for v in got.values()) - 1.0) < 1e-12
    assert sum(v[4] for v in got.values()) <= 1_000_000


def test_context_length_waste_python_reference(spark, sf_dir):
    ns = [n for _, n in _doc_token_counts(spark, sf_dir)]
    expected = {}
    for L in (128, 256, 512, 1024):
        kept = sum(min(n, L) for n in ns)
        expected[L] = (
            len(ns),
            sum(1 for n in ns if n <= L),
            kept,
            sum(max(n - L, 0) for n in ns),
            sum(L - min(n, L) for n in ns),
            10000 * kept // (len(ns) * L),
        )
    got = {
        r.ctx_len: (
            r.n_docs,
            r.n_docs_fit,
            r.tokens_kept,
            r.tokens_truncated,
            r.pad_waste,
            r.utilization_bp,
        )
        for r in REGISTRY["context_length_waste_curve"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # identities: kept + truncated = total tokens; kept + pad = docs*L
    total_tokens = sum(ns)
    for L, (n_docs, _fit, kept, trunc, pad, _u) in got.items():
        assert kept + trunc == total_tokens
        assert kept + pad == n_docs * L


def test_token_balanced_shards_python_reference_and_balance_law(spark, sf_dir):
    """token_balanced_shards vs an independent single-machine reference
    (sort every doc by (bucket, hkey, doc_id), one running total, shard
    = contiguous token range) — exact per-shard equality proves the
    two-phase prefix-sum decomposition — plus the BALANCE LAW the
    operator exists for: every shard's token total deviates from the
    ideal share by less than the largest single document (contiguous
    ranges can only misalign at their two boundaries)."""
    import hashlib

    from flinkstreametl_spark.operators import text as X

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(X.tokens("text")).cast("long").alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    )
    sized = []
    for r in docs:
        hkey = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        sized.append((hkey % 64, hkey, r.doc_id, r.n))
    sized.sort()
    total = sum(n for *_, n in sized)
    expect: dict[int, list[int]] = {}
    cum = 0
    for *_, n in sized:
        shard = (16 * cum) // total
        d, t = expect.setdefault(shard, [0, 0])
        expect[shard] = [d + 1, t + n]
        cum += n
    got = {
        r.shard: [r.n_docs, r.shard_tokens]
        for r in REGISTRY["token_balanced_shards"].fn(spark, sf_dir).collect()
    }
    assert got == expect

    max_doc = max(n for *_, n in sized)
    ideal = total / 16
    for _, tokens in got.values():
        assert abs(tokens - ideal) < max_doc + 1, (tokens, ideal, max_doc)
