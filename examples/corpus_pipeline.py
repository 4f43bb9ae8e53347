"""Quickstart: a pretraining-corpus preparation pass over the
``documents`` table — quality gate, exact + span-level dedup, near-dup
detection, then the train/val/test split — each stage one registered,
oracle-verified query (run any of them standalone via
``python -m flinkstreametl_spark run <name>``).

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    from pyspark.sql import functions as F

    from flinkstreametl_spark.plans import REGISTRY
    from flinkstreametl_spark.session import get_spark

    spark = get_spark("corpus-quickstart")

    gate = REGISTRY["gopher_quality_gate"].fn(spark, sf_dir)
    kept = gate.filter("keep").count()
    total = gate.count()
    print(f"quality gate: keep {kept}/{total} docs")

    spans = REGISTRY["span_dedup_keep_first"].fn(spark, sf_dir)
    agg = spans.agg(
        F.sum("n_tokens").alias("tokens"),
        F.sum("cleaned_tokens").alias("cleaned"),
    ).collect()[0]
    print(f"span dedup: {agg.tokens} tokens -> {agg.cleaned} after keep-first span removal")

    pairs = REGISTRY["minhash_lsh_neardup"].fn(spark, sf_dir)
    print(f"MinHash+LSH near-dup candidate pairs >= 0.6 jaccard: {pairs.count()}")

    split = REGISTRY["training_data_pipeline"].fn(spark, sf_dir)
    split.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs")).orderBy("split").show()

    # sizing reports (round 6): how the mixture and the context length
    # should be set for whatever survived the cleaning above
    print("temperature (alpha=0.5) mixture allocation per 1M training tokens:")
    REGISTRY["mixture_weights_by_lang"].fn(spark, sf_dir).orderBy("lang").show()
    print("context-length sizing (truncation loss vs padding waste):")
    REGISTRY["context_length_waste_curve"].fn(spark, sf_dir).orderBy("ctx_len").show()

    # split governance (round 6, wave 2): measure the leak the naive
    # doc-id split carries, then apply the cluster-safe law that makes
    # it zero by construction
    print("5-gram leakage of the doc-id hash split (held-out docs sharing a gram with train):")
    REGISTRY["split_leakage_audit"].fn(spark, sf_dir).orderBy("split").show()
    print("cluster-safe split (assignment hashed on the near-dup component; n_cross_pairs is recomputed, not assumed):")
    REGISTRY["cluster_safe_split"].fn(spark, sf_dir).orderBy("split").show()

    # tokenizer equity: tokens/word per language on the production merges
    print("tokenizer fertility by language (bp; 10000 = 1 token/word):")
    REGISTRY["tokenizer_fertility_by_lang"].fn(spark, sf_dir).orderBy("lang").show()

    # write-side sharding (round 6, wave 3): token-balanced output
    # shards via the two-phase global prefix sum — no global sort
    print("token-balanced shard audit (dev_bp = signed deviation from the ideal share):")
    REGISTRY["token_balanced_shards"].fn(spark, sf_dir).orderBy("shard").show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
