"""Incremental LSH near-dup maintenance (operators/dedup.py
incremental_lsh_pairs): batching the corpus through the incremental
path must reproduce the full batch recompute — same pairs, discovered
as each batch arrives, with per-batch work proportional to the batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.operators.dedup import (
    incremental_lsh_pairs,
    lsh_band_keys,
    minhash_lsh_pairs,
)
from flinkstreametl_spark.sources.parquet import load_table


def _pairs_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_incremental_stream_equals_batch_recompute(spark, sf_dir):
    """Split documents into 3 arrival batches; union of incremental
    new-pairs across batches == the one-shot batch pairs (cap disabled
    so both paths see identical buckets regardless of arrival order)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    batches = [
        docs.filter(F.col("doc_id") % 3 == i).localCheckpoint() for i in range(3)
    ]

    expected = _pairs_set(minhash_lsh_pairs(docs, max_bucket_size=None))

    seen_docs = None
    bands = lsh_band_keys(docs.limit(0))  # empty index, right schema
    got = set()
    for b in batches:
        seen_docs = b if seen_docs is None else seen_docs.unionByName(b)
        new_pairs, bands = incremental_lsh_pairs(
            bands, b, seen_docs, max_bucket_size=None
        )
        bands = bands.localCheckpoint()
        got |= _pairs_set(new_pairs)

    assert got == expected and len(expected) > 0


def test_incremental_new_batch_only_pairs_touching_new_docs(spark, sf_dir):
    """Each batch's emitted pairs must involve >=1 new document — the
    old-old work is never redone."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    first = docs.filter(F.col("doc_id") < 100).localCheckpoint()
    second = docs.filter(F.col("doc_id") >= 100).localCheckpoint()

    bands0 = lsh_band_keys(docs.limit(0))
    _, bands1 = incremental_lsh_pairs(bands0, first, first, max_bucket_size=None)
    new_pairs, _ = incremental_lsh_pairs(
        bands1.localCheckpoint(), second, docs, max_bucket_size=None
    )
    new_ids = {r.doc_id for r in second.select("doc_id").collect()}
    for a, b in _pairs_set(new_pairs):
        assert a in new_ids or b in new_ids


def test_updated_index_is_append_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bands0 = lsh_band_keys(docs.limit(0))
    _, bands1 = incremental_lsh_pairs(bands0, docs, docs, max_bucket_size=None)
    assert bands1.count() == lsh_band_keys(docs).count()


def test_incremental_redelivery_is_idempotent(spark, sf_dir):
    """At-least-once delivery: re-delivering an earlier batch's docs in
    a later batch must add NO index entries and emit NO duplicate
    pairs — the pair stream still equals the batch recompute."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    b0 = docs.filter(F.col("doc_id") % 3 == 0).localCheckpoint()
    b1_dupes = (
        docs.filter(F.col("doc_id") % 3 == 1)
        .unionByName(docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)))
        .localCheckpoint()
    )
    b2_dupes = (
        docs.filter(F.col("doc_id") % 3 == 2)
        .unionByName(docs.filter((F.col("doc_id") % 3 == 1) & (F.col("doc_id") % 5 == 0)))
        .localCheckpoint()
    )

    expected = _pairs_set(minhash_lsh_pairs(docs, max_bucket_size=None))

    bands = lsh_band_keys(docs.limit(0))
    emitted = []
    seen = b0
    p, bands = incremental_lsh_pairs(bands, b0, seen, max_bucket_size=None)
    bands = bands.localCheckpoint()
    emitted.append(_pairs_set(p))
    seen = seen.unionByName(docs.filter(F.col("doc_id") % 3 == 1))
    p, bands = incremental_lsh_pairs(bands, b1_dupes, seen, max_bucket_size=None)
    bands = bands.localCheckpoint()
    emitted.append(_pairs_set(p))
    p, bands = incremental_lsh_pairs(bands, b2_dupes, docs, max_bucket_size=None)
    emitted.append(_pairs_set(p))

    got = set().union(*emitted)
    assert got == expected and expected
    # disjoint emission: no pair surfaces in two batches
    assert sum(len(s) for s in emitted) == len(got)
    # index stayed one-entry-per-(doc, band): same count as one-shot
    assert bands.count() == lsh_band_keys(docs).count()
