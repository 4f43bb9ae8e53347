"""Streaming inverted-index maintenance (streaming/index_ingest.py):
postings appended per micro-batch must equal the batch recompute,
ranking stats stay frozen until the growth-triggered re-fit, and the
version flip commits postings + stats together."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flinkstreametl_spark.sources.parquet import load_table
from flinkstreametl_spark.streaming.index_ingest import (
    build_index,
    load_meta,
    load_postings,
    load_stats,
    maybe_refit,
    postings_of,
    process_batch,
    run_index_stream,
    staleness,
)
from flinkstreametl_spark.streaming.versioned import current_version


def _docs(spark, sf_dir, n=150):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
        .localCheckpoint()
    )


def _postings_set(df):
    return {(r.doc_id, r.term, r.tf, r.dl) for r in df.collect()}


def _write_jsonl(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")


def test_ingest_matches_batch_postings(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    cut = len(rows) // 2
    base = spark.createDataFrame(rows[:cut], "doc_id LONG, text STRING")
    idx = str(tmp_path / "inv")
    build_index(spark, base, idx)

    mid = cut + (len(rows) - cut) // 2
    b1 = spark.createDataFrame(rows[cut:mid], "doc_id LONG, text STRING")
    # redelivery of b1's tail inside b2 (at-least-once)
    b2 = spark.createDataFrame(rows[mid:] + rows[cut : cut + 5], "doc_id LONG, text STRING")
    process_batch(spark, b1, idx, refit_growth=None)
    process_batch(spark, b2, idx, refit_growth=None)

    assert _postings_set(load_postings(spark, idx)) == _postings_set(postings_of(docs))

    # stats stayed FROZEN at the base fit (that's the staleness)
    dfq, tot = load_stats(spark, idx)
    base_dfq, base_tot = (
        postings_of(base).groupBy("term").agg(F.count(F.lit(1)).alias("df")),
        None,
    )
    assert {(r.term, r.df) for r in dfq.collect()} == {
        (r.term, r.df) for r in base_dfq.collect()
    }
    assert tot.collect()[0].n == cut


def test_stream_driver_equals_direct(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir, n=90)
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    base = spark.createDataFrame(rows[:30], "doc_id LONG, text STRING")
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", rows[30:60])
    _write_jsonl(src / "b.jsonl", rows[60:] + rows[30:33])

    idx = str(tmp_path / "inv")
    build_index(spark, base, idx)
    q = run_index_stream(spark, str(src), idx, refit_growth=None)
    q.awaitTermination(120)

    assert _postings_set(load_postings(spark, idx)) == _postings_set(postings_of(docs))


def test_growth_trigger_refits_stats(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir, n=100)
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    base = spark.createDataFrame(rows[:50], "doc_id LONG, text STRING")
    arrivals = spark.createDataFrame(rows[50:], "doc_id LONG, text STRING")
    idx = str(tmp_path / "inv")
    build_index(spark, base, idx)
    assert current_version(idx) == 0
    assert staleness(spark, idx) == 0.0

    process_batch(spark, arrivals, idx, refit_growth=None)
    assert abs(staleness(spark, idx) - 1.0) < 1e-9  # 50 arrivals on a 50-doc fit
    assert not maybe_refit(spark, idx, growth=1.5)
    assert current_version(idx) == 0

    assert maybe_refit(spark, idx, growth=0.5)
    assert current_version(idx) == 1
    assert load_meta(idx)["fit_n"] == 100
    assert staleness(spark, idx) == 0.0

    # refit stats == recompute over the full corpus
    dfq, tot = load_stats(spark, idx)
    full_dfq = postings_of(docs).groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    assert {(r.term, r.df) for r in dfq.collect()} == {
        (r.term, r.df) for r in full_dfq.collect()
    }
    t = tot.collect()[0]
    full_dl = postings_of(docs).groupBy("doc_id").agg(F.max("dl").alias("dl"))
    assert t.n == 100 and t.s == sum(r.dl for r in full_dl.collect())
    # postings survived the re-cluster byte-for-byte
    assert _postings_set(load_postings(spark, idx)) == _postings_set(postings_of(docs))
