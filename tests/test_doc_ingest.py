"""Streaming document ingestion (streaming/doc_ingest.py): the batch
twin defines the semantics; the availableNow stream must reproduce its
kept KEY SET (kept row per duplicate fingerprint may differ between
modes — first-wins is arrival-order-dependent — but the surviving
fingerprint set and all stateless columns cannot)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flinkstreametl_spark.streaming.doc_ingest import (
    DOC_STREAM_SCHEMA,
    dedup_against_history,
    ingest_documents,
    quality_gate,
    with_fingerprint,
)


def _write_jsonl(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "part-0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


_GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "in the field with many other animals around the old farm"
)
_DUP = "the same boilerplate text appears twice in this stream and it is long enough to pass the gate"
_BAD = "short"


def _rows():
    return [
        {"doc_id": 1, "text": _GOOD, "lang": "en", "source": "s1", "event_ts": "2024-01-01T00:00:00"},
        {"doc_id": 2, "text": _DUP, "lang": "en", "source": "s1", "event_ts": "2024-01-01T00:01:00"},
        {"doc_id": 3, "text": _DUP, "lang": "en", "source": "s2", "event_ts": "2024-01-01T00:02:00"},
        {"doc_id": 4, "text": _BAD, "lang": "en", "source": "s1", "event_ts": "2024-01-01T00:03:00"},
        {"doc_id": 5, "text": "a historical document that was already ingested into the corpus index some time ago it is long", "lang": "en", "source": "s1", "event_ts": "2024-01-01T00:04:00"},
    ]


def _history(spark):
    hist = spark.createDataFrame(
        [("a historical document that was already ingested into the corpus index some time ago it is long",)],
        "text STRING",
    )
    return with_fingerprint(hist).select("fp")


def test_batch_ingest_semantics(spark):
    docs = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"], r["source"], r["event_ts"]) for r in _rows()],
        "doc_id LONG, text STRING, lang STRING, source STRING, event_ts STRING",
    ).withColumn("event_ts", F.to_timestamp("event_ts"))
    out = ingest_documents(docs, _history(spark)).collect()
    ids = {r.doc_id for r in out}
    # 4 fails the gate; 5 is in history; 2/3 collapse to one survivor
    assert 1 in ids and 4 not in ids and 5 not in ids
    assert len(ids & {2, 3}) == 1
    assert all(r.quality_score >= 6 for r in out)


def test_stream_matches_batch_key_set(spark, tmp_path):
    src = tmp_path / "docs_stream"
    _write_jsonl(src, _rows())
    hist = _history(spark)

    batch = spark.read.schema(DOC_STREAM_SCHEMA).json(str(src))
    batch_fps = {r.fp for r in ingest_documents(batch, hist).collect()}

    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(str(src))
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        ingest_documents(stream, hist, watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out_dir))
    stream_fps = {r.fp for r in got.collect()}
    assert stream_fps == batch_fps
    # stateless columns survive identically for the unambiguous docs
    g1 = got.filter(F.col("doc_id") == 1).collect()
    assert len(g1) == 1 and g1[0].n_tokens > 10


def test_quality_gate_stateless_filters(spark):
    docs = spark.createDataFrame(
        [(1, _GOOD), (2, _BAD)], "doc_id LONG, text STRING"
    )
    out = quality_gate(docs).collect()
    assert [r.doc_id for r in out] == [1]


def test_history_antijoin_drops_known_fp(spark):
    docs = with_fingerprint(
        spark.createDataFrame([(1, "known text here"), (2, "new text here")], "doc_id LONG, text STRING")
    )
    hist = with_fingerprint(spark.createDataFrame([("known text here",)], "text STRING")).select("fp")
    out = dedup_against_history(docs, hist).collect()
    assert [r.doc_id for r in out] == [2]


def test_classifier_score_single_definition(spark, sf_dir):
    """quality_classifier_score (plans/ml_ext.py) keeps its term-level
    form because it exposes the five features as output columns; this
    pin guarantees its composed score can never drift from the shared
    operators/text.quality_score_expr() that the ingest gate, the drift
    monitor, and the batch audits all use (ADVICE r8)."""
    from flinkstreametl_spark.operators import text as X
    from flinkstreametl_spark.plans import REGISTRY
    from flinkstreametl_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").limit(300)
    shared = docs.select("doc_id", X.quality_score_expr("text").alias("s"))
    composed = (
        REGISTRY["quality_classifier_score"].fn(spark, sf_dir).select("doc_id", "score")
    )
    diff = (
        shared.join(composed, "doc_id")
        .filter(F.col("s") != F.col("score"))
        .count()
    )
    assert diff == 0
