"""[EXT] Streaming training-data ingestion: the LLM-pipeline operators
(quality filter, exact dedup, text stats) composed as one Structured
Streaming job over a document stream — the corpus-side twin of the
reference's CDC chain (SURVEY.md §3 reshaped onto documents).

    doc stream (file/Kafka JSONL)
        ──▶ quality gate (integer-linear classifier, map-side)
        ──▶ in-stream exact dedup (dropDuplicates on fingerprint;
            state bounded by watermark in the timed variant)
        ──▶ anti-join against the HISTORICAL fingerprint set
            (stream-static, broadcast when the dedup index is a
            bounded snapshot; at 100 TB the index is a bucketed
            table and the join co-locates on the digest)
        ──▶ per-doc quality stats projection ──▶ append sink

The same builder runs on a batch DataFrame (oracle-checkable: the
batch twin is what tests compare against) and a readStream input —
one plan, two sources, exactly like streaming/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flinkstreametl_spark.operators import text as X

DOC_STREAM_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, event_ts TIMESTAMP"


def quality_gate(docs: DataFrame) -> DataFrame:
    """The integer-weight linear classifier (plans/ml_ext.py) as a
    streaming-safe map-side filter: score >= 6 passes. Stateless, so it
    runs identically in batch and streaming."""
    score = X.quality_score_expr("text")
    return docs.withColumn("quality_score", score).filter(F.col("quality_score") >= 6)


def with_fingerprint(docs: DataFrame) -> DataFrame:
    return docs.withColumn("fp", X.fingerprint("text"))


def dedup_against_history(docs_fp: DataFrame, history_fp: DataFrame) -> DataFrame:
    """Drop documents whose fingerprint already exists in the historical
    index (stream-static LEFT ANTI join). The static side is loaded per
    micro-batch, so a compacted dedup index picks up between batches;
    Spark broadcasts it while it fits, and at index scale the join
    falls back to shuffle co-located on fp — the key is already the
    digest, so there is no skew."""
    return docs_fp.join(history_fp.select("fp"), "fp", "left_anti")


def ingest_documents(
    docs: DataFrame,
    history_fp: DataFrame,
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Full ingestion chain: quality gate -> fingerprint -> in-stream
    first-wins dedup -> anti-join vs history -> stats projection.

    ``dropDuplicates`` on a streaming frame keeps per-key state; pass
    ``watermark`` to bound it (state then expires with the event-time
    horizon, the T3 discipline). In batch the same call is the plain
    keep-any dedup — the batch/stream twin tests pin that the kept ROW
    may differ but the kept KEY SET cannot.
    """
    gated = with_fingerprint(quality_gate(docs))
    if watermark is not None:
        gated = gated.withWatermark("event_ts", watermark)
        deduped = gated.dropDuplicatesWithinWatermark(["fp"])
    else:
        deduped = gated.dropDuplicates(["fp"])
    fresh = dedup_against_history(deduped, history_fp)
    toks = X.tokens("text")
    return fresh.select(
        "doc_id",
        "lang",
        "source",
        "fp",
        "event_ts",
        "quality_score",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )
