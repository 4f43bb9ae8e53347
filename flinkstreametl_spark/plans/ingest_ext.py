"""[EXT] Ingestion/curation extension queries: the deterministic batch
twin of the streaming doc-ingest chain (streaming/doc_ingest.py), a
bucketed event range join, and temperature-based corpus mixing.

These extend the reference's ETL surface (SURVEY.md §2 north-star) with
the curation ops a 100 TB training-data pipeline runs between raw
ingestion and tokenization. Each query is a single declarative plan —
Catalyst picks broadcast/shuffle; nothing materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkstreametl_spark.operators import text as X
from flinkstreametl_spark.operators.windows import epoch_micros
from flinkstreametl_spark.plans.registry import register
from flinkstreametl_spark.sources.parquet import load_table
from flinkstreametl_spark.streaming.doc_ingest import quality_gate, with_fingerprint

_TOKS = X.sql_tokens("text")
_FP = X.sql_fingerprint("text")

# The streaming chain's quality gate, as oracle SQL (weights 3/2/2/1/1,
# threshold 6 — identical to plans/ml_ext.py quality_classifier_score).
_SCORE_SQL = """
CAST(3 * CAST(n_tokens BETWEEN 10 AND 10000 AS BIGINT)
   + 2 * CAST(n_distinct_tokens * 10 > n_tokens AS BIGINT)
   + 2 * CAST(n_stop * 20 >= n_tokens AS BIGINT)
   + 1 * CAST(n_chars BETWEEN n_tokens * 3 AND n_tokens * 13 AS BIGINT)
   + 1 * CAST(n_punct * 10 <= n_chars AS BIGINT) AS BIGINT)
"""


@register(
    "ingest_batch_pipeline",
    tags=("ext", "llm", "pipeline", "ingest", "streaming-twin"),
    oracle=f"""
WITH feat AS (
    SELECT doc_id, lang, source, text,
           len({_TOKS}) AS n_tokens,
           len(list_distinct({_TOKS})) AS n_distinct_tokens,
           {X.sql_marker_hits(_TOKS, X.EN_STOPWORDS)} AS n_stop,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
    FROM documents
    WHERE source <> 'src0'
), scored AS (
    SELECT doc_id, lang, source, n_tokens, n_distinct_tokens,
           {_FP} AS fp,
           {_SCORE_SQL} AS quality_score
    FROM feat
), kept AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM scored WHERE quality_score >= 6
), hist AS (
    SELECT DISTINCT {_FP} AS fp FROM documents WHERE source = 'src0'
)
SELECT k.doc_id, k.lang, k.source, k.fp, k.quality_score,
       k.n_tokens, k.n_distinct_tokens
FROM kept k LEFT JOIN hist h ON k.fp = h.fp
WHERE k.rn = 1 AND h.fp IS NULL
""",
)
def ingest_batch_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic batch twin of the streaming ingest chain
    (streaming/doc_ingest.py ``ingest_documents``): quality gate →
    fingerprint → keep-MIN-doc_id per fingerprint → anti-join against
    the historical index (src0 plays the already-ingested corpus) →
    stats projection. The streaming form keeps an arbitrary first
    arrival per fingerprint; the twin pins min-doc_id so the result is
    oracle-checkable, and the stream==batch KEY-SET test
    (tests/test_doc_ingest.py) covers the arrival-order half.

    Scale shape: one map-side scan+gate, ONE shuffle keyed by the md5
    fingerprint (uniform by construction — no skew), and the history
    anti-join co-locates on the same key (broadcast while the index
    snapshot fits, bucketed at 100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    incoming = docs.filter(F.col("source") != "src0")
    gated = with_fingerprint(quality_gate(incoming)).select(
        "fp",
        F.struct(
            "doc_id",
            "lang",
            "source",
            "quality_score",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        ).alias("r"),
    )
    # keep-min via partial-aggregating min(struct) — doc_id leads the
    # struct and is unique, so this is arg-min without a window sort.
    kept = gated.groupBy("fp").agg(F.min("r").alias("r"))
    history = with_fingerprint(docs.filter(F.col("source") == "src0")).select("fp")
    fresh = kept.join(history, "fp", "left_anti")
    return fresh.select(
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.lang").alias("lang"),
        F.col("r.source").alias("source"),
        "fp",
        F.col("r.quality_score").alias("quality_score"),
        F.col("r.n_tokens").alias("n_tokens"),
        F.col("r.n_distinct_tokens").alias("n_distinct_tokens"),
    )


# Rabin-Karp rolling hash over token windows: k=8 tokens, base 131,
# modulus 2^31-1 (intermediates stay < 2^38 — no BIGINT overflow in
# either engine), boundary where hash % 64 == 0.
_CDC_K = 8
_CDC_B = 131
_CDC_M = 2147483647
_CDC_MASK = 64


def _rolling_expr(h: str, idx: str) -> str:
    """Unrolled ((...)*B + h[i+j]) % M chain over the k-token window —
    identical text in Spark SQL and DuckDB (element_at vs [] differs)."""
    rh = f"element_at({h}, {idx})"
    for j in range(1, _CDC_K):
        rh = f"(({rh}) * {_CDC_B} + element_at({h}, {idx}+{j})) % {_CDC_M}"
    return rh


def _rolling_expr_duck(h: str, idx: str) -> str:
    rh = f"{h}[{idx}]"
    for j in range(1, _CDC_K):
        rh = f"(({rh}) * {_CDC_B} + {h}[{idx}+{j}]) % {_CDC_M}"
    return rh


@register(
    "cdc_rolling_hash_chunks",
    tags=("ext", "llm", "dedup", "chunking", "rolling-hash"),
    oracle=f"""
WITH t AS (
    SELECT doc_id, list_transform({_TOKS},
               t -> CAST(concat('0x', substr(md5(t), 1, 4)) AS BIGINT)) AS h
    FROM documents
), w AS (
    SELECT doc_id,
           CASE WHEN len(h) >= {_CDC_K}
                THEN list_transform(range(1, len(h) - {_CDC_K - 2}),
                                    i -> {_rolling_expr_duck('h', 'i')})
                ELSE [] END AS wins
    FROM t
), b AS (
    SELECT doc_id, wins,
           list_filter(range(1, len(wins) + 1), p -> wins[p] % {_CDC_MASK} = 0) AS bpos
    FROM w
)
SELECT doc_id,
       CAST(len(wins) AS BIGINT) AS n_windows,
       CAST(len(bpos) AS BIGINT) AS n_boundaries,
       CAST(len(bpos) + 1 AS BIGINT) AS n_chunks,
       CAST(coalesce(list_sum(bpos), 0) AS BIGINT) AS boundary_pos_sum
FROM b
""",
)
def cdc_rolling_hash_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking by Rabin-Karp rolling hash (the rsync /
    LowBW-dedup technique, at token granularity): hash every 8-token
    window, declare a chunk boundary where hash % 64 == 0, report
    window/boundary/chunk counts and the boundary-position sum per doc.
    Unlike fixed-stride chunking (chunk_documents), an insertion shifts
    at most the chunks around the edit — the property substring-level
    dedup at 100 TB depends on.

    All arithmetic is integer with an explicit mod after every fold
    step (intermediates < 2^38), so the hash is bit-identical in both
    engines. Plan shape: one scan, all higher-order functions, ZERO
    shuffles — the token hash array is materialized as a column first
    (docs/SCALE.md round-2 lesson: HOF lambda bodies do not get
    subexpression elimination)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(
        "transform(split(lower(trim(text)), '\\\\s+'),"
        " t -> CAST(conv(substr(md5(t), 1, 4), 16, 10) AS BIGINT))"
    )
    wins = F.expr(
        f"CASE WHEN size(h) >= {_CDC_K}"
        f" THEN transform(sequence(1, size(h) - {_CDC_K - 1}), i -> {_rolling_expr('h', 'i')})"
        " ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    bpos = F.expr(
        "CASE WHEN size(wins) > 0"
        f" THEN filter(sequence(1, size(wins)), p -> element_at(wins, p) % {_CDC_MASK} = 0)"
        " ELSE CAST(array() AS ARRAY<INT>) END"
    )
    return (
        docs.select("doc_id", h.alias("h"))
        .select("doc_id", wins.alias("wins"))
        .select("doc_id", F.size("wins").alias("n_windows"), bpos.alias("bpos"))
        .select(
            "doc_id",
            F.col("n_windows").cast("long").alias("n_windows"),
            F.size("bpos").cast("long").alias("n_boundaries"),
            (F.size("bpos") + 1).cast("long").alias("n_chunks"),
            F.expr("aggregate(bpos, CAST(0 AS BIGINT), (a, x) -> a + x)").alias("boundary_pos_sum"),
        )
    )


_BUCKET_US = 300_000_000  # 5-minute range, in microseconds


@register(
    "range_join_error_context",
    tags=("ext", "join", "range", "events"),
    oracle=f"""
WITH clicks AS (
    SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'
), errors AS (
    SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'
)
SELECT c.event_id,
       CAST(COUNT(e.user_id) AS BIGINT) AS n_errors_5min
FROM clicks c LEFT JOIN errors e
  ON c.user_id = e.user_id AND abs(c.us - e.us) <= {_BUCKET_US}
GROUP BY c.event_id
""",
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for every click, how many errors did the same user
    hit within ±5 minutes. The oracle states it as the naive inequality
    join; the Spark plan is the BUCKETED form — each error replicates
    into its time bucket and both neighbors, the join is a pure
    EQUI-join on (user_id, bucket), and the exact |Δt| ≤ 5 min predicate
    filters pairs after the hash match. Replication factor is a
    constant 3, candidates are bounded per (user, 5-min bucket), and no
    CartesianProduct/BroadcastNestedLoopJoin appears at any scale —
    the standard interval-join decomposition (the batch analogue of the
    stream-stream interval join in streaming/pipeline.py).

    Time arithmetic is integer microseconds on both sides
    (epoch_micros / epoch_us), so the boundary is bit-exact."""
    events = load_table(spark, sf_dir, "events")
    us = epoch_micros(events, "ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        us.alias("c_us"),
        F.floor(us / F.lit(_BUCKET_US)).cast("long").alias("bucket"),
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            us.alias("e_us"),
            F.floor(us / F.lit(_BUCKET_US)).cast("long").alias("b"),
        )
        .withColumn("bucket", F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)))
        .drop("b")
    )
    joined = clicks.join(
        errors,
        (clicks.user_id == errors.e_user)
        & (clicks.bucket == errors.bucket)
        & (F.abs(clicks.c_us - errors.e_us) <= _BUCKET_US),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("e_user").cast("long").alias("n_errors_5min")
    )


@register(
    "temperature_mix_sample",
    tags=("ext", "llm", "sampling", "mixing"),
    oracle=f"""
WITH w AS (
    SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents GROUP BY lang
), m AS (
    SELECT MAX(chars) AS max_chars FROM w
), rates AS (
    SELECT lang, chars,
           CAST(floor(4294967296.0 * sqrt(CAST(chars AS DOUBLE)) / sqrt(CAST(max_chars AS DOUBLE))) AS BIGINT) AS threshold
    FROM w, m
)
SELECT d.doc_id, d.lang, r.threshold,
       CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hash32
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < r.threshold
""",
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-sampling rule
    from the mBERT/XLM-R lineage, α = 0.5): each language keeps
    documents with probability (w_l / w_max)^α where w_l is the
    language's total char mass — small languages are up-weighted
    relative to proportional sampling, large ones flattened. Selection
    is the deterministic md5-hash Bernoulli (same family as
    hash_split_train_test): keep iff hash32(doc_id) < floor(2³² ·
    sqrt(w_l)/sqrt(w_max)), reproducible across engines, reruns, and
    incremental batches. sqrt/·/÷ are IEEE correctly-rounded, so the
    threshold is bit-identical in both engines.

    Scale shape: one tiny per-language aggregate (broadcast back) plus
    one map-side filtered scan — no fact-side shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("lang").agg(F.sum("n_chars").cast("long").alias("chars"))
    m = w.agg(F.max("chars").alias("max_chars"))
    rates = w.crossJoin(F.broadcast(m)).select(
        "lang",
        F.floor(
            F.lit(4294967296.0)
            * F.sqrt(F.col("chars").cast("double"))
            / F.sqrt(F.col("max_chars").cast("double"))
        )
        .cast("long")
        .alias("threshold"),
    )
    h32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(h32 < F.col("threshold"))
        .select("doc_id", "lang", "threshold", h32.alias("hash32"))
    )
