"""[EXT] Round-4 training-data quality operators: Gopher-style
repetition/quality gate and vocabulary coverage curve (SURVEY.md §2.9
/ the LLM-pipeline north star; splits/sampling live in pipeline_ext).

The reference ETL (liwei199411/FlinkStreamETL, Main.java) moves CDC
rows; a corpus pipeline at 100 TB additionally has to DECIDE what to
keep. These are the keep/drop operators, shaped as one-shuffle
aggregates: per-document signals come from a single (doc_id, token)
explode + hash aggregate (the wordcount discipline — partial
aggregation map-side, one exchange), never from O(len²) per-row
higher-order scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.operators import text as X
from flinkstreametl_spark.plans.registry import register
from flinkstreametl_spark.sources.parquet import load_table

_TOKS = X.sql_tokens("text")

# Thresholds tuned so the fixture corpus has both keepers and drops;
# the shape (bounds on length, repetition, and word geometry) follows
# the published Gopher/C4 filter families.
_MIN_TOKENS = 12
_MAX_TOKENS = 100_000
_MIN_DISTINCT_FRAC = 0.45
_MAX_TOP_FRAC = 0.12
_MIN_MEAN_WLEN = 3.0
_MAX_MEAN_WLEN = 10.0


_GOPHER_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), tc AS (
    SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY doc_id, tok
), sig AS (
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(cnt) AS BIGINT) AS top_tok_count,
           CAST(SUM(len(tok) * cnt) AS BIGINT) AS n_word_chars
    FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct, top_tok_count,
       CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_frac,
       CAST(top_tok_count AS DOUBLE) / n_tokens AS top_frac,
       CAST(n_word_chars AS DOUBLE) / n_tokens AS mean_word_len,
       (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS})
         AND CAST(n_distinct AS DOUBLE) / n_tokens >= {_MIN_DISTINCT_FRAC}
         AND CAST(top_tok_count AS DOUBLE) / n_tokens <= {_MAX_TOP_FRAC}
         AND CAST(n_word_chars AS DOUBLE) / n_tokens BETWEEN {_MIN_MEAN_WLEN} AND {_MAX_MEAN_WLEN}
         AS keep
FROM sig
"""


@register("gopher_quality_gate", tags=("ext", "llm", "quality"), oracle=_GOPHER_ORACLE)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-family quality gate: per document, token count,
    distinct-token fraction (1 - repetition), most-frequent-token
    fraction, and mean word length, each bounded to produce a keep
    flag.

    Shape: explode to (doc_id, token), ONE hash aggregate keyed on
    (doc_id, token) with map-side partial aggregation, then a second
    per-doc aggregate that reuses the same doc_id partitioning — at
    100 TB this is two pipelined aggregates over one exchange, state
    bounded by vocabulary-per-doc. The per-row higher-order-function
    alternative (count each distinct token inside the token array) is
    O(len·distinct) per document with no codegen — wrong shape for
    long documents. All derived fractions are integer-over-integer
    double divisions, bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("doc_id", F.explode(X.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sig = tc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_tok_count"),
        F.sum(F.length("tok") * F.col("cnt")).alias("n_word_chars"),
    )
    n = F.col("n_tokens")
    distinct_frac = F.col("n_distinct").cast("double") / n
    top_frac = F.col("top_tok_count").cast("double") / n
    mean_wlen = F.col("n_word_chars").cast("double") / n
    keep = (
        n.between(_MIN_TOKENS, _MAX_TOKENS)
        & (distinct_frac >= _MIN_DISTINCT_FRAC)
        & (top_frac <= _MAX_TOP_FRAC)
        & mean_wlen.between(_MIN_MEAN_WLEN, _MAX_MEAN_WLEN)
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_tok_count",
        distinct_frac.alias("distinct_frac"),
        top_frac.alias("top_frac"),
        mean_wlen.alias("mean_word_len"),
        keep.alias("keep"),
    )


_VOCAB_ORACLE = f"""
WITH tok AS (
    SELECT unnest({_TOKS}) AS tok FROM documents
), freq AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY tok
), tot AS (
    SELECT CAST(SUM(freq) AS BIGINT) AS total FROM freq
), ranked AS (
    SELECT tok, freq,
           ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rk,
           CAST(SUM(freq) OVER (ORDER BY freq DESC, tok
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_freq
    FROM freq
)
SELECT CAST(rk AS BIGINT) AS rk, tok, freq, cum_freq,
       CAST(cum_freq AS DOUBLE) / total AS cum_frac
FROM ranked, tot
WHERE rk <= 100
"""


@register("vocab_coverage_curve", tags=("ext", "llm", "text"), oracle=_VOCAB_ORACLE)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: tokens by descending corpus
    frequency with the cumulative fraction of all token occurrences
    covered — the plot that sizes a tokenizer vocabulary (how few
    types cover 90% of the stream). Top-100 rows emitted.

    The corpus-wide explode + count is the scalable part (wordcount
    shape); the ordered cumulative sum runs over the VOCABULARY, which
    is orders of magnitude smaller than the corpus (Heaps' law), so
    the single-partition window over it is a deliberate, bounded
    choice — the same reasoning as collecting k centroids. Ties broken
    by token for determinism."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(X.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = freq.agg(F.sum("freq").alias("total"))
    w = Window.orderBy(F.col("freq").desc(), "tok")
    ranked = freq.select(
        F.row_number().over(w).cast("long").alias("rk"),
        "tok",
        "freq",
        F.sum("freq").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum_freq"),
    ).filter(F.col("rk") <= 100)
    return ranked.crossJoin(F.broadcast(total)).select(
        "rk",
        "tok",
        "freq",
        "cum_freq",
        (F.col("cum_freq").cast("double") / F.col("total")).alias("cum_frac"),
    )
