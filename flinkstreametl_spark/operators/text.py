"""[EXT] Text-analysis operators for training-data pipelines:
tokenization, token counting, quality scoring, language-ID heuristic,
document fingerprinting (SURVEY.md §2.9 / north-star).

All built-in column expressions — JVM-side, whole-stage-codegen'd, no
Python in the hot path. Every helper has an exact SQL twin used by the
DuckDB oracles (plans/llm.py), so semantics are pinned engine-neutrally.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"

# Marker stopword lists for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "los", "de", "que", "y", "en", "una"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "les", "et", "des", "un", "dans", "que"),
    "zh": ("的", "了", "是", "在", "我"),
}

EN_STOPWORDS = LANG_MARKERS["en"]


def tokens(col: str | Column = "text") -> Column:
    """Lowercased whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), TOKEN_SPLIT)


def distinct_tokens(col: str | Column = "text") -> Column:
    return F.array_distinct(tokens(col))


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def marker_hits(tokens_col: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that appear in `words` (with multiplicity)."""
    return F.size(F.filter(tokens_col, lambda t: t.isin(*words)))


def punct_count(col: str | Column = "text") -> Column:
    """Punctuation chars, counted as length minus punctuation-stripped
    length (identical semantics in Spark and DuckDB regexp_replace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))


def quality_score_expr(col: str | Column = "text") -> Column:
    """THE production 5-term integer-weight quality classifier (score
    0..9); the single definition shared by the ingest gate
    (``streaming/doc_ingest.quality_gate``), the drift monitor
    (``streaming/drift_monitor.score_histogram``), their batch twins
    (``plans/quality_ext.quality_score_drift``,
    ``plans/llm.quality_classifier_score`` /
    ``plans/llm.dedup_funnel_by_source``), and any future consumer —
    a weight change here changes ALL of them together, so the drift
    monitor always measures the signal the pipeline filters on.

    Terms (integer comparisons only — exact in Spark and DuckDB):
    +3 sane length (10..10_000 tokens), +2 lexical diversity
    (>10% distinct tokens), +2 English stopword density (>=5%),
    +1 chars-per-token in [3, 13], +1 punctuation <=10% of chars.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = marker_hits(toks, EN_STOPWORDS)
    n_chars = F.length(c)
    n_punct = punct_count(c)
    return (
        3 * n_tokens.between(10, 10000).cast("long")
        + 2 * (n_distinct * 10 > n_tokens).cast("long")
        + 2 * (n_stop * 20 >= n_tokens).cast("long")
        + 1 * n_chars.between(n_tokens * 3, n_tokens * 13).cast("long")
        + 1 * (n_punct * 10 <= n_chars).cast("long")
    )


def fingerprint(col: str | Column = "text") -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ").cast("binary"))


def predicted_lang(hit_cols: dict[str, Column]) -> Column:
    """Argmax over language marker-hit counts, ties broken by the fixed
    language order, zero hits -> 'und'. The same CASE chain is emitted in
    the oracle SQL so tie-breaks match exactly."""
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    for lang in reversed(langs):
        others = [hit_cols[o] for o in langs if o != lang]
        cond = (hit_cols[lang] > 0)
        for o in others:
            cond = cond & (hit_cols[lang] >= o)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def ngrams(col: str | Column = "text", n: int = 3) -> Column:
    """Word n-grams (with multiplicity), space-joined. Empty array when
    the document has fewer than n tokens — guarded explicitly because
    Spark's sequence(1, stop) DESCENDS for stop < 1 instead of
    returning empty.

    PERF: this tokenizes inline, and the token expression is referenced
    from inside the per-element lambda — Spark re-runs the split per
    ELEMENT (no subexpression elimination into HOF lambda bodies; see
    docs/SCALE.md). For anything hot, materialize the token array as a
    column first and use ngrams_from_tokens."""
    return ngrams_from_tokens(tokens(col), n)


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """n-grams over an ALREADY-MATERIALIZED token-array column — the
    hot-path form: the lambda references a bound column, not an
    expression tree, so nothing is recomputed per element."""
    cnt = F.size(toks)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    return F.when(
        cnt >= n, F.transform(F.sequence(F.lit(1), cnt - (n - 1)), gram)
    ).otherwise(F.array().cast("array<string>"))


def chunk_tokens(toks_col: Column, chunk_id: Column, chunk_size: int, stride: int) -> Column:
    """Token slice of chunk `chunk_id` (0-based): tokens
    [chunk_id*stride+1, chunk_id*stride+chunk_size], clamped at the end."""
    return F.slice(toks_col, chunk_id * stride + 1, chunk_size)


def num_chunks(toks_col: Column, chunk_size: int, stride: int) -> Column:
    """ceil((n_tokens - overlap) / stride), min 1 — the count that tiles
    every token with `chunk_size`-token windows overlapping by
    chunk_size - stride."""
    overlap = chunk_size - stride
    n = F.size(toks_col)
    return F.greatest(F.floor((n - overlap + (stride - 1)) / F.lit(stride)).cast("long"), F.lit(1))


# --- SQL twins (DuckDB dialect) used to build oracle strings -------------

def sql_tokens(col: str = "text") -> str:
    return f"regexp_split_to_array(lower(trim({col})), '\\s+')"


def sql_word_list(words: tuple[str, ...]) -> str:
    return "(" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + ")"


def sql_marker_hits(tokens_sql: str, words: tuple[str, ...]) -> str:
    return f"len(list_filter({tokens_sql}, t -> t IN {sql_word_list(words)}))"


def sql_fingerprint(col: str = "text") -> str:
    return f"md5(regexp_replace(lower(trim({col})), '\\s+', ' ', 'g'))"


def sql_ngrams(col: str = "text", n: int = 3) -> str:
    toks = sql_tokens(col)
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" if j else f"{toks}[i]" for j in range(n))
    return f"list_transform(range(1, len({toks}) - {n - 2}), i -> {parts})"


def sql_predicted_lang(hit_sql: dict[str, str]) -> str:
    langs = list(LANG_MARKERS)
    cases = []
    for lang in langs:
        conds = [f"{hit_sql[lang]} > 0"] + [
            f"{hit_sql[lang]} >= {hit_sql[o]}" for o in langs if o != lang
        ]
        cases.append("WHEN " + " AND ".join(conds) + f" THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"
