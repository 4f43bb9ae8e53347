"""Invariants of span_dedup_keep_first beyond oracle parity: exactly
one occurrence survives per distinct window, and cleaning never grows a
document."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.operators import text as X
from flinkstreametl_spark.plans.corpus_ext import _WIN, span_dedup_keep_first
from flinkstreametl_spark.sources.parquet import load_table


def test_one_survivor_per_distinct_window(spark, sf_dir):
    out = span_dedup_keep_first(spark, sf_dir)
    kept_windows = out.agg(F.sum(F.col("n_windows") - F.col("n_removed_windows"))).collect()[0][0]

    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    n_win = F.floor((F.size(toks) + (_WIN - 1)) / _WIN).cast("long")
    w = docs.select("doc_id", toks.alias("toks"), F.explode(F.sequence(F.lit(0), n_win - 1)).alias("wid"))
    wtext = F.array_join(F.slice(F.col("toks"), F.col("wid") * _WIN + 1, _WIN), " ")
    n_distinct = w.select(F.md5(wtext.cast("binary")).alias("wh")).distinct().count()

    assert kept_windows == n_distinct


def test_cleaning_is_monotone(spark, sf_dir):
    rows = span_dedup_keep_first(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.cleaned_tokens <= r.n_tokens
        assert 0 <= r.n_removed_windows <= r.n_windows
        # removal takes whole windows, each 1..16 tokens
        if r.n_removed_windows == 0:
            assert r.cleaned_tokens == r.n_tokens
        else:
            assert r.cleaned_tokens < r.n_tokens
