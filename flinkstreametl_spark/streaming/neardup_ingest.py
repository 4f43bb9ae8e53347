"""[EXT] Streaming NEAR-dup maintenance: ``incremental_lsh_pairs``
wired into a Structured Streaming ``foreachBatch`` loop with the band
index persisted as a parquet table between micro-batches.

This is the production deployment of the incremental dedup operator
(operators/dedup.py): per micro-batch the job

    1. loads the band index accumulated so far (parquet, partitioned
       by band — the candidate join prunes to matching bands);
    2. runs incremental_lsh_pairs(old_index, batch, corpus):
       redelivery anti-join -> |batch| signatures -> new-vs-all
       candidate equi-join -> exact Jaccard verify;
    3. appends the emitted near-dup pairs to the pairs sink and the
       NEW band rows to the index — both append-only writes, so a
       replayed batch (at-least-once) re-writes nothing thanks to the
       redelivery dedup.

State lives in STORAGE, not executor memory: the index is a table, the
checkpoint tracks source offsets, and a restart resumes from both. Per
batch the work is proportional to the batch (measured:
docs/INCREMENTAL.md), which is the only shape that survives a corpus
that never stops growing.

The corpus frame passed for the exact-Jaccard verify is the persisted
document store (here: the growing parquet of ingested docs); at 100 TB
that read is pruned to the candidate doc_ids by the join itself.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from flinkstreametl_spark.operators.dedup import incremental_lsh_pairs, lsh_band_keys

PAIRS_SUBDIR = "pairs"
INDEX_SUBDIR = "band_index"
DOCS_SUBDIR = "docs"

#: Compact the on-disk state every N micro-batches. Append-only state
#: gains ~one file set per batch, so at a deep horizon the per-batch
#: cost is dominated by FILE COUNT (open/footers/listing), not rows —
#: measured in docs/INCREMENTAL.md's 50-batch probe. 10 keeps the file
#: population bounded at ~10 appends between rewrites.
DEFAULT_COMPACT_EVERY = 10


def _recover_compaction(path: str) -> None:
    """Repair a compaction swap interrupted by a crash (ADVICE r5).

    The swap in ``_compact_parquet`` is rename(path, old) then
    rename(tmp, path); a crash between the two leaves ``path`` missing
    with the ORIGINAL intact at ``path + '._old'``. Without this step
    ``_load_or_empty`` would silently treat the missing dir as empty —
    the dedup index resets, duplicate pairs re-emit, and the document
    store is lost. Recovery is deterministic:

    - ``._old`` present, ``path`` missing  -> crash mid-swap: restore
      the original (content-equal to the compacted ``._compact``;
      restoring the known-complete original is the conservative pick).
    - ``._old`` present, ``path`` present AND carrying its ``_SUCCESS``
      marker -> crash after a verified swap: only housekeeping remains.
    - ``._old`` present, ``path`` present WITHOUT ``_SUCCESS`` -> the
      swap landed an unverified write (the RuntimeError path below, or
      a crash straddling the renames): discard it and restore the
      original — ``._old`` is the only verified copy and must never be
      deleted in favor of an unverified directory.
    - a stale ``._compact`` is always discarded (the next compaction
      rewrites it from live state).
    """
    tmp, old = path + "._compact", path + "._old"
    if os.path.isdir(old):
        if os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS")):
            shutil.rmtree(old)
        else:
            if os.path.isdir(path):
                shutil.rmtree(path)
            os.rename(old, path)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)


def _compact_parquet(
    spark: SparkSession, path: str, schema, n_files: int, cluster_col: str | None = None
) -> None:
    """Rewrite an append-only parquet directory into ``n_files`` files
    (hash-clustered on ``cluster_col`` when given, so the candidate
    join's band pruning keeps working on the compacted layout).

    Swap is rename-based and CRASH-RECOVERABLE: the original directory
    survives at ``path + '._old'`` until the new one is verified in
    place (its ``_SUCCESS`` marker — written by the committer before
    the swap began — is checked after the final rename), and every
    state load runs ``_recover_compaction`` first, so a crash at any
    point costs only deferred housekeeping, never state. Correct for
    the single-writer foreachBatch loop this module runs (Structured
    Streaming serializes batches); a multi-writer deployment at
    cluster scale would put the state in a transactional table format
    instead and compact via its rewrite API — the read/compute shape
    here is unchanged by that swap."""
    _recover_compaction(path)
    if not os.path.isdir(path):
        return
    df = spark.read.schema(schema).parquet(path)
    if cluster_col is not None:
        df = df.repartition(n_files, cluster_col)
    else:
        df = df.repartition(n_files)
    tmp, old = path + "._compact", path + "._old"
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # The committed write lost its marker — keep ._old (recovery
        # restores it on the next load) rather than deleting the only
        # known-good copy.
        raise RuntimeError(f"compacted state at {path} missing _SUCCESS; original kept at ._old")
    shutil.rmtree(old)


def compact_state(spark: SparkSession, state_dir: str, *, n_files: int = 16) -> None:
    """Compact the band index (clustered by band) and the document
    store (clustered by doc_id). Pairs are a SINK, not probed state —
    their file count never enters the per-batch critical path, so they
    are left to the downstream consumer."""
    _compact_parquet(
        spark,
        os.path.join(state_dir, INDEX_SUBDIR),
        _empty_index(spark).schema,
        n_files,
        "band",
    )
    _compact_parquet(
        spark,
        os.path.join(state_dir, DOCS_SUBDIR),
        "doc_id LONG, text STRING",
        n_files,
        "doc_id",
    )


def _empty_index(spark: SparkSession) -> DataFrame:
    return lsh_band_keys(
        spark.createDataFrame([], "doc_id LONG, text STRING")
    )


def _load_or_empty(spark: SparkSession, path: str, empty: DataFrame) -> DataFrame:
    # Pre-batch recovery: a crash mid-compaction must restore, never
    # silently read as empty (see _recover_compaction).
    _recover_compaction(path)
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        return spark.read.schema(empty.schema).parquet(path)
    return empty


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    threshold: float = 0.6,
    *,
    batch_id: int | None = None,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
) -> None:
    """One micro-batch of near-dup maintenance against on-disk state.
    Called from ``foreachBatch`` (or directly, for batch replay tests).

    Write order is pairs -> docs -> index: the index append is the
    COMMIT POINT for redelivery dedup. If the batch dies mid-way, its
    docs are not yet in the index, so the replay re-runs the whole
    batch and the pairs sink receives the same rows again — dedupable
    downstream by (doc_a, doc_b), exactly the idempotent-upsert story
    of streaming/sinks.py.

    Every ``compact_every`` batches (when ``batch_id`` is provided) the
    probed state is rewritten into a bounded file count AFTER the
    commit point — compaction changes layout, never content, so a
    crash between commit and compaction costs nothing but deferred
    housekeeping.
    """
    # In-batch self-dedup first: an at-least-once source can duplicate
    # a doc WITHIN one micro-batch (two files of the same retry drained
    # together), where the index anti-join cannot see it. ∝ batch cost.
    batch_df = batch_df.dropDuplicates(["doc_id"]).localCheckpoint()
    index_path = os.path.join(state_dir, INDEX_SUBDIR)
    docs_path = os.path.join(state_dir, DOCS_SUBDIR)
    pairs_path = os.path.join(state_dir, PAIRS_SUBDIR)

    old_index = _load_or_empty(spark, index_path, _empty_index(spark))
    corpus = _load_or_empty(
        spark, docs_path, spark.createDataFrame([], "doc_id LONG, text STRING")
    ).unionByName(batch_df.select("doc_id", "text"))

    pairs, _updated = incremental_lsh_pairs(old_index, batch_df, corpus, threshold=threshold)
    # Appended rows are derived from the BATCH only (anti-join away
    # redeliveries, then band-key the remainder) — never diffed against
    # the full index (an exceptAll there would make per-batch work
    # proportional to the corpus).
    fresh_docs = batch_df.select("doc_id", "text").join(
        old_index.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    new_rows = lsh_band_keys(fresh_docs)

    pairs.write.mode("append").parquet(pairs_path)
    fresh_docs.write.mode("append").parquet(docs_path)
    new_rows.write.mode("append").parquet(index_path)

    if compact_every and batch_id is not None and (batch_id + 1) % compact_every == 0:
        compact_state(spark, state_dir)


def run_neardup_stream(
    spark: SparkSession,
    source_path: str,
    state_dir: str,
    *,
    threshold: float = 0.6,
    available_now: bool = True,
):
    """Continuous near-dup maintenance over a JSONL document stream.
    ``available_now=True`` drains existing files and stops (test/batch
    replay); ``False`` runs continuously (production)."""
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)  # bounded micro-batches; availableNow drains them in sequence
        .json(source_path)
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: process_batch(
                df.sparkSession, df, state_dir, threshold, batch_id=bid
            )
        )
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
