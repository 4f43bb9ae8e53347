"""[EXT] Deduplication operators: exact (fingerprint groupBy),
MinHash+LSH near-dup, SimHash, bounded n-gram Jaccard (SURVEY.md §2.9 /
north-star).

Scale design
------------
- Exact dedup: hash-groupBy on a fingerprint — one shuffle keyed by the
  digest; at 100 TB this is the classic dedup-by-content-hash sweep.
- MinHash+LSH: shingle -> K min-hashes -> band keys -> self-join on
  (band, band_key). Only documents sharing a band bucket are paired, so
  the candidate set is output-sized, not O(n²); the exact Jaccard
  verification runs only on candidates. Hashes are md5 strings (not
  engine-native hash()) so the DuckDB oracle reproduces them exactly.
- SimHash: 16-bit signature from per-token md5 nibbles; near-dup pairs
  = hamming distance <= d via xor/bit_count, candidates from the
  multi-index pigeonhole equi-join (d+1 bit bands; any pair within d
  agrees on some band) — exact recall, never a cross join.
- Hot-key guard: band buckets above MAX_BUCKET_SIZE are dropped before
  any self-join (both LSH and SimHash) — one boilerplate bucket
  otherwise turns the candidate join quadratic on a single key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.operators.text import distinct_tokens, fingerprint
from flinkstreametl_spark.sources.parquet import ensure_parallelism

# 8 hashes in 4 bands of 2: at the 0.6 Jaccard threshold the candidate
# probability is 1-(1-j²)⁴ ≈ 0.86 (vs 0.59 for 2 bands of 4) — recall
# matters more than band selectivity because candidates are verified
# with exact Jaccard anyway.
NUM_HASHES = 8
ROWS_PER_BAND = 2  # -> 4 bands

# Band buckets larger than this are dropped before the candidate
# self-join. A hot band key (boilerplate, empty docs, template text)
# otherwise produces a quadratic self-join on a single key — the one
# thing that does not survive 100 TB. Oversized buckets carry almost no
# signal anyway: their members are typically exact or near-exact
# duplicates that the cheaper exact-fingerprint pass (run it first)
# already collapses.
MAX_BUCKET_SIZE = 256


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup inventory: one row per distinct content fingerprint
    with its cardinality and keeper (min id)."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper"))
    )


def dedup_keep_first(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the lowest-id document per fingerprint
    (deterministic, unlike dropDuplicates' arbitrary pick)."""
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        docs.withColumn("fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def token_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), distinct_tokens(text_col).alias("toks"))


def _sig_array(num_hashes: int):
    """array<string> of the document's min-hashes, computed per-row:
    sig[j] = MIN over tokens t of md5(t || ':' || j). Pure higher-order
    functions over the already-materialized token array — whole-stage
    codegen, no explode, no shuffle. The md5 family is engine-portable
    and MIN over hex strings is exact, so the DuckDB oracle reproduces
    signatures bit-for-bit."""
    return F.array(
        [
            F.array_min(
                F.transform(
                    F.col("toks"),
                    lambda t: F.md5(F.concat(t, F.lit(":"), F.lit(str(j))).cast("binary")),
                )
            )
            for j in range(num_hashes)
        ]
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_hashes: int = NUM_HASHES
) -> DataFrame:
    """Per-document MinHash signature rows (doc, hash-index j, min md5).

    Row-oriented view of ``_sig_array`` (posexplode of the per-row
    signature) — kept for API parity with sketch-table consumers; the
    LSH path uses the array form directly and never shuffles here.
    Empty documents (no tokens) carry no signature rows.
    """
    toks = token_sets(docs, id_col, text_col).filter(F.size("toks") > 0)
    return toks.select(
        F.col(id_col), F.posexplode(_sig_array(num_hashes)).alias("j", "mh")
    )


def lsh_band_keys(
    docs_or_sigs: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = ROWS_PER_BAND,
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """(doc, band, band_key) rows; band key = ordered concatenation of
    the band's min-hashes. Computed entirely per-row (signature array ->
    slice per band -> one generator explode of #bands rows) — the first
    exchange in the whole LSH pipeline is the candidate self-join's."""
    n_bands = -(-num_hashes // rows_per_band)
    toks = token_sets(docs_or_sigs, id_col, text_col).filter(F.size("toks") > 0)
    sig = toks.select(F.col(id_col), _sig_array(num_hashes).alias("sig"))
    bands = F.array(
        [
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(
                    F.slice("sig", b * rows_per_band + 1, rows_per_band), "|"
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_hashes: int = NUM_HASHES,
    rows_per_band: int = ROWS_PER_BAND,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidate generation + exact Jaccard
    verification. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Band buckets with more than ``max_bucket_size`` members are dropped
    before the self-join (``None`` disables): a single hot key would
    otherwise generate size² candidates in one task. The count-filter is
    a window count over the same (band, band_key) partitioning the
    self-join shuffles on anyway — linear in bucket size, so the hot
    bucket costs one sequential scan, not a quadratic join."""
    bands = lsh_band_keys(docs, id_col, rows_per_band, text_col, num_hashes)
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "band_key")
        bands = (
            bands.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    # Pin the banded signatures and the token sets before their
    # self-join fan-out (r14 opt): each is consumed by TWO join sides,
    # and Spark plans self-joins as two full subtrees — unpinned, the
    # tokenize + 8-md5s-per-token signature stage ran twice and the
    # tokenizer twice more under the Jaccard joins (measured in the
    # r14 before-plan: the band subtree appears verbatim as both build
    # sides). Both frames are doc-scale (4 band rows / 1 token array
    # per doc), far cheaper to hold than to recompute at any scale.
    bands = bands.localCheckpoint()
    b1 = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b2 = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    cand = (
        b1.join(b2, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = token_sets(docs, id_col, text_col).localCheckpoint()
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def neardup_clusters(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components over a near-dup pair graph -> (doc_id,
    cluster_id) with cluster_id = min doc id in the component: the step
    a real dedup pipeline runs AFTER pair generation, since near-dup is
    not transitive but removal must be (A~B, B~C => keep one of
    {A,B,C}).

    Iterative min-label propagation, all DataFrame ops: each round
    pushes labels across edges and takes the per-node min; converges in
    O(graph diameter) rounds (near-dup components are dense, so
    typically 2-4). Each round is one shuffle join + one aggregate;
    ``localCheckpoint`` cuts lineage so round N's plan doesn't replay
    rounds 1..N-1. This is the simple 100 TB-safe formulation; the
    large-star/small-star variant halves rounds on high-diameter graphs
    but near-dup graphs are not that.
    """
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # Pin the symmetric edge list BEFORE the loop: `pairs` is usually a
    # lazy pair-generation pipeline (banded LSH join + Jaccard verify),
    # and without this every propagation round re-executed it from the
    # scan up — at sf1 that was ~12s of pair generation x rounds x the
    # two lineage uses, dominating the 167s query (round 6; the fix
    # cuts the CC consumers to pair-gen + rounds x one cheap join).
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_iterations):
        nbr = sym.join(labels, sym.src == labels.id).select(
            F.col("dst").alias("id"), F.col("label")
        )
        new_labels = (
            nbr.union(labels).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """16-bit SimHash signature per document.

    Per distinct token, take the first 4 hex chars of md5(token); bit i
    contributes +1/-1 according to nibble bit ((hex_digit >> (i%4)) & 1
    of hex char i//4). Signature bit i is set iff the sum over tokens is
    positive. Pure integer/string builtins — portable to the oracle.

    Computed entirely PER ROW with higher-order functions (the
    ``_sig_array`` MinHash pattern): one ``aggregate`` over the token
    array carries a `bits`-wide array of contribution sums, then the
    signature folds out of the sums — zero explodes, zero shuffles,
    whole-stage codegen. The previous explode(tokens) × explode(bits)
    formulation shuffled ~|tokens|×bits rows through two aggregations
    (~40M at sf0.1) and was the bench's hottest operator; the semantics
    and the DuckDB oracle are unchanged (integer sums are
    order-independent)."""
    # ceil(bits/4) hex chars must fit a signed 64-bit int after conv():
    # 16 chars can exceed it and the non-ANSI cast would silently NULL
    # every signature. 15 hex chars (60 bits) is the safe maximum.
    if not 1 <= bits <= 60:
        raise ValueError(f"simhash bits must be in [1, 60] (conv() of {-(-bits // 4)} hex chars overflows bigint): {bits}")
    # A digest per token is CPU-bound: spread a badly-split input
    # across cores before the hot map (measured 5.2s -> 1.5s at sf0.1,
    # where the fixture parquet is one unsplittable row group).
    toks = token_sets(ensure_parallelism(docs), id_col, text_col).filter(F.size("toks") > 0)
    # md5 once per token -> the first 4 hex chars as one 16-bit int
    # (HOF lambdas get no common-subexpression elimination, so per-bit
    # md5 calls would run `bits` digests per token). Bit i of the
    # oracle's scheme — nibble bit (i%4) of hex char (i//4), the
    # leftmost hex char being the HIGH nibble of the conv() value —
    # is bit 4*(3 - i//4) + (i%4) of that int.
    n_chars = -(-bits // 4)
    shifts = [4 * (n_chars - 1 - i // 4) + (i % 4) for i in range(bits)]
    contrib_terms = ", ".join(
        f"CASE WHEN (shiftright(v, {s}) & 1) = 1 THEN 1 ELSE -1 END" for s in shifts
    )
    sums = F.expr(
        f"""aggregate(
            transform(toks, t -> cast(conv(substring(md5(cast(t as binary)), 1, {n_chars}), 16, 10) as bigint)),
            array_repeat(cast(0 as bigint), {bits}),
            (acc, v) -> zip_with(acc, array({contrib_terms}), (a, c) -> a + cast(c as bigint))
        )"""
    )
    with_sums = toks.select(F.col(id_col), sums.alias("_sums"))
    sig = sum(
        (
            F.when(F.element_at("_sums", i + 1) > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(bits)
        ),
        start=F.lit(0).cast("long"),
    )
    return with_sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 16,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Pairs of documents whose SimHash signatures are within
    ``max_hamming`` bits (xor + bit_count).

    Candidate generation is the multi-index (pigeonhole) equi-join, not
    a cross join: the signature is cut into ``max_hamming + 1`` bit
    bands, so any pair within the hamming budget agrees exactly on at
    least one band — a self-join on (band index, band bits) finds every
    such pair with zero recall loss, then the exact hamming filter and a
    pair-distinct run on candidates only. Same hot-key guard as LSH:
    band buckets above ``max_bucket_size`` are dropped."""
    sh = simhash(docs, id_col, text_col, bits)
    n_bands = max_hamming + 1
    width = -(-bits // n_bands)  # ceil: last band may be narrower
    band_idx = F.explode(F.array([F.lit(i) for i in range(n_bands)])).alias("band")
    banded = sh.select(F.col(id_col), F.col("simhash"), band_idx).withColumn(
        "band_bits",
        F.expr(f"(simhash >> (band * {width})) & {(1 << width) - 1}"),
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "band_bits")
        banded = (
            banded.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    # Pin before the self-join fan-out (r14 opt): the two join sides
    # are planned as two full subtrees, so an unpinned banded frame
    # re-ran the whole per-token-md5 SimHash fold twice (the
    # minhash_lsh_pairs rationale; banded is n_bands small rows/doc).
    banded = banded.localCheckpoint()
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "band_bits"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "band_bits"
    )
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def incremental_lsh_pairs(
    old_bands: DataFrame,
    new_docs: DataFrame,
    all_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_hashes: int = NUM_HASHES,
    rows_per_band: int = ROWS_PER_BAND,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
    dedupe_redelivered: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup maintenance for continuous ingest: given the
    persisted band index of the corpus so far (``old_bands``, the
    output schema of ``lsh_band_keys``) and a batch of NEW documents,
    return ``(new_pairs, updated_bands)`` where ``new_pairs`` is every
    near-dup pair that involves at least one new document.

    ``dedupe_redelivered`` (default on) makes the operator safe under
    at-least-once delivery: a doc re-delivered in a later batch (CDC
    replay, source retry) is anti-joined away against the ids already
    in the band index BEFORE signature computation, so the index stays
    one-entry-per-(doc, band) and re-deliveries cost one anti-join
    probe instead of duplicate signatures, duplicate index rows, and
    re-emitted pairs. The probe reuses the index itself as the seen-id
    set (distinct over doc_id — one small aggregation on data already
    partitioned by the join key), so there is no second state table.

    This is the 100 TB shape for streaming dedup: per batch the work is
    |new| signature computations + a join of the new bands against the
    accumulated index — NOT a recompute over the corpus. The band index
    is the only state, it appends (no rewrite), and it lives in storage
    (partition by band for pruning), not executor memory. Candidate
    generation joins new-vs-all, so new-new and new-old pairs both
    surface; old-old pairs were already emitted by earlier batches —
    the pair stream over time equals the batch recompute (proven in
    tests/test_incremental_dedup.py).

    The hot-bucket cap applies to the UNION index, exactly as in the
    batch path: a boilerplate bucket fed by many batches is dropped
    once it exceeds the cap, bounding every future batch's join fan-out.
    """
    if dedupe_redelivered:
        seen_ids = old_bands.select(id_col).distinct()
        new_docs = new_docs.join(seen_ids, id_col, "left_anti")
    # Shared LAZILY (r15 opt): the new-doc signatures feed BOTH the
    # probe side of the candidate join and the updated index (whose
    # capped form is the other join side). r14 pinned this with an
    # EAGER localCheckpoint, which stacked one fixed-cost job per
    # replay batch on a query whose whole action is sub-second — the
    # driver measured incremental_minhash_multibatch 2.70 -> 7.03 s at
    # 32c (VERDICT r14 item 1). localCheckpoint(eager=False) keeps the
    # single-evaluation guarantee (the checkpoint RDD is persisted
    # MEMORY_AND_DISK at first compute; block-level locking dedupes the
    # two consumers) while deferring the final stage: measured with
    # tools/job_count_probe.py, AQE's toRdd still executes the plan's
    # upstream shuffle stages at construction, so lazy != zero jobs,
    # but multibatch drops 11 -> 5 construction jobs vs the eager form.
    # NOT persist(): a persisted plan is matched by Spark's CacheManager
    # across query re-invocations, so a repeated bench run would reuse
    # the previous run's materialization — cross-run caching the bench
    # must not measure. The lazy checkpoint creates a fresh RDD per
    # invocation: every run recomputes from the parquet inputs.
    new_bands = lsh_band_keys(
        new_docs, id_col, rows_per_band, text_col, num_hashes
    ).localCheckpoint(eager=False)
    updated = old_bands.unionByName(new_bands)
    capped = updated
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "band_key")
        capped = (
            updated.withColumn("_bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    nb = new_bands.select(F.col(id_col).alias("doc_new"), "band", "band_key")
    ab = capped.select(F.col(id_col).alias("doc_any"), "band", "band_key")
    cand = (
        nb.join(ab, ["band", "band_key"])
        .filter(F.col("doc_new") != F.col("doc_any"))
        .select(
            F.least("doc_new", "doc_any").alias("doc_a"),
            F.greatest("doc_new", "doc_any").alias("doc_b"),
        )
        .distinct()
    )
    # Shared lazily for the same reason as new_bands above: the Jaccard
    # verify consumes token sets on BOTH pair sides. The r14 EAGER
    # localCheckpoint additionally materialized the FULL seen corpus's
    # token arrays per replay batch regardless of need — roughly
    # input-sized state, the §5 hazard VERDICT r14 item 2 flagged. The
    # lazy checkpoint stores MEMORY_AND_DISK (spillable) and only what
    # the verify join actually scans, when it scans it.
    sets = token_sets(all_docs, id_col, text_col).localCheckpoint(eager=False)
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs, updated
