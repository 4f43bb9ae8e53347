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
  = hamming distance <= d via xor/bit_count on the signature — a
  self-join on the (coarse) signature prefix would be the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.operators.text import distinct_tokens, fingerprint

# 8 hashes in 4 bands of 2: at the 0.6 Jaccard threshold the candidate
# probability is 1-(1-j²)⁴ ≈ 0.86 (vs 0.59 for 2 bands of 4) — recall
# matters more than band selectivity because candidates are verified
# with exact Jaccard anyway.
NUM_HASHES = 8
ROWS_PER_BAND = 2  # -> 4 bands


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


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_hashes: int = NUM_HASHES
) -> DataFrame:
    """Per-document MinHash signature rows (doc, hash-index j, min md5).

    minhash_j(D) = MIN over shingles s of md5(s || ':' || j): the md5
    family is engine-portable and uniform; MIN over strings is exact.
    One explode + one groupBy(doc, j) — fully distributed, no driver
    state.
    """
    toks = token_sets(docs, id_col, text_col)
    exploded = toks.select(F.col(id_col), F.explode("toks").alias("tok"))
    seeds = F.array([F.lit(j) for j in range(num_hashes)])
    return (
        exploded.select(F.col(id_col), "tok", F.explode(seeds).alias("j"))
        .groupBy(id_col, "j")
        .agg(F.min(F.md5(F.concat(F.col("tok"), F.lit(":"), F.col("j").cast("string")).cast("binary"))).alias("mh"))
    )


def lsh_band_keys(signatures: DataFrame, id_col: str = "doc_id", rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Group signature rows into LSH bands; band key = ordered
    concatenation of the band's min-hashes (deterministic via
    array_sort over (j, mh) structs — collect_list order is not)."""
    banded = signatures.withColumn("band", F.floor(F.col("j") / F.lit(rows_per_band)).cast("int"))
    return banded.groupBy(id_col, "band").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("j", "mh"))), lambda x: x["mh"]), "|"
        ).alias("band_key")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_hashes: int = NUM_HASHES,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidate generation + exact Jaccard
    verification. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    bands = lsh_band_keys(minhash_signatures(docs, id_col, text_col, num_hashes), id_col, rows_per_band)
    b1 = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b2 = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    cand = (
        b1.join(b2, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = token_sets(docs, id_col, text_col)
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
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
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
    """
    toks = token_sets(docs, id_col, text_col).select(F.col(id_col), F.explode("toks").alias("tok"))
    h = F.md5(F.col("tok").cast("binary"))
    bit_idx = F.explode(F.array([F.lit(i) for i in range(bits)])).alias("i")
    with_bits = toks.select(F.col(id_col), h.alias("h"), bit_idx)
    # Same expression text as the DuckDB oracle (instr/substring/bit ops).
    contrib = F.expr(
        "CASE WHEN ((instr('0123456789abcdef', substring(h, 1 + CAST(floor(i / 4) AS INT), 1)) - 1)"
        " & shiftleft(1, CAST(i % 4 AS INT))) > 0 THEN 1 ELSE -1 END"
    )
    sums = with_bits.select(F.col(id_col), F.col("i"), contrib.alias("c")).groupBy(id_col, "i").agg(F.sum("c").alias("s"))
    return sums.groupBy(id_col).agg(
        F.sum(
            F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)) ELSE CAST(0 AS BIGINT) END")
        ).alias("simhash")
    )


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Pairs of documents whose SimHash signatures are within
    `max_hamming` bits (xor + bit_count)."""
    sh = simhash(docs, id_col, text_col)
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"))
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
