"""[EXT] ANN index lifecycle audits (round 8): measures what the
streaming index maintenance (``streaming/ann_ingest.py``) trades away —
a stream of arriving vectors is assigned to centroids that were fit
BEFORE those vectors existed, so the coarse partition drifts away from
the true density and recall decays until a re-fit.

``ann_index_staleness_audit`` is the drift twin of
``lsh_precision_recall_audit`` (plans/dedup_audit_ext.py): the quality
of production index parameters measured in-query, oracle-verified to
the bit. The reference engine has no index at all (Flink wiring only,
``Main.java``); this tier is the LLM-pipeline surface the brief makes
first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.operators import similarity as S
from flinkstreametl_spark.operators.clustering import kmeans_fit
from flinkstreametl_spark.plans.ml_ext import _kmeans_ctes
from flinkstreametl_spark.plans.registry import register
from flinkstreametl_spark.sources.parquet import ensure_parallelism, load_table

_K = 8  # coarse clusters (the suite's standing IVF shape)
_ITERS = 3  # Lloyd iterations — two fits per query; 3 keeps the sf1 oracle bounded
_QK = 10  # recall depth (matches the ivf_* audits)
_NQ = 5  # audit queries: vec_id < 5, the suite convention
_NPROBES = [1, 2, 4, 8]  # nprobe = 8 scans every cluster -> recall 1.0 anchor
# The arrival stream: every 5th vector "arrived after the index was
# fit". The stale fit sees only the base 80%; both indexes CONTAIN all
# vectors (the streaming path appends arrivals to the stale partition).
_ARRIVALS = "vec_id % 5 = 0"
_FP = "1099511627776.0"  # 2^40


def _staleness_oracle() -> str:
    """Two Lloyd chains (refit: unprefixed, full corpus; stale:
    prefix 's', base corpus only) + a full-corpus assignment against
    the stale centroids, then one probe/candidate/recall pipeline
    keyed by index_state."""
    fin_a, fin_c = f"a{_ITERS + 1}", f"c{_ITERS}"
    sfin_c = f"sc{_ITERS}"
    nps = ", ".join(str(n) for n in _NPROBES)
    return (
        _kmeans_ctes(_K, _ITERS)
        + ",\n"
        + _kmeans_ctes(_K, _ITERS, prefix="s", where=f"NOT ({_ARRIVALS})")
        + f""",
sfd AS (
    SELECT e.vec_id, c.cluster,
           SUM(CAST(floor((e.val - c.cval) * (e.val - c.cval) * {_FP}) AS BIGINT)) AS dist
    FROM e JOIN {sfin_c} c ON e.pos = c.pos GROUP BY e.vec_id, c.cluster
),
sfa AS (
    SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM sfd) t WHERE rn = 1
),
mem AS (
    SELECT 'refit' AS index_state, vec_id, cluster FROM {fin_a}
    UNION ALL
    SELECT 'stale' AS index_state, vec_id, cluster FROM sfa
),
cent AS (
    SELECT 'refit' AS index_state, cluster, pos, cval FROM {fin_c}
    UNION ALL
    SELECT 'stale' AS index_state, cluster, pos, cval FROM {sfin_c}
),
q AS (SELECT vec_id, pos, val FROM e WHERE vec_id < {_NQ}),
ps AS (
    SELECT c.index_state, q.vec_id AS query_id, c.cluster,
           SUM(CAST(floor(q.val * c.cval * {_FP}) AS BIGINT)) AS dot,
           SUM(CAST(floor(q.val * q.val * {_FP}) AS BIGINT)) AS qq,
           SUM(CAST(floor(c.cval * c.cval * {_FP}) AS BIGINT)) AS cc
    FROM q JOIN cent c ON q.pos = c.pos
    GROUP BY 1, 2, 3
),
prb AS (
    SELECT index_state, query_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY index_state, query_id
               ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qq AS DOUBLE) * CAST(cc AS DOUBLE)) DESC,
                        cluster) AS prb
    FROM ps
),
cscore AS (
    SELECT p.index_state, p.query_id, m.vec_id AS neighbor_id, p.prb,
           SUM(CAST(floor(q.val * e.val * {_FP}) AS BIGINT)) AS dot,
           SUM(CAST(floor(q.val * q.val * {_FP}) AS BIGINT)) AS qq,
           SUM(CAST(floor(e.val * e.val * {_FP}) AS BIGINT)) AS cc
    FROM prb p
    JOIN mem m ON m.index_state = p.index_state AND m.cluster = p.cluster
               AND m.vec_id <> p.query_id
    JOIN e ON e.vec_id = m.vec_id
    JOIN q ON q.vec_id = p.query_id AND q.pos = e.pos
    GROUP BY 1, 2, 3, 4
),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY CAST(SUM(CAST(floor(q.val * c.val * {_FP}) AS BIGINT)) AS DOUBLE)
                            / sqrt(CAST(SUM(CAST(floor(q.val * q.val * {_FP}) AS BIGINT)) AS DOUBLE)
                                   * CAST(SUM(CAST(floor(c.val * c.val * {_FP}) AS BIGINT)) AS DOUBLE)) DESC,
                            c.vec_id
               ) AS rk
        FROM q JOIN e c ON q.pos = c.pos AND q.vec_id <> c.vec_id
        GROUP BY q.vec_id, c.vec_id
    ) WHERE rk <= {_QK}
),
np AS (SELECT CAST(unnest([{nps}]) AS INTEGER) AS nprobe),
cand_np AS (
    SELECT c.index_state, np.nprobe, c.query_id, c.neighbor_id, c.dot, c.qq, c.cc
    FROM cscore c JOIN np ON c.prb <= np.nprobe
),
ivf_top AS (
    SELECT index_state, nprobe, query_id, neighbor_id FROM (
        SELECT index_state, nprobe, query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY index_state, nprobe, query_id
                   ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qq AS DOUBLE) * CAST(cc AS DOUBLE)) DESC,
                            neighbor_id) AS rk
        FROM cand_np
    ) WHERE rk <= {_QK}
),
hits AS (
    SELECT t.index_state, t.nprobe, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM ivf_top t
    WHERE EXISTS (SELECT 1 FROM exact x
                  WHERE x.query_id = t.query_id AND x.neighbor_id = t.neighbor_id)
    GROUP BY 1, 2
),
cands AS (
    SELECT index_state, nprobe, CAST(COUNT(*) AS BIGINT) AS n_candidates
    FROM cand_np GROUP BY 1, 2
)
SELECT c.index_state, c.nprobe, c.n_candidates,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / ({_NQ}.0 * {_QK}.0) AS recall_at_{_QK}
FROM cands c LEFT JOIN hits h ON h.index_state = c.index_state AND h.nprobe = c.nprobe
ORDER BY c.index_state, c.nprobe
"""
    )


@register(
    "ann_index_staleness_audit",
    tags=("ext", "llm", "similarity", "quality-curve", "iterative", "pandas", "streaming-twin"),
    oracle=_staleness_oracle(),
)
def ann_index_staleness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall drift of a STALE IVF index vs a re-fit one — the in-query
    audit of the trade the streaming maintenance path makes
    (streaming/ann_ingest.py: arrivals are assigned to pre-existing
    centroids; a re-fit only happens at the growth threshold).

    Setup: every 5th vector is an "arrival" that streamed in after the
    index was fit. The STALE quantizer is Lloyd-fit (k=8, 3 iterations,
    deterministic lowest-id init, 2^-40 fixed point — kmeans_fit) on
    the base 80% only; the REFIT quantizer is fit on everything. Both
    indexes CONTAIN all vectors (the stale one appended arrivals to its
    old partition — exactly what process_batch does). For the 5 audit
    queries, IVF top-10 under each index is compared against exact
    brute-force truth at nprobe = 1, 2, 4, 8; nprobe=8 scans every
    cluster and must read recall 1.0 for BOTH states — the anchor that
    pins the harness itself.

    Exactness: both Lloyd trajectories, the full-corpus stale
    assignment, probe ranking, candidate scoring, and the exact truth
    all use the repo's fixed-point folds, so the DuckDB oracle (two
    parameterized _kmeans_ctes chains) replays the audit bit-for-bit.

    Plan shape: the embedding scan is pinned once and fanned out to
    both fits, the membership union, and the exact truth; centroids are
    two k-row parameter tables (broadcast); candidates are scored once
    per index state with probe ranks attached, and every nprobe slice
    re-ranks the same localCheckpoint-pinned scored set. Driver traffic
    = k centroids per Lloyd iteration, twice."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).localCheckpoint()
    base = emb.filter(~F.expr(_ARRIVALS))
    stale_mat, assign_stale = kmeans_fit(base, k=_K, n_iters=_ITERS)
    refit_mat, assign_refit = kmeans_fit(emb, k=_K, n_iters=_ITERS)

    def cents_df(mat, state: str) -> DataFrame:
        return spark.createDataFrame(
            [(state, i, [float(x) for x in mat[i]]) for i in range(len(mat))],
            "index_state STRING, cluster LONG, centroid ARRAY<DOUBLE>",
        )

    cents = cents_df(stale_mat, "stale").unionByName(cents_df(refit_mat, "refit"))
    members = (
        assign_stale(emb).select(F.lit("stale").alias("index_state"), "vec_id", "embedding", "cluster")
    ).unionByName(
        assign_refit(emb).select(F.lit("refit").alias("index_state"), "vec_id", "embedding", "cluster")
    )
    q = emb.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probe_w = Window.partitionBy("index_state", "query_id").orderBy(
        F.col("c_score").desc(), "cluster"
    )
    ranks = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select(
            "index_state",
            "query_id",
            "q_emb",
            "cluster",
            S.cosine_col_fp(F.col("q_emb"), F.col("centroid")).alias("c_score"),
        )
        .withColumn("prb", F.row_number().over(probe_w))
        .select("index_state", "query_id", "q_emb", "cluster", "prb")
    )
    cscore = (
        ranks.join(
            members.select(
                "index_state", F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_emb"), "cluster",
            ),
            ["index_state", "cluster"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "index_state",
            "query_id",
            "neighbor_id",
            "prb",
            S.cosine_col_fp(F.col("q_emb"), F.col("c_emb")).alias("cosine"),
        )
        .localCheckpoint()  # scored once; every nprobe slice reuses it
    )
    exact = S.knn_fast(emb, n_queries=_NQ, k=_QK).select("query_id", "neighbor_id")
    np_df = spark.range(1).select(
        F.explode(F.array(*[F.lit(n) for n in _NPROBES])).alias("nprobe")
    )
    cand_np = cscore.join(F.broadcast(np_df), F.col("prb") <= F.col("nprobe"))
    w = Window.partitionBy("index_state", "nprobe", "query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    ivf_top = cand_np.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= _QK)
    hits = (
        ivf_top.join(exact, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("index_state", "nprobe")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    cands = cand_np.groupBy("index_state", "nprobe").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    return (
        cands.join(hits, ["index_state", "nprobe"], "left")
        .select(
            "index_state",
            "nprobe",
            "n_candidates",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)).cast("double") / F.lit(float(_NQ * _QK))).alias(
                f"recall_at_{_QK}"
            ),
        )
        .orderBy("index_state", "nprobe")
    )


# Matryoshka truncation audit: production multi-resolution retrieval
# serves the FIRST d dimensions of each embedding (coarse search on a
# prefix, exact rerank on the full width). The audit measures what each
# prefix width costs in recall against the full-width truth.
_MRL_DIMS = [8, 16, 32, 64]  # 64 = the fixture embedding width -> recall 1.0 anchor


def _mrl_oracle() -> str:
    dims = ", ".join(str(d) for d in _MRL_DIMS)
    return f"""
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                  CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
q AS (SELECT vec_id, pos, val FROM e WHERE vec_id < {_NQ}),
dims AS (SELECT CAST(unnest([{dims}]) AS BIGINT) AS dim),
sc AS (
    SELECT d.dim, q.vec_id AS query_id, c.vec_id AS neighbor_id,
           SUM(CAST(floor(q.val * c.val * {_FP}) AS BIGINT)) AS dot,
           SUM(CAST(floor(q.val * q.val * {_FP}) AS BIGINT)) AS qq,
           SUM(CAST(floor(c.val * c.val * {_FP}) AS BIGINT)) AS cc
    FROM q JOIN e c ON q.pos = c.pos AND q.vec_id <> c.vec_id
    JOIN dims d ON q.pos < d.dim
    GROUP BY 1, 2, 3
),
topd AS (
    SELECT dim, query_id, neighbor_id FROM (
        SELECT dim, query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY dim, query_id
                   ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qq AS DOUBLE) * CAST(cc AS DOUBLE)) DESC,
                            neighbor_id) AS rk
        FROM sc
    ) t WHERE rk <= {_QK}
),
full_top AS (SELECT query_id, neighbor_id FROM topd WHERE dim = {_MRL_DIMS[-1]}),
hits AS (
    SELECT t.dim, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM topd t
    WHERE EXISTS (SELECT 1 FROM full_top x
                  WHERE x.query_id = t.query_id AND x.neighbor_id = t.neighbor_id)
    GROUP BY t.dim
)
SELECT d.dim, COALESCE(h.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / ({_NQ}.0 * {_QK}.0) AS recall_at_{_QK}
FROM dims d LEFT JOIN hits h ON h.dim = d.dim
ORDER BY d.dim
"""


@register(
    "mrl_truncation_recall",
    tags=("ext", "llm", "similarity", "quality-curve"),
    oracle=_mrl_oracle(),
)
def mrl_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (prefix-truncation) recall curve: brute-force top-10
    by fixed-point cosine over the first d in {8, 16, 32, 64}
    dimensions of each embedding, scored against the full-width (d=64)
    top-10 as truth. The d=64 row must read recall 1.0 — a prefix as
    wide as the vector IS the exact search, anchoring the harness.
    This is the audit behind a multi-resolution ANN deployment
    (coarse-search a narrow prefix, rerank the survivors full-width):
    it prices each prefix width in recall before committing index
    storage to it.

    Plan shape: ONE pass over the candidates — the 5 query vectors
    broadcast, every (query, candidate) pair scores all four prefix
    widths in-row (slice + the cosine_col_fp fixed-point fold, pure
    JVM), and the stacked (dim, pair, score) frame feeds a per-
    (dim, query) top-k window. Nothing rescans per width; nothing
    leaves fixed point, so the DuckDB oracle (prefix filter on the
    exploded positions) matches bit-for-bit."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).localCheckpoint()
    q = emb.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    stacked = pairs.select(
        "query_id",
        "neighbor_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("dim"),
                        S.cosine_col_fp(
                            F.slice(F.col("q_emb"), 1, d), F.slice(F.col("c_emb"), 1, d)
                        ).alias("cosine"),
                    )
                    for d in _MRL_DIMS
                ]
            )
        ).alias("dc"),
    ).select("query_id", "neighbor_id", F.col("dc.dim").alias("dim"), F.col("dc.cosine").alias("cosine"))
    w = Window.partitionBy("dim", "query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    topd = (
        stacked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _QK)
        .select("dim", "query_id", "neighbor_id")
        .localCheckpoint()  # truth and every width slice reuse it
    )
    full_top = topd.filter(F.col("dim") == _MRL_DIMS[-1]).select("query_id", "neighbor_id")
    hits = (
        topd.join(full_top, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("dim")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    dims_df = spark.range(1).select(
        F.explode(F.array(*[F.lit(d).cast("long") for d in _MRL_DIMS])).alias("dim")
    )
    return (
        dims_df.join(hits, "dim", "left")
        .select(
            "dim",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)).cast("double") / F.lit(float(_NQ * _QK))).alias(
                f"recall_at_{_QK}"
            ),
        )
        .orderBy("dim")
    )
