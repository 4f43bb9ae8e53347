"""[EXT] Graph analytics over the co-purchase graph: degree-oriented
triangle counting with global transitivity, plus market-basket
association rules (support / confidence / lift) at the pair grain.

The near-dup stack already does one graph computation — connected
components over the duplicate-pair edge list (operators/dedup.py) — and
TextRank runs PageRank over the token graph (plans/corpus_ext.py).
This module adds the third classic distributed-graph kernel, triangle
counting, on a graph the warehouse actually has: parts are nodes,
"appeared in the same order" is an edge (the market-basket projection
of the orders/lineitem star).

Why degree orientation matters at 100 TB: the naive wedge enumeration
(join edges on the shared endpoint) is sum(deg^2) — a single celebrity
node with degree 10^6 generates 10^12 wedges. Directing every edge
from its lower-(degree, id) endpoint to the higher one and enumerating
wedges only from OUT-neighbors bounds the work by O(E^1.5) total
(every node's out-degree is at most sqrt(2E)), which is the standard
MapReduce/GraphX triangle algorithm. Each undirected triangle then
appears exactly once: its three nodes have a unique (degree, id)
ordering a < b < c, and the enumeration finds it only as the wedge
(a->b, a->c) closed by the edge b->c.

Exactness: node ids, degrees, and counts are all integers; the single
double division (transitivity = 3*triangles / wedge_total) happens
once, on exact operands, in the same order as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.operators import graph as G
from flinkstreametl_spark.plans.registry import register
from flinkstreametl_spark.sources.parquet import load_table

# Linearizes the (degree, node) total order into one BIGINT so the
# orientation and the wedge ordering compare a single column. Valid
# while node ids < 10^7 (TPC-H partkeys at any test SF; at larger
# scales widen the multiplier or compare a (deg, node) struct — both
# engines order structs lexicographically).
_ORD = 10_000_000

# MATERIALIZED pins each stage to one evaluation (round 8): DuckDB 1.0
# re-inlines multi-referenced CTEs (oriented feeds adj/tri/estats, adj
# is probed twice in tri). sf1: 230s -> 190s uncontended; the rest is
# the genuine 12M-edge list_intersect work.
_TRI_ORACLE = f"""
WITH pairs AS MATERIALIZED (
    SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                    greatest(a.l_partkey, b.l_partkey) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS MATERIALIZED (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
    FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
    GROUP BY node
),
oriented AS MATERIALIZED (
    SELECT CASE WHEN du.deg*{_ORD} + u < dv.deg*{_ORD} + v THEN u ELSE v END AS src,
           CASE WHEN du.deg*{_ORD} + u < dv.deg*{_ORD} + v THEN v ELSE u END AS dst,
           CASE WHEN du.deg*{_ORD} + u < dv.deg*{_ORD} + v
                THEN dv.deg*{_ORD} + v ELSE du.deg*{_ORD} + u END AS ord_dst
    FROM pairs JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v
),
tri AS (
    -- Degree-oriented path join (round 8, replacing the adjacency
    -- list_intersect form): an oriented wedge u->v, u->w with
    -- ord(v) < ord(w) closes iff the oriented edge v->w exists (the
    -- orientation makes u the ord-least node and guarantees the
    -- closing edge points v->w), so each triangle is counted exactly
    -- once. Oriented wedges are Sum C(outdeg, 2) <= O(E^1.5) like the
    -- intersect form, but the intermediate rows are three BIGINTs
    -- instead of two full adjacency LISTS per edge — the wide rows
    -- were what thrashed memory when DuckDB shares the box with the
    -- Spark JVM (measured sf1: 190-580s intersect (memory-dependent)
    -- -> 77s path join, identical count).
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM oriented e1
    JOIN oriented e2 ON e2.src = e1.src AND e2.ord_dst > e1.ord_dst
    JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
gstats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges_total
    FROM deg
),
estats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM oriented
)
SELECT n_nodes, n_edges, n_wedges_total, n_triangles,
       CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges_total AS DOUBLE) AS transitivity
FROM gstats, estats, tri
"""


@register("copurchase_triangle_stats", tags=("ext", "graph"), oracle=_TRI_ORACLE)
def copurchase_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph: node/edge counts,
    total wedges (sum C(deg,2)), exact triangle count, and the global
    clustering coefficient (transitivity = 3*triangles / wedges).
    Kernel: operators/graph.py ``triangle_stats`` — reusable over ANY
    canonical undirected edge list (near-dup pairs, transition graphs);
    this query supplies the co-purchase edges.

    Plan shape (the 100 TB story is in the module docstring):
    1. Edge list: lineitem self-join on l_orderkey — per-order pair
       enumeration, quadratic only in ORDER SIZE (bounded, ~4 items),
       then one distinct.
    2. Degrees: one hash aggregate over edge endpoints; the degree
       table is |V|-sized (parts, not lineitems) and is BROADCAST onto
       the edge list to orient it — the edge stream never shuffles for
       the orientation step.
    3. Wedges: oriented self-join on src. Out-degrees are capped at
       sqrt(2E) by the orientation, so the join output is O(E^1.5)
       worst-case, not deg^2-skewed.
    4. Closure: LEFT SEMI join of wedges against the oriented edge
       list — the edge list is the SMALL side and broadcasts, so the
       wedge stream (the big intermediate) is never exchanged.
    ``localCheckpoint`` pins the oriented edge list so the three
    consumers (edge count, wedge enumeration, closure probe) reuse one
    materialization instead of replaying the self-join (same pattern
    as the connected-components loop, operators/dedup.py)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    return G.triangle_stats(pairs, ord_base=_ORD)


_LIFT_ORACLE = """
WITH baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_total FROM baskets
),
item_n AS (
    SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS n_item FROM baskets GROUP BY 1
),
pair_n AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS n_pair
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT u, v, n_pair, ia.n_item AS n_u, ib.n_item AS n_v, n_total,
       CAST(n_pair * n_total AS DOUBLE) / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift,
       CAST(n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence_u_to_v
FROM pair_n
JOIN item_n ia ON ia.item = u
JOIN item_n ib ON ib.item = v
CROSS JOIN n_orders
ORDER BY n_pair DESC, u, v
LIMIT 20
"""


@register("basket_lift_top_pairs", tags=("ext", "graph", "basket"), oracle=_LIFT_ORACLE)
def basket_lift_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over the same co-purchase
    structure the triangle census uses, kept at the PAIR grain: for the
    20 most co-purchased part pairs, support counts, confidence
    P(v | u), and lift (observed co-rate vs independence).

    Exactness: lift = (n_pair * n_total) / (n_u * n_v) — both products
    are computed in BIGINT (exact) and cast to double for ONE division,
    so the doubles are bit-identical across engines and even the
    ORDER BY needs no float: top-20 ranks by (n_pair DESC, u, v), a
    total integer order.

    Plan: per-order pair enumeration (quadratic in basket size only),
    one hash aggregate per grain (pair / item / total), item counts
    broadcast onto the pair table, top-20 via TakeOrdered — no global
    sort materialization."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    n_total_df = baskets.agg(F.count_distinct("l_orderkey").cast("long").alias("n_total"))
    item_n = baskets.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    ia = item_n.select(F.col("item").alias("u"), F.col("n_item").alias("n_u"))
    ib = item_n.select(F.col("item").alias("v"), F.col("n_item").alias("n_v"))
    joined = (
        pair_n.join(F.broadcast(ia), "u")
        .join(F.broadcast(ib), "v")
        .crossJoin(F.broadcast(n_total_df))
    )
    return (
        joined.select(
            "u",
            "v",
            "n_pair",
            "n_u",
            "n_v",
            "n_total",
            (
                (F.col("n_pair") * F.col("n_total")).cast("double")
                / (F.col("n_u") * F.col("n_v")).cast("double")
            ).alias("lift"),
            (F.col("n_pair").cast("double") / F.col("n_u").cast("double")).alias(
                "confidence_u_to_v"
            ),
        )
        .orderBy(F.col("n_pair").desc(), "u", "v")
        .limit(20)
    )


_PR_ITER = 6
_PR_TOPK = 20
_PR_BASE = G.PR_SCALE * (G.PR_DAMP_DEN - G.PR_DAMP_NUM) // G.PR_DAMP_DEN


def _pagerank_oracle() -> str:
    """Unrolled power iteration: r0..r{N} as a CTE chain (DuckDB has no
    keyed iterate-to-fixpoint; a recursive CTE can't re-aggregate per
    step, so the fixed iteration count is spelled out). `pairs`/`adj`
    are MATERIALIZED — each rank step scans adj, and without the hint
    DuckDB may inline the per-order self-join into all N steps."""
    steps = []
    for i in range(1, _PR_ITER + 1):
        steps.append(
            f"r{i} AS (\n"
            f"    SELECT a.dst AS node,\n"
            f"           {_PR_BASE} + ({G.PR_DAMP_NUM} * SUM(r.r // a.deg)) // {G.PR_DAMP_DEN} AS r\n"
            f"    FROM adj a JOIN r{i - 1} r ON r.node = a.src\n"
            f"    GROUP BY a.dst\n"
            f")"
        )
    chain = ",\n".join(steps)
    return f"""
WITH pairs AS MATERIALIZED (
    SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                    greatest(a.l_partkey, b.l_partkey) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (
    SELECT u AS src, v AS dst FROM pairs
    UNION ALL
    SELECT v AS src, u AS dst FROM pairs
),
deg AS (
    SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY src
),
adj AS MATERIALIZED (
    SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d USING (src)
),
r0 AS (
    SELECT src AS node, CAST({G.PR_SCALE} AS BIGINT) AS r FROM deg
),
{chain}
SELECT node AS part, CAST(r AS BIGINT) AS rank_fp, rk FROM (
    SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS rk
    FROM r{_PR_ITER}
) t
WHERE rk <= {_PR_TOPK}
"""


@register("pagerank_copurchase", tags=("ext", "graph", "iterative", "bench"), oracle=_pagerank_oracle())
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph — the
    link-analysis quality signal a training-data pipeline computes over
    its document/web graph, exercised here on the graph the warehouse
    actually has (same edge list as the triangle census).

    Kernel: operators/graph.py ``pagerank`` — integer fixed-point
    power iteration (6 rounds, damping 85/100) over a width-bounded
    GROUPED adjacency (per-node neighbor arrays, hash-segmented past
    8192 entries), so each round's join moves |V|-scale rows and the
    contribution stream compacts via partial aggregation before its
    one exchange; the symmetrized edge list and grouped adjacency are
    pinned once. The DuckDB oracle replays the SAME six integer
    updates as an unrolled CTE chain, so every intermediate mass —
    not just the ranking — is hash-verified cross-engine.

    Top-k shape: TakeOrdered on (rank DESC, node) pulls 20 rows; the
    row_number window then runs on the 20-row frame, never on |V|."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    ranks = G.pagerank(pairs, iterations=_PR_ITER)
    top = ranks.orderBy(F.col("rank_fp").desc(), "node").limit(_PR_TOPK)
    w = Window.orderBy(F.col("rank_fp").desc(), "node")
    return top.select(
        F.col("node").alias("part"),
        "rank_fp",
        F.row_number().over(w).cast("long").alias("rk"),
    )
