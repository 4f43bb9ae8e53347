"""[EXT] Reusable graph kernels: degree orientation and triangle
counting over an arbitrary undirected edge list.

plans/graph_ext.py applies these to the part co-purchase graph; the
operators themselves take any ``(u, v)`` DataFrame (near-dup pair
streams, session transition graphs, citation edges). Scale rationale —
why orientation bounds wedge work at O(E^1.5) — is documented there
and in docs/SCALE.md.

Contract: the input edge list is UNDIRECTED and canonical — one row
per edge with ``u < v``, no self-loops, no duplicates (callers with
raw pairs: ``select(least, greatest).distinct()``). Node ids must fit
in ``[0, ord_base)`` so the (degree, id) total order linearizes into
one BIGINT; pass a larger base (or pre-map ids) for wider id spaces.
``degree_orient`` enforces the id range at runtime (loud
``assert_true`` failure instead of silent corruption).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ORD_BASE = 10_000_000

PR_SCALE = 10**9
"""Fixed-point scale for PageRank mass: rank 1.0 == PR_SCALE. Chosen
so the damped in-sum stays far inside BIGINT at any plausible node
count (total mass = |V| * PR_SCALE; 85 * 2e14 at an sf1-sized graph,
ceiling ~10^8 nodes before the 9.2e18 BIGINT limit — widen to a
smaller scale or decimal past that)."""

PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
"""Damping factor 0.85 as an exact integer ratio — the float constant
would make every iteration's rounding engine-dependent."""


def degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from a canonical undirected edge list."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def degree_orient(edges: DataFrame, deg: DataFrame, *, ord_base: int = DEFAULT_ORD_BASE) -> DataFrame:
    """Direct each edge from its lower-(degree, id) endpoint to the
    higher one: (src, dst, ord_dst). The degree table broadcasts — the
    edge stream is never shuffled for orientation.

    The ``node id in [0, ord_base)`` contract is ENFORCED, not just
    documented: an out-of-range id (e.g. hash-derived) would silently
    corrupt the (deg, id) linearization and thus every downstream
    triangle count, so each edge row passes through a JVM-side
    ``assert_true`` that raises loudly instead. The guard is a per-row
    comparison inside the scan filter — no extra exchange, no action."""
    in_range = (
        (F.col("u") >= 0) & (F.col("u") < ord_base) & (F.col("v") >= 0) & (F.col("v") < ord_base)
    )
    edges = edges.where(
        F.assert_true(
            in_range,
            F.concat(
                F.lit(f"degree_orient: node id outside [0, {ord_base}); "
                      "pass a larger ord_base or pre-map ids. edge=("),
                F.col("u").cast("string"), F.lit(","), F.col("v").cast("string"), F.lit(")"),
            ),
        ).isNull()
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    ord_u = F.col("du.deg") * ord_base + F.col("u")
    ord_v = F.col("dv.deg") * ord_base + F.col("v")
    u_first = ord_u < ord_v
    # No broadcast hint: the degree table is |V|-sized, not
    # parameter-sized — auto-broadcast picks it up while it fits (it
    # does at every test SF) and falls back to a shuffle join when a
    # 100 TB node set doesn't. Forcing the hint made the fit a promise.
    return (
        edges.join(du, F.col("du.node") == F.col("u"))
        .join(dv, F.col("dv.node") == F.col("v"))
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, ord_v).otherwise(ord_u).alias("ord_dst"),
        )
    )


def triangle_stats(edges: DataFrame, *, ord_base: int = DEFAULT_ORD_BASE) -> DataFrame:
    """One-row census of a canonical undirected edge list: n_nodes,
    n_edges, n_wedges_total (sum C(deg,2)), exact n_triangles, and
    transitivity = 3*triangles / wedges.

    Wedges enumerate only out-neighbor pairs of the degree-oriented
    list (out-degree <= sqrt(2E)); the closure probe is a LEFT SEMI
    join of the wedge stream against the edge list with the join
    strategy left to Catalyst/AQE: while the edge list fits the
    broadcast threshold the wedge stream is never exchanged, and past
    that the probe degrades to a partitionable, spillable shuffle semi
    join — the standard MapReduce triangle formulation. (Round 6
    removed the forced broadcast(edges): an E-sized broadcast is a
    hard executor-memory ceiling a 100 TB edge list blows through,
    which is exactly the skew-vs-salting lesson in docs/SCALE.md —
    hint only parameter-sized sides.) The oriented list is
    localCheckpoint-pinned for its three consumers."""
    deg = degrees(edges).localCheckpoint()
    oriented = degree_orient(edges, deg, ord_base=ord_base).localCheckpoint()

    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.ord_dst") < F.col("o2.ord_dst")),
    ).select(F.col("o1.dst").alias("wa"), F.col("o2.dst").alias("wb"))
    closer = oriented.select(F.col("src").alias("wa"), F.col("dst").alias("wb"))
    tri = wedges.join(closer, ["wa", "wb"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )

    gstats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges_total"),
    )
    estats = oriented.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        gstats.crossJoin(estats)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges_total",
            "n_triangles",
            (
                F.lit(3) * F.col("n_triangles").cast("double") / F.col("n_wedges_total").cast("double")
            ).alias("transitivity"),
        )
    )


def pagerank(
    edges: DataFrame, *, iterations: int = 6, scale: int = PR_SCALE, max_seg_width: int = 8192
) -> DataFrame:
    """Power-iteration PageRank over a canonical undirected edge list:
    returns (node, rank_fp) with rank_fp an exact BIGINT fixed-point
    mass (1.0 == ``scale``).

    The classic GraphX/Pregel kernel re-expressed as DataFrame joins,
    with the adjacency GROUPED into per-node neighbor arrays so each
    iteration's join touches |V|-scale ROWS, not |E|: iteration i joins
    the grouped adjacency with the current ranks on src, explodes each
    node's neighbor array into (dst, rank div deg) contributions
    WITHOUT any exchange (explode is a per-partition generator), and
    aggregates by dst — partial aggregation compacts the E-sized
    contribution stream back to at most partitions x |V| rows before
    the one real exchange. vs the flat (src, dst, deg) formulation
    this removes the per-iteration sort of E rows inside the
    sort-merge join (measured 25-30% faster at sf0.1, bit-identical
    output — the arithmetic never changes, only the physical grouping).

    Row width is BOUNDED, not best-effort: a node's neighbors are
    split into ``ceil(deg / max_seg_width)`` hash-assigned segments,
    so a 10^8-degree hub becomes ~12k rows of <= 8192 entries instead
    of one 800 MB array row that no executor survives. Cold nodes
    (deg <= max_seg_width, i.e. almost all of any real graph) get
    exactly one segment — the cap costs nothing until a row would
    otherwise be dangerous. Per-segment contribution sums are partial
    sums of the same integer terms, so segmentation cannot change the
    result.

    The grouped adjacency is built ONCE and localCheckpoint-pinned:
    without the pin every iteration would replay the edge-list
    derivation from the scan up (the lazy-reuse-in-loops trap that
    cost 6x on the connected-components loop — see neardup_clusters).
    Measured caveat: localCheckpoint does NOT carry outputPartitioning
    into the planner, so the pinned adjacency is re-exchanged each
    iteration (now as |V|-scale grouped rows); on a cluster even that
    goes away by writing the grouped adjacency BUCKETED on src (the
    sources/bucketed.py path) — iterations then shuffle only the
    |V|-sized rank frame, which is the GraphX partition-reuse story in
    DataFrame terms. Per-iteration rank frames form a LINEAR lazy
    chain (each consumed exactly once by the next), so they need no
    pinning.

    Exactness, the reason this is driver-verifiable cross-engine: all
    arithmetic is integer. Each node's outgoing contribution is
    ``rank_fp div deg`` (floor; operands positive so Spark's
    truncating ``div`` == DuckDB's flooring ``//``), the damped update
    is ``base + (85 * sum) div 100`` with ``base = (15 * scale) div
    100``, and integer sums are order-independent — no float
    accumulation anywhere, so N iterations stay bit-identical on both
    engines. Undirected edges are symmetrized, so every graph node has
    out-degree >= 1: no dangling-mass redistribution term is needed
    and the node set is closed under the update.
    """
    # The EDGE list is pinned (r14 opt — formerly the 2x-wider sym was):
    # it is the caller's expensive derivation (for pagerank_copurchase
    # the per-order pair generation + distinct), and every downstream
    # consumer reads it through the narrow symmetrizing union, so
    # pinning the half-size frame materializes half the bytes for the
    # same recompute protection.
    edges = edges.select("u", "v").localCheckpoint()
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    # Grouped adjacency: hash-segmented neighbor arrays, <= max_seg_width
    # entries per row. Degrees come from a window count over the SAME
    # src-hash exchange the grouping needs anyway (r14 opt — the
    # former separate deg aggregate + src-keyed join cost one extra
    # pinned frame and one extra exchange+sort per build); groupBy
    # (src, seg) after the window needs no further exchange and
    # `first(deg)` is constant within a group.
    wdeg = Window.partitionBy("src")
    n_seg = F.greatest(F.lit(1), F.ceil(F.col("deg") / F.lit(max_seg_width)))
    adj = (
        sym.withColumn("deg", F.count(F.lit(1)).over(wdeg))
        .withColumn("seg", F.pmod(F.hash("dst"), n_seg))
        .groupBy("src", "seg")
        .agg(F.collect_list("dst").alias("nbrs"), F.first("deg").alias("deg"))
        .select("src", "nbrs", "deg")
        .localCheckpoint()
    )
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    # Initial ranks: every node once (each src holds >= 1 adjacency
    # segment, so distinct src over the pinned adj is the node set the
    # former deg frame supplied).
    ranks = adj.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(scale).cast("long").alias("r")
    )
    for _ in range(iterations):
        contrib = adj.join(ranks, adj["src"] == ranks["node"]).select(
            F.explode("nbrs").alias("dst"), F.expr("r div deg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                F.expr(
                    f"CAST({base} AS BIGINT) + ({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}"
                ).alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
        )
    return ranks.select("node", F.col("r").alias("rank_fp"))


def pagerank_weighted(
    edges_w: DataFrame, *, iterations: int = 6, scale: int = PR_SCALE, max_seg_width: int = 8192
) -> DataFrame:
    """Weighted power-iteration PageRank over a canonical undirected
    WEIGHTED edge list (u, v, w > 0): returns (node, rank_fp). Each
    node distributes rank in proportion to edge weight — contribution
    to neighbor d is ``(rank * w(s,d)) div sw(s)`` with sw(s) the
    node's total incident weight; the damped update and every other
    property (integer-exact, grouped/segmented adjacency, pinned loop
    inputs) mirror the unweighted kernel above, and with all weights
    equal the two kernels agree except for per-edge division rounding.

    int64 headroom: the widest product is rank·w ~ |V|·scale·w_max —
    at PR_SCALE 10^9 that holds to |V|·w_max ~ 9×10^9 (e.g. 10^8 nodes
    with weights to ~90); past that drop ``scale`` a decade or widen to
    DECIMAL(38,0), shape unchanged."""
    sym = (
        edges_w.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionAll(edges_w.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))
        .localCheckpoint()
    )
    stats = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("ndeg"), F.sum("w").alias("sw"))
        .localCheckpoint()
    )
    n_seg = F.greatest(F.lit(1), F.ceil(F.col("ndeg") / F.lit(max_seg_width)))
    adj = (
        sym.join(stats, "src")
        .withColumn("seg", F.pmod(F.hash("dst"), n_seg))
        .groupBy("src", "seg")
        .agg(
            F.collect_list(F.struct("dst", "w")).alias("nbrs"),
            F.first("sw").alias("sw"),
        )
        .select("src", "nbrs", "sw")
        .localCheckpoint()
    )
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    ranks = stats.select(F.col("src").alias("node"), F.lit(scale).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = adj.join(ranks, adj["src"] == ranks["node"]).select(
            F.explode("nbrs").alias("nb"), F.col("r"), F.col("sw")
        ).select(
            F.col("nb.dst").alias("dst"), F.expr("(r * nb.w) div sw").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                F.expr(
                    f"CAST({base} AS BIGINT) + ({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}"
                ).alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
        )
    return ranks.select("node", F.col("r").alias("rank_fp"))


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    iterations: int = 6,
    scale: int = PR_SCALE,
    max_seg_width: int = 8192,
) -> DataFrame:
    """Personalized PageRank: the ``pagerank`` kernel with the teleport
    term restricted to ``seeds`` (a (node) frame) — random walks
    restart only at the seed set, so rank measures proximity TO the
    seeds instead of global centrality (the recommendation/expansion
    primitive: "parts co-purchased near these parts").

    Arithmetic is the same all-integer update; the only change is
    ``base`` becoming ``base * is_seed``: non-seeds receive no teleport
    mass and decay unless the walk reaches them. Seeds are broadcast
    (a parameter-sized frame by contract). Same grouped, width-bounded,
    pinned adjacency as ``pagerank`` — see that docstring for the
    scale analysis; per-iteration cost is identical.
    """
    sym = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    n_seg = F.greatest(F.lit(1), F.ceil(F.col("deg") / F.lit(max_seg_width)))
    adj = (
        sym.join(deg, "src")
        .withColumn("seg", F.pmod(F.hash("dst"), n_seg))
        .groupBy("src", "seg")
        .agg(F.collect_list("dst").alias("nbrs"), F.first("deg").alias("deg"))
        .select("src", "nbrs", "deg")
        .localCheckpoint()
    )
    base = scale * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    seed_marks = seeds.select(F.col("node").alias("dst"), F.lit(1).alias("is_seed"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(scale).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = adj.join(ranks, adj["src"] == ranks["node"]).select(
            F.explode("nbrs").alias("dst"), F.expr("r div deg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .join(F.broadcast(seed_marks), "dst", "left")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({base} AS BIGINT) * coalesce(is_seed, 0)"
                    f" + ({PR_DAMP_NUM} * s) div {PR_DAMP_DEN}"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_fp"))
