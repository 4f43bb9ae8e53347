"""[EXT] Distributed EXACT order statistics: equi-depth histogram
boundaries, a two-phase Pareto frontier (skyline), and grouped mode —
the "sort-free selection" family.

The common 100 TB problem: rank-based answers (the value at rank r,
the running max over everything cheaper) naively need a GLOBAL sort or
a single-partition window — the shapes that bottleneck a
1000-executor cluster on one reducer. The pattern used here instead is
two-level selection:

1. reduce the fact stream to a VALUE GRAIN (count/max per distinct
   value) — an ordinary map-side-combined shuffle;
2. bucket the value domain coarsely, aggregate once per bucket, and
   run the tiny cross-bucket prefix pass (cumulative counts / prefix
   max) on the DOMAIN-BOUNDED bucket table;
3. answer exactly WITHIN the few candidate buckets, windows
   partitioned by bucket — never a global window over data-sized
   input.

Exactness: counts and ranks are integers; boundary/frontier VALUES are
carried verbatim (no arithmetic beyond the bucket floor, which is the
same IEEE operation in both engines), so results hash identically.

No counterpart in the reference (its aggregations stop at COUNT/SUM,
`SURVEY.md` §2.4); this is warehouse capability the reference's users
get for free from the Spark engine underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkstreametl_spark.plans.registry import register
from flinkstreametl_spark.sources.parquet import load_table

_N_BUCKETS_WIDTH = 1000.0  # o_totalprice bucket width (domain ~1e3..5e5 -> ~500 buckets)
_DECILES = 9


_EQUIDEPTH_ORACLE = f"""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
t AS (
    SELECT CAST(i AS BIGINT) AS decile, (i * n + 9) // 10 AS target_rank
    FROM n, (SELECT unnest(generate_series(1, {_DECILES})) AS i)
),
r AS (
    SELECT o_totalprice AS v,
           row_number() OVER (ORDER BY o_totalprice) AS rn
    FROM orders
)
SELECT decile, target_rank, v AS boundary
FROM t JOIN r ON r.rn = t.target_rank
"""


@register("equidepth_totalprice_bounds", tags=("ext", "orderstats"), oracle=_EQUIDEPTH_ORACLE)
def equidepth_totalprice_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth decile boundaries of o_totalprice — the
    optimizer-statistics histogram, computed WITHOUT a global sort:
    boundary_i = the value at rank ceil(i*N/10) (equivalently the
    smallest v with #(<= v) >= rank).

    Two-level selection (module docstring): per-bucket counts (one
    map-combined shuffle), cumulative counts over the ~500-row bucket
    table, candidate bucket per decile found in that tiny frame; then
    the exact in-bucket cumulative count (window PARTITIONED BY
    bucket, value grain) pins each boundary. The oracle instead
    brute-forces the global row_number — two independent formulations,
    identical rows.

    At 100 TB nothing here is data-global: the only unbounded-width
    structures are the bucket table (value-DOMAIN-bounded) and the
    per-bucket windows (depth = one bucket's distinct values)."""
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("v"))
    n = orders.agg(F.count(F.lit(1)).alias("n"))
    targets = (
        F.broadcast(n)
        .select(F.explode(F.sequence(F.lit(1), F.lit(_DECILES))).alias("i"), "n")
        .select(
            F.col("i").cast("long").alias("decile"),
            F.expr("(i * n + 9) div 10").alias("target_rank"),
        )
    )
    b = F.floor(F.col("v") / F.lit(_N_BUCKETS_WIDTH)).alias("b")
    bcnt = orders.groupBy(b).agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bcum = bcnt.select(
        "b",
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("cum_before"),
        F.sum("cnt").over(wcum).alias("cum"),
    )
    # candidate bucket per decile: smallest b whose cumulative count
    # reaches the target rank (bucket table broadcast — tiny)
    cand = (
        targets.join(F.broadcast(bcum), F.col("cum") >= F.col("target_rank"))
        .groupBy("decile", "target_rank")
        .agg(F.min_by(F.struct("b", "cum_before"), "b").alias("pick"))
        .select("decile", "target_rank", F.col("pick.b").alias("b"), F.col("pick.cum_before").alias("cum_before"))
    )
    # exact in-bucket selection on the value grain of candidate buckets only
    vg = (
        orders.select(b, "v")
        .join(F.broadcast(cand.select("b").distinct()), "b", "left_semi")
        .groupBy("b", "v")
        .agg(F.count(F.lit(1)).alias("vcnt"))
    )
    wv = Window.partitionBy("b").orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vcum = vg.select("b", "v", F.sum("vcnt").over(wv).alias("vrun"))
    return (
        cand.join(F.broadcast(vcum), "b")
        .filter(F.col("cum_before") + F.col("vrun") >= F.col("target_rank"))
        .groupBy("decile", "target_rank")
        .agg(F.min("v").alias("boundary"))
    )


_PARETO_ORACLE = """
SELECT x.p_partkey, x.p_retailprice, x.p_size
FROM part x
WHERE NOT EXISTS (
    SELECT 1 FROM part y
    WHERE y.p_retailprice <= x.p_retailprice AND y.p_size >= x.p_size
      AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size)
)
"""


@register("pareto_frontier_parts", tags=("ext", "orderstats", "skyline"), oracle=_PARETO_ORACLE)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of parts on (minimize p_retailprice,
    maximize p_size): a part survives iff nothing is cheaper-and-at-
    least-as-big or same-price-and-strictly-bigger.

    The oracle is the textbook quadratic NOT EXISTS; the Spark side is
    the scalable two-phase rewrite: collapse to the price grain (max
    size per distinct price — one shuffle), compute the strictly-
    cheaper prefix max in two levels (coarse price buckets -> exclusive
    running max over the tiny bucket table, then an exclusive ROWS
    window WITHIN each bucket, both combined with greatest()), and keep
    grain rows whose size beats that prefix. Joining the frontier
    grain back to parts restores key-level rows (ties on (price, size)
    are all frontier members — neither strictly improves the other).

    Two independent formulations, identical rows; integer/verbatim
    values only, no float arithmetic. At 100 TB the only global pass
    is over the bucket table (domain-bounded); everything else is one
    price-grain shuffle and per-bucket windows."""
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    grain = parts.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("mx")
    )
    grain = grain.withColumn("b", F.floor(F.col("price") / F.lit(10.0)))
    bmax = grain.groupBy("b").agg(F.max("mx").alias("bmx"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bpre = bmax.select("b", F.max("bmx").over(wb).alias("carry_in"))
    wp = Window.partitionBy("b").orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    scored = (
        grain.join(F.broadcast(bpre), "b")
        .withColumn("run_excl", F.max("mx").over(wp))
        .withColumn(
            "prefix_strict",
            F.greatest(F.coalesce("carry_in", F.lit(-1)), F.coalesce("run_excl", F.lit(-1))),
        )
    )
    frontier = scored.filter(F.col("mx") > F.col("prefix_strict")).select("price", "mx")
    return (
        parts.join(
            F.broadcast(frontier),
            (parts.p_retailprice == frontier.price) & (parts.p_size == frontier.mx),
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


_MODE_ORACLE = """
SELECT p_type, p_brand, n_parts FROM (
    SELECT p_type, p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           row_number() OVER (PARTITION BY p_type
                              ORDER BY COUNT(*) DESC, p_brand) AS rk
    FROM part
    GROUP BY p_type, p_brand
) v
WHERE rk = 1
"""


@register("mode_brand_per_type", tags=("ext", "orderstats", "aggregate"), oracle=_MODE_ORACLE)
def mode_brand_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode with a deterministic tie-break: the most
    common brand within each part type (count DESC, then brand ASC —
    never the engines' native mode(), whose tie choice is
    unspecified and differs between Spark and DuckDB).

    Plan: one hash aggregate to the (type, brand) grain, then a
    bounded window per type (brands per type is catalog-sized). The
    grain aggregate combines map-side, so the exchange carries
    distinct pairs, not parts."""
    parts = load_table(spark, sf_dir, "part")
    counted = parts.groupBy("p_type", "p_brand").agg(F.count(F.lit(1)).alias("n_parts"))
    w = Window.partitionBy("p_type").orderBy(F.col("n_parts").desc(), "p_brand")
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_type", "p_brand", "n_parts")
    )


_TIES_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           rank() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC) AS rk
    FROM orders
) v
WHERE rk <= 3
"""


@register("topk_with_ties_orders", tags=("ext", "orderstats", "topk"), oracle=_TIES_ORACLE)
def topk_with_ties_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per priority class WITH TIES — ``rank()``
    rather than ``row_number()``, so every order sharing a top-3 value
    is returned (ANSI FETCH FIRST ... WITH TIES semantics). The
    existing ``topk_orders`` is the row_number half; together they pin
    both top-k contracts, whose difference is exactly the rows an
    arbitrary tie-cut would silently drop.

    Determinism: the output SET is tie-insensitive by construction
    (every tied row is present), so no tie-break column is needed —
    rank() over (value DESC) yields identical rows under any
    partitioning. One exchange on the partition key; per-class window
    depth is the class's orders."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        orders.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", F.col("rk").cast("long").alias("rk"))
    )


_WMEDIAN_ORACLE = """
WITH g AS (
    SELECT l_returnflag, l_extendedprice AS v,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS wt
    FROM lineitem
    GROUP BY l_returnflag, l_extendedprice
),
c AS (
    SELECT l_returnflag, v, wt,
           CAST(SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
           CAST(SUM(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total
    FROM g
)
SELECT l_returnflag, CAST(MIN(total) AS BIGINT) AS total_weight,
       MIN(v) AS weighted_median_price
FROM c
WHERE 2 * cum >= total
GROUP BY l_returnflag
"""


@register("weighted_median_quantity", tags=("ext", "orderstats"), oracle=_WMEDIAN_ORACLE)
def weighted_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price v whose cumulative quantity weight reaches half the
    class total — the lower weighted median, selected with the
    integer-only inequality 2*cum >= W (no W/2 division, no float).

    Plan: one map-combined shuffle to the (flag, price) value grain,
    then both windows (running weight, class total) share the flag
    exchange; the selection is a filter + min, not a sort. Weights are
    defined as floor(quantity) on BOTH engines — Spark's .cast('long')
    truncates decimals while DuckDB's CAST rounds half-to-even, so a
    bare cast agrees only while quantities happen to be integral
    (ADVICE r5); floor() pins one semantics regardless of input. The
    median VALUE is carried verbatim, so results hash identically
    cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.floor("l_quantity").cast("long")).alias("wt"))
    byf = Window.partitionBy("l_returnflag")
    wcum = byf.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(wcum).alias("cum"),
        F.sum("wt").over(byf).alias("total"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("total").alias("total_weight"), F.min("v").alias("weighted_median_price"))
    )


# --- Exact discrete percentile bands ---------------------------------------

# percentile_disc(q) = the value at ascending position ceil(q·n) —
# computed with the SAME rank-selection formula in both engines (the
# builtins disagree on interpolation; rank selection never
# interpolates, so it is exact on the fixed-point column).
_PCT_ORACLE = """
WITH v AS (
    SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v_fp FROM events
), r AS (
    SELECT event_type, v_fp,
           row_number() OVER (PARTITION BY event_type ORDER BY v_fp) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM v
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN v_fp END) AS BIGINT) AS p50_fp,
       CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN v_fp END) AS BIGINT) AS p90_fp,
       CAST(MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN v_fp END) AS BIGINT) AS p99_fp
FROM r GROUP BY event_type
"""


@register("value_percentile_bands", tags=("ext", "orderstats", "events"), oracle=_PCT_ORACLE)
def value_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of the event value per event type
    (percentile_disc semantics: the element at ascending position
    ceil(q·n), never interpolated) — the SLO-band profile over the
    monitoring stream. Rank selection instead of the engines'
    percentile builtins: Spark's percentile_approx is approximate and
    the exact builtins interpolate differently across engines, while
    the selected ELEMENT is engine-independent even though row_number
    breaks ties arbitrarily (equal values at the selected position are
    by definition equal).

    Plan shape: one shuffle on event_type; the rank window and the
    band aggregate reuse that partitioning, and per-key state is the
    key's row count (5 keys here; for a high-cardinality key the same
    shape holds per key). ceil(q·n) = (q_num·n + q_den − 1) div q_den
    in exact integers."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.floor(F.col("value") * 1_000_000).cast("long").alias("v_fp")
    )
    w = Window.partitionBy("event_type").orderBy("v_fp")
    wn = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "v_fp",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda num, den: F.min(  # noqa: E731
        F.when(F.col("rn") == F.expr(f"({num} * n + {num}) div {den}"), F.col("v_fp"))
    )
    return r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v_fp"))).alias("p50_fp"),
        pick(9, 10).alias("p90_fp"),
        pick(99, 100).alias("p99_fp"),
    )
