"""[EXT] Skew mitigation: salting for joins and aggregations whose key
distribution has heavy hitters (SURVEY.md §2.9; the 100 TB problem the
reference never meets because its stream is keyed by unique meeting_id).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most cases at runtime by splitting oversized
partitions. Salting is the manual fallback for the pathological shapes
AQE can't fix:

- a join where ONE key holds >> a partition's worth of rows on BOTH
  sides (AQE can split one side's partition but must then duplicate the
  other side anyway — salting makes that duplication explicit/bounded);
- a high-cardinality aggregation whose hot keys bottleneck single
  reducers even after map-side partial aggregation (e.g. collect_list,
  which has no partial reduction).

Both transforms are *plan rewrites with identical semantics*, proven by
equality tests against the unsalted plans (tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_skew_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to heavy-hitter keys when the right side is
    too large to broadcast: the left (skewed, larger) side gets a
    deterministic per-row salt in [0, n_salts); the right side is
    replicated n_salts times; the join key becomes (key, salt), so a hot
    key's rows spread over n_salts reducers instead of one.

    Cost model: right side is duplicated n_salts×. Use when
    |right| * n_salts << |left|'s hot-key partition overflow — i.e. a
    mid-size dimension (too big to broadcast, small enough to replicate).
    The salt is xxhash64 over the whole left row (deterministic, no
    rand() — reruns and retried tasks salt identically)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)).cast("int")
    lt = left.withColumn(SALT, salt)
    rt = right.withColumn(SALT, F.explode(F.array([F.lit(i) for i in range(n_salts)])))
    out = lt.join(rt, (lt[left_key] == rt[right_key]) & (lt[SALT] == rt[SALT]), how)
    return out.drop(SALT)


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    merges: dict[str, Column],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation through an explicit salt: stage 1 groups on
    (keys…, salt) — hot keys fan out over n_salts reducers — stage 2
    merges the per-salt partials on the true keys.

    `aggs` maps partial-column name -> stage-1 aggregate expression;
    `merges` maps final-column name -> stage-2 merge over the partials.
    Only algebraic aggregates decompose this way (sum/count/min/max, and
    anything expressible in partial+merge form, e.g. avg = sum/count) —
    the same contract Spark's own partial aggregation requires.

    Spark already does map-side partials for built-in aggregates, which
    usually suffices; explicit salting is for aggregates WITHOUT partial
    reduction (collect_list/collect_set) or exchanges reused by later
    stages."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")
    stage1 = (
        df.withColumn(SALT, salt)
        .groupBy(*group_cols, SALT)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    return stage1.groupBy(*group_cols).agg(*[expr.alias(name) for name, expr in merges.items()])
