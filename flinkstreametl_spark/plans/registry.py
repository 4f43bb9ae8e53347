"""Query registry.

Each operator from SURVEY.md §2 is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.

Determinism rules (driver hashes values order-insensitively but exactly):
- alias every computed column identically in Spark and SQL;
- floating-point aggregates are rounded identically on both sides
  (float sums are order-dependent; rounding removes last-ulp noise);
- integer sums are cast to BIGINT on both sides (DuckDB widens to
  HUGEINT, Spark keeps BIGINT);
- LIMIT/top-k queries order by a unique tie-break key;
- NO array-typed output columns: the driver canonicalizes results via
  pandas sort/hash and Python lists are unhashable (``TypeError:
  unhashable type: 'list'`` — the two r3 window failures). Emit
  collection results as delimiter-joined strings instead: Spark
  ``array_join(array_sort(...), ',')`` (cast numeric arrays to
  ``array<string>`` AFTER sorting), DuckDB
  ``array_to_string(list_sort(...), ',')``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Sketch/approximate operators whose outputs are engine-specific
# (HLL++, KLL percentiles, moment accumulators): structurally
# unverifiable by the driver's exact-hash gate, so they are NOT
# exposed through ``queries()``. They stay runnable (CLI, tests pin
# them against exact twins within tolerance) via this tier.
AUDIT_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    driver: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY or name in AUDIT_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        target = REGISTRY if driver else AUDIT_REGISTRY
        target[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Driver-facing + audit-only specs (CLI / test surface)."""
    return {**REGISTRY, **AUDIT_REGISTRY}


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
