"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``flinkstreametl_spark/plans/`` — this module
is a thin adapter over the query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flinkstreametl_spark.plans import REGISTRY, oracle_sql_map, queries_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's centerpiece enrich join, SURVEY.md
    §2.3 J1+J2) on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_enrich"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return oracle_sql_map()
