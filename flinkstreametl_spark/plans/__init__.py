"""Named query registry. Importing this package registers every query
module; ``__spark_entry__.py``, the tests, and ``bench.py`` all consume
the same registry."""

from flinkstreametl_spark.plans.registry import REGISTRY, QuerySpec, oracle_sql_map, queries_map

# Import for registration side effects.
from flinkstreametl_spark.plans import reference as _reference  # noqa: E402,F401
from flinkstreametl_spark.plans import analytics as _analytics  # noqa: E402,F401
from flinkstreametl_spark.plans import analytics_ext as _analytics_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import llm as _llm  # noqa: E402,F401
from flinkstreametl_spark.plans import tpch_ext as _tpch_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import pipeline_ext as _pipeline_ext  # noqa: E402,F401
from flinkstreametl_spark.plans import coverage_ext as _coverage_ext  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
