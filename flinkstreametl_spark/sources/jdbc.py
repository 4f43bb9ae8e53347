"""JDBC bounded dimension source (reference S2, SURVEY.md §2.1).

The reference materializes its 3-way dim join INSIDE MySQL and ships
only the result through JDBC (`Seetings/CreateJDBCInputFormat.java:22-35`
builds the input format around one pushed-down SELECT). The Spark
equivalent is the `query` option of the JDBC reader: the database runs
the join, Spark receives the joined snapshot — same pushdown, plus
optional partitioned parallel reads the Flink InputFormat never had.

CI has no database or driver jar, so the reader itself is gated; the
option construction — the part that encodes the reference's semantics —
is pure and unit-tested (`tests/test_cdc.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# CreateJDBCInputFormat.java:28-31, verbatim semantics: address
# LEFT JOIN location LEFT JOIN region, aliased to the enrich columns.
MEETING_DIM_PUSHDOWN_SQL = """\
SELECT tma.id AS meetingroom_id, tma.name AS meetingroom_name,
       tml.code AS location_id, tml.full_name AS location_name,
       tmr.name AS city
FROM t_meeting_address tma
LEFT JOIN t_meeting_location tml ON tma.location = tml.code
LEFT JOIN t_meeting_region tmr   ON tml.region_id = tmr.id"""


def jdbc_pushdown_options(
    url: str,
    query: str,
    *,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """The documented JDBC-reader option set (unit-testable without a
    database). `query` pushes the dim join into the database — the
    reference's CreateJDBCInputFormat shape. The partition_* quartet
    turns the single-connection Flink-style read into Spark's
    range-partitioned parallel scan; all four must be given together.
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"JDBC url must start with 'jdbc:', got {url!r}")
    if not query.strip():
        raise ValueError("pushdown query is required")
    opts: dict[str, str] = {
        "url": url,
        "query": query,
        "fetchsize": str(fetchsize),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part):
        if any(p is None for p in part):
            raise ValueError(
                "partitionColumn, lowerBound, upperBound, numPartitions must be set together"
            )
        opts.update(
            {
                "partitionColumn": str(partition_column),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_jdbc_dim(
    spark: SparkSession,
    url: str,
    query: str = MEETING_DIM_PUSHDOWN_SQL,
    **kwargs,
) -> DataFrame:
    """S2 — the gated reader (needs a live database + driver jar;
    ``jdbc_pushdown_options`` carries the CI-tested wiring). The result
    is the already-joined dim snapshot, broadcast-sized by construction."""
    return spark.read.format("jdbc").options(**jdbc_pushdown_options(url, query, **kwargs)).load()
