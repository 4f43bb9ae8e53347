"""Join operators (reference J1/J2, SURVEY.md §2.3) plus the semi/anti
extensions (§2.9).

J1 — the reference centerpiece: stream-to-static LEFT OUTER equi-join
enriching each CDC event with dimension attributes
(``sqlquery/JoinedSQLQuery.java:6-10``, executed ``Main.java:100``).
J2 — the 3-way dimension join the reference pushes down into MySQL
(``Seetings/CreateJDBCInputFormat.java:28-31``).

Scale design: the dimension side is small (reference scale hints: ~554
rooms, ~103 locations, README.md:64,89; TPC-H dims are similarly tiny
relative to facts), so the enrich join must be a BROADCAST hash join —
no shuffle of the 100 TB fact side. We hint ``F.broadcast`` explicitly
rather than relying on the autoBroadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_3way(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """J2 — customer ⟕ nation ⟕ region, mirroring
    t_meeting_address ⟕ t_meeting_location ⟕ t_meeting_region
    (``CreateJDBCInputFormat.java:28-31``). Projects the 5-column dim
    the stream join consumes (``DimensionTableSeetings.java:7-8`` shape).

    nation/region are tiny: both joins broadcast, zero shuffles.
    """
    return (
        customer.alias("c")
        .join(F.broadcast(nation.alias("n")), F.col("c.c_nationkey") == F.col("n.n_nationkey"), "left")
        .join(F.broadcast(region.alias("r")), F.col("n.n_regionkey") == F.col("r.r_regionkey"), "left")
        .select(
            F.col("c.c_custkey").alias("dim_key"),
            F.col("c.c_name").alias("dim_name"),
            F.col("c.c_mktsegment").alias("segment"),
            F.col("n.n_name").alias("nation_name"),
            F.col("r.r_name").alias("region_name"),
        )
    )


def enrich(stream_df: DataFrame, dim_df: DataFrame, stream_key: str, dim_key: str, how: str = "left") -> DataFrame:
    """J1 — stream-to-static enrichment join with an explicit broadcast
    of the dimension snapshot.

    The reference snapshots the dim into Flink state once and never
    refreshes (``CreateJDBCInputFormat.java:8-10`` comment); Spark's
    stream-static join re-reads the static side per micro-batch —
    strictly fresher, same semantics for append-only input.
    """
    return stream_df.join(F.broadcast(dim_df), stream_df[stream_key] == dim_df[dim_key], how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """[EXT] EXISTS — broadcast-able left-semi; no right columns survive."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """[EXT] NOT EXISTS — left-anti."""
    return left.join(right, on, "left_anti")
