"""Randomized cross-engine check of the exactness core (functions/
exact.py): on arbitrary 2-decimal values, a 32-partition Spark decimal
sum surfaced through dbl() must equal DuckDB's single-threaded sum
surfaced through sql_dbl() BIT-FOR-BIT — the invariant every oracle-
checked aggregate in the registry rests on.

Seeded RNG: failures reproduce; the point is breadth over hand-picked
values (negatives, sub-cent magnitudes, 1e9-scale, ulp-adjacent sums).
"""

from __future__ import annotations

import random
import struct

import duckdb

from flinkstreametl_spark.functions.exact import dbl, dec, sql_dbl


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def test_random_sums_bit_identical(spark, tmp_path):
    rng = random.Random(0xC0FFEE)
    for trial in range(5):
        # magnitudes from sub-cent to 1e9, mixed signs, 2dp values
        scale = 10 ** rng.randint(0, 9)
        vals = [round(rng.uniform(-scale, scale), 2) for _ in range(2000)]
        p = str(tmp_path / f"vals_{trial}.parquet")
        spark.createDataFrame([(v,) for v in vals], "v double").repartition(32).write.parquet(p)

        from pyspark.sql import functions as F

        sdf = spark.read.parquet(p).agg(dbl(F.sum(dec("v", 14, 2)), 2).alias("s"))
        got = sdf.first().s

        con = duckdb.connect()
        want = con.sql(f"SELECT {sql_dbl('SUM(CAST(v AS DECIMAL(14,2)))', 2)} AS s FROM '{p}/*.parquet'").fetchone()[0]
        con.close()
        assert _bits(got) == _bits(want), f"trial {trial}: {got!r} != {want!r}"


def test_random_dbl_conversion_bit_identical(spark, tmp_path):
    """Per-row decimal->double via dbl(): random decimals at scales 2-6
    convert identically in both engines (the unscaled-BIGINT path)."""
    from pyspark.sql import functions as F

    rng = random.Random(0xBEEF)
    rows = [(i, round(rng.uniform(-1e7, 1e7), 6)) for i in range(3000)]
    p = str(tmp_path / "conv.parquet")
    spark.createDataFrame(rows, "id long, v double").write.parquet(p)

    # precision headroom: digits(1e7 value) + 2*scale (sql_dbl contract)
    got = {
        r.id: (_bits(r.c2), _bits(r.c6))
        for r in spark.read.parquet(p)
        .select(
            "id",
            dbl(dec("v", 20, 2), 2).alias("c2"),
            dbl(dec("v", 26, 6), 6).alias("c6"),
        )
        .collect()
    }
    con = duckdb.connect()
    want = {
        rid: (_bits(c2), _bits(c6))
        for rid, c2, c6 in con.sql(
            f"""SELECT id, {sql_dbl('CAST(v AS DECIMAL(20,2))', 2)} AS c2,
                       {sql_dbl('CAST(v AS DECIMAL(26,6))', 6)} AS c6
                FROM '{p}/*.parquet'"""
        ).fetchall()
    }
    con.close()
    assert got == want
