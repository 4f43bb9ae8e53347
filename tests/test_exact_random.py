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


def test_random_corr_moments_bit_identical(spark, tmp_path):
    """The corr/covar moment combination (stats_corr_covar_exact) on
    random pairs: exact decimal moments + one shared double formula must
    be bit-identical across engines and partitionings."""
    from pyspark.sql import functions as F

    rng = random.Random(0xFACADE)
    rows = [
        (rng.randint(0, 3), round(rng.uniform(0, 50), 2), round(rng.uniform(900, 105000), 2))
        for _ in range(4000)
    ]
    p = str(tmp_path / "xy.parquet")
    spark.createDataFrame(rows, "g int, x double, y double").repartition(32).write.parquet(p)

    x, y = dec("x"), dec("y")
    y14 = dec("y", 14, 2)
    agg = (
        spark.read.parquet(p)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"), F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"), F.sum(y14 * y14).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = dbl(F.col("sx"), 2), dbl(F.col("sy"), 2)
    sxx, syy, sxy = dbl(F.col("sxx"), 4), dbl(F.col("syy"), 4), dbl(F.col("sxy"), 4)
    corr = (nd * sxy - sx * sy) / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))
    got = {r.g: _bits(r.c) for r in agg.select("g", corr.alias("c")).collect()}

    SX = "SUM(CAST(x AS DECIMAL(12,2)))"
    SY = "SUM(CAST(y AS DECIMAL(12,2)))"
    SXX = "SUM(CAST(x AS DECIMAL(12,2)) * CAST(x AS DECIMAL(12,2)))"
    SYY = "SUM(CAST(y AS DECIMAL(14,2)) * CAST(y AS DECIMAL(14,2)))"
    SXY = "SUM(CAST(x AS DECIMAL(12,2)) * CAST(y AS DECIMAL(12,2)))"
    con = duckdb.connect()
    want = {
        g: _bits(c)
        for g, c in con.sql(
            f"""SELECT g,
                 (CAST(COUNT(*) AS DOUBLE) * {sql_dbl(SXY, 4)} - {sql_dbl(SX, 2)} * {sql_dbl(SY, 2)})
                   / SQRT((CAST(COUNT(*) AS DOUBLE) * {sql_dbl(SXX, 4)} - {sql_dbl(SX, 2)} * {sql_dbl(SX, 2)})
                        * (CAST(COUNT(*) AS DOUBLE) * {sql_dbl(SYY, 4)} - {sql_dbl(SY, 2)} * {sql_dbl(SY, 2)})) AS c
                FROM '{p}/*.parquet' GROUP BY g"""
        ).fetchall()
    }
    con.close()
    assert got == want


def test_random_dbl_wide_bit_identical_past_bigint(spark, tmp_path):
    """dbl_wide()/sql_dbl_wide(): magnitudes whose unscaled value
    passes 2^63 (where dbl() throws CAST_OVERFLOW — the round-5 sf1
    sweep finding) must still convert BIT-identically in both engines,
    and must agree with dbl() below 2^53 where both are exact."""
    from pyspark.sql import functions as F

    from flinkstreametl_spark.functions.exact import dbl_wide, sql_dbl_wide

    import decimal as _d

    rng = random.Random(0xF00D)
    rows = []
    for i in range(2000):
        # NATIVE decimal fixture: a double->decimal cast of wide values
        # rounds differently between engines (the documented trap), so
        # the shared input must be exact from the start — as in real
        # usage, where wide unscaled values arise from exact SUMs.
        digits = rng.randint(1, 26)
        unscaled = rng.randrange(-(10**digits), 10**digits)
        rows.append((i, _d.Decimal(unscaled).scaleb(-4)))
    p = str(tmp_path / "wide.parquet")
    spark.createDataFrame(rows, "id long, v decimal(30,4)").write.parquet(p)

    got = {
        r.id: _bits(r.c)
        for r in spark.read.parquet(p)
        .select("id", dbl_wide(dec("v", 30, 4), 4).alias("c"))
        .collect()
    }
    con = duckdb.connect()
    want = {
        rid: _bits(c)
        for rid, c in con.sql(
            f"""SELECT id, {sql_dbl_wide('CAST(v AS DECIMAL(30,4))', 4)} AS c
                FROM '{p}/*.parquet'"""
        ).fetchall()
    }
    con.close()
    assert got == want

    # below 2^53 unscaled, wide == narrow exactly
    small = [(i, round(rng.uniform(-1e8, 1e8), 4)) for i in range(500)]
    p2 = str(tmp_path / "small.parquet")
    spark.createDataFrame(small, "id long, v double").write.parquet(p2)
    both = (
        spark.read.parquet(p2)
        .select(
            "id",
            dbl(dec("v", 20, 4), 4).alias("narrow"),
            dbl_wide(dec("v", 20, 4), 4).alias("wide"),
        )
        .collect()
    )
    for r in both:
        assert _bits(r.narrow) == _bits(r.wide)
