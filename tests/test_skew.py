"""Salting rewrites must be semantically invisible: salted plans equal
unsalted plans on skewed data (one key dominating)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkstreametl_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # key 7 holds 90% of the rows — the heavy-hitter shape
    rows = [(7 if i % 10 else i % 100, i, float(i % 13)) for i in range(5000)]
    return spark.createDataFrame(rows, "k int, uid long, v double")


def _dim(spark):
    return spark.createDataFrame([(i, f"name_{i}") for i in range(100)], "dk int, dname string")


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed(spark), _dim(spark)
    plain = fact.join(dim, fact.k == dim.dk).select("uid", "dname")
    salted = salted_join(fact, dim, "k", "dk", n_salts=8).select("uid", "dname")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    fact = _skewed(spark).withColumn("k", F.col("k") + 50)  # half miss the dim
    dim = _dim(spark)
    plain = fact.join(dim, fact.k == dim.dk, "left").select("uid", "dname")
    salted = salted_join(fact, dim, "k", "dk", n_salts=4, how="left").select("uid", "dname")
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(map(tuple, plain.collect()), key=str)


def test_salted_agg_equals_plain_agg(spark):
    fact = _skewed(spark)
    plain = {
        (r.k): (r.n, r.s, r.mx)
        for r in fact.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("uid").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mx)
        for r in salted_agg(
            fact,
            ["k"],
            aggs={"pn": F.count("*"), "ps": F.sum("uid"), "pm": F.max("v")},
            merges={"n": F.sum("pn"), "s": F.sum("ps"), "mx": F.max("pm")},
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_collect_list(spark):
    """The case that actually NEEDS salting: collect_list has no partial
    reduction, so a hot key funnels every row through one reducer; the
    salted form builds per-salt lists then flattens."""
    fact = _skewed(spark)
    plain = {
        r.k: sorted(r.xs)
        for r in fact.groupBy("k").agg(F.collect_list("uid").alias("xs")).collect()
    }
    salted = {
        r.k: sorted(r.xs)
        for r in salted_agg(
            fact,
            ["k"],
            aggs={"part": F.collect_list("uid")},
            merges={"xs": F.flatten(F.collect_list("part"))},
            n_salts=16,
        ).collect()
    }
    assert salted == plain
