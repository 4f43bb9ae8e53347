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


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """The RUNTIME half of the skew story (round-5 verdict item 7):
    AQE's skew-join must detect and split a deliberately hot key at
    sf0.1 without any plan rewrite on our side. 90% of events hash to
    one join key; with broadcast disabled (forcing the sort-merge
    shape a 100 TB fact-fact join takes) and the skew thresholds
    scaled to fixture bytes, the final adaptive plan must mark the
    join skew=true — i.e. the hot partition was split across tasks.
    When to prefer WHICH mitigation is documented in docs/SCALE.md
    ("AQE skew split vs explicit salting")."""
    from flinkstreametl_spark.sources.parquet import ensure_parallelism, load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # thresholds scaled to fixture bytes: the hot partition is tens
        # of KB here where production defaults assume 256MB — the
        # DETECTION math (hot > max(threshold, factor*median)) is the
        # same at both scales
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        # ensure_parallelism matters beyond CPU here: AQE splits a hot
        # reduce partition along MAP-output boundaries, so a
        # single-split parquet input (one mapper) leaves nothing to
        # split — exactly how a 1000-executor cluster would see the
        # fact side arrive (many map tasks). The 16x explode makes the
        # hot key's bytes unambiguous at the smallest fixture.
        ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
        fact = ev.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(16)]))
        ).select(
            F.when(F.col("event_id") % 10 != 0, F.lit(7))
            .otherwise(F.col("event_id") % 997)
            .alias("k"),
            "event_type",
            "props",
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"),
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("copy"),
        )
        joined = fact.join(dim, "k")
        # Aggregate on a DIFFERENT key than the join: the downstream
        # exchange is needed either way, so AQE is free to split the
        # join's hot partition. collect() executes THIS DataFrame's
        # QueryExecution, whose final adaptive plan we then inspect
        # (count() would plan a separate execution).
        result = joined.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("copy").alias("s")
        )
        rows = result.collect()
        assert sum(r.n for r in rows) == fact.count() * 4
        final_plan = result._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, f"AQE did not split the skewed join:\n{final_plan[:2000]}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
