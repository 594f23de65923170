"""salted_join: result parity with the plain join, and salt spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from shippinglanes_spark.io import table
from shippinglanes_spark.plans.skew import salted_join


def test_salted_join_matches_plain(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    salted = (
        salted_join(o, c, o.o_custkey, c.c_custkey, n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark):
    # one hot key: every fact row has key=1
    fact = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "hot")], "dk long, name string")
    out = salted_join(fact, dim, F.col("k"), F.col("dk"), n_salts=8)
    assert out.count() == 10_000
    # the salt must actually partition the hot key's rows into >1 group
    n_salts_used = (
        fact.withColumn("s", (F.rand(seed=42) * 8).cast("int"))
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts_used == 8


def test_aqe_skew_join_splits_partitions(spark):
    """AQE's skew-join handling must kick in on a constructed hot key:
    with skewJoin enabled and thresholds lowered, the post-shuffle sort-
    merge join reports OptimizeSkewedJoin having split the hot partition
    (isSkew=true in the final plan). This is the runtime re-plan relied
    on at 100 TB when salting isn't wired in by hand."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows on ONE key vs 5k spread over 100 keys + pad to defeat
        # compression into a sub-threshold partition
        big = spark.range(60_000).select(
            F.when(F.col("id") % 50 < 49, F.lit(0))
            .otherwise((F.col("id") % 100) + 1)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        small = spark.range(101).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        j = big.join(small, "k")
        # execute THIS DataFrame's own QueryExecution (.count()/.write
        # build a different one and the cached plan stays pre-adaptive)
        rows = j.collect()
        assert len(rows) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "isSkew=true" in plan or "skewed" in plan.lower(), plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
