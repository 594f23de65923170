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
