"""SURVEY §2.7 — set operations & dedup."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import epoch_us
from ..io import table
from ..registry import register


def _auto_keys(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")


def _big_order_keys(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.where(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )


@register(
    "set_union",
    section="2.7",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 8000
    """,
)
def set_union(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 8000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "set_union_all",
    section="2.7",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 8000
    """,
)
def set_union_all(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 8000).select("c_custkey")
    return a.unionByName(b)


@register(
    "set_intersect",
    section="2.7",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_intersect(spark, sf_dir):
    return _auto_keys(spark, sf_dir).intersect(_big_order_keys(spark, sf_dir))


@register(
    "set_except",
    section="2.7",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def set_except(spark, sf_dir):
    return _auto_keys(spark, sf_dir).subtract(_big_order_keys(spark, sf_dir))


@register(
    "distinct_rows",
    section="2.7",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "dedup_keep_latest",
    section="2.7",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
               FROM events)
    SELECT user_id, event_id, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
    WHERE rn = 1
    """,
    notes="ETL upsert-flatten: newest record per key via window, one shuffle",
)
def dedup_keep_latest(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", "value", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "set_intersect_all",
    section="2.7",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
    notes="MULTISET intersection: a customer appearing 3x among urgent "
    "orders and 5x among premium orders appears min(3,5)=3 times — the "
    "bag semantics DISTINCT-based set_intersect cannot express. Maps "
    "to Spark intersectAll (a single aggregate-and-replicate under the "
    "hood, not a join fanout)",
)
def set_intersect_all(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    section="2.7",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
    notes="MULTISET difference: multiplicities subtract (3 urgent minus "
    "1 premium leaves the customer twice) instead of vanishing on "
    "first match. Spark exceptAll / SQL EXCEPT ALL",
)
def set_except_all(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.exceptAll(b)
