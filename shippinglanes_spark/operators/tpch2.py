"""TPC-H pack, part 2 — the remaining canonical shapes (SURVEY §2.12).

Together with operators/tpch.py this completes all 22 TPC-H query
shapes, adapted to the fixture schema. The fixtures carry no partsupp
table, ship modes, comments, or commit/receipt dates, so the queries
that need them are re-expressed over a derived supply relation
(distinct (l_partkey, l_suppkey) from lineitem, with unit-price /
shipped-quantity standing in for ps_supplycost / ps_availqty) and
ship-delay predicates (l_shipdate vs o_orderdate) standing in for the
commit/receipt lateness tests. Every adaptation keeps the *plan shape*
of the original — correlated min (Q2), grouped scalar-threshold HAVING
(Q11), left-join histogram (Q13), view+scalar-max (Q15), NOT-IN anti
join (Q16), correlated avg (Q17), nested semi joins (Q20), and the
exists/not-exists multi-supplier lateness test (Q21, re-expressed as
per-order distinct-supplier counts — exactly the de-correlated form an
optimizer produces).

Scale notes: dims (nation/region/supplier/part at fixture ratios)
broadcast; every aggregate is partially applied map-side; the only
wide exchanges are the lineitem groupBys, each keyed on its join key
so AQE can coalesce. Scalar aggregates (Q11's threshold, Q15's max,
Q17's per-part avg) are broadcast one-row/small frames, never driver
round-trips.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import money
from ..io import table
from ..registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@register(
    "tpch_q1_pricing_summary",
    section="2.12",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    notes="the full Q1 measure set (agg_groupby carries the reduced flagship "
    "form); one scan, one keyed shuffle, all aggregates partial map-side",
)
def tpch_q1(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc)).alias("sum_disc_price"),
            money(F.sum(disc * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    section="2.12",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_name, n_name, p_partkey, p_type,
           FLOOR(ps_supplycost * 10000) / 10000.0 AS cost
    FROM part JOIN supply ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size <= 15
      AND ps_supplycost = (SELECT MIN(s2.ps_supplycost) FROM supply s2
                           WHERE s2.ps_partkey = p_partkey)
    """,
    notes="Q2 shape (correlated min subquery) over the derived supply "
    "relation; the correlated min is a per-part window min, equality on "
    "identical IEEE doubles on both engines; cost presented as "
    "floor(x*1e4)/1e4 because ROUND(double, n) is not cross-engine "
    "deterministic at boundaries while floor and divide are exact IEEE ops",
)
def tpch_q2(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        )
    )
    min_cost = F.min("ps_supplycost").over(
        Window.partitionBy("ps_partkey")
    )
    cheapest = supply.withColumn("min_cost", min_cost).where(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        p.where(F.col("p_size") <= 15)
        .join(cheapest, p.p_partkey == cheapest.ps_partkey)
        .join(s, cheapest.ps_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.floor(F.col("ps_supplycost") * 10000) / 10000.0).alias("cost"),
        )
    )


@register(
    "tpch_q5_local_supplier_volume",
    section="2.12",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    notes="6-table join with the customer-nation == supplier-nation "
    "locality predicate; region/nation/supplier broadcast",
)
def tpch_q5(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(
            o.where(
                (F.col("o_orderdate") >= _ts("1997-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ),
            c.c_custkey == o.o_custkey,
        )
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r.where(F.col("r_name") == "ASIA"), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@register(
    "tpch_q7_volume_shipping",
    section="2.12",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
    GROUP BY 1, 2, 3
    """,
    notes="bidirectional nation-pair trade volume by year; the nation dim "
    "joins twice under different roles (supplier vs customer side)",
)
def tpch_q7(spark, sf_dir):
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    section="2.12",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    """,
    notes="Q8 market share: one nation's fraction of regional volume per "
    "year — conditional-sum ratio, 8-table join, dims broadcast",
)
def tpch_q8(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.where(F.col("p_type") == "ECONOMY")
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(
            r.where(F.col("r_name") == "EUROPE"),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    section="2.12",
    oracle="""
    SELECT nation, o_year,
           CAST(SUM(amount_e4) AS BIGINT) / 10000.0 AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(ROUND((l_extendedprice * (1 - l_discount)
                   - 0.8 * p_retailprice * l_quantity) * 10000) AS BIGINT)
                   AS amount_e4
          FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%bolt%') profit
    GROUP BY nation, o_year
    """,
    notes="Q9 profit by nation and year; fixtures lack ps_supplycost, so "
    "cost = 0.8 * p_retailprice per unit (same multiply-and-subtract shape). "
    "Per-row profit is mathematically a 4-decimal value (2dp prices x 2dp "
    "discounts, integral qty), so it is integerized to e4 BEFORE summing: "
    "the bigint sum is exact and order-independent, where ROUND(SUM(double)) "
    "flips cents between engines at sf0.1",
)
def tpch_q9(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.8
    ) * F.col("p_retailprice") * F.col("l_quantity")
    amount_e4 = F.round(amount * 10000, 0).cast("long")
    return (
        p.where(F.col("p_name").like("%bolt%"))
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg((F.sum(amount_e4) / 10000.0).alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    section="2.12",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, SUM(l_extendedprice) AS val
      FROM lineitem GROUP BY 1, 2
    ), filtered AS (
      SELECT pk, val FROM supply JOIN supplier ON sk = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
    )
    SELECT pk AS p_partkey, ROUND(SUM(val), 2) AS value
    FROM filtered GROUP BY pk
    HAVING ROUND(SUM(val), 2) > (SELECT ROUND(SUM(val) * 0.001, 2) FROM filtered)
    """,
    notes="Q11 shape: grouped value vs a scalar fraction-of-total threshold "
    "in HAVING; the scalar is a broadcast 1-row aggregate, threshold "
    "compared on ROUNDed values so engines can't flip boundary rows",
)
def tpch_q11(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nations = ["NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    supply = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum("l_extendedprice").alias("val"))
    filtered = (
        supply.join(s, supply.sk == s.s_suppkey)
        .join(
            n.where(F.col("n_name").isin(nations)),
            s.s_nationkey == n.n_nationkey,
        )
        .select("pk", "val")
    )
    threshold = filtered.agg(
        F.round(F.sum("val") * 0.001, 2).alias("threshold")
    )
    return (
        filtered.groupBy(F.col("pk").alias("p_partkey"))
        .agg(money(F.sum("val")).alias("value"))
        .crossJoin(F.broadcast(threshold))
        .where(F.col("value") > F.col("threshold"))
        .select("p_partkey", "value")
    )


@register(
    "tpch_q12_ship_priority",
    section="2.12",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 'LATE'
                WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'SLOW'
                ELSE 'FAST' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    notes="Q12 shape: priority-class line counts per shipping bucket; "
    "fixtures lack l_shipmode/receiptdate, so the bucket is the "
    "order-to-ship delay class",
)
def tpch_q12(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li.where(
                (F.col("l_shipdate") >= _ts("1997-01-01"))
                & (F.col("l_shipdate") < _ts("1998-01-01"))
            ),
            o.o_orderkey == li.l_orderkey,
        )
        .groupBy(
            F.when(delay > 60, "LATE")
            .when(delay > 30, "SLOW")
            .otherwise("FAST")
            .alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_order_distribution",
    section="2.12",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    notes="Q13 customer order-count histogram: filtered LEFT join (the "
    "filter lives in the join condition, keeping zero-order customers), "
    "then a count-of-counts re-aggregation",
)
def tpch_q13(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(
            o.where(F.col("o_orderpriority") != "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q15_top_supplier",
    section="2.12",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    notes="Q15 shape: revenue view + scalar max subquery; max taken over "
    "ROUNDed revenues so the equality can't float-flip",
)
def tpch_q15(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("total_revenue")
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_supplier_count",
    section="2.12",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                    FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT sk) AS BIGINT) AS supplier_cnt
    FROM supply JOIN part ON pk = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    notes="Q16 shape: distinct supplier count per part class with a NOT-IN "
    "exclusion -> left-anti join in Spark (s_suppkey is non-null, so "
    "NOT IN == anti join)",
)
def tpch_q16(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    supply = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    excluded = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        supply.join(
            p.where(
                (F.col("p_brand") != "Brand#1")
                & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
            ),
            supply.pk == p.p_partkey,
        )
        .join(excluded, supply.sk == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("sk").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    section="2.12",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    notes="Q17 shape: correlated per-part avg-quantity subquery -> grouped "
    "avg + equi-join in Spark; quantities are integral doubles, so the avg "
    "is bit-identical on both engines",
)
def tpch_q17(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(p.where(F.col("p_brand") == "Brand#1"), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("avg_pk"))
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(money(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "tpch_q20_part_promotion",
    section="2.12",
    oracle="""
    WITH qty AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, SUM(l_quantity) AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
      AND s_suppkey IN (SELECT sk FROM qty JOIN part ON pk = p_partkey
                        WHERE p_name LIKE '%bolt%' AND sum_qty > 40)
    """,
    notes="Q20 shape: nested IN subqueries (suppliers who shipped a "
    "meaningful quantity of matching parts in the year) -> semi-join chain "
    "in Spark; the availqty*0.5 threshold becomes a constant (no partsupp)",
)
def tpch_q20(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nations = ["NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    qty = (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    qualified = (
        qty.where(F.col("sum_qty") > 40)
        .join(
            p.where(F.col("p_name").like("%bolt%")),
            qty.pk == p.p_partkey,
            "left_semi",
        )
        .select("sk")
    )
    return (
        s.join(qualified, s.s_suppkey == qualified.sk, "left_semi")
        .join(
            n.where(F.col("n_name").isin(nations)),
            s.s_nationkey == n.n_nationkey,
        )
        .select("s_name", "n_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    section="2.12",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ), o AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM l GROUP BY 1
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l JOIN o ON l.l_orderkey = o.l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """,
    notes="Q21 shape (EXISTS other-supplier AND NOT EXISTS other-late-"
    "supplier), de-correlated to per-order distinct-supplier counts — the "
    "exact rewrite an optimizer produces; lateness = shipped >90 days after "
    "order (fixtures lack commit/receipt dates)",
)
def tpch_q21(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    lines = (
        li.join(
            o.where(F.col("o_orderstatus") == "F"),
            li.l_orderkey == o.o_orderkey,
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    return (
        lines.where(F.col("late") == 1)
        .join(
            per_order.where(
                (F.col("n_supp") > 1) & (F.col("n_late") == 1)
            ),
            F.col("l_orderkey") == F.col("ok"),
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
