"""SURVEY §2.2 — projection, filter, scalar expressions.

All expressions are JVM-side Catalyst expressions (no UDFs) so they stay
inside WholeStageCodegen; per-row double arithmetic is IEEE-deterministic
and therefore bit-identical to the DuckDB oracle without rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import as_date
from ..io import table
from ..registry import register


@register(
    "project_arith",
    section="2.2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def project_arith(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("revenue"),
        (disc * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@register(
    "filter_pred",
    section="2.2",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority IS NOT NULL
    """,
)
def filter_pred(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "filter_like",
    section="2.2",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%red%' OR p_name LIKE 'small%'
    """,
)
def filter_like(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").like("%red%") | F.col("p_name").like("small%")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "case_when",
    section="2.2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band,
           CASE l_returnflag WHEN 'A' THEN 'accepted'
                             WHEN 'R' THEN 'returned'
                             ELSE 'none' END AS flag_desc
    FROM lineitem
    """,
)
def case_when(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "A", "accepted")
        .when(F.col("l_returnflag") == "R", "returned")
        .otherwise("none")
        .alias("flag_desc"),
    )


@register(
    "cast_types",
    section="2.2",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate_str
    FROM orders
    """,
    notes="double->int via FLOOR on both sides: Spark cast truncates, DuckDB rounds",
)
def cast_types(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor(F.col("o_totalprice")).cast("long").alias("price_int"),
        as_date("o_orderdate").cast("string").alias("odate"),
        as_date("o_orderdate").cast("string").alias("odate_str"),
    )


@register(
    "null_handling",
    section="2.2",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS pos_bal,
           CAST(c_nationkey IS NOT DISTINCT FROM 5 AS INT) AS is_n5
    FROM customer
    """,
)
def null_handling(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
        F.coalesce(
            F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")),
            F.lit(0.0),
        ).alias("pos_bal"),
        F.col("c_nationkey").eqNullSafe(F.lit(5)).cast("int").alias("is_n5"),
    )


@register(
    "project_unpivot",
    section="2.2",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric,
           FLOOR(val * 100) / 100.0 AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    ) t
    """,
    notes="UNPIVOT/melt — the inverse of agg_pivot: wide numeric columns "
    "to (metric, value) rows via stack(), the wide-to-long reshape every "
    "metrics pipeline needs; a pure per-row generator (3x row expansion, "
    "no shuffle). Values floor-disciplined for the cross-engine hash",
)
def project_unpivot(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount)"
        ).alias("metric", "raw"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "metric",
        (F.floor(F.col("raw") * 100) / 100.0).alias("val"),
    )


@register(
    "project_explode_outer",
    section="2.2",
    oracle="""
    WITH d AS (SELECT doc_id,
                      list_filter(string_split(text, ' '),
                                  t -> length(t) >= 6) AS longs
               FROM documents)
    SELECT d.doc_id, u.tok
    FROM d LEFT JOIN (SELECT doc_id, UNNEST(longs) AS tok FROM d) u
      ON u.doc_id = d.doc_id
    """,
    notes="NULL-PRESERVING explode (explode_outer / LEFT JOIN UNNEST): "
    "documents whose filtered token array is EMPTY survive as a row "
    "with a NULL element instead of vanishing — the difference "
    "between 'docs and their long tokens' and 'docs that happen to "
    "have long tokens', which silently changes downstream counts "
    "when inner explode is used by habit. Pure per-row generate, "
    "zero shuffles",
)
def project_explode_outer(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split("text", " "), lambda t: F.length(t) >= 6
        ).alias("longs"),
    )
    return d.select("doc_id", F.explode_outer("longs").alias("tok"))
