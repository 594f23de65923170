"""Subquery shapes: scalar and correlated aggregates.

Spark's Catalyst de-correlates subqueries into joins; these operators
express the de-correlated form directly in the DataFrame API — a
broadcast of a 1-row aggregate for the scalar case, an aggregate-join
for the correlated case — which is exactly the physical plan a SQL
subquery compiles to, minus the rewrite step. Both shapes stay fully
keyed/broadcast (no nested-loop re-execution per outer row, which is
how a naive interpreter runs correlated subqueries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import money
from ..io import table
from ..registry import register


@register(
    "subquery_scalar",
    section="2.3",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 2)
             AS above_avg_by
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
    """,
    notes="scalar subquery as broadcast of a 1-row global aggregate "
    "(the TPC-H Q22 idiom); the only 'cross join' is against one row",
)
def subquery_scalar(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > F.col("avg_price") * 1.5)
        .select(
            "o_orderkey",
            "o_totalprice",
            money(F.col("o_totalprice") - F.col("avg_price")).alias("above_avg_by"),
        )
    )


@register(
    "subquery_correlated",
    section="2.3",
    oracle="""
    SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS bal
    FROM customer c
    WHERE c_acctbal > 1.8 * (SELECT AVG(c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
    """,
    notes="correlated aggregate subquery, de-correlated to "
    "group-aggregate + equi-join (Catalyst's own rewrite, hand-expressed)",
)
def subquery_correlated(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    per_nation = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        c.join(F.broadcast(per_nation), c.c_nationkey == per_nation.nk)
        .where(F.col("c_acctbal") > 1.8 * F.col("nation_avg"))
        .select(
            "c_custkey", "c_nationkey", money(F.col("c_acctbal")).alias("bal")
        )
    )


@register(
    "sql_api_analytics",
    section="2.2",
    oracle="""
    WITH m AS (
      SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
               AS month, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders WHERE o_orderstatus = 'F'
      GROUP BY 1, 2)
    SELECT month, o_orderpriority, n_orders, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY o_orderpriority
                                     ORDER BY month) AS BIGINT) AS run_cents
    FROM m
    """,
    notes="the SQL front-end surface: a multi-CTE analytic query submitted "
    "through spark.sql() over registered temp views — NOT an oracle "
    "passthrough (Spark dialect, distinct text; unix-free month strings, "
    "cent-integerized sums per the cross-engine float discipline). Proves "
    "a reference user can drive the engine with SQL alone; Catalyst "
    "compiles it to the same pushed-scan + partial-agg + window plan the "
    "DataFrame form gets",
)
def sql_api_analytics(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH monthly AS (
          SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING)
                   AS month, o_orderpriority,
                 COUNT(*) AS n_orders,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
          FROM orders WHERE o_orderstatus = 'F'
          GROUP BY 1, 2)
        SELECT month, o_orderpriority, n_orders, rev_cents,
               SUM(rev_cents) OVER (PARTITION BY o_orderpriority
                                    ORDER BY month) AS run_cents
        FROM monthly
        """
    )


@register(
    "sql_pivot_surface",
    section="2.2",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT)
             AS n_open,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
             AS n_filled,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT)
             AS n_partial
    FROM orders GROUP BY o_orderpriority
    """,
    notes="the SQL PIVOT clause surface (spark.sql front-end, not the "
    "DataFrame .pivot API that agg_pivot covers) — compiles to the same "
    "single hash aggregate with conditional counts; oracle spells the "
    "CASE expansion",
)
def sql_pivot_surface(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               coalesce(O, 0) AS n_open,
               coalesce(F, 0) AS n_filled,
               coalesce(P, 0) AS n_partial
        FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
        PIVOT (COUNT(*) FOR o_orderstatus IN ('O' AS O, 'F' AS F, 'P' AS P))
        """
    )


@register(
    "subquery_exists",
    section="2.2",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_orderstatus = 'O')
    """,
    notes="correlated EXISTS through the SQL front-end — Catalyst "
    "decorrelates it to a left-semi hash join (asserted in "
    "tests/test_plans.py), never a per-row re-execution",
)
def subquery_exists(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_orderstatus = 'O')
        """
    )


@register(
    "subquery_not_in_nulls",
    section="2.2",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN
                  (SELECT nullif(o_custkey, 7) FROM orders)) AS BIGINT)
        AS n_not_in,
      CAST((SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS
                  (SELECT 1 FROM orders o
                   WHERE nullif(o.o_custkey, 7) = c.c_custkey)) AS BIGINT)
        AS n_not_exists
    """,
    notes="the NOT IN null trap, certified on both engines: a single NULL "
    "in the subquery makes NOT IN three-valued-logic empty (n_not_in = "
    "0) while NOT EXISTS keeps anti-join semantics — the correctness "
    "divergence every SQL engine must honor and every migration guide "
    "warns about. Spark plans the NOT IN as a null-aware anti join",
)
def subquery_not_in_nulls(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN
                      (SELECT nullif(o_custkey, 7) FROM orders)) AS BIGINT)
            AS n_not_in,
          CAST((SELECT COUNT(*) FROM customer c
                WHERE NOT EXISTS
                      (SELECT 1 FROM orders o
                       WHERE nullif(o.o_custkey, 7) = c.c_custkey)) AS BIGINT)
            AS n_not_exists
        """
    )


_REACH_SQL = """
WITH RECURSIVE
ecnt AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
thr AS (SELECT 1.0 * AVG(c) AS t FROM ecnt),
e AS (SELECT src, dst FROM ecnt CROSS JOIN thr WHERE c >= t),
reach(id, hops) AS (
  SELECT n_nationkey, 0 FROM nation WHERE n_regionkey = 1
  UNION ALL
  SELECT e.dst, r.hops + 1
  FROM reach r JOIN e ON e.src = r.id
  WHERE r.hops < 4
)
SELECT id AS nation_id, CAST(MIN(hops) AS BIGINT) AS hops
FROM reach GROUP BY id
"""


@register(
    "sql_recursive_cte",
    section="2.2",
    oracle=_REACH_SQL,
    notes="WITH RECURSIVE (Spark 4 recursive CTE surface): multi-source "
    "BFS min-hop reachability over the above-average-weight nation trade "
    "graph, seeded from every region-1 nation, depth-capped at 4. The "
    "edge threshold is RELATIVE (>= avg pair count) so graph sparsity — "
    "and the hop distribution — is scale-invariant; integer sums make the "
    "avg bit-identical across engines. MIN(hops) after the recursion "
    "collapses the duplicate frontier paths UNION ALL produces. The "
    "recursion operates on the graph-sized aggregate (nations^2 ceiling), "
    "never the raw fact table, so each iteration is a tiny self-join — "
    "the only data-sized work is the one edge aggregation. The oracle "
    "runs the whole thing as one recursive-CTE statement on DuckDB; the "
    "Spark side derives the edge table with the DataFrame API, "
    "localCheckpoints it (UnionLoop otherwise re-plans the edge subtree "
    "INSIDE the loop, re-running the 4-way join every iteration — "
    "measured 3.1s -> 1.9s at sf0.1), and recurses over the ~|V|^2-row "
    "checkpointed view",
)
def sql_recursive_cte(spark, sf_dir):
    from ..io import register_views, table

    register_views(spark, sf_dir)
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    ecnt = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey != s.s_nationkey)
        .groupBy(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    thr = ecnt.agg((1.0 * F.avg("c")).alias("t"))
    edges = (
        ecnt.crossJoin(F.broadcast(thr))
        .where(F.col("c") >= F.col("t"))
        .select("src", "dst")
        .localCheckpoint()
    )
    edges.createOrReplaceTempView("trade_edges")
    return spark.sql(
        """
        WITH RECURSIVE reach(id, hops) AS (
          SELECT n_nationkey, 0 FROM nation WHERE n_regionkey = 1
          UNION ALL
          SELECT e.dst, r.hops + 1
          FROM reach r JOIN trade_edges e ON e.src = r.id
          WHERE r.hops < 4
        )
        SELECT id AS nation_id, CAST(MIN(hops) AS BIGINT) AS hops
        FROM reach GROUP BY id
        """
    )


@register(
    "join_lateral",
    section="2.3",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) t
    """,
    notes="LATERAL correlated subquery (top-2 orders per customer) "
    "through the SQL front-end: Catalyst rewrites the per-row LIMIT "
    "into a windowed rank over one keyed shuffle — the decorrelation "
    "that makes LATERAL scale instead of re-executing per outer row",
)
def join_lateral(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        """
    )


@register(
    "sql_group_by_all",
    section="2.2",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM lineitem GROUP BY ALL ORDER BY ALL
    """,
    notes="GROUP BY ALL / ORDER BY ALL (the DuckDB-pioneered shorthand "
    "Spark 4 adopted): every non-aggregate select item groups, every "
    "output column orders — the ergonomic surface analysts reach for "
    "first. Identical dialect text runs on both engines but each "
    "resolves the shorthand through its own analyzer; Spark compiles "
    "it to the same pushed-scan + partial-agg plan the explicit form "
    "gets (no penalty for the sugar)",
)
def sql_group_by_all(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev_cents
        FROM lineitem GROUP BY ALL ORDER BY ALL
        """
    )


@register(
    "sql_parameterized",
    section="2.11",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM orders
    WHERE o_totalprice > 250000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    notes="parameterized SQL (Spark 4 named-parameter binding): the "
    "statement text carries :min_price / :status placeholders and the "
    "values bind server-side through spark.sql(args=...) — the "
    "injection-safe prepared-statement surface a SQL front-end needs. "
    "Parameter marks bind as typed literals BEFORE optimization, so "
    "the filter still pushes to the scan exactly like an inlined "
    "constant (no penalty for the indirection)",
)
def sql_parameterized(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 250000.0, "status": "O"},
    ).select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.col("rev_cents").cast("long").alias("rev_cents"),
    )


@register(
    "sql_pipe_surface",
    section="2.11",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    HAVING COUNT(*) >= 5
    ORDER BY n.n_name
    """,
    notes="SQL pipe syntax (Spark 4's |> operator chain, the "
    "GoogleSQL-pioneered linear dialect): FROM orders |> WHERE |> JOIN "
    "|> AGGREGATE ... GROUP BY |> WHERE (post-aggregation = HAVING) "
    "|> ORDER BY — each stage reads top-to-bottom in execution order "
    "instead of the inside-out SELECT nesting. The oracle is the "
    "equivalent classic ANSI statement (DuckDB has no pipe dialect), "
    "proving the sugar changes NOTHING semantically; Spark's analyzer "
    "lowers the chain to the same pushed-scan + broadcast-join + "
    "partial-agg plan the nested form gets. Completes the SQL-surface "
    "set: GROUP BY ALL (sql_group_by_all), named parameters "
    "(sql_parameterized), recursive CTEs (sql_recursive_cte), pipes",
)
def sql_pipe_surface(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> JOIN customer ON o_custkey = c_custkey
        |> JOIN nation ON c_nationkey = n_nationkey
        |> AGGREGATE COUNT(*) AS n_orders,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS rev_cents
           GROUP BY n_name
        |> WHERE n_orders >= 5
        |> SELECT n_name, n_orders, CAST(rev_cents AS BIGINT) AS rev_cents
        |> ORDER BY n_name
        """
    )
