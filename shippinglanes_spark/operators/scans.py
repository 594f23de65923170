"""SURVEY §2.1 — scans, sources, sinks.

Scale notes: both queries are pure parquet scans; `scan_pruned` exists to
prove predicate pushdown + column pruning reach the scan node (asserted in
tests/test_plans.py via PushedFilters/ReadSchema) — at 100 TB that is the
difference between reading 2 columns of a few row groups and reading
everything.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..core import as_date
from ..io import table
from ..registry import register

# Derived partitioned layouts live under the repo (fixtures are read-only);
# one layout per (sf_dir) is materialized on first use and reused after.
_DERIVED_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".derived",
)


def partitioned_orders_path(spark, sf_dir: str) -> str:
    """Materialize (once) an orders copy partitioned by order year —
    the hive-style layout a 100 TB lake would maintain for its fact
    tables — and return its path."""
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    out = os.path.join(_DERIVED_ROOT, tag, "orders_by_year")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        o = table(spark, sf_dir, "orders")
        (
            o.withColumn("o_year", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(out)
        )
    return out

_LI_COLS = (
    "l_orderkey l_partkey l_suppkey l_linenumber l_quantity l_extendedprice "
    "l_discount l_tax l_returnflag l_linestatus"
).split()


@register(
    "scan_parquet",
    section="2.1",
    oracle=f"""
    SELECT {', '.join(_LI_COLS)}, CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS l_shipdate
    FROM lineitem
    """,
)
def scan_parquet(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(*_LI_COLS, as_date("l_shipdate").cast("string").alias("l_shipdate"))


@register(
    "scan_pruned",
    section="2.1",
    oracle="""
    SELECT l_orderkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 10
    """,
)
def scan_pruned(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_quantity", "l_extendedprice")


@register(
    "scan_partition_pruned",
    section="2.1",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE year(o_orderdate) IN (1996, 1997)
    GROUP BY 1, 2
    """,
    notes="reads a hive-partitioned (o_year=...) layout with a partition-key "
    "predicate: the filter prunes DIRECTORIES at the file index "
    "(PartitionFilters, asserted in tests/test_plans.py), so non-matching "
    "years are never opened - the oracle proves the pruned read equals the "
    "full-scan-and-filter semantics",
)
def scan_partition_pruned(spark, sf_dir):
    path = partitioned_orders_path(spark, sf_dir)
    o = spark.read.parquet(path)
    return (
        o.where(F.col("o_year").isin(1996, 1997))
        .groupBy(F.col("o_year").cast("int").alias("o_year"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "scan_dpp",
    section="2.1",
    oracle="""
    WITH yrs AS (
      SELECT DISTINCT CAST(year(l_shipdate) AS BIGINT) AS yr
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01')
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN yrs ON CAST(year(o_orderdate) AS BIGINT) = yrs.yr
    GROUP BY 1
    """,
    notes="dynamic partition pruning: the fact side is the hive-"
    "partitioned (o_year=...) layout and the pruning years come from a "
    "FILTERED DIM SCAN, not a literal — Catalyst injects a "
    "dynamicpruningexpression into PartitionFilters at runtime "
    "(asserted in tests/test_plans.py), so only the dim's years are "
    "ever opened. The static-literal variant is scan_partition_pruned; "
    "together they cover both halves of partition pruning at 100 TB",
)
def scan_dpp(spark, sf_dir):
    """The join-driven half of partition pruning: nobody types the year
    list in a real pipeline — it arrives from another table. The dim
    (distinct ship years, filtered) broadcasts; its values prune the
    fact layout's directories before any fact bytes are read."""
    path = partitioned_orders_path(spark, sf_dir)
    o = spark.read.parquet(path)
    li = table(spark, sf_dir, "lineitem")
    yrs = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select(F.year("l_shipdate").cast("long").alias("yr"))
        .distinct()
    )
    return (
        o.join(yrs, o.o_year == yrs.yr)
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "scan_metadata_columns",
    section="2.1",
    oracle="""
    SELECT 'events.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) > 0 AS INT) AS size_known
    FROM events
    """,
    notes="the hidden _metadata struct every file scan carries "
    "(file_name / file_size / file_modification_time ...): the lineage "
    "surface incremental pipelines use to attribute rows to source "
    "objects without a manifest join. Grouping by _metadata.file_name "
    "is free — it's a per-split constant, no shuffle widening",
)
def scan_metadata_columns(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_size").alias("file_size"),
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.min("file_size") > 0).cast("int").alias("size_known"),
        )
    )


@register(
    "scan_observed",
    section="2.1",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(COUNT(*) FILTER (value IS NULL) AS BIGINT) AS n_null
    FROM events
    """,
    notes="the Observation API (df.observe): accumulator-style metrics "
    "collected DURING a pass — row count, exact cents sum, null count "
    "— without a second scan or a separate aggregation job. The "
    "production use is data-quality counters riding an ETL write for "
    "free; here the observed metrics are returned as the result row "
    "and hash-checked against the straight aggregate, proving the "
    "side-channel sees every row exactly once. The observe pass runs "
    "a noop sink (full scan, no driver transfer)",
)
def scan_observed(spark, sf_dir):
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("scan_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.count(F.when(F.col("value").isNull(), 1)).cast("long").alias("n_null"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_cents"], m["n_null"])],
        "n_rows long, sum_cents long, n_null long",
    )
