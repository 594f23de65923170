"""SURVEY §2.1 — scans, sources, sinks.

Scale notes: both queries are pure parquet scans; `scan_pruned` exists to
prove predicate pushdown + column pruning reach the scan node (asserted in
tests/test_plans.py via PushedFilters/ReadSchema) — at 100 TB that is the
difference between reading 2 columns of a few row groups and reading
everything.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import as_date
from ..io import table
from ..registry import register

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
