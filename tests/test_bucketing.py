"""Bucketed co-located join: the 100 TB fact⋈fact strategy.

When both sides of a big join are bucketed on the key, Spark reads
bucket i of each table into the same task and joins with ZERO exchanges —
the layout a production lake would use for lineitem⋈orders at scale.
This test materializes bucketed copies and asserts the shuffle-free plan
and result parity with the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippinglanes_spark.io import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf so it can't be pointed at a tmpdir on a live session
    import shutil

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for df, name, key in ((li, "li_b", "l_orderkey"), (o, "o_b", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"spark-warehouse/{name}", ignore_errors=True)
        df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)
    yield spark.table("li_b"), spark.table("o_b")
    for name in ("li_b", "o_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li_b, o_b = bucketed
    # the fixture tables are tiny enough to broadcast, which would bypass
    # the bucketed path we're demonstrating; at production fact⋈fact
    # sizes broadcast is off the table anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" not in plan  # co-located: bucket-to-bucket join
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed):
    li_b, o_b = bucketed
    got = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
        )
        .first()
    )
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
        )
        .first()
    )
    assert (got.n, got.q) == (want.n, want.q)
