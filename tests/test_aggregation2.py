"""Accuracy contract for agg_sketch_merge (mergeable HLL pre-aggregation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shippinglanes_spark.io import table
from shippinglanes_spark.operators.aggregation import agg_sketch_merge


def test_sketch_merge_lossless_and_accurate(spark, sf_dir):
    merged = {
        r["event_type"]: r["approx_users"]
        for r in agg_sketch_merge(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    single = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("n")
        )
        .collect()
    }
    assert set(merged) == set(exact)
    for k, est in merged.items():
        # union-merge of same-config sketches is lossless: merged == single-pass
        assert est == single[k]
        # and the sketch itself is within HLL error of exact
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k])
