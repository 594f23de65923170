"""Accuracy contract for agg_sketch_merge (mergeable HLL pre-aggregation).

The registered query now emits (exact_users, merged_within_5pct) so the
driver value-oracles it; the raw merged ESTIMATE — deliberately absent
from the query output — is rebuilt here to assert the lossless-merge
property the notes claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from shippinglanes_spark.io import table
from shippinglanes_spark.operators.aggregation import agg_sketch_merge


def test_sketch_merge_lossless_and_accurate(spark, sf_dir):
    out = {
        r["event_type"]: (r["exact_users"], r["merged_within_5pct"])
        for r in agg_sketch_merge(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    merged = {
        r["event_type"]: r["n"]
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
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
    assert set(out) == set(exact)
    for k, (ex, flag) in out.items():
        assert ex == exact[k]
        assert flag == 1
        # union-merge of same-config sketches is lossless: merged == single-pass
        assert merged[k] == single[k]
        # and the sketch itself is within HLL error of exact
        assert abs(merged[k] - exact[k]) <= max(1, 0.05 * exact[k])
