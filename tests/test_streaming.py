"""Streaming lift: batch≡stream on identical input, and the watermarked
append-mode path used in production for late data."""

from __future__ import annotations

import uuid

from shippinglanes_spark.registry import all_queries
from shippinglanes_spark.streaming.lift import tumbling_watermarked


def test_stream_lift_equals_batch(spark, sf_dir):
    Q = all_queries()
    batch = {
        (r.day, r.event_type): (r.n, r.sum_value)
        for r in Q["evt_tumbling"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r.day, r.event_type): (r.n, r.sum_value)
        for r in Q["stream_lift"].fn(spark, sf_dir).collect()
    }
    assert batch == stream


def test_watermarked_append_runs(spark, sf_dir):
    agg = tumbling_watermarked(spark, sf_dir)
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    out = spark.table(name).collect()
    # append mode emits only windows fully below the final watermark:
    # every day of the month-long fixture except the last open one(s).
    days = {r.w.start.day for r in out}
    assert len(days) >= 25
    assert all(r.n > 0 for r in out)


def test_stateful_totals_equal_batch(spark, sf_dir):
    import uuid as _uuid

    from shippinglanes_spark.io import table
    from shippinglanes_spark.streaming.stateful import running_user_totals
    from pyspark.sql import functions as F

    out = running_user_totals(spark, sf_dir)
    name = f"stateful_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    # update mode re-emits a user's row per batch; the last emission per
    # user is the final state
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }
    ev = table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, r.t)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("t"),
        )
        .collect()
    }
    assert got == want


def test_stream_stream_join_equals_batch(spark, sf_dir):
    import uuid as _uuid

    from pyspark.sql import functions as F

    from shippinglanes_spark.io import table
    from shippinglanes_spark.streaming.lift import stream_stream_join

    out = stream_stream_join(spark, sf_dir)
    name = f"ssj_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    got = {
        (r.p_user, r.purchase_id, r.view_id) for r in spark.table(name).collect()
    }
    ev = table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    want = {
        (r.p_user, r.purchase_id, r.view_id)
        for r in p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") <= F.col("p_ts")),
        )
        .select("p_user", "purchase_id", "view_id")
        .collect()
    }
    assert got == want and len(got) > 0
