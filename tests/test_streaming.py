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
