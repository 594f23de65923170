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


def test_late_rows_dropped_exact_count(spark, tmp_path):
    """Constructed micro-batches with known late rows: batch 0 advances
    the watermark, batch 1 is a buffer (Spark's late filter lags the
    eviction watermark by one batch), batch 2 injects 4 old rows of
    which exactly 3 sit below the watermark — accounting must say 3."""
    import json
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from shippinglanes_spark.streaming.lift import _eventtime_ts

    def us(day, hour=0):
        import datetime

        return datetime.datetime(2024, 1, day, hour)

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    # watermark delay 2 days; batch0 max = Jan 10 -> wm = Jan 8T00:00
    batches = [
        [(1, us(10)), (2, us(9))],  # recent: advances wm to Jan 8
        [(3, us(9, 12))],  # buffer batch
        # late batch: 3 rows strictly below Jan 8, 1 at Jan 8T06 (kept)
        [(4, us(5)), (5, us(6)), (6, us(7, 23)), (7, us(8, 6))],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        pq.write_table(t, f"{stage}/f{i}.parquet")
        os.utime(f"{stage}/f{i}.parquet", (now - 180 + i * 60,) * 2)
    stream = _eventtime_ts(
        spark.readStream.schema("event_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    dedup = stream.withWatermark("ts", "2 days").dropDuplicates(
        ["event_id", "ts"]
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = 0
    for p in q.recentProgress:
        prog = json.loads(p.json)
        for so in prog.get("stateOperators", []):
            dropped += int(so.get("numRowsDroppedByWatermark", 0))
    q.stop()
    assert dropped == 3
    admitted = {r.event_id for r in spark.table(name).collect()}
    assert admitted == {1, 2, 3, 7}


def test_exactly_once_sink_replay_idempotent(spark, sf_dir, tmp_path):
    """Replaying ANY batch (not just the last) through the exactly-once
    writer must leave the folded sink identical — the versioned keyed
    write is the fence."""
    from shippinglanes_spark.streaming.latedata import (
        LATE_FILE,
        _stage_batches,
        _staged_stream,
        exactly_once_batch_writer,
    )

    stage = _stage_batches(spark, sf_dir)
    target = str(tmp_path / "eos")
    writer = exactly_once_batch_writer(target)
    stream = _staged_stream(spark, sf_dir, stage)
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    import os
    import shutil

    versions = sorted(int(d[1:]) for d in os.listdir(target) if d[0] == "v")
    last = versions[-1]
    before = {
        (r.day, r.event_type): (r.n, r.sum_cents)
        for r in spark.read.parquet(f"{target}/v{last}").collect()
    }
    # replay the LAST batch twice and an EARLIER batch once
    late_df = spark.read.parquet(f"{stage}/{LATE_FILE}")
    writer(late_df, last)
    writer(late_df, last)
    if len(versions) >= 2:
        buf_df = spark.read.parquet(f"{stage}/batch1_buffer.parquet")
        writer(buf_df, versions[-2])
    after = {
        (r.day, r.event_type): (r.n, r.sum_cents)
        for r in spark.read.parquet(f"{target}/v{last}").collect()
    }
    assert after == before
    shutil.rmtree(stage, ignore_errors=True)


def test_transform_with_state_equals_batch(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) profile
    must equal the batch aggregate. Skipped where the TWS state-server
    dependency (protobuf) is absent — the environment gate is the
    reason the query is registered with declare=False."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from shippinglanes_spark.registry import all_queries

    Q = all_queries()
    got = {
        r.user_id: (r.n_events, r.n_types, r.first_us, r.last_us)
        for r in Q["stream_transform_with_state"].fn(spark, sf_dir).collect()
    }
    from shippinglanes_spark.io import table

    ev = table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, r.t, r.f, r.l)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("t"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("f"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("l"),
        )
        .collect()
    }
    assert got == want


def test_stream_partitions_pin_restores_conf(spark):
    """The drain-time state-partition pin must restore the caller's
    shuffle-partition setting afterwards (batch plans untouched)."""
    from shippinglanes_spark.session import stream_partitions

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with stream_partitions(spark, 4):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # exception-safe: the finally path restores too
    try:
        with stream_partitions(spark, 3):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
