"""SURVEY §2.10 stream_lift — batch ops re-run as Structured Streaming.

The engine's event operators are plain DataFrame expressions, so lifting
them to a stream is a source swap: `readStream` over the same files, the
same aggregation, a memory sink. `stream_lift` runs evt_tumbling's
aggregation as a stream (availableNow trigger drains the source, complete
mode emits every window) and its oracle is evt_tumbling's own SQL — the
hash match IS the batch≡stream equivalence proof. Watermarked append-mode
(the production late-data config) is exercised in tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from ..core import as_date, epoch_us, money
from ..io import table
from ..registry import register
from ..session import apply_runtime_confs, stream_partitions


@register(
    "stream_lift",
    section="2.10",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    notes="evt_tumbling lifted to Structured Streaming; oracle = the batch SQL, "
    "so the driver's hash check proves batch≡stream",
)
def stream_lift(spark, sf_dir):
    apply_runtime_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # The file streaming source takes a directory; pathGlobFilter narrows
    # it to the events table.
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    agg = stream.groupBy(
        as_date(F.date_trunc("day", F.col("ts"))).cast("string").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum("value")).alias("sum_value"),
    )
    name = f"stream_lift_{uuid.uuid4().hex[:8]}"
    with stream_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.table(name)


@register(
    "stream_session_window",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
               FROM events),
    g AS (SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER (
                           PARTITION BY user_id ORDER BY ts_us, event_id)
                         > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT *, CAST(SUM(new_sess) OVER (
                      PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS session_id
          FROM g)
    SELECT user_id, MIN(ts_us) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
    notes="F.session_window as a STREAMING stateful aggregation (gap-merge "
    "session state, availableNow drain, complete mode); oracle = the batch "
    "window-SQL sessionize CTE, so the driver's hash check proves "
    "batch-sessionize ≡ stream-session-window on identical input",
)
def stream_session_window(spark, sf_dir):
    apply_runtime_confs(spark)
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            epoch_us(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    with stream_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.table(name)


@register(
    "stream_dedup",
    section="2.10",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
               FROM events)
    SELECT event_id, user_id, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts_us, user_id) AS rn
      FROM e)
    WHERE rn = 1
    """,
    notes="streaming replay-dedup: keep the earliest copy per event_id via a "
    "min(struct) stateful aggregation (arrival-order independent, unlike "
    "stream dropDuplicates); oracle = the batch evt_late_dedup SQL, so the "
    "hash check proves batch≡stream dedup",
)
def stream_dedup(spark, sf_dir):
    """Duplicate/late-replay consolidation as a streaming stateful
    aggregation: min over struct(ts, tiebreak, payload) per event_id is
    deterministic regardless of arrival order — the property file-order-
    based dropDuplicates lacks — and its state is one struct per key,
    mergeable across micro-batches."""
    apply_runtime_confs(spark)
    stream = _events_stream(spark, sf_dir)
    first_copy = F.min(
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    ).alias("fc")
    agg = (
        stream.groupBy("event_id")
        .agg(first_copy)
        .select(
            "event_id",
            F.col("fc.user_id").alias("user_id"),
            F.col("fc.event_type").alias("event_type"),
            F.col("fc.value").alias("value"),
        )
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with stream_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.table(name)


def tumbling_watermarked(spark, sf_dir, gap: str = "1 hour"):
    """Production-shaped variant: event-time window + watermark, append
    mode (late rows beyond the watermark are dropped). Used by the
    streaming tests; not a declared query because append-mode emission
    depends on watermark advancement, not on the data alone."""
    apply_runtime_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # The file streaming source takes a directory; pathGlobFilter narrows
    # it to the events table.
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = _eventtime_ts(stream)
    return (
        stream.withWatermark("ts", gap)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _eventtime_ts(stream):
    """Normalize the ``ts`` column to TimestampType (LTZ): watermarks and
    event-time windows reject TIMESTAMP_NTZ, and parquet written by Arrow
    (isAdjustedToUTC=false) infers as NTZ under Spark 4. The session runs
    in UTC, so the cast is value-preserving."""
    dtype = dict(stream.dtypes).get("ts")
    if dtype == "bigint":
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _events_stream(spark, sf_dir):
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _eventtime_ts(stream)


def _drain(agg, name_prefix: str, output_mode: str, partitions: int = 8):
    """Run a streaming DataFrame to completion into a memory sink and
    return the drained table. State-store partitions are pinned small for
    the drain (see session.stream_partitions) — a plain driver session's
    200-partition default costs ~200 state tasks per micro-batch.
    Stream-stream joins keep FOUR state stores per partition, so their
    drains pass an even smaller count (measured: 8 -> 5.0 s, 4 -> 3.8 s
    for stream_join_outer at sf0.1; the rest is the per-micro-batch
    incremental re-plan floor)."""
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    with stream_partitions(agg.sparkSession, partitions):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return agg.sparkSession.table(name)


@register(
    "stream_join",
    section="2.10",
    oracle="""
    WITH v AS (SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
               FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id AS p_user, event_id AS purchase_id, ts AS p_ts
          FROM events WHERE event_type = 'purchase')
    SELECT p_user, purchase_id, view_id
    FROM p JOIN v ON p_user = v_user
       AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts
    """,
    notes="stream-stream inner join (watermark-bounded state) drained and "
    "hash-compared to the batch interval join - inner-join emissions are "
    "watermark-independent, so the equality is exact",
)
def stream_join(spark, sf_dir):
    return _drain(
        stream_stream_join(spark, sf_dir), "stream_join", "append", partitions=4
    )


@register(
    "stream_stateful_totals",
    section="2.10",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
    notes="applyInPandasWithState custom accumulator (explicit GroupState) "
    "drained; the fixture is one file = one micro-batch, so the final "
    "update per user equals the batch aggregate - a full value oracle for "
    "the custom-stateful-operator surface",
)
def stream_stateful_totals(spark, sf_dir):
    from .stateful import running_user_totals

    out = _drain(
        running_user_totals(spark, sf_dir), "stream_totals", "update"
    )
    return out.select(
        "user_id", "n_events", money(F.col("sum_value")).alias("sum_value")
    )


def stream_stream_join(spark, sf_dir):
    """Stream-stream inner join: each purchase joined to the same user's
    views from the preceding hour. Watermarks on both sides bound the
    join state (Spark drops buffered rows older than watermark+bound) —
    the production shape for event-correlation at scale. Inner-join
    emissions are watermark-independent, so the drained result equals the
    batch interval join (asserted in tests/test_streaming.py)."""
    apply_runtime_confs(spark)
    ev = _events_stream(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
    ).select("p_user", "purchase_id", "view_id")


@register(
    "stream_sliding",
    section="2.10",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', MIN(ts)) - INTERVAL 5 HOUR AS lo,
                      date_trunc('hour', MAX(ts)) AS hi
               FROM events),
    ws AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS w_start FROM b)
    SELECT epoch_us(w_start) AS w_start_us, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ws JOIN events ON ts >= w_start AND ts < w_start + INTERVAL 6 HOUR
    GROUP BY w_start, event_type
    """,
    notes="evt_sliding lifted to Structured Streaming: overlapping 6h/1h "
    "windows as a streaming stateful aggregation (each event updates 6 "
    "window states), availableNow drain; oracle = the batch evt_sliding "
    "SQL, so the hash check proves batch≡stream for overlapping windows",
)
def stream_sliding(spark, sf_dir):
    apply_runtime_confs(spark)
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.select(F.window("ts", "6 hours", "1 hour").alias("w"), "event_type")
        .groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            epoch_us(F.col("w.start")).alias("w_start_us"),
            "event_type",
            "n",
        )
    )
    return _drain(agg, "stream_sliding", "complete")


@register(
    "stream_incremental_rollup",
    section="2.10",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    notes="the foreachBatch delta-rollup MAINTENANCE pipeline as a "
    "declared query: stream events one file per micro-batch into "
    "per-(day, batch) delta partitions, then fold the deltas with "
    "read_rollup. Oracle = the plain batch aggregate — the hash match "
    "proves the incremental table equals the from-scratch answer "
    "(idempotent replays and multi-batch days are separately tested in "
    "tests/test_maintenance.py)",
)
def stream_incremental_rollup(spark, sf_dir):
    """Incremental materialized-view maintenance end-to-end: the stream
    writes partial aggregates as (day, batch) delta partitions (dynamic
    partition overwrite makes replays idempotent), and the read folds
    them — sums are algebraic, so folded partials equal the one-shot
    aggregate exactly. At 100 TB the rollup table is the thing that
    makes daily dashboards O(days), not O(events)."""
    import shutil
    import tempfile

    from ..sources.maintenance import incremental_rollup, read_rollup

    out = tempfile.mkdtemp(prefix="rollup_")
    shutil.rmtree(out, ignore_errors=True)
    with stream_partitions(spark):
        q = incremental_rollup(spark, sf_dir, out)
        q.awaitTermination()
    folded = read_rollup(spark, out)
    # localCheckpoint materializes the fold, so the scratch delta dir
    # (and its checkpoint) can be removed before returning
    result = folded.select(
        F.col("day").cast("string").alias("day"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        "sum_value",
    ).localCheckpoint()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(f"{out}_ckpt", ignore_errors=True)
    return result


@register(
    "stream_rate_limit",
    section="2.10",
    oracle="""
    WITH r AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                      ROW_NUMBER() OVER (
                        PARTITION BY user_id, date_trunc('hour', ts)
                        ORDER BY epoch_us(ts), event_id) AS rn
               FROM events)
    SELECT user_id, event_id, ts_us FROM r WHERE rn <= 3
    """,
    notes="evt_rate_limit lifted to streaming: applyInPandasWithState "
    "keeps the per-(user, hour) admission tally as GroupState, so the "
    "budget survives across micro-batches/replays; drained result is "
    "hash-equal to the batch window SQL - a full value oracle for a "
    "second custom-stateful operator shape (filtering, vs the totals "
    "accumulator)",
)
def stream_rate_limit(spark, sf_dir):
    from .stateful import rate_limited_events

    return _drain(rate_limited_events(spark, sf_dir), "stream_ratelimit", "update")


@register(
    "stream_transform_with_state",
    section="2.10",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_us
    FROM events GROUP BY user_id
    """,
    notes="the Spark 4 transformWithStateInPandas arbitrary-state API "
    "(StatefulProcessor + typed ValueState handles — the successor to "
    "applyInPandasWithState, with timers/TTL/multiple state variables): "
    "per-user activity profile accumulated across micro-batches, drained "
    "final rows hash-equal to the batch aggregate. NOT driver-declared: "
    "the TWS state-server protocol needs google.protobuf, absent from "
    "this container (environment-gated like multimodal_decode's codecs); "
    "tests/test_streaming.py runs it where protobuf exists",
    declare=False,
)
def stream_transform_with_state(spark, sf_dir):
    from .stateful import user_activity_tws

    return _drain(user_activity_tws(spark, sf_dir), "stream_tws", "update")


@register(
    "stream_topk_per_window",
    section="2.10",
    oracle="""
    WITH d AS (SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)
                        AS day,
                      event_type, CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2)
    SELECT day, event_type, n FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                                   ORDER BY n DESC, event_type) AS rn
      FROM d)
    WHERE rn <= 3
    """,
    notes="windowed top-k as a STREAM: complete-mode day/type counts "
    "drained, then the rank applied over the drained state — the "
    "trending-now dashboard shape; the hash match vs the batch "
    "window-SQL proves the streaming aggregation state equals the "
    "from-scratch counts before ranking",
)
def stream_topk_per_window(spark, sf_dir):
    from pyspark.sql import Window

    apply_runtime_confs(spark)
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy(
        as_date(F.date_trunc("day", F.col("ts"))).cast("string").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    drained = _drain(agg, "stream_topk", "complete")
    w = Window.partitionBy("day").orderBy(F.desc("n"), "event_type")
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )
