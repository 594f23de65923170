"""SURVEY §2.10 — event-stream / sessionization / pattern operators.

These are the AIS-domain semantics (voyage segmentation on time gaps,
per-voyage stats, windowed traffic counts, pattern funnels) expressed over
the batch `events` table. Each is a keyed window or keyed aggregation: one
shuffle on user_id, never a per-user collect to the driver — the plans are
identical on a 1000-executor cluster. The same expressions lift to
Structured Streaming (streaming/lift.py) with watermarks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import as_date, epoch_us, money
from ..io import table
from ..registry import register

SESSION_GAP_US = 1_800_000_000  # 30 minutes


def sessionized(spark, sf_dir):
    """events + session_id column (30-min-gap segmentation). Shared by the
    sessionize/session_stats queries and reusable as a library op."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", "value", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    new_sess = F.when(gap > SESSION_GAP_US, 1).otherwise(0)
    return e.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(wrun).cast("long")
    )


_SESSIONIZE_CTE = """
    WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
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
"""


@register(
    "evt_sessionize",
    section="2.10",
    oracle=_SESSIONIZE_CTE
    + """
    SELECT user_id, event_id, session_id FROM s
    """,
    notes="AIS voyage segmentation: gap>30min starts a new session",
)
def evt_sessionize(spark, sf_dir):
    return sessionized(spark, sf_dir).select("user_id", "event_id", "session_id")


@register(
    "evt_session_stats",
    section="2.10",
    oracle=_SESSIONIZE_CTE
    + """
    , w AS (SELECT *,
        FIRST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
          ORDER BY ts_us, event_id) AS first_type,
        LAST_VALUE(event_type) OVER (PARTITION BY user_id, session_id
          ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
      FROM s)
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts_us) - MIN(ts_us) AS dur_us,
           ROUND(SUM(value), 2) AS sum_value,
           first_type, last_type
    FROM w GROUP BY user_id, session_id, first_type, last_type
    """,
)
def evt_session_stats(spark, sf_dir):
    s = sessionized(spark, sf_dir)
    wsess = Window.partitionBy("user_id", "session_id").orderBy("ts_us", "event_id")
    wfull = wsess.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    withtypes = s.withColumn(
        "first_type", F.first("event_type").over(wsess)
    ).withColumn("last_type", F.last("event_type").over(wfull))
    return withtypes.groupBy("user_id", "session_id", "first_type", "last_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
        money(F.sum("value")).alias("sum_value"),
    ).select(
        "user_id", "session_id", "n_events", "dur_us", "sum_value",
        "first_type", "last_type",
    )


@register(
    "evt_tumbling",
    section="2.10",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def evt_tumbling(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            as_date(F.date_trunc("day", F.col("ts"))).cast("string").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("value")).alias("sum_value"),
        )
    )


@register(
    "evt_funnel",
    section="2.10",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS conv_us
      FROM events e JOIN s ON e.user_id = s.user_id
                   AND epoch_us(e.ts) >= s.signup_us
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_us, p.conv_us,
           p.conv_us - s.signup_us AS delta_us
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
    notes="signup->purchase conversion per user; time-to-convert in µs",
)
def evt_funnel(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type", epoch_us("ts").alias("ts_us"))
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(s.withColumnRenamed("user_id", "su"), F.col("user_id") == F.col("su"))
        .where(F.col("ts_us") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("conv_us"))
    )
    return s.join(p, "user_id", "left").select(
        "user_id",
        "signup_us",
        "conv_us",
        (F.col("conv_us") - F.col("signup_us")).alias("delta_us"),
    )


@register(
    "evt_late_dedup",
    section="2.10",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
               FROM events)
    SELECT event_id, user_id, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts_us, user_id) AS rn
      FROM e)
    WHERE rn = 1
    """,
    notes="out-of-order replay dedup: keep earliest copy of each event_id",
)
def evt_late_dedup(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", "event_type", "value", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("event_id").orderBy("ts_us", "user_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "evt_sliding",
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
    notes="6h windows sliding 1h; Spark F.window explodes rows, oracle joins a generated series — both epoch-hour aligned",
)
def evt_sliding(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(F.window("ts", "6 hours", "1 hour").alias("w"), "event_type")
        .groupBy("w", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            epoch_us(F.col("w.start")).alias("w_start_us"),
            "event_type",
            "n",
        )
    )


@register(
    "evt_track_length",
    section="2.10",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             (value % 180) - 90 AS lat, ((value * 2) % 360) - 180 AS lon
      FROM events),
    hops AS (
      SELECT user_id,
             LAG(lat) OVER w AS lat1, LAG(lon) OVER w AS lon1, lat AS lat2, lon AS lon2
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
    SELECT user_id,
           ROUND(SUM(2 * 6371.0 * ASIN(SQRT(
             SIN(RADIANS(lat2 - lat1) / 2) ^ 2
             + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
             * SIN(RADIANS(lon2 - lon1) / 2) ^ 2))), 2) AS track_km,
           CAST(COUNT(lat1) AS BIGINT) AS n_hops
    FROM hops GROUP BY user_id
    """,
    notes="AIS track length: per-vessel sum of consecutive-fix haversine hops "
    "(synthetic lat/lon from value; fixtures lack geo columns)",
)
def evt_track_length(spark, sf_dir):
    from ..functions.scalar import haversine_km

    ev = table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("ts_us"),
        ((F.col("value") % 180) - 90).alias("lat"),
        (((F.col("value") * 2) % 360) - 180).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    hops = pts.select(
        "user_id",
        F.lag("lat").over(w).alias("lat1"),
        F.lag("lon").over(w).alias("lon1"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    return hops.groupBy("user_id").agg(
        F.round(
            F.sum(
                haversine_km(
                    F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
                )
            ),
            2,
        ).alias("track_km"),
        F.count("lat1").alias("n_hops"),
    )


@register(
    "evt_retention",
    section="2.10",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.d0, CAST(date_trunc('day', e.ts) AS DATE)) AS day_n
      FROM events e JOIN first_day f ON e.user_id = f.user_id
    )
    SELECT CAST(day_n AS INT) AS day_n,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity WHERE day_n <= 14 GROUP BY day_n
    """,
    notes="classic D0..D14 retention: per-user first-seen day, distinct active days since",
)
def evt_retention(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    day = as_date(F.date_trunc("day", F.col("ts")))
    e = ev.select("user_id", day.alias("d"))
    first = e.groupBy("user_id").agg(F.min("d").alias("d0"))
    activity = (
        e.join(first, "user_id")
        .select("user_id", F.datediff(F.col("d"), F.col("d0")).alias("day_n"))
        .distinct()
    )
    return (
        activity.where(F.col("day_n") <= 14)
        .groupBy("day_n")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "evt_top_sessions",
    section="2.10",
    oracle=_SESSIONIZE_CTE
    + """
    , agg AS (
      SELECT user_id, session_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 2) AS sum_value
      FROM s GROUP BY user_id, session_id)
    SELECT user_id, session_id, n_events, sum_value
    FROM agg ORDER BY sum_value DESC, user_id, session_id LIMIT 25
    """,
    notes="composite: sessionize -> aggregate -> global top-k by session value",
)
def evt_top_sessions(spark, sf_dir):
    s = sessionized(spark, sf_dir)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum("value")).alias("sum_value"),
        )
        .orderBy(F.desc("sum_value"), "user_id", "session_id")
        .limit(25)
    )


@register(
    "evt_anomaly",
    section="2.10",
    oracle="""
    WITH stats AS (
      SELECT user_id, AVG(value) AS mu, STDDEV_POP(value) AS sigma
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, ROUND(e.value, 2) AS value,
           ROUND((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE s.sigma > 0 AND ABS((e.value - s.mu) / s.sigma) > 2.5
    """,
    notes="per-key z-score outliers (monitoring/pattern detection); "
    "population stddev on both sides",
)
def evt_anomaly(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("user_id").alias("su")).agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(stats, ev.user_id == F.col("su"))
        .where((F.col("sigma") > 0) & (F.abs(z) > 2.5))
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@register(
    "evt_session_window",
    section="2.10",
    oracle=_SESSIONIZE_CTE
    + """
    SELECT user_id, MIN(ts_us) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
    notes="built-in F.session_window (gap-merge) vs the window-SQL sessionize "
    "CTE as oracle — proves the two formulations share semantics",
)
def evt_session_window(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
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


@register(
    "evt_multi_pattern",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    w AS (SELECT *,
        MAX(CASE WHEN event_type = 'signup' THEN ts_us END) OVER uw AS last_signup,
        MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER uw AS last_view,
        MAX(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER uw AS last_purchase
      FROM e
      WINDOW uw AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT user_id,
           CAST(MAX(CASE WHEN event_type = 'purchase' AND last_signup IS NOT NULL
                    THEN 1 ELSE 0 END) AS INT) AS signup_to_purchase,
           CAST(MAX(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
                    AND ts_us - last_view <= 600000000 THEN 1 ELSE 0 END) AS INT)
             AS view_click_10m,
           CAST(MAX(CASE WHEN event_type = 'error' AND last_purchase IS NOT NULL
                    AND ts_us - last_purchase <= 3600000000 THEN 1 ELSE 0 END) AS INT)
             AS purchase_error_1h
    FROM w GROUP BY user_id
    """,
    notes="one-pass multi-pattern detection (SIGMOD'19 theme): three ordered "
    "patterns evaluated from one shared running-max window",
)
def evt_multi_pattern(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    uw = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def last_of(t):
        return F.max(F.when(F.col("event_type") == t, F.col("ts_us"))).over(uw)

    w = (
        e.withColumn("last_signup", last_of("signup"))
        .withColumn("last_view", last_of("view"))
        .withColumn("last_purchase", last_of("purchase"))
    )
    is_p1 = F.when(
        (F.col("event_type") == "purchase") & F.col("last_signup").isNotNull(), 1
    ).otherwise(0)
    is_p2 = F.when(
        (F.col("event_type") == "click")
        & F.col("last_view").isNotNull()
        & (F.col("ts_us") - F.col("last_view") <= 600_000_000),
        1,
    ).otherwise(0)
    is_p3 = F.when(
        (F.col("event_type") == "error")
        & F.col("last_purchase").isNotNull()
        & (F.col("ts_us") - F.col("last_purchase") <= 3_600_000_000),
        1,
    ).otherwise(0)
    return w.groupBy("user_id").agg(
        F.max(is_p1).cast("int").alias("signup_to_purchase"),
        F.max(is_p2).cast("int").alias("view_click_10m"),
        F.max(is_p3).cast("int").alias("purchase_error_1h"),
    )


@register(
    "evt_scd2",
    section="2.10",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(json_extract(props, '$.k') AS INT) AS k
      FROM events WHERE event_type = 'signup'
    ),
    chg AS (
      SELECT * FROM (
        SELECT user_id, event_id, ts_us, k,
               LAG(k) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_k
        FROM e)
      WHERE prev_k IS NULL OR k <> prev_k
    )
    SELECT user_id, k, ts_us AS valid_from_us,
           LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
             AS valid_to_us
    FROM chg
    """,
    notes="SCD2 dimension build from a change stream: collapse repeats, then "
    "LEAD closes each validity interval (open interval = current row)",
)
def evt_scd2(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("ts_us"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = (
        e.withColumn("prev_k", F.lag("k").over(w))
        .where(F.col("prev_k").isNull() | (F.col("k") != F.col("prev_k")))
    )
    return chg.select(
        "user_id",
        "k",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
    )


@register(
    "evt_transitions",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    bi AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
               AS to_type
      FROM e)
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM bi WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    notes="event-type bigram transition counts (markov-chain sequence analytics)",
)
def evt_transitions(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "evt_resample_ffill",
    section="2.10",
    oracle="""
    WITH u AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
                      date_trunc('hour', MAX(ts)) AS hi
               FROM events WHERE user_id < 50 GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
             FROM u),
    hourly AS (SELECT user_id, date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      ROUND(SUM(value), 2) AS sum_value
               FROM events WHERE user_id < 50 GROUP BY 1, 2)
    SELECT g.user_id, epoch_us(g.hr) AS hr_us,
           COALESCE(h.n, 0) AS n,
           last_value(h.sum_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr
    """,
    notes="time-series resample to an hourly grid + forward-fill (the AIS "
    "track-regularization primitive): per-key bounds -> sequence explode "
    "grid -> left join hourly agg -> last-ignore-nulls carry. All keyed "
    "shuffles; grid size is bounded by key span, never by row count",
)
def evt_resample_ffill(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    hour = F.expr("INTERVAL 1 HOUR")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi", hour)).alias("hr")
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum("value")).alias("sum_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hr"], "left")
        .select(
            "user_id",
            epoch_us("hr").alias("hr_us"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("sum_value", ignorenulls=True).over(w).alias("carried"),
        )
    )


@register(
    "evt_attribution",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value
               FROM events WHERE event_type IN ('click', 'view', 'purchase')),
    m AS (SELECT *, MAX(CASE WHEN event_type <> 'purchase' THEN ts_us END) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch_us
          FROM e),
    p AS (SELECT user_id, event_id AS p_id, value, last_touch_us FROM m
          WHERE event_type = 'purchase' AND last_touch_us IS NOT NULL),
    t AS (SELECT user_id, ts_us, event_id AS t_id, event_type AS touch_type
          FROM e WHERE event_type <> 'purchase'),
    j AS (SELECT p.value, t.touch_type,
                 ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY t.t_id DESC) AS rn
          FROM p JOIN t ON p.user_id = t.user_id AND t.ts_us = p.last_touch_us)
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(value), 2) AS attributed_value
    FROM j WHERE rn = 1 GROUP BY touch_type
    """,
    notes="last-touch attribution: each purchase credits the user's most "
    "recent preceding click/view (running-max as-of, one keyed shuffle - "
    "never a per-purchase self-join), ties on timestamp broken by highest "
    "event id; revenue rolled up by touch type",
)
def evt_attribution(spark, sf_dir):
    """Marketing/conversion attribution composed from the as-of idiom:
    the last-touch timestamp is a running max over the interleaved
    (touch|purchase) stream - the same union+window shape as join_asof,
    so cost is one shuffle on user_id regardless of purchase count -
    then one equi-join recovers the touch row to get its type."""
    ev = table(spark, sf_dir, "events")
    e = ev.where(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        epoch_us("ts").alias("ts_us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = e.withColumn(
        "last_touch_us",
        F.max(
            F.when(F.col("event_type") != "purchase", F.col("ts_us"))
        ).over(w),
    )
    p = m.where(
        (F.col("event_type") == "purchase")
        & F.col("last_touch_us").isNotNull()
    ).select("user_id", F.col("event_id").alias("p_id"), "value", "last_touch_us")
    t = e.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts_us").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    wp = Window.partitionBy("p_id").orderBy(F.desc("t_id"))
    return (
        p.join(
            t,
            (p.user_id == t.t_user) & (t.t_ts == p.last_touch_us),
        )
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            money(F.sum("value")).alias("attributed_value"),
        )
    )


@register(
    "evt_path_analysis",
    section="2.10",
    oracle=_SESSIONIZE_CTE
    + """
    , p AS (
      SELECT LAG(event_type, 2) OVER sw AS t1,
             LAG(event_type, 1) OVER sw AS t2,
             event_type AS t3
      FROM s
      WINDOW sw AS (PARTITION BY user_id, session_id
                    ORDER BY ts_us, event_id))
    SELECT t1 || '>' || t2 || '>' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM p WHERE t1 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
    notes="top-10 3-step event paths within sessions (clickstream path "
    "mining): two LAGs over the session window produce each sliding "
    "triple exactly once, then one keyed count + TakeOrdered top-k. "
    "Reuses the sessionize window partitioning — the lag window and the "
    "session build share one (user_id) shuffle",
)
def evt_path_analysis(spark, sf_dir):
    """What do users do in what order: the most common 3-step paths
    inside a session. The triple expansion is two lags over the already-
    sessionized stream (same partitioning, no extra shuffle), the count
    is map-side combined, and the global top-10 is TakeOrderedAndProject
    — nothing materializes a global sort."""
    s = sessionized(spark, sf_dir)
    sw = Window.partitionBy("user_id", "session_id").orderBy("ts_us", "event_id")
    p = s.select(
        F.lag("event_type", 2).over(sw).alias("t1"),
        F.lag("event_type", 1).over(sw).alias("t2"),
        F.col("event_type").alias("t3"),
    ).where(F.col("t1").isNotNull())
    return (
        p.select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "evt_streaks",
    section="2.10",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day_n
      FROM events),
    isl AS (
      SELECT user_id, day_n,
             day_n - ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY day_n) AS island
      FROM d),
    runs AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             CAST(MIN(day_n) AS BIGINT) AS start_day
      FROM isl GROUP BY user_id, island)
    SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
           CAST(MIN(start_day) FILTER (WHERE len = (
             SELECT MAX(r2.len) FROM runs r2 WHERE r2.user_id = runs.user_id))
             AS BIGINT) AS best_streak_start
    FROM runs GROUP BY user_id
    """,
    notes="gaps-and-islands: longest consecutive-day activity streak per "
    "user via the day_n - row_number() island id (consecutive days share "
    "it). All-integer; two keyed windows/aggregations on the same "
    "user_id partitioning — one shuffle. Tie on max length resolved to "
    "the earliest streak start",
)
def evt_streaks(spark, sf_dir):
    """Consecutive-day engagement streaks — the retention primitive
    behind 'N-day streak' features. distinct (user, day) first (the big
    reduction), then the island trick: day minus per-user row_number is
    constant exactly within a run of consecutive days. Everything after
    the distinct is keyed on user_id; no global ordering."""
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day_n"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_n")
    isl = d.withColumn("island", F.col("day_n") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day_n").cast("long").alias("start_day"),
    )
    wmax = Window.partitionBy("user_id")
    return (
        runs.withColumn("best", F.max("len").over(wmax))
        .where(F.col("len") == F.col("best"))
        .groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("max_streak"),
            F.min("start_day").cast("long").alias("best_streak_start"),
        )
    )


@register(
    "evt_user_overlap",
    section="2.10",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM du GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT i.type_a, i.type_b, i.n_both,
           FLOOR(CAST(i.n_both AS DOUBLE)
                 / (sa.n + sb.n - i.n_both) * 1000000) / 1000000.0
             AS jaccard
    FROM inter i
    JOIN sz sa ON sa.event_type = i.type_a
    JOIN sz sb ON sb.event_type = i.type_b
    """,
    notes="audience overlap: Jaccard similarity of user sets between "
    "every pair of event types. The self-join runs on the distinct "
    "(type, user) table keyed by user_id — fanout per user is "
    "|types|^2 (bounded, 5 here), never |events|^2; per-type sizes "
    "broadcast. One float division, floor-disciplined",
)
def evt_user_overlap(spark, sf_dir):
    """Which behaviors share an audience: |A∩B| / |A∪B| over user sets.
    After the distinct reduction the user-keyed self-join has bounded
    per-key fanout (the type alphabet), so the candidate pairs scale
    with users, not events; the two size lookups are broadcast joins of
    an alphabet-sized table."""
    ev = table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    sz = du.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = du.select("user_id", F.col("event_type").alias("type_a"))
    b = du.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            (
                F.floor(
                    F.col("n_both").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
                    * 1000000
                )
                / 1000000.0
            ).alias("jaccard"),
        )
    )


@register(
    "evt_resample_interp",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                      arg_min(value, event_id) AS v
               FROM events WHERE user_id < 50 GROUP BY user_id, epoch_us(ts)),
    b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
                 date_trunc('hour', MAX(ts)) AS hi
          FROM events WHERE user_id < 50 GROUP BY user_id),
    g AS (SELECT user_id, epoch_us(unnest(generate_series(lo, hi, INTERVAL 1 HOUR))) AS hr_us
          FROM b),
    u AS (SELECT user_id, ts_us, v, 0 AS is_grid FROM e
          UNION ALL SELECT user_id, hr_us, NULL, 1 FROM g),
    m AS (SELECT *,
            last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER wp AS pv,
            last_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS) OVER wp AS pt,
            first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER wf AS nv,
            first_value(CASE WHEN is_grid = 0 THEN ts_us END IGNORE NULLS) OVER wf AS nt
          FROM u
          WINDOW wp AS (PARTITION BY user_id ORDER BY ts_us, is_grid
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY user_id ORDER BY ts_us, is_grid
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, ts_us AS hr_us,
           ROUND(CASE WHEN pt = ts_us THEN pv
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + (nv - pv) * (CAST(ts_us - pt AS DOUBLE) / (nt - pt))
                 END, 4) AS v_interp
    FROM m WHERE is_grid = 1
    """,
    notes="hourly resample with LINEAR interpolation between the "
    "surrounding events (vs evt_resample_ffill's step-carry): "
    "grid-point rows merge-sorted into the event stream per user, one "
    "window pass finds both bracketing events via IGNORE NULLS "
    "first/last_value — one shuffle on user_id, no self-join, no "
    "per-grid-point probe. Events pre-deduped per (user, ts) by min "
    "event_id so the bracketing value is engine-independent; identical "
    "IEEE interpolation expression on both sides",
)
def evt_resample_interp(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    e = ev.groupBy("user_id", epoch_us("ts").alias("ts_us")).agg(
        F.min_by("value", "event_id").alias("v")
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    ).select("user_id", epoch_us("hr").alias("ts_us"))
    u = e.select("user_id", "ts_us", "v", F.lit(0).alias("is_grid")).unionByName(
        grid.select(
            "user_id",
            "ts_us",
            F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
        )
    )
    ev_v = F.when(F.col("is_grid") == 0, F.col("v"))
    ev_t = F.when(F.col("is_grid") == 0, F.col("ts_us"))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = u.select(
        "user_id",
        "ts_us",
        "is_grid",
        F.last(ev_v, ignorenulls=True).over(wp).alias("pv"),
        F.last(ev_t, ignorenulls=True).over(wp).alias("pt"),
        F.first(ev_v, ignorenulls=True).over(wf).alias("nv"),
        F.first(ev_t, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = F.when(F.col("pt") == F.col("ts_us"), F.col("pv")).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("ts_us") - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt"))),
    )
    return (
        m.where(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.col("ts_us").alias("hr_us"),
            F.round(interp, 4).alias("v_interp"),
        )
    )


@register(
    "evt_rate_limit",
    section="2.10",
    oracle="""
    WITH r AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                      ROW_NUMBER() OVER (
                        PARTITION BY user_id, date_trunc('hour', ts)
                        ORDER BY epoch_us(ts), event_id) AS rn
               FROM events)
    SELECT user_id, event_id, ts_us FROM r WHERE rn <= 3
    """,
    notes="deterministic per-key rate limiting: keep the first 3 events "
    "per user per hour — one window over (user, hour), the throttling/"
    "per-key-cap shape (dedup-adjacent) every ingestion pipeline needs; "
    "event_id tiebreak makes the kept set engine-independent",
)
def evt_rate_limit(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", F.date_trunc("hour", F.col("ts"))
    ).orderBy(epoch_us("ts"), "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            epoch_us("ts").alias("ts_us"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "evt_regex_match",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id,
                      CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                           WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                           ELSE 'e' END AS ch,
                      epoch_us(ts) AS ts_us, event_id
               FROM events),
    s AS (SELECT user_id,
                 string_agg(ch, '' ORDER BY ts_us, event_id) AS seq
          FROM e GROUP BY user_id)
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v[vc]*p')) AS BIGINT) AS n_funnels,
           CAST(len(seq) - len(replace(seq, 'e', '')) AS BIGINT) AS n_errors
    FROM s
    """,
    notes="MATCH_RECOGNIZE-style sequence pattern matching, distributed: "
    "each user's ordered event stream collapses to a character string "
    "(one keyed aggregate), then ordinary regexes express patterns with "
    "quantifiers — view,(view|click)*,purchase counted per user. Both "
    "engines use leftmost non-overlapping regex semantics so counts "
    "agree exactly; (ts, event_id) ordering makes the string unique. "
    "State per user = one bounded string, never a cross-row join",
)
def evt_regex_match(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(epoch_us("ts").alias("t"), F.col("event_id").alias("i"), ch.alias("ch"))
                )
            ),
            lambda x: x["ch"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").cast("long").alias("seq_len"),
            F.regexp_count(F.col("seq"), F.lit("v[vc]*p")).cast("long").alias("n_funnels"),
            (
                F.length("seq") - F.length(F.replace(F.col("seq"), F.lit("e"), F.lit("")))
            ).cast("long").alias("n_errors"),
        )
    )


@register(
    "evt_median_gap",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
    g AS (SELECT user_id,
                 ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                          ORDER BY ts_us, event_id) AS gap_us
          FROM e)
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           MEDIAN(gap_us) AS med_gap_us
    FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    """,
    notes="median inter-event gap per user (the cadence statistic behind "
    "session-gap threshold tuning): one keyed window for the lag, one "
    "grouped exact median over integer microseconds (interpolated "
    "(a+b)/2 on even counts matches across engines exactly on integers)",
)
def evt_median_gap(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", epoch_us("ts").alias("ts_us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = e.select(
        "user_id", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.median("gap_us").alias("med_gap_us"),
    )


@register(
    "evt_bursts",
    section="2.10",
    oracle="""
    WITH h AS (SELECT user_id, date_trunc('hour', ts) AS hr,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    m AS (SELECT user_id, AVG(n) AS mean_n FROM h GROUP BY user_id)
    SELECT h.user_id, epoch_us(h.hr) AS hr_us, h.n
    FROM h JOIN m USING (user_id)
    WHERE h.n >= 3 * m.mean_n AND h.n >= 3
    """,
    notes="burst detection: hours where a user's event count reaches 3x "
    "their mean active-hour rate (and at least 3 absolute) — two "
    "combinable aggregations + one key join; the integer-vs-3*avg "
    "comparison is the same IEEE arithmetic on both engines",
)
def evt_bursts(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = h.groupBy("user_id").agg(F.avg("n").alias("mean_n"))
    return (
        h.join(m, "user_id")
        .where((F.col("n") >= 3 * F.col("mean_n")) & (F.col("n") >= 3))
        .select("user_id", epoch_us("hr").alias("hr_us"), "n")
    )


@register(
    "evt_sessionize_adaptive",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
    g AS (SELECT user_id, ts_us,
                 ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                          ORDER BY ts_us, event_id) AS gap_us
          FROM e),
    thr AS (SELECT user_id,
                   3 * CAST(FLOOR(MEDIAN(gap_us)) AS BIGINT) AS thr_us
            FROM g WHERE gap_us IS NOT NULL GROUP BY user_id)
    SELECT g.user_id,
           MAX(t.thr_us) AS thr_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 + SUM(CASE WHEN g.gap_us > t.thr_us THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions
    FROM g LEFT JOIN thr t USING (user_id)
    GROUP BY g.user_id
    """,
    notes="adaptive-gap sessionization: instead of one global 30-min "
    "cutoff, each user's session break is 3x their own median "
    "inter-event gap (cadence-relative segmentation — a fast-moving "
    "ferry and a weekly tramp steamer both segment sensibly). One keyed "
    "window for gaps, one grouped exact median, one same-key join back "
    "(the lag window and the final aggregate share the user_id "
    "partitioning, so the whole thing is ONE logical shuffle + a "
    "metadata-sized threshold join). FLOOR integerizes the interpolated "
    "median before the 3x so the cutoff is engine-exact",
)
def evt_sessionize_adaptive(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", epoch_us("ts").alias("ts_us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = e.select(
        "user_id", "ts_us", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    )
    thr = (
        g.where(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg((3 * F.floor(F.median("gap_us"))).cast("long").alias("thr_us"))
    )
    return (
        g.join(thr, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.max("thr_us").alias("thr_us"),
            F.count(F.lit(1)).alias("n_events"),
            (
                1
                + F.sum(
                    F.when(F.col("gap_us") > F.col("thr_us"), 1).otherwise(0)
                )
            ).cast("long").alias("n_sessions"),
        )
    )


@register(
    "evt_feature_vector",
    section="2.10",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_clicks,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_views,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
                         FILTER (event_type = 'purchase'), 0) AS BIGINT)
             AS revenue_cents,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_active,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_us
    FROM events GROUP BY user_id
    """,
    notes="per-entity behavioral feature table (the churn/propensity "
    "model input): event counts by type, purchase revenue, active-day "
    "count, and activity span — ALL from one map-side-combined "
    "conditional aggregate; never one pass per feature, never a "
    "self-join per type. Revenue is exact integer cents; span is exact "
    "integer microseconds. distinct-day is the only non-algebraic "
    "piece and rides the same single shuffle via Spark's "
    "partial-distinct expansion. This composes with join_feature_pit "
    "(the point-in-time discipline) — here the snapshot features, "
    "there the leakage-free trailing ones",
)
def evt_feature_vector(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    purchase = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_if(F.col("event_type") == "click").cast("long").alias("n_clicks"),
        F.count_if(F.col("event_type") == "view").cast("long").alias("n_views"),
        F.count_if(purchase).cast("long").alias("n_purchases"),
        F.coalesce(
            F.sum(
                F.when(purchase, F.round(F.col("value") * 100).cast("long"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("revenue_cents"),
        F.count_distinct(F.col("ts").cast("date")).cast("long").alias(
            "days_active"
        ),
        (epoch_us(F.max("ts")) - epoch_us(F.min("ts"))).cast("long").alias(
            "span_us"
        ),
    )


@register(
    "evt_cohort_matrix",
    section="2.10",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CAST(date_trunc('week', ts) AS DATE)) AS w0
      FROM events GROUP BY user_id),
    sz AS (SELECT w0, CAST(COUNT(*) AS BIGINT) AS cohort_size
           FROM f GROUP BY w0),
    a AS (
      SELECT DISTINCT e.user_id, f.w0,
             date_diff('day', f.w0,
                       CAST(date_trunc('week', e.ts) AS DATE)) // 7
               AS offset_w
      FROM events e JOIN f ON e.user_id = f.user_id)
    SELECT CAST(a.w0 AS VARCHAR) AS cohort_week,
           CAST(a.offset_w AS BIGINT) AS offset_w,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(COUNT(*) * 1000000 // sz.cohort_size AS BIGINT)
             AS retained_ppm
    FROM a JOIN sz ON sz.w0 = a.w0
    GROUP BY a.w0, a.offset_w, sz.cohort_size
    """,
    notes="full cohort retention matrix (cohort week x week offset), "
    "the triangle chart behind every growth dashboard — unlike "
    "evt_retention (which collapses cohorts), each cohort keeps its "
    "own row so week-over-week cohort quality is visible. Two keyed "
    "aggregates + one join on the user key (the first-seen table "
    "reuses the activity shuffle's partitioning); retention shares "
    "are exact integer ppm. Week truncation on both engines is "
    "ISO-Monday, and the offset divides a day-diff of week-truncated "
    "dates by 7 — exact integers, no float calendar math",
)
def evt_cohort_matrix(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    wk = as_date(F.date_trunc("week", F.col("ts")))
    e = ev.select("user_id", wk.alias("w"))
    f = e.groupBy("user_id").agg(F.min("w").alias("w0"))
    sz = f.groupBy("w0").agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    a = (
        e.join(f, "user_id")
        .select(
            "user_id",
            "w0",
            (F.datediff(F.col("w"), F.col("w0")) / 7).cast("long").alias(
                "offset_w"
            ),
        )
        .distinct()
    )
    return (
        a.join(F.broadcast(sz), "w0")
        .groupBy("w0", "offset_w", "cohort_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .select(
            F.col("w0").cast("string").alias("cohort_week"),
            "offset_w",
            "n_active",
            ((F.col("n_active") * 1000000) / F.col("cohort_size"))
            .cast("long")
            .alias("retained_ppm"),
        )
    )


@register(
    "evt_rfm_scores",
    section="2.10",
    oracle="""
    WITH per AS (
      SELECT user_id,
             MAX(CAST(ts AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
                           FILTER (event_type = 'purchase'), 0) AS BIGINT)
               AS revenue_cents
      FROM events GROUP BY user_id),
    g AS (SELECT MAX(last_day) AS gd FROM per),
    m AS (SELECT user_id,
                 CAST(date_diff('day', last_day, g.gd) AS BIGINT) AS r_days,
                 n_events, revenue_cents
          FROM per CROSS JOIN g),
    e AS (SELECT quantile_disc(r_days, 0.2) AS r1, quantile_disc(r_days, 0.4) AS r2,
                 quantile_disc(r_days, 0.6) AS r3, quantile_disc(r_days, 0.8) AS r4,
                 quantile_disc(n_events, 0.2) AS f1, quantile_disc(n_events, 0.4) AS f2,
                 quantile_disc(n_events, 0.6) AS f3, quantile_disc(n_events, 0.8) AS f4,
                 quantile_disc(revenue_cents, 0.2) AS m1, quantile_disc(revenue_cents, 0.4) AS m2,
                 quantile_disc(revenue_cents, 0.6) AS m3, quantile_disc(revenue_cents, 0.8) AS m4
          FROM m)
    SELECT user_id, r_days, n_events, revenue_cents,
           CAST(5 - ((r_days > e.r1)::INT + (r_days > e.r2)::INT
                     + (r_days > e.r3)::INT + (r_days > e.r4)::INT)
                AS BIGINT) AS r_score,
           CAST(1 + (n_events > e.f1)::INT + (n_events > e.f2)::INT
                  + (n_events > e.f3)::INT + (n_events > e.f4)::INT
                AS BIGINT) AS f_score,
           CAST(1 + (revenue_cents > e.m1)::INT + (revenue_cents > e.m2)::INT
                  + (revenue_cents > e.m3)::INT + (revenue_cents > e.m4)::INT
                AS BIGINT) AS m_score
    FROM m CROSS JOIN e
    """,
    notes="RFM customer segmentation (recency / frequency / monetary "
    "quintile scores): per-user exact-integer metrics in one "
    "conditional aggregate, then the 12 quintile EDGES come from one "
    "global percentile_disc aggregate (a 1-row broadcast) and scores "
    "are row-local comparisons — never an NTILE over all users (the "
    "global-window single-partition trap win_ntile_pct exists to "
    "avoid; here even the two-pass rank is unnecessary because only "
    "the 4 edges are needed, not every rank). Discrete percentiles are "
    "actual data values, so the whole pipeline is integer-exact",
)
def evt_rfm_scores(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    purchase = F.col("event_type") == "purchase"
    per = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.coalesce(
            F.sum(F.when(purchase, F.round(F.col("value") * 100).cast("long"))),
            F.lit(0),
        )
        .cast("long")
        .alias("revenue_cents"),
    )
    g = per.agg(F.max("last_day").alias("gd"))
    m = per.crossJoin(F.broadcast(g)).select(
        "user_id",
        F.datediff(F.col("gd"), F.col("last_day")).cast("long").alias("r_days"),
        "n_events",
        "revenue_cents",
    )
    edge_aggs = []
    for pre, col in (("r", "r_days"), ("f", "n_events"), ("m", "revenue_cents")):
        for i, q in enumerate((0.2, 0.4, 0.6, 0.8), start=1):
            edge_aggs.append(
                F.expr(
                    f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})"
                ).alias(f"{pre}{i}")
            )
    e = m.agg(*edge_aggs)

    def score(col, pre):
        hits = sum(
            (F.col(col) > F.col(f"{pre}{i}")).cast("int") for i in (1, 2, 3, 4)
        )
        return hits

    return m.crossJoin(F.broadcast(e)).select(
        "user_id",
        "r_days",
        "n_events",
        "revenue_cents",
        (F.lit(5) - score("r_days", "r")).cast("long").alias("r_score"),
        (F.lit(1) + score("n_events", "f")).cast("long").alias("f_score"),
        (F.lit(1) + score("revenue_cents", "m")).cast("long").alias("m_score"),
    )


@register(
    "evt_growth_accounting",
    section="2.10",
    oracle="""
    WITH um AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('month', ts) AS DATE) AS m
                FROM events),
    lagd AS (SELECT user_id, m,
                    LAG(m) OVER (PARTITION BY user_id ORDER BY m) AS pm,
                    LEAD(m) OVER (PARTITION BY user_id ORDER BY m) AS nm
             FROM um),
    st AS (SELECT m,
                  CAST(COUNT(*) FILTER (pm IS NULL) AS BIGINT) AS n_new,
                  CAST(COUNT(*) FILTER (
                    pm IS NOT NULL AND date_diff('month', pm, m) = 1)
                    AS BIGINT) AS n_retained,
                  CAST(COUNT(*) FILTER (
                    pm IS NOT NULL AND date_diff('month', pm, m) > 1)
                    AS BIGINT) AS n_resurrected
           FROM lagd GROUP BY m),
    ch AS (SELECT CAST(m + INTERVAL 1 MONTH AS DATE) AS m,
                  CAST(COUNT(*) AS BIGINT) AS n_churned
           FROM lagd
           WHERE nm IS NULL OR date_diff('month', m, nm) > 1
           GROUP BY 1)
    SELECT CAST(COALESCE(st.m, ch.m) AS VARCHAR) AS month,
           COALESCE(st.n_new, 0) AS n_new,
           COALESCE(st.n_retained, 0) AS n_retained,
           COALESCE(st.n_resurrected, 0) AS n_resurrected,
           COALESCE(ch.n_churned, 0) AS n_churned
    FROM st FULL JOIN ch ON ch.m = st.m
    """,
    notes="monthly growth accounting (the canonical new / retained / "
    "resurrected / churned decomposition every growth team reports): "
    "distinct user-months, one keyed LAG/LEAD window classifies each "
    "user-month, churn attributes to the month AFTER last activity, "
    "and a months-dimension full join merges the two count streams. "
    "actives(m) = new + retained + resurrected by construction; all "
    "counts are exact integers over month-truncated dates (no float "
    "calendar math). Two keyed shuffles (user window, month "
    "aggregate) — corpus-linear",
)
def evt_growth_accounting(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    um = ev.select(
        "user_id", as_date(F.date_trunc("month", F.col("ts"))).alias("m")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("m")
    lagd = um.select(
        "user_id",
        "m",
        F.lag("m").over(w).alias("pm"),
        F.lead("m").over(w).alias("nm"),
    )
    gap_in = F.months_between(F.col("m"), F.col("pm")).cast("long")
    st = lagd.groupBy("m").agg(
        F.count_if(F.col("pm").isNull()).cast("long").alias("n_new"),
        F.count_if(F.col("pm").isNotNull() & (gap_in == 1))
        .cast("long")
        .alias("n_retained"),
        F.count_if(F.col("pm").isNotNull() & (gap_in > 1))
        .cast("long")
        .alias("n_resurrected"),
    )
    gap_out = F.months_between(F.col("nm"), F.col("m")).cast("long")
    ch = (
        lagd.where(F.col("nm").isNull() | (gap_out > 1))
        .select(F.add_months(F.col("m"), 1).alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        st.join(ch, "m", "full")
        .select(
            F.col("m").cast("string").alias("month"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0))
            .cast("long")
            .alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
    )


@register(
    "evt_abandonment",
    section="2.10",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click'),
    a AS (SELECT c.user_id, c.event_id
          FROM c
          WHERE NOT EXISTS (
            SELECT 1 FROM events p
            WHERE p.event_type = 'purchase'
              AND p.user_id = c.user_id
              AND p.ts >= c.ts
              AND p.ts <= c.ts + INTERVAL 1 HOUR))
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_abandoned
    FROM a GROUP BY user_id
    """,
    notes="temporal ANTI-join (abandonment): clicks with NO purchase by "
    "the same user within the following hour — the non-conversion "
    "complement of evt_funnel. The oracle is the textbook NOT EXISTS "
    "interval subquery; the engine side never runs an anti-join at "
    "all: one keyed window computes each click's NEXT purchase time "
    "(running-min over the time-ordered interleaved stream, the "
    "forward as-of trick), and abandonment is a row-local comparison "
    "— one (user_id) shuffle, no second scan, no correlated probe "
    "per click",
)
def evt_abandonment(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    purchase_us = F.when(
        F.col("event_type") == "purchase", epoch_us("ts")
    )
    # clicks sort BEFORE purchases at an identical timestamp (asc on
    # event_type: 'click' < 'purchase'), so a same-instant purchase lands
    # INSIDE the click's [currentRow, unboundedFollowing] frame — matching
    # the oracle's inclusive p.ts >= c.ts (no collision in the fixtures,
    # but the semantics shouldn't depend on that)
    wf = (
        W.partitionBy("user_id")
        .orderBy(epoch_us("ts"), F.col("event_type").asc(), "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    x = ev.select(
        "user_id",
        "event_id",
        "event_type",
        epoch_us("ts").alias("ts_us"),
        F.min(purchase_us).over(wf).alias("next_purchase_us"),
    ).where(F.col("event_type") == "click")
    abandoned = x.where(
        F.col("next_purchase_us").isNull()
        | (F.col("next_purchase_us") > F.col("ts_us") + 3_600_000_000)
    )
    return abandoned.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_abandoned")
    )


@register(
    "evt_attribution_linear",
    section="2.10",
    oracle="""
    WITH x AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'view', 'purchase')),
    p AS (
      SELECT user_id, ts_us, cents,
             CAST(COUNT(*) FILTER (event_type = 'click') OVER w AS BIGINT)
               AS n_click,
             CAST(COUNT(*) FILTER (event_type = 'view') OVER w AS BIGINT)
               AS n_view,
             event_type
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)),
    c AS (SELECT cents, n_click, n_view FROM p
          WHERE event_type = 'purchase')
    SELECT
      CAST(SUM(CASE WHEN n_click + n_view > 0
               THEN cents * n_click // (n_click + n_view) ELSE 0 END)
           AS BIGINT) AS click_cents,
      CAST(SUM(CASE WHEN n_click + n_view > 0
               THEN cents * n_view // (n_click + n_view) ELSE 0 END)
           AS BIGINT) AS view_cents,
      CAST(SUM(CASE WHEN n_click + n_view = 0 THEN cents ELSE 0 END)
           AS BIGINT) AS unattributed_cents,
      CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM c
    """,
    notes="LINEAR multi-touch attribution (equal credit to every touch "
    "in the preceding hour) — the many-touch complement of "
    "evt_attribution's last-touch: per purchase the touch counts come "
    "from one value-RANGE window over integer microseconds (a sliding "
    "two-pointer per user — never a purchase-to-touches interval "
    "join), and credit splits are exact integer floor-division of "
    "cents (remainders stay unassigned by documented convention, so "
    "the books balance without float shares). Purchases with no "
    "preceding touch report as unattributed — the bucket every "
    "attribution report must disclose",
)
def evt_attribution_linear(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "purchase")
    )
    x = ev.select(
        "user_id",
        "event_type",
        epoch_us("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    p = x.select(
        "event_type",
        "cents",
        F.count(F.when(F.col("event_type") == "click", 1)).over(w)
        .cast("long")
        .alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).over(w)
        .cast("long")
        .alias("n_view"),
    ).where(F.col("event_type") == "purchase")
    nt = F.col("n_click") + F.col("n_view")
    credit = lambda n: F.when(nt > 0, (F.col("cents") * n / nt).cast("long")).otherwise(
        F.lit(0)
    )
    return p.agg(
        F.sum(credit(F.col("n_click"))).cast("long").alias("click_cents"),
        F.sum(credit(F.col("n_view"))).cast("long").alias("view_cents"),
        F.sum(F.when(nt == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("unattributed_cents"),
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
    )


@register(
    "evt_survival_km",
    section="2.10",
    oracle="""
    WITH c AS (SELECT user_id, MIN(epoch_us(ts)) AS t_c FROM events
               WHERE event_type = 'click' GROUP BY user_id),
    p AS (SELECT c.user_id, MIN(epoch_us(e.ts)) AS t_p
          FROM c JOIN events e
            ON e.user_id = c.user_id AND e.event_type = 'purchase'
           AND epoch_us(e.ts) >= c.t_c
          GROUP BY c.user_id),
    m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
    d AS (SELECT c.user_id,
                 CASE WHEN p.t_p IS NULL THEN (m.mx - c.t_c) // 86400000000
                      ELSE (p.t_p - c.t_c) // 86400000000 END AS day,
                 CASE WHEN p.t_p IS NULL THEN 0 ELSE 1 END AS ev
          FROM c LEFT JOIN p USING (user_id) CROSS JOIN m),
    g AS (SELECT day, CAST(SUM(ev) AS BIGINT) AS deaths,
                 CAST(COUNT(*) - SUM(ev) AS BIGINT) AS censored
          FROM d GROUP BY day),
    r AS (SELECT day, deaths,
                 CAST((SELECT COUNT(*) FROM d) AS BIGINT)
                 - CAST(COALESCE(SUM(deaths + censored) OVER (
                     ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS n_risk
          FROM g),
    k AS (SELECT day, deaths, n_risk FROM r WHERE deaths > 0),
    a AS (SELECT list(struct_pack(
                   day := day,
                   f := 1.0 - CAST(deaths AS DOUBLE) / n_risk)
                 ORDER BY day) AS fs
          FROM k)
    SELECT k.day, k.deaths, k.n_risk,
           FLOOR(list_reduce(
             list_prepend(1.0, [x.f FOR x IN a.fs IF x.day <= k.day]),
             (acc, x) -> acc * x) * 1e6) / 1e6 AS survival
    FROM k CROSS JOIN a
    """,
    notes="Kaplan-Meier survival curve for click-to-purchase conversion "
    "(right-censored at corpus end): per-user first-click/first-"
    "subsequent-purchase durations in whole days, then the KM product "
    "S(t) = prod(1 - d_i/n_i). The sequential product is the classic "
    "'not SQL-expressible' claim; here both engines fold the SAME "
    "sorted factor array left-to-right (Spark F.aggregate / DuckDB "
    "list_reduce), so the doubles are bit-identical — division and "
    "multiplication are correctly-rounded IEEE ops and the fold order "
    "is pinned. Day-level machinery is corpus-bounded (one row per "
    "distinct duration day); the only data-sized work is ONE keyed "
    "aggregation over a single events scan (per-user purchase times "
    "collect into a per-key-bounded array; the first >= first-click is "
    "an array lookup, so no click-to-purchase join ever forms), and "
    "the risk set is a suffix sum on the day table — no count branch",
)
def evt_survival_km(spark, sf_dir):
    """KM estimator, Spark-first: user durations from ONE keyed agg over
    one scan (plus the 1-row max-ts broadcast); the curve lives on the
    day-cardinality table (bounded by the corpus time span), where an
    unpartitioned window and a collected factor array are O(days), not
    O(users). The day table is localCheckpoint'ed: it fans out into the
    factor-array branch and the output branch, and without the cut each
    branch would re-run the full user aggregation."""
    day_us = 86_400_000_000
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max(epoch_us("ts")).alias("mx"))
    per_user = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "click", epoch_us("ts"))
            ).alias("t_c"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "purchase", epoch_us("ts"))
                )
            ).alias("p_ts"),
        )
        .where(F.col("t_c").isNotNull())
    )
    t_p = F.get(
        F.filter(F.col("p_ts"), lambda x: x >= F.col("t_c")), 0
    )
    d = (
        per_user.crossJoin(F.broadcast(mx))
        .select(
            "t_c",
            t_p.alias("t_p"),
            F.col("mx"),
        )
        .select(
            F.when(
                F.col("t_p").isNull(),
                F.expr(f"(mx - t_c) div {day_us}"),
            )
            .otherwise(F.expr(f"(t_p - t_c) div {day_us}"))
            .alias("day"),
            F.when(F.col("t_p").isNull(), 0).otherwise(1).alias("ev"),
        )
    )
    g = d.groupBy("day").agg(
        F.sum("ev").cast("long").alias("deaths"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("long").alias("censored"),
    )
    # risk set = suffix sum over the day table (everyone with duration
    # >= t is still at risk) — no separate total-count branch, so the
    # user aggregation has exactly one consumer. Unpartitioned window +
    # collected factor array both run on the day-cardinality table
    # (<= corpus span in days), never data-sized.
    wsuf = Window.orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    r = (
        g.select(
            "day",
            "deaths",
            F.sum(F.col("deaths") + F.col("censored"))
            .over(wsuf)
            .cast("long")
            .alias("n_risk"),
        )
        .where(F.col("deaths") > 0)
        .localCheckpoint()
    )
    factors = r.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("day"),
                    (
                        F.lit(1.0)
                        - F.col("deaths").cast("double") / F.col("n_risk")
                    ).alias("f"),
                )
            )
        ).alias("fs")
    )
    surv = F.aggregate(
        F.filter(F.col("fs"), lambda x: x["day"] <= F.col("day")),
        F.lit(1.0),
        lambda acc, x: acc * x["f"],
    )
    return (
        r.crossJoin(F.broadcast(factors))
        .select(
            "day",
            "deaths",
            "n_risk",
            (F.floor(surv * 1e6) / 1e6).alias("survival"),
        )
    )


@register(
    "evt_logrank",
    section="2.10",
    oracle="""
    WITH c AS (SELECT user_id, user_id % 2 AS grp,
                      MIN(epoch_us(ts)) AS t_c FROM events
               WHERE event_type = 'click' GROUP BY user_id),
    p AS (SELECT c.user_id, MIN(epoch_us(e.ts)) AS t_p
          FROM c JOIN events e
            ON e.user_id = c.user_id AND e.event_type = 'purchase'
           AND epoch_us(e.ts) >= c.t_c
          GROUP BY c.user_id),
    m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
    d AS (SELECT c.grp,
                 CASE WHEN p.t_p IS NULL THEN (m.mx - c.t_c) // 86400000000
                      ELSE (p.t_p - c.t_c) // 86400000000 END AS day,
                 CASE WHEN p.t_p IS NULL THEN 0 ELSE 1 END AS ev
          FROM c LEFT JOIN p USING (user_id) CROSS JOIN m),
    g AS (SELECT day,
                 CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)
                   AS d1,
                 CAST(SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT)
                   AS d2,
                 CAST(COUNT(*) FILTER (grp = 1) AS BIGINT) AS a1,
                 CAST(COUNT(*) FILTER (grp = 0) AS BIGINT) AS a2
          FROM d GROUP BY day),
    r AS (SELECT day, d1, d2,
                 CAST(SUM(a1) OVER (ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n1,
                 CAST(SUM(a2) OVER (ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n2
          FROM g),
    k AS (SELECT day,
                 d1 + d2 AS dt, n1 + n2 AS nt, d1, n1
          FROM r WHERE d1 + d2 > 0 AND n1 + n2 > 1),
    a AS (SELECT list(struct_pack(
                   oe := d1 - CAST(dt AS DOUBLE) * n1 / nt,
                   v := CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / nt)
                        * (1.0 - CAST(n1 AS DOUBLE) / nt)
                        * (nt - dt) / (nt - 1))
                 ORDER BY day) AS terms
          FROM k),
    f AS (SELECT list_reduce(
                   list_prepend(struct_pack(oe := 0.0, v := 0.0),
                                [struct_pack(oe := x.oe, v := x.v)
                                 FOR x IN terms]),
                   (acc, x) -> struct_pack(oe := acc.oe + x.oe,
                                           v := acc.v + x.v)) AS s
          FROM a)
    SELECT FLOOR(f.s.oe * 1e6) / 1e6 AS o_minus_e,
           FLOOR(f.s.v * 1e6) / 1e6 AS variance,
           FLOOR(f.s.oe * f.s.oe / f.s.v * 1e6) / 1e6 AS chi2
    FROM f
    """,
    notes="log-rank test between two cohorts' click-to-purchase survival "
    "(the hypothesis test that pairs with evt_survival_km): at each "
    "death day, observed-minus-expected cohort-1 deaths under the "
    "pooled-risk null, and the hypergeometric variance; chi2 = "
    "(O-E)^2/V. Cohort at-risk counts are per-cohort suffix sums on "
    "the day table; the day-term sums fold a SORTED array identically "
    "on both engines (the agg_anova ordered-fold discipline), so the "
    "doubles are bit-identical despite being a sum of float terms. "
    "Data-sized work: one keyed agg over one scan, as evt_survival_km",
)
def evt_logrank(spark, sf_dir):
    day_us = 86_400_000_000
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max(epoch_us("ts")).alias("mx"))
    per_user = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "click", epoch_us("ts"))
            ).alias("t_c"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "purchase", epoch_us("ts"))
                )
            ).alias("p_ts"),
        )
        .where(F.col("t_c").isNotNull())
    )
    t_p = F.get(F.filter(F.col("p_ts"), lambda x: x >= F.col("t_c")), 0)
    d = (
        per_user.crossJoin(F.broadcast(mx))
        .select(
            (F.col("user_id") % 2).alias("grp"),
            "t_c",
            t_p.alias("t_p"),
            "mx",
        )
        .select(
            "grp",
            F.when(F.col("t_p").isNull(), F.expr(f"(mx - t_c) div {day_us}"))
            .otherwise(F.expr(f"(t_p - t_c) div {day_us}"))
            .alias("day"),
            F.when(F.col("t_p").isNull(), 0).otherwise(1).alias("ev"),
        )
    )
    is1 = F.col("grp") == 1
    g = d.groupBy("day").agg(
        F.sum(F.when(is1, F.col("ev")).otherwise(0)).cast("long").alias("d1"),
        F.sum(F.when(~is1, F.col("ev")).otherwise(0)).cast("long").alias("d2"),
        F.count(F.when(is1, 1)).cast("long").alias("a1"),
        F.count(F.when(~is1, 1)).cast("long").alias("a2"),
    )
    wsuf = Window.orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    r = g.select(
        "day",
        "d1",
        "d2",
        F.sum("a1").over(wsuf).cast("long").alias("n1"),
        F.sum("a2").over(wsuf).cast("long").alias("n2"),
    )
    k = r.select(
        "day",
        (F.col("d1") + F.col("d2")).alias("dt"),
        (F.col("n1") + F.col("n2")).alias("nt"),
        "d1",
        "n1",
    ).where((F.col("dt") > 0) & (F.col("nt") > 1))
    oe = F.col("d1") - F.col("dt").cast("double") * F.col("n1") / F.col("nt")
    v = (
        F.col("dt").cast("double")
        * (F.col("n1").cast("double") / F.col("nt"))
        * (F.lit(1.0) - F.col("n1").cast("double") / F.col("nt"))
        * (F.col("nt") - F.col("dt"))
        / (F.col("nt") - 1)
    )
    terms = k.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("day"), oe.alias("oe"), v.alias("v"))
            )
        ).alias("terms")
    )
    folded = F.aggregate(
        F.col("terms"),
        F.struct(F.lit(0.0).alias("oe"), F.lit(0.0).alias("v")),
        lambda acc, x: F.struct(
            (acc["oe"] + x["oe"]).alias("oe"), (acc["v"] + x["v"]).alias("v")
        ),
    )
    return terms.select(folded.alias("s")).select(
        (F.floor(F.col("s.oe") * 1e6) / 1e6).alias("o_minus_e"),
        (F.floor(F.col("s.v") * 1e6) / 1e6).alias("variance"),
        (
            F.floor(F.col("s.oe") * F.col("s.oe") / F.col("s.v") * 1e6) / 1e6
        ).alias("chi2"),
    )


_MK_ITERS = 8
# Size gate for the driver-side power-iteration fast path: the
# transition matrix is |states|^2-bounded (states are event types — a
# fixed vocabulary at ANY corpus size); over the cap the distributed
# loop runs instead (the graph-family discipline).
_MK_LOCAL_MAX = 64 * 64

_MK_EDGES_SQL = """
    e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
          FROM events),
    bi AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS to_type
      FROM e),
    tc AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM bi WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
    rt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
           FROM tc GROUP BY from_type),
    p AS (SELECT tc.from_type, tc.to_type, tc.n / rt.tot AS frac
          FROM tc JOIN rt ON tc.from_type = rt.from_type),
    st AS (SELECT DISTINCT from_type AS state FROM tc),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_states FROM st)
"""


def _markov_oracle() -> str:
    """Unroll the power iteration pi_{t+1} = pi_t P into chained CTEs
    (the graph_pagerank oracle pattern)."""
    ctes = ["r0 AS (SELECT state, 1.0 / n_states AS pr FROM st CROSS JOIN ns)"]
    for i in range(1, _MK_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT p.to_type AS state, SUM(r.pr * p.frac) AS pr
      FROM r{i - 1} r JOIN p ON p.from_type = r.state
      GROUP BY p.to_type)"""
        )
    return (
        "WITH "
        + _MK_EDGES_SQL.strip()
        + ",\n    "
        + ",\n    ".join(ctes)
        + f"\n    SELECT state, ROUND(pr, 6) AS stationary_prob FROM r{_MK_ITERS}"
    )


@register(
    "evt_markov_stationary",
    section="2.10",
    oracle=_markov_oracle(),
    notes=f"long-run state distribution of the event-type Markov chain: "
    f"power iteration pi P^{_MK_ITERS} from uniform over the row-"
    "normalized bigram transition matrix (evt_transitions' counts). "
    "The oracle unrolls the recurrence into chained CTEs (the "
    "graph_pagerank pattern), so the iterative computation is fully "
    "value-checked; ROUND 6 dp absorbs float-sum order inside each "
    "5-term matrix-vector product. Every observed state has outgoing "
    "transitions in this corpus, so no dangling-mass correction is "
    "needed (pagerank shows the damped variant when it is)",
)
def evt_markov_stationary(spark, sf_dir):
    """Where user behavior settles: the transition matrix aggregates
    once from the data-sized lag pass (one keyed window shuffle —
    identical shape to evt_transitions), after which the chain is
    states^2-sized and every power-iteration step is a broadcast join
    + 1-row-per-state aggregate. localCheckpoint keeps the iterative
    plan flat. At 100 TB the matrix is still 5x5: iteration cost is
    independent of corpus size."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    tc = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    rt = tc.groupBy("from_type").agg(F.sum("n").cast("long").alias("tot"))
    p = tc.join(rt, "from_type").select(
        "from_type", "to_type", (F.col("n") / F.col("tot")).alias("frac")
    ).localCheckpoint()
    p_rows = p.limit(_MK_LOCAL_MAX + 1).collect()
    if len(p_rows) <= _MK_LOCAL_MAX:
        return _markov_local(spark, p, p_rows)
    return _markov_distributed(spark, p)


def _markov_local(spark, p, p_rows):
    """Driver-side exact replica for the size-gated fast path (the
    graph_pagerank discipline): the collected fracs are the identical
    long/long doubles, the matrix-vector fold runs in sorted
    (from_type, to_type) order, and each iteration's support is exactly
    the reachable to_type set (matching the distributed join+groupBy).
    ROUND 6dp absorbs fold-order ulps exactly as it does between Spark
    and the oracle."""
    from pyspark.sql import types as T

    from .graph import _round6

    rows = sorted((r["from_type"], r["to_type"], r["frac"]) for r in p_rows)
    states = sorted({ft for ft, _tt, _f in rows})
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(_MK_ITERS):
        new: dict[str, float] = {}
        for ft, tt, frac in rows:
            if ft in pi:
                new[tt] = new.get(tt, 0.0) + pi[ft] * frac
        pi = new
    stype = p.schema["from_type"].dataType
    schema = T.StructType(
        [
            T.StructField("state", stype, True),
            T.StructField("stationary_prob", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(
        [(s, _round6(v)) for s, v in sorted(pi.items())], schema
    )


def _markov_distributed(spark, p):
    """The original iterative plan — the over-cap fallback."""
    states = p.select(F.col("from_type").alias("state")).distinct()
    n_states = states.count()
    pi = states.select("state", F.lit(1.0 / n_states).alias("pr"))
    for _ in range(_MK_ITERS):
        pi = (
            p.join(F.broadcast(pi), p.from_type == pi.state)
            .groupBy(F.col("to_type").alias("next_state"))
            .agg(F.sum(F.col("pr") * F.col("frac")).alias("pr"))
            .select(F.col("next_state").alias("state"), "pr")
            .localCheckpoint()
        )
    return pi.select("state", F.round("pr", 6).alias("stationary_prob"))


@register(
    "evt_interval_merge",
    section="2.10",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts)
               + (1 + CAST(ROUND(value * 100) AS BIGINT) % 3600) * 1000000
               AS e
      FROM events WHERE value IS NOT NULL),
    mk AS (
      SELECT user_id, event_id, s, e,
             CAST(MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS prev_max_e
      FROM iv),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                  THEN 1 ELSE 0 END AS new_island
      FROM mk),
    isl AS (
      SELECT user_id, s, e,
             CAST(SUM(new_island) OVER (PARTITION BY user_id
                  ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS island
      FROM flagged)
    SELECT user_id, island,
           CAST(MIN(s) AS BIGINT) AS span_start_us,
           CAST(MAX(e) AS BIGINT) AS span_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM isl GROUP BY user_id, island
    """,
    notes="interval coalescing (merge transitively-overlapping spans "
    "into maximal islands) over VARIABLE-length per-event intervals "
    "(duration derived from the value column, 1s..1h) — the classic "
    "running-max-of-ends gaps-and-islands algorithm, which "
    "evt_sessionize's fixed-gap rule cannot express: with variable "
    "lengths an early long interval can swallow several later short "
    "ones, so the island test needs MAX(e) over ALL predecessors, "
    "not the previous row's end. Everything is exact epoch "
    "microseconds; two stacked keyed windows, one keyed aggregate",
)
def evt_interval_merge(spark, sf_dir):
    """The ops/booking primitive (machine reservations, on-call spans,
    maintenance windows): one sort per user key drives both windows
    and the final aggregate — a single exchange end to end, same
    shape at any scale."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    iv = ev.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("s"),
        (
            epoch_us("ts")
            + (1 + F.round(F.col("value") * 100).cast("long") % 3600)
            * 1_000_000
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    mk = iv.select(
        "user_id",
        "s",
        "e",
        F.max("e")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .cast("long")
        .alias("prev_max_e"),
    )
    flagged = mk.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w2 = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w2).cast("long").alias("island"),
    )
    return isl.groupBy("user_id", "island").agg(
        F.min("s").cast("long").alias("span_start_us"),
        F.max("e").cast("long").alias("span_end_us"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )


@register(
    "evt_stickiness",
    section="2.10",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d
      FROM events),
    bounds AS (SELECT CAST(MIN(d) AS BIGINT) AS d0,
                      CAST(MAX(d) AS BIGINT) AS d1 FROM ud),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    contrib AS (
      SELECT user_id, d + t.o AS target_d
      FROM ud CROSS JOIN range(0, 7) t(o)),
    wau AS (
      SELECT target_d AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM contrib GROUP BY target_d)
    SELECT dau.d AS day_idx, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d CROSS JOIN bounds
    WHERE dau.d >= bounds.d0 + 6
    """,
    notes="DAU / trailing-7-day-WAU stickiness per day — the growth "
    "metric that needs a DISTINCT count over a SLIDING window, which "
    "no window frame computes directly: each (user, day) activity row "
    "is exploded to the 7 future days it keeps the user 'weekly "
    "active' for, turning the sliding distinct into a plain keyed "
    "COUNT(DISTINCT) — the standard contribution-explosion rewrite. "
    "Days without a full trailing week are excluded; the ratio is one "
    "exact division",
)
def evt_stickiness(spark, sf_dir):
    """The sliding-distinct rewrite that scales: corpus reduces to
    (user, day) once; the 7x explosion is grid-sized, and both
    distinct counts are ordinary keyed aggregates with partial
    combine. No per-day re-scan, no window-frame distinct (which
    Spark and most engines lack)."""
    ev = table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).distinct()
    bounds = ud.agg(F.min("d").cast("long").alias("d0"))
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    contrib = ud.select(
        "user_id", "d", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o")
    ).select(
        "user_id", (F.col("d") + F.col("o")).cast("long").alias("target_d")
    )
    wau = contrib.groupBy(F.col("target_d").alias("d")).agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "d")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("d") >= F.col("d0") + 6)
        .select(
            F.col("d").alias("day_idx"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "evt_cohort_ltv",
    section="2.10",
    oracle="""
    WITH ud AS (
      SELECT user_id,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(SUM(CASE WHEN value IS NOT NULL
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS rev
      FROM events GROUP BY 1, 2),
    fu AS (SELECT user_id, CAST(MIN(d) AS BIGINT) AS cohort FROM ud
           GROUP BY user_id),
    cs AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users
           FROM fu GROUP BY cohort),
    aged AS (
      SELECT fu.cohort, ud.d - fu.cohort AS age,
             CAST(SUM(ud.rev) AS BIGINT) AS rev
      FROM ud JOIN fu USING (user_id) GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age,
             CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_rev
      FROM aged)
    SELECT cum.cohort AS cohort_day, cum.age, cs.cohort_users,
           cum.cum_rev / 100.0 AS cum_revenue,
           CAST(cum.cum_rev AS DOUBLE) / cs.cohort_users / 100.0
             AS ltv_per_user
    FROM cum JOIN cs USING (cohort)
    """,
    notes="cohort LTV curves: users cohorted by first-activity day, "
    "revenue accumulated by cohort age — the matrix whose rows growth "
    "teams read down (how fast does each vintage monetize). Exact "
    "cent-integer cumsum per cohort (grid-sized window after two "
    "keyed aggregates); per-user LTV is a single division of exact "
    "integers. The revenue-weighted companion to evt_cohort_matrix's "
    "retention counts",
)
def evt_cohort_ltv(spark, sf_dir):
    """Corpus reduces to (user, day, cents) then (cohort, age, cents)
    — two map-side-combined shuffles; the cumulative window runs on
    the calendar-bounded cohort x age grid. Standard 100 TB shape:
    nothing after the second aggregate sees row counts."""
    ev = table(spark, sf_dir, "events")
    ud = ev.groupBy(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("rev")
    )
    fu = ud.groupBy("user_id").agg(F.min("d").cast("long").alias("cohort"))
    cs = fu.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    aged = (
        ud.join(fu, "user_id")
        .groupBy("cohort", (F.col("d") - F.col("cohort")).alias("age"))
        .agg(F.sum("rev").cast("long").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = aged.select(
        "cohort",
        "age",
        F.sum("rev").over(w).cast("long").alias("cum_rev"),
    )
    return cum.join(F.broadcast(cs), "cohort").select(
        F.col("cohort").alias("cohort_day"),
        "age",
        "cohort_users",
        (F.col("cum_rev") / 100.0).alias("cum_revenue"),
        (
            F.col("cum_rev").cast("double") / F.col("cohort_users") / 100.0
        ).alias("ltv_per_user"),
    )


@register(
    "profile_sequence_gaps",
    section="2.10",
    oracle="""
    WITH ids AS (SELECT event_id AS id FROM events
                 WHERE event_type = 'click'),
    bounds AS (SELECT CAST(MAX(id) AS BIGINT) AS hi FROM ids),
    starts AS (
      SELECT a.id + 1 AS gap_start
      FROM ids a CROSS JOIN bounds
      WHERE a.id < bounds.hi
        AND NOT EXISTS (SELECT 1 FROM ids b WHERE b.id = a.id + 1)),
    enders AS (
      SELECT a.id - 1 AS gap_end
      FROM ids a
      WHERE NOT EXISTS (SELECT 1 FROM ids b WHERE b.id = a.id - 1)
        AND a.id > (SELECT MIN(id) FROM ids)),
    s AS (SELECT gap_start,
                 ROW_NUMBER() OVER (ORDER BY gap_start) AS rk FROM starts),
    e AS (SELECT gap_end,
                 ROW_NUMBER() OVER (ORDER BY gap_end) AS rk FROM enders)
    SELECT s.gap_start, e.gap_end,
           CAST(e.gap_end - s.gap_start + 1 AS BIGINT) AS gap_len
    FROM s JOIN e USING (rk)
    """,
    notes="missing-id audit over the click event-id sequence (which "
    "ranges never arrived in this feed): gap BOUNDARIES are found by "
    "two keyed anti-joins (an id whose successor is absent starts a "
    "gap; one whose predecessor is absent ends the preceding gap) — "
    "NO global sort of the data, because boundaries pair up 1:1 by "
    "rank and only the gap-count-sized boundary sets are ordered. "
    "Exact integers throughout; the i-th start matches the i-th end "
    "by construction (gaps cannot nest in a set of integers)",
)
def profile_sequence_gaps(spark, sf_dir):
    """The data-quality primitive for ingest audits at scale: the
    corpus-sized work is two hash anti-joins on id+-1 (keyed,
    map-side prunable); the ROW_NUMBER pairing runs only over the
    boundary sets, which are as small as the number of gaps. The
    naive lead()-over-global-order formulation would single-partition
    the whole feed."""
    ev = table(spark, sf_dir, "events")
    ids = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("id")
    ).localCheckpoint()
    bounds = ids.agg(
        F.max("id").cast("long").alias("hi"),
        F.min("id").cast("long").alias("lo"),
    )
    probe = ids.select(F.col("id").alias("probe"))
    starts = (
        ids.join(probe, F.col("id") + 1 == F.col("probe"), "left_anti")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("id") < F.col("hi"))
        .select((F.col("id") + 1).alias("gap_start"))
    )
    enders = (
        ids.join(probe, F.col("id") - 1 == F.col("probe"), "left_anti")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("id") > F.col("lo"))
        .select((F.col("id") - 1).alias("gap_end"))
    )
    s = starts.select(
        "gap_start",
        F.row_number().over(Window.orderBy("gap_start")).alias("rk"),
    )
    e = enders.select(
        "gap_end",
        F.row_number().over(Window.orderBy("gap_end")).alias("rk"),
    )
    return s.join(e, "rk").select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1)
        .cast("long")
        .alias("gap_len"),
    )


@register(
    "evt_propensity_matching",
    section="2.10",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_purch,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_click,
             CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_cov
      FROM events GROUP BY user_id),
    sc AS (
      SELECT user_id,
             CAST(n_purch > 0 AS BIGINT) AS treated,
             CAST(n_click * 1000000 // n_cov AS BIGINT) AS score
      FROM u WHERE n_cov > 0),
    carried AS (
      SELECT user_id, treated, score, score // 100000 AS band,
             LAST_VALUE(CASE WHEN treated = 0 THEN score END IGNORE NULLS)
               OVER wb AS prev_score,
             LAST_VALUE(CASE WHEN treated = 0 THEN user_id END IGNORE NULLS)
               OVER wb AS prev_uid,
             FIRST_VALUE(CASE WHEN treated = 0 THEN score END IGNORE NULLS)
               OVER wf AS next_score,
             FIRST_VALUE(CASE WHEN treated = 0 THEN user_id END IGNORE NULLS)
               OVER wf AS next_uid
      FROM sc
      WINDOW
        wb AS (PARTITION BY score // 100000
               ORDER BY score, treated, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY score // 100000
               ORDER BY score, treated, user_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id AS treated_uid, score AS treated_score, band,
           CASE
             WHEN prev_score IS NULL AND next_score IS NULL THEN NULL
             WHEN prev_score IS NULL THEN next_uid
             WHEN next_score IS NULL THEN prev_uid
             WHEN score - prev_score <= next_score - score THEN prev_uid
             ELSE next_uid
           END AS control_uid,
           CASE
             WHEN prev_score IS NULL AND next_score IS NULL THEN NULL
             WHEN prev_score IS NULL THEN next_score - score
             WHEN next_score IS NULL THEN score - prev_score
             ELSE LEAST(score - prev_score, next_score - score)
           END AS score_gap
    FROM carried WHERE treated = 1
    """,
    notes="1:1 nearest-neighbor propensity matching with a band "
    "caliper — the missing piece of the causal family next to evt_did "
    "/ agg_cuped / evt_logrank. Propensity is an EXACT integer score "
    "(click share of non-purchase events, ppm); treated users (>= 1 "
    "purchase) match the nearest control WITHIN their score band "
    "(caliper = 100k ppm), distance ties to the lower side; equal-score "
    "controls resolve by the carry order (last/first in (score, uid)). "
    "The carry windows run on the DISTINCT-SCORE grid (bounded by "
    "the ppm range — at most 1e6+1 rows no matter how many users), "
    "with score and carrier uid taken from the SAME per-score summary "
    "row so the pair cannot disagree; treated users then equi-join "
    "their score row. That grid reduction is what makes it "
    "100 TB-safe: the naive formulation windows over the USER-sized "
    "table with only ~10 band partitions (measured exactly linear at "
    "10x — a billion-row single-task sort at scale); the grid version "
    "is one keyed user aggregate + bounded-grid windows + one "
    "broadcast-able equi-join. Matching with replacement: controls "
    "may repeat",
)
def evt_propensity_matching(spark, sf_dir):
    """Corpus -> per-user covariates (one keyed agg, checkpointed so
    the grid and the treated probe share the single corpus pass) ->
    per-score summary (bounded grid) -> banded carry windows on the
    grid -> treated equi-join back by score. Nothing after the first
    aggregate is user-sized except the final keyed join. An unmatched
    treated user (no control in band) surfaces with NULL control
    rather than silently dropping."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("n_purch"),
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("n_click"),
        F.sum((F.col("event_type") != "purchase").cast("long"))
        .cast("long")
        .alias("n_cov"),
    )
    sc = (
        u.where(F.col("n_cov") > 0)
        .select(
            "user_id",
            (F.col("n_purch") > 0).cast("long").alias("treated"),
            F.expr("n_click * 1000000 div n_cov").cast("long").alias("score"),
        )
        .localCheckpoint()
    )
    # per-score summary: the grid is bounded by the ppm score range,
    # NOT by user count. Carrier uids reproduce the union-sort-carry
    # tie rule exactly: backward picks the LAST control in (score,
    # uid) order (max uid of its score), forward the FIRST (min uid)
    g = sc.groupBy("score").agg(
        F.max(F.when(F.col("treated") == 0, F.col("user_id")))
        .cast("long")
        .alias("ctl_max_uid"),
        F.min(F.when(F.col("treated") == 0, F.col("user_id")))
        .cast("long")
        .alias("ctl_min_uid"),
    )
    band = F.expr("score div 100000")
    wb = (
        Window.partitionBy(band)
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(band)
        .orderBy("score")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    has_ctl = F.col("ctl_max_uid").isNotNull()
    ctl_score = F.when(has_ctl, F.col("score"))
    grid = g.select(
        "score",
        band.cast("long").alias("band"),
        F.last(ctl_score, ignorenulls=True).over(wb).alias("prev_score"),
        F.last(F.when(has_ctl, F.col("ctl_max_uid")), ignorenulls=True)
        .over(wb)
        .alias("prev_uid"),
        F.first(ctl_score, ignorenulls=True).over(wf).alias("next_score"),
        F.first(F.when(has_ctl, F.col("ctl_min_uid")), ignorenulls=True)
        .over(wf)
        .alias("next_uid"),
    )
    carried = sc.where(F.col("treated") == 1).join(
        F.broadcast(grid), "score"
    )
    back = F.col("score") - F.col("prev_score")
    fwd = F.col("next_score") - F.col("score")
    control = (
        F.when(
            F.col("prev_score").isNull() & F.col("next_score").isNull(),
            F.lit(None),
        )
        .when(F.col("prev_score").isNull(), F.col("next_uid"))
        .when(F.col("next_score").isNull(), F.col("prev_uid"))
        .when(back <= fwd, F.col("prev_uid"))
        .otherwise(F.col("next_uid"))
    )
    gap = (
        F.when(
            F.col("prev_score").isNull() & F.col("next_score").isNull(),
            F.lit(None),
        )
        .when(F.col("prev_score").isNull(), fwd)
        .when(F.col("next_score").isNull(), back)
        .otherwise(F.least(back, fwd))
    )
    return carried.select(
        F.col("user_id").alias("treated_uid"),
        F.col("score").alias("treated_score"),
        "band",
        control.cast("long").alias("control_uid"),
        gap.cast("long").alias("score_gap"),
    )


_SRM_CHI_CRIT = 3.841458820694124  # chi-square(df=1) 95% critical value


@register(
    "evt_ab_srm",
    section="2.10",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    b AS (SELECT user_id,
                 ('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)),
                                 1, 13))::BIGINT % 2 AS arm
          FROM u),
    t AS (SELECT CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n0,
                 CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n1
          FROM b)
    SELECT n0, n1,
           FLOOR(((n0 - n1) * (n0 - n1)) / (n0 + n1) * 1e6) / 1e6
             AS chi2,
           CAST(((n0 - n1) * (n0 - n1)) / (n0 + n1)
                > {_SRM_CHI_CRIT!r} AS BIGINT) AS srm_detected
    FROM t
    """,
    notes="sample-ratio-mismatch guard for a 50/50 experiment split: "
    "users are assigned by the CONTENT-ADDRESSED md5 arm (the "
    "pipeline_split discipline — reproducible anywhere, no RNG "
    "state), and the goodness-of-fit chi-square for two equal cells "
    "reduces to (n0-n1)^2/(n0+n1) — one division of exact BIGINTs, "
    "compared against the df=1 critical value embedded as the same "
    "repr literal in both engines. The pre-analysis hygiene check "
    "every experiment readout should run before agg_ab_test/"
    "agg_ttest_welch are allowed to mean anything. One distinct + "
    "one map-side aggregate at any scale",
)
def evt_ab_srm(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    t = u.select(arm.alias("arm")).agg(
        F.sum((F.col("arm") == 0).cast("long")).cast("long").alias("n0"),
        F.sum((F.col("arm") == 1).cast("long")).cast("long").alias("n1"),
    )
    d2 = (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))
    chi = d2 / (F.col("n0") + F.col("n1"))
    return t.select(
        "n0",
        "n1",
        (F.floor(chi * 1e6) / 1e6).alias("chi2"),
        (chi > _SRM_CHI_CRIT).cast("long").alias("srm_detected"),
    )


@register(
    "evt_burstiness",
    section="2.10",
    oracle="""
    WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS ts_us,
                      event_id
               FROM events),
    g AS (SELECT event_type,
                 (ts_us - LAG(ts_us) OVER (
                    PARTITION BY event_type, user_id
                    ORDER BY ts_us, event_id)) // 60000000 AS gap_min
          FROM e),
    m AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(gap_min) AS BIGINT) AS s,
                 CAST(SUM(gap_min * gap_min) AS BIGINT) AS ss
          FROM g WHERE gap_min IS NOT NULL GROUP BY event_type),
    b AS (SELECT event_type, n, s,
                 CAST(s AS DOUBLE) / n AS mu,
                 sqrt((n * CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * s)
                      / (CAST(n AS DOUBLE) * n)) AS sigma
          FROM m)
    SELECT event_type, n AS n_gaps,
           FLOOR(mu * 1e4) / 1e4 AS mean_gap_min,
           FLOOR((sigma - mu) / (sigma + mu) * 1e6) / 1e6 AS burstiness
    FROM b WHERE sigma + mu > 0
    """,
    notes="Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of "
    "per-user inter-event gaps, per event type: B -> -1 is metronomic, "
    "0 is Poisson, -> +1 is heavy-tailed bursts — the temporal-pattern "
    "diagnostic behind rate-limit sizing and anomaly thresholds. Gaps "
    "integerize to whole minutes so the first/second moments are "
    "exact BIGINTs (gap^2 in MICROseconds would overflow by sf0.1 — "
    "the agg_hurst lesson applied at design time); the cross products "
    "n*ss and s^2 go through DOUBLE (they overflow by sf1), one "
    "correctly-rounded sqrt, identical trees both engines, floored. "
    "One keyed window pass + one per-type aggregate",
)
def evt_burstiness(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_type", "user_id", epoch_us("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts_us", "event_id"
    )
    g = e.select(
        "event_type",
        F.expr("(ts_us - lag(ts_us) over (partition by event_type, user_id"
               " order by ts_us, event_id)) div 60000000").alias("gap_min"),
    ).where(F.col("gap_min").isNotNull())
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_min").cast("long").alias("s"),
        F.sum(F.col("gap_min") * F.col("gap_min")).cast("long").alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sigma = F.sqrt(
        (
            F.col("n") * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s")
        )
        / (F.col("n").cast("double") * F.col("n"))
    )
    b = m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        (F.floor(mu * 1e4) / 1e4).alias("mean_gap_min"),
        (F.floor((sigma - mu) / (sigma + mu) * 1e6) / 1e6).alias(
            "burstiness"
        ),
        (sigma + mu).alias("_sm"),
    )
    return b.where(F.col("_sm") > 0).drop("_sm")


# Shapley coalition weights for n=3 players: |S|! (n-1-|S|)! / n!
# (exact rationals as repr literals shared by both engines)
_SHAP_W0 = 1.0 / 3.0  # |S| = 0
_SHAP_W1 = 1.0 / 6.0  # |S| = 1
_SHAP_W2 = 1.0 / 3.0  # |S| = 2


_SHAP_ORDER = "vcs"  # canonical member order in coalition column names


def _shapley_vname(*members: str) -> str:
    """Canonical coalition column name: v + members in _SHAP_ORDER
    (the p CTE names columns this way), so callers never post-edit
    generated identifiers."""
    return "v" + "".join(ch for ch in _SHAP_ORDER if ch in members)


def _shapley_phi_sql(i: str, j: str, k: str) -> str:
    """phi_i over coalitions of {j, k}: sum of weighted marginal
    contributions v(S+i) - v(S)."""
    return (
        f"{_SHAP_W0!r} * ({_shapley_vname(i)} - v0) "
        f"+ {_SHAP_W1!r} * ({_shapley_vname(i, j)} - {_shapley_vname(j)}) "
        f"+ {_SHAP_W1!r} * ({_shapley_vname(i, k)} - {_shapley_vname(k)}) "
        f"+ {_SHAP_W2!r} * ({_shapley_vname(i, j, k)}"
        f" - {_shapley_vname(j, k)})"
    )


@register(
    "evt_attribution_shapley",
    section="2.6",
    oracle=f"""
    WITH uc AS (SELECT user_id,
                      CAST(COUNT(*) FILTER (event_type = 'view')
                           AS BIGINT) AS nv,
                      CAST(COUNT(*) FILTER (event_type = 'click')
                           AS BIGINT) AS nc,
                      CAST(COUNT(*) FILTER (event_type = 'signup')
                           AS BIGINT) AS ns,
                      CAST(MAX(CASE WHEN event_type = 'purchase'
                                     AND CAST(ROUND(value * 100) AS BIGINT)
                                         >= 20000
                                    THEN 1 ELSE 0 END) AS BIGINT) AS conv
               FROM events GROUP BY user_id),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
                   CAST(SUM(nv) AS BIGINT) AS sv,
                   CAST(SUM(nc) AS BIGINT) AS sc,
                   CAST(SUM(ns) AS BIGINT) AS ss
            FROM uc),
    u AS (SELECT user_id,
                 CAST(CASE WHEN nv * nu > sv THEN 1 ELSE 0 END
                      AS BIGINT) AS tv,
                 CAST(CASE WHEN nc * nu > sc THEN 1 ELSE 0 END
                      AS BIGINT) AS tc,
                 CAST(CASE WHEN ns * nu > ss THEN 1 ELSE 0 END
                      AS BIGINT) AS ts,
                 conv
          FROM uc CROSS JOIN tot),
    s AS (SELECT tv, tc, ts,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS x
          FROM u GROUP BY tv, tc, ts),
    p AS (SELECT
            COALESCE(MAX(CASE WHEN tv=0 AND tc=0 AND ts=0
                              THEN CAST(x AS DOUBLE)/n END), 0) AS v0,
            COALESCE(MAX(CASE WHEN tv=1 AND tc=0 AND ts=0
                              THEN CAST(x AS DOUBLE)/n END), 0) AS vv,
            COALESCE(MAX(CASE WHEN tv=0 AND tc=1 AND ts=0
                              THEN CAST(x AS DOUBLE)/n END), 0) AS vc,
            COALESCE(MAX(CASE WHEN tv=0 AND tc=0 AND ts=1
                              THEN CAST(x AS DOUBLE)/n END), 0) AS vs,
            COALESCE(MAX(CASE WHEN tv=1 AND tc=1 AND ts=0
                              THEN CAST(x AS DOUBLE)/n END), 0) AS vvc,
            COALESCE(MAX(CASE WHEN tv=1 AND tc=0 AND ts=1
                              THEN CAST(x AS DOUBLE)/n END), 0) AS vvs,
            COALESCE(MAX(CASE WHEN tv=0 AND tc=1 AND ts=1
                              THEN CAST(x AS DOUBLE)/n END), 0) AS vcs,
            COALESCE(MAX(CASE WHEN tv=1 AND tc=1 AND ts=1
                              THEN CAST(x AS DOUBLE)/n END), 0) AS vvcs,
            CAST(SUM(n) AS BIGINT) AS n_users
          FROM s),
    phi AS (SELECT n_users,
                   {_shapley_phi_sql('v', 'c', 's')} AS phi_view,
                   {_shapley_phi_sql('c', 'v', 's')} AS phi_click,
                   {_shapley_phi_sql('s', 'v', 'c')} AS phi_signup
            FROM p)
    SELECT channel, n_users, FLOOR(phi * 1e6) / 1e6 AS shapley_value
    FROM (SELECT n_users, 'view' AS channel, phi_view AS phi FROM phi
          UNION ALL
          SELECT n_users, 'click', phi_click FROM phi
          UNION ALL
          SELECT n_users, 'signup', phi_signup FROM phi)
    ORDER BY channel
    """,
    notes="Shapley-value channel attribution over three ENGAGEMENT "
    "channels (above-mean view/click/signup activity — the every-user-touches-everything degeneracy needs a real split, decided by the exact integer cross-multiply cnt*users > total) against HIGH-VALUE purchase "
    "conversion (>= 200 units — every fixture user converts on plain "
    "purchase, the agg_power_analysis degeneracy lesson): coalition "
    "value v(S) = conversion rate of users whose touch set is exactly "
    "S, phi_i = sum over coalitions of the weighted marginal "
    "contribution with the exact 3-player factorial weights embedded "
    "as literals. The fair-division answer to 'which channel drives "
    "conversion' next to last-touch (evt_attribution) and linear "
    "(evt_attribution_linear). ONE user-keyed aggregate + an 8-row "
    "coalition table at any scale; v values are single divisions of "
    "exact counts",
)
def evt_attribution_shapley(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    conv = (F.col("event_type") == "purchase") & (
        F.round(F.col("value") * 100).cast("long") >= 20000
    )
    uc = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("long")
        .alias("nv"),
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("nc"),
        F.count(F.when(F.col("event_type") == "signup", 1))
        .cast("long")
        .alias("ns"),
        F.max(conv.cast("long")).alias("conv"),
    )
    tot = uc.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.sum("nv").cast("long").alias("sv"),
        F.sum("nc").cast("long").alias("sc"),
        F.sum("ns").cast("long").alias("ss"),
    )
    u = uc.crossJoin(F.broadcast(tot)).select(
        "user_id",
        F.when(F.col("nv") * F.col("nu") > F.col("sv"), 1)
        .otherwise(0)
        .cast("long")
        .alias("tv"),
        F.when(F.col("nc") * F.col("nu") > F.col("sc"), 1)
        .otherwise(0)
        .cast("long")
        .alias("tc"),
        F.when(F.col("ns") * F.col("nu") > F.col("ss"), 1)
        .otherwise(0)
        .cast("long")
        .alias("ts"),
        "conv",
    )
    s = u.groupBy("tv", "tc", "ts").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )

    def v(tv, tc, ts):
        return F.coalesce(
            F.max(
                F.when(
                    (F.col("tv") == tv)
                    & (F.col("tc") == tc)
                    & (F.col("ts") == ts),
                    F.col("x").cast("double") / F.col("n"),
                )
            ),
            F.lit(0.0),
        )

    p = s.agg(
        v(0, 0, 0).alias("v0"),
        v(1, 0, 0).alias("vv"),
        v(0, 1, 0).alias("vc"),
        v(0, 0, 1).alias("vs"),
        v(1, 1, 0).alias("vvc"),
        v(1, 0, 1).alias("vvs"),
        v(0, 1, 1).alias("vcs"),
        v(1, 1, 1).alias("vvcs"),
        F.sum("n").cast("long").alias("n_users"),
    )

    def phi(vi, vij, vik, vj, vk, vjk):
        return (
            _SHAP_W0 * (F.col(vi) - F.col("v0"))
            + _SHAP_W1 * (F.col(vij) - F.col(vj))
            + _SHAP_W1 * (F.col(vik) - F.col(vk))
            + _SHAP_W2 * (F.col("vvcs") - F.col(vjk))
        )

    phiv = phi("vv", "vvc", "vvs", "vc", "vs", "vcs")
    phic = phi("vc", "vvc", "vcs", "vv", "vs", "vvs")
    phis = phi("vs", "vvs", "vcs", "vv", "vc", "vvc")
    wide = p.select(
        "n_users",
        phiv.alias("phi_view"),
        phic.alias("phi_click"),
        phis.alias("phi_signup"),
    )
    stacked = wide.selectExpr(
        "n_users",
        "stack(3, 'view', phi_view, 'click', phi_click, "
        "'signup', phi_signup) AS (channel, phi)",
    )
    return stacked.select(
        "channel",
        "n_users",
        (F.floor(F.col("phi") * 1e6) / 1e6).alias("shapley_value"),
    ).orderBy("channel")


@register(
    "evt_markov_entropy",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type,
                      epoch_us(ts) AS ts_us
               FROM events),
    tr AS (SELECT event_type AS from_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts_us, event_id)
                    AS to_type
           FROM e),
    tc AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
    rt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM tc
           GROUP BY from_type),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS gt FROM tc),
    hs AS (SELECT rt.from_type, rt.tot,
                  -list_reduce(list_prepend(0.0,
                     list((CAST(tc.n AS DOUBLE) / rt.tot)
                          * LN(CAST(tc.n AS DOUBLE) / rt.tot)
                          ORDER BY tc.to_type)),
                     (a, b) -> a + b) / LN(2.0) AS h_bits
           FROM rt JOIN tc ON tc.from_type = rt.from_type
           GROUP BY rt.from_type, rt.tot),
    rate AS (SELECT list_reduce(list_prepend(0.0,
                      list((CAST(hs.tot AS DOUBLE) / g.gt) * hs.h_bits
                           ORDER BY hs.from_type)),
                      (a, b) -> a + b) AS r
             FROM hs CROSS JOIN g)
    SELECT hs.from_type AS state,
           FLOOR(CAST(hs.tot AS DOUBLE) / g.gt * 1e6) / 1e6 AS pi,
           FLOOR(hs.h_bits * 1e6) / 1e6 AS h_state_bits,
           FLOOR(rate.r * 1e6) / 1e6 AS entropy_rate_bits
    FROM hs CROSS JOIN g CROSS JOIN rate
    ORDER BY state
    """,
    notes="entropy rate of the event-type Markov chain: per-state "
    "conditional entropy H_i = -sum p_ij log2 p_ij and the rate "
    "H = sum pi_i H_i, weighting by the EMPIRICAL state distribution "
    "(exact integer ratio tot_i / total — the observed chain's rate; "
    "evt_markov_stationary next door gives the asymptotic pi). How "
    "predictable is the next user action, in bits — the information-"
    "theoretic ceiling for any next-event model, and the sibling of "
    "ts_permutation_entropy (which asks it of the value series). "
    "Transition counts come from ONE keyed lag window (the shared "
    "evt_transitions pass); everything after is states^2-sized with "
    "dim-ordered folds, so both engines fold identical doubles in "
    "identical order. FLOOR 6 dp",
)
def evt_markov_entropy(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    tc = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    rt = tc.groupBy("from_type").agg(F.sum("n").cast("long").alias("tot"))
    g = tc.agg(F.sum("n").cast("long").alias("gt"))
    pj = F.col("n").cast("double") / F.col("tot")
    hs = (
        tc.join(F.broadcast(rt), "from_type")
        .groupBy("from_type", "tot")
        .agg(
            (
                -F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "to_type", (pj * F.log(pj)).alias("t")
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, r: acc + r["t"],
                )
                / F.log(F.lit(2.0))
            ).alias("h_bits")
        )
    )
    rate = (
        hs.crossJoin(F.broadcast(g))
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "from_type",
                            (
                                F.col("tot").cast("double")
                                / F.col("gt")
                                * F.col("h_bits")
                            ).alias("t"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, r: acc + r["t"],
            ).alias("r")
        )
    )
    return (
        hs.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(rate))
        .select(
            F.col("from_type").alias("state"),
            (
                F.floor(F.col("tot").cast("double") / F.col("gt") * 1e6)
                / 1e6
            ).alias("pi"),
            (F.floor(F.col("h_bits") * 1e6) / 1e6).alias("h_state_bits"),
            (F.floor(F.col("r") * 1e6) / 1e6).alias("entropy_rate_bits"),
        )
        .orderBy("state")
    )
