"""Time-series analytics over the event stream (SURVEY §2.10).

Three classic stream-smoothing/diagnosis operators, each expressed so
the sequential-looking recurrence becomes one keyed window pass:

- `ts_ewma`: exponentially-weighted moving average as a FINITE (20-tap)
  windowed dot product. The textbook recurrence is sequential; the
  truncated form is a frame-local weighted sum (weights decay below
  1e-2 after 20 taps at alpha=0.2), so it runs as an ordinary sliding
  window — no state, no per-key iteration, same shape at any scale.
- `ts_corr_series`: rolling Pearson correlation between two derived
  metric series (hourly click vs view counts) over a trailing day.
  All six sufficient statistics are EXACT integer window sums; floats
  appear only in the final one-shot formula, so the value is engine-
  deterministic up to the ROUND.
- `ts_changepoint`: best single mean-shift split per key in ONE pass —
  running sum + total turn every prefix/suffix mean into row-local
  arithmetic; argmax picks the split. The quadratic "try every split,
  re-average both sides" formulation collapses to a window cumsum.

All windows are keyed (user / series); no single-partition exchanges.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import epoch_us
from ..io import table
from ..registry import register

_ALPHA = 0.2
_TAPS = 20


@register(
    "ts_ewma",
    section="2.10",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                               ROWS BETWEEN {_TAPS - 1} PRECEDING AND CURRENT ROW)
               AS arr
      FROM events)
    SELECT user_id, event_id, ts_us,
           ROUND(
             list_sum(list_transform(range(1, len(arr) + 1),
                      i -> arr[i] * pow({1 - _ALPHA}, len(arr) - i)))
             / ((1 - pow({1 - _ALPHA}, len(arr))) / {_ALPHA}), 6) AS ewma
    FROM ordered
    """,
    notes=f"EWMA (alpha={_ALPHA}) as a {_TAPS}-tap windowed dot product: "
    "the truncated form of the recurrence (tail weight < 1.2% dropped, "
    "normalized by the finite geometric sum) — frame-local, stateless, "
    "one keyed window; ROUND 6 dp (pow/div chain)",
)
def ts_ewma(spark, sf_dir):
    """Smoothing without the recurrence: collect the trailing 20 values
    in frame order and take the normalized geometric-weight dot product.
    Exactly equals adjust-normalized EWMA restricted to a 20-sample
    memory — the standard practical truncation, and the form that
    parallelizes (the true recurrence is inherently sequential)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(_TAPS - 1), 0)
    )
    d = ev.select(
        "user_id", "event_id", epoch_us("ts").alias("ts_us"), "value"
    ).withColumn("arr", F.collect_list("value").over(w))
    n = F.size("arr")
    weighted = F.zip_with(
        F.col("arr"),
        F.sequence(F.lit(1), n),
        lambda x, i: x * F.pow(F.lit(1 - _ALPHA), n - i),
    )
    denom = (1 - F.pow(F.lit(1 - _ALPHA), n)) / F.lit(_ALPHA)
    return d.select(
        "user_id",
        "event_id",
        "ts_us",
        F.round(
            F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x) / denom, 6
        ).alias("ewma"),
    )


@register(
    "ts_corr_series",
    section="2.10",
    oracle="""
    WITH hourly AS (
      SELECT epoch_us(date_trunc('hour', ts)) AS hr,
             CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS x,
             CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS y
      FROM events GROUP BY 1),
    stats AS (
      SELECT hr,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER w AS BIGINT) AS syy
      FROM hourly
      WINDOW w AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT hr,
           ROUND((n * sxy - sx * sy) /
                 (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS corr
    FROM stats
    WHERE n = 24 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    notes="rolling Pearson correlation between the hourly click and view "
    "count series over a trailing 24h window: the six sufficient "
    "statistics are exact INTEGER window sums (hour grid is dense, so "
    "ROWS 23 PRECEDING == the trailing day), floats only in the final "
    "formula; degenerate-variance windows filtered on exact integers. "
    "The global hour series is metadata-sized: the ordered window runs "
    "over at most hours-per-retention rows, not over events",
)
def ts_corr_series(spark, sf_dir):
    """Are two operational metrics moving together? Build both hourly
    series in one conditional aggregation (map-side combined over the
    raw events), then correlate over a trailing-day window. The window
    is over the HOURLY table — bounded by the time range, thousands of
    rows per year — so the unkeyed orderBy is safe at any event volume
    (documented single-series exception, same as the vocab top-k)."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        epoch_us(F.date_trunc("hour", F.col("ts"))).alias("hr")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("y"),
    )
    w = Window.orderBy("hr").rowsBetween(-23, 0)
    st = hourly.select(
        "hr",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return st.where((F.col("n") == 24) & (vx > 0) & (vy > 0)).select(
        "hr",
        F.round(
            num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), 4
        ).alias("corr"),
    )


@register(
    "ts_changepoint",
    section="2.10",
    oracle="""
    WITH cents AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events),
    ordered AS (
      SELECT user_id, event_id, ts_us,
             CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                  AS BIGINT) AS cum,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id) AS BIGINT)
               AS i,
             CAST(SUM(v) OVER (PARTITION BY user_id) AS BIGINT) AS total,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM cents),
    scored AS (
      SELECT user_id, ts_us, n,
             FLOOR(ABS(CAST(cum AS DOUBLE) / i
                       - CAST(total - cum AS DOUBLE) / (n - i)) / 100
                   * 1000000) / 1000000.0 AS score
      FROM ordered WHERE i < n),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY score DESC, ts_us) AS rk
      FROM scored)
    SELECT user_id, ts_us AS split_us, score, n
    FROM best WHERE rk = 1
    """,
    notes="single mean-shift changepoint per key in ONE window pass: "
    "running sum + per-key total make every candidate split's "
    "|left mean - right mean| row-local; argmax with (floored score "
    "desc, ts asc) tiebreak (floor discipline: the cents-exact ratios "
    "land on .5 ULP boundaries where ROUND is engine-dependent). "
    "The naive form is O(n^2) re-averaging; "
    "this is a cumsum. Values integerized to cents first: window SUM "
    "association differs across engines (segment tree vs running), so "
    "the sufficient statistics must be exact integers",
)
def ts_changepoint(spark, sf_dir):
    """Where did the level shift? Every split point's two-sided means
    derive from (prefix sum, total), so scoring all n-1 candidate
    splits costs one keyed window pass; the winner per key is a second
    tiny window. Cumulative float sums run in the same (ts, id) order
    on both engines, keeping the scores bit-comparable pre-ROUND."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wp = Window.partitionBy("user_id")
    d = ev.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    ).select(
        "user_id",
        "ts_us",
        F.sum("v").over(wo).cast("long").alias("cum"),
        F.row_number().over(wo).cast("long").alias("i"),
        F.sum("v").over(wp).cast("long").alias("total"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    scored = d.where(F.col("i") < F.col("n")).select(
        "user_id",
        "ts_us",
        "n",
        (
            F.floor(
                F.abs(
                    F.col("cum").cast("double") / F.col("i")
                    - (F.col("total") - F.col("cum")).cast("double")
                    / (F.col("n") - F.col("i"))
                )
                / 100
                * 1000000
            )
            / 1000000.0
        ).alias("score"),
    )
    wr = Window.partitionBy("user_id").orderBy(F.desc("score"), "ts_us")
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select("user_id", F.col("ts_us").alias("split_us"), "score", "n")
    )


@register(
    "ts_calendar_spine",
    section="2.10",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
             MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
      FROM events),
    spine AS (
      SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT CAST(s.day AS DATE) AS day,
           COALESCE(d.n, 0) AS n,
           2 * COALESCE(d.n, 0) * t.n_days < t.total AS is_sparse
    FROM spine s LEFT JOIN daily d ON CAST(s.day AS DATE) = d.day
    CROSS JOIN tot t
    """,
    notes="calendar-spine densification: generate the full day dimension "
    "from min..max (sequence+explode), left-join the daily counts so "
    "silent days surface as explicit zero rows, flag days under half the "
    "average load with an EXACT integer inequality (2*n*n_days < total "
    "-- no float division in the predicate). Spine is date-range-sized; "
    "only the daily aggregate touches the events",
)
def ts_calendar_spine(spark, sf_dir):
    """Gap detection needs rows that are NOT in the data: build the
    dense day dimension with sequence()/explode from the min/max bounds
    (a one-row broadcast), left-join the per-day counts, and flag
    under-loaded days. The spine's size is the calendar range -- the
    data volume only flows through one map-side-combined daily count."""
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    daily = ev.groupBy(day.alias("day")).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day"), "total", "n_days"
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            (
                2 * F.coalesce(F.col("n"), F.lit(0)) * F.col("n_days")
                < F.col("total")
            ).alias("is_sparse"),
        )
    )


@register(
    "ts_concurrency",
    section="2.10",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    g AS (SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER (
                           PARTITION BY user_id ORDER BY ts_us, event_id)
                         > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM e),
    s AS (SELECT *, CAST(SUM(new_sess) OVER (
                      PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS session_id
          FROM g),
    spans AS (
      SELECT user_id, session_id, MIN(ts_us) AS s0, MAX(ts_us) AS s1
      FROM s GROUP BY user_id, session_id),
    deltas AS (
      SELECT s0 AS ts_us, 1 AS delta FROM spans
      UNION ALL
      SELECT s1 + 1 AS ts_us, -1 AS delta FROM spans),
    swept AS (
      SELECT ts_us,
             CAST(SUM(delta) OVER (ORDER BY ts_us, delta DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS active
      FROM deltas)
    SELECT CAST(ts_us // 86400000000 AS BIGINT) AS day_n,
           MAX(active) AS max_concurrent
    FROM swept GROUP BY 1
    """,
    notes="peak concurrent sessions per day via a DISTRIBUTED sweep-line: "
    "+1/-1 deltas at session span edges, per-day keyed running sums, and "
    "day-level carry offsets (a bounded-cardinality prefix over the day "
    "table) -- the global prefix sum decomposed into two keyed passes, "
    "no single-partition window over the data. Oracle is the plain "
    "global sweep. Deltas ordered (ts, +1 first) so simultaneous "
    "starts/ends resolve identically; all-integer arithmetic",
)
def ts_concurrency(spark, sf_dir):
    """How many voyages are underway at once, at peak, each day?
    Sweep-line with the prefix sum decomposed for scale: within-day
    running sums shuffle on day; cross-day carry comes from per-day
    totals (calendar-bounded, so the unkeyed cumsum over days runs on
    a metadata-sized table). Equals the global sweep exactly."""
    from .events import sessionized

    spans = (
        sessionized(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("s0"), F.max("ts_us").alias("s1"))
    )
    deltas = spans.select(F.col("s0").alias("ts_us"), F.lit(1).alias("delta")).unionAll(
        spans.select((F.col("s1") + 1).alias("ts_us"), F.lit(-1).alias("delta"))
    )
    d = deltas.withColumn(
        "day_n", (F.col("ts_us") / F.lit(86400000000)).cast("long")
    )
    win_day = (
        Window.partitionBy("day_n")
        .orderBy("ts_us", F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = d.withColumn("run", F.sum("delta").over(win_day))
    day_tot = d.groupBy("day_n").agg(F.sum("delta").alias("day_delta"))
    win_carry = (
        Window.orderBy("day_n")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = day_tot.withColumn(
        "offset", F.coalesce(F.sum("day_delta").over(win_carry), F.lit(0))
    ).select("day_n", "offset")
    return (
        within.join(F.broadcast(carry), "day_n")
        .groupBy("day_n")
        .agg(F.max(F.col("run") + F.col("offset")).cast("long").alias("max_concurrent"))
    )


@register(
    "ts_seasonal_profile",
    section="2.10",
    oracle="""
    SELECT event_type,
           CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 100 * 1000000) / 1000000.0 AS mean_value
    FROM events
    GROUP BY 1, 2
    """,
    notes="day-of-week seasonal profile per event_type (the seasonal "
    "component of a decomposition; subtracting it from raw values gives "
    "the deseasonalized residual evt_anomaly-style scoring should run "
    "on). One map-side-combined aggregate into types x 7 groups; values "
    "integerized (cents) before the SUM so accumulation order cannot "
    "move the mean. Spark dayofweek is 1-based Sunday, DuckDB 0-based — "
    "normalized to DuckDB's 0..6",
)
def ts_seasonal_profile(spark, sf_dir):
    """Weekly seasonality baseline: mean value per (event_type,
    day-of-week). The whole result is metadata-sized (|types| x 7), so
    downstream deseasonalization broadcasts it back onto the stream."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.floor(
                    F.sum(F.round(F.col("value") * 100).cast("long")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                    / 100
                    * 1000000
                )
                / 1000000.0
            ).alias("mean_value"),
        )
    )


@register(
    "ts_autocorr",
    section="2.10",
    oracle="""
    WITH d AS (SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    l AS (SELECT n,
                 LAG(n, 1) OVER (ORDER BY day) AS n1,
                 LAG(n, 7) OVER (ORDER BY day) AS n7
          FROM d)
    SELECT ROUND(CORR(n, n1), 4) AS acf1,
           ROUND(CORR(n, n7), 4) AS acf7
    FROM l
    """,
    notes="lag-1/lag-7 autocorrelation of the daily event-count series "
    "(seasonality detector): per-day rollup (one keyed shuffle), lag "
    "pairs from a bounded calendar-sized window, Pearson corr ignoring "
    "the NULL lead-in pairs on both engines identically",
)
def ts_autocorr(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 7).over(w).alias("n7"),
    )
    return lagged.agg(
        F.round(F.corr("n", "n1"), 4).alias("acf1"),
        F.round(F.corr("n", "n7"), 4).alias("acf7"),
    )


@register(
    "ts_pct_change",
    section="2.10",
    oracle="""
    WITH d AS (SELECT CAST(CAST(date_trunc('day', o_orderdate) AS DATE) AS VARCHAR)
                        AS day,
                      CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                        AS rev_cents
               FROM orders GROUP BY 1),
    l AS (SELECT day, rev_cents,
                 LAG(rev_cents) OVER (ORDER BY day) AS prev_cents
          FROM d)
    SELECT day, rev_cents,
           FLOOR((CAST(rev_cents AS DOUBLE) / prev_cents - 1) * 1000000)
             / 1000000.0 AS pct_change
    FROM l WHERE prev_cents IS NOT NULL
    """,
    notes="day-over-day revenue change — per-day rollup (keyed shuffle) + "
    "lag over the bounded calendar series; exact integer cents in, "
    "floor-disciplined ratio out",
)
def ts_pct_change(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").cast("string").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day", "rev_cents", F.lag("rev_cents").over(w).alias("prev_cents")
    ).where(F.col("prev_cents").isNotNull())
    return lagged.select(
        "day",
        "rev_cents",
        (
            F.floor(
                (F.col("rev_cents").cast("double") / F.col("prev_cents") - 1)
                * 1_000_000
            )
            / 1_000_000.0
        ).alias("pct_change"),
    )


@register(
    "ts_anomaly_mad",
    section="2.10",
    oracle="""
    WITH med AS (SELECT user_id, MEDIAN(value) AS med FROM events
                 GROUP BY user_id),
    mad AS (SELECT e.user_id, med.med,
                   MEDIAN(ABS(e.value - med.med)) AS mad
            FROM events e JOIN med ON e.user_id = med.user_id
            GROUP BY e.user_id, med.med)
    SELECT e.user_id, e.event_id,
           FLOOR(ABS(e.value - m.med) / m.mad * 10000) / 10000.0
             AS dev_ratio
    FROM events e JOIN mad m ON e.user_id = m.user_id
    WHERE m.mad > 0 AND ABS(e.value - m.med) > 3 * m.mad
    """,
    notes="robust per-key outlier mining: median absolute deviation "
    "instead of evt_anomaly's z-score (mean/std are themselves hijacked "
    "by the outliers they hunt). Two keyed exact-median aggregations + "
    "one flagging pass, all shuffling on user_id — the monitoring shape "
    "that survives heavy-tailed telemetry",
)
def ts_anomaly_mad(spark, sf_dir):
    """MAD outliers: |x - median| > 3 * median(|x - median|). Exact
    interpolated medians on both engines; dev_ratio floor-disciplined."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    med = ev.groupBy("user_id").agg(F.median("value").alias("med"))
    j = ev.join(med, "user_id")
    mad = j.groupBy("user_id", "med").agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    dev = F.abs(F.col("value") - F.col("med"))
    return (
        ev.join(mad, "user_id")
        .where((F.col("mad") > 0) & (dev > 3 * F.col("mad")))
        .select(
            "user_id",
            "event_id",
            (F.floor(dev / F.col("mad") * 10000) / 10000.0).alias("dev_ratio"),
        )
    )


@register(
    "ts_m4_downsample",
    section="2.10",
    oracle="""
    WITH e AS (SELECT epoch_us(ts) AS ts_us, value, event_id FROM events),
    b AS (SELECT *, CAST(FLOOR(ts_us / 21600000000.0) AS BIGINT) AS bucket
          FROM e),
    r AS (SELECT bucket, value, event_id, ts_us,
                 ROW_NUMBER() OVER (PARTITION BY bucket
                                    ORDER BY ts_us, event_id) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY bucket
                                    ORDER BY ts_us DESC, event_id DESC) AS rl
          FROM b)
    SELECT bucket,
           ROUND(MIN(value), 4) AS v_min,
           ROUND(MAX(value), 4) AS v_max,
           ROUND(MAX(CASE WHEN rf = 1 THEN value END), 4) AS v_first,
           ROUND(MAX(CASE WHEN rl = 1 THEN value END), 4) AS v_last,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r GROUP BY bucket
    """,
    notes="M4 downsampling (per-bucket min/max/first/last) — the "
    "error-free line-chart reduction for time-series dashboards: 100 TB "
    "of points become 4 values per pixel column with zero visual "
    "difference. min_by/max_by on the (ts, id) tiebreak keeps "
    "first/last deterministic; one map-side-combined aggregate",
)
def ts_m4_downsample(spark, sf_dir):
    from ..core import epoch_us

    ev = table(spark, sf_dir, "events")
    e = ev.select(
        epoch_us("ts").alias("ts_us"), "value", "event_id"
    ).withColumn(
        "bucket", F.floor(F.col("ts_us") / 21_600_000_000.0).cast("long")
    )
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    return e.groupBy("bucket").agg(
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
        F.round(F.min_by("value", key), 4).alias("v_first"),
        F.round(F.max_by("value", key), 4).alias("v_last"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "evt_time_to_event",
    section="2.10",
    oracle="""
    WITH f AS (SELECT user_id,
                      MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
                        AS first_signup,
                      MIN(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END) AS first_purchase
               FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(COUNT(CASE WHEN first_purchase > first_signup THEN 1 END)
                AS BIGINT) AS n_converted,
           CAST(COALESCE(MIN(CASE WHEN first_purchase > first_signup
                             THEN first_purchase - first_signup END), 0)
                AS BIGINT) AS min_lag_us,
           CAST(COALESCE(CAST(FLOOR(MEDIAN(
                  CASE WHEN first_purchase > first_signup
                       THEN first_purchase - first_signup END))
                  AS BIGINT), 0) AS BIGINT) AS med_lag_us
    FROM f WHERE first_signup IS NOT NULL
    """,
    notes="time-to-event (signup -> first purchase) conversion funnel with "
    "lag distribution: one conditional-min aggregate per user (map-side "
    "combined), then a scalar summary — the survival-analysis first "
    "stats every activation dashboard needs. Exact integer microsecond "
    "lags; the interpolated even-count median is FLOORed before the cast "
    "on both engines (DuckDB CAST rounds half-even, Spark truncates)",
)
def evt_time_to_event(spark, sf_dir):
    from ..core import epoch_us

    ev = table(spark, sf_dir, "events")
    us = epoch_us("ts")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "first_purchase"
        ),
    )
    lag = F.when(
        F.col("first_purchase") > F.col("first_signup"),
        F.col("first_purchase") - F.col("first_signup"),
    )
    return f.where(F.col("first_signup").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count(lag).alias("n_converted"),
        F.coalesce(F.min(lag), F.lit(0)).cast("long").alias("min_lag_us"),
        F.coalesce(F.floor(F.median(lag)).cast("long"), F.lit(0))
        .cast("long")
        .alias("med_lag_us"),
    )


@register(
    "ts_forecast_naive_backtest",
    section="2.10",
    oracle="""
    WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    l AS (SELECT day, n,
                 LAG(n, 7) OVER (ORDER BY day) AS forecast
          FROM d)
    SELECT CAST(day AS VARCHAR) AS day, n, forecast,
           CAST(ABS(n - forecast) AS BIGINT) AS abs_err,
           CAST(ABS(n - forecast) * 1000000 // n AS BIGINT) AS ape_ppm
    FROM l WHERE forecast IS NOT NULL
    """,
    notes="seasonal-naive forecast backtest: predict each day's volume "
    "with the same weekday last week (lag-7 over the daily rollup) and "
    "score per-day absolute and ppm relative error — the baseline every "
    "capacity forecast must beat, and the backtest harness shape for "
    "evaluating better models. Daily rollup is the only corpus-sized "
    "pass; the lag runs on the calendar-bounded series. Exact integers "
    "throughout",
)
def ts_forecast_naive_backtest(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day")
    l = d.withColumn("forecast", F.lag("n", 7).over(w))
    return l.where(F.col("forecast").isNotNull()).select(
        F.col("day").cast("string").alias("day"),
        "n",
        "forecast",
        F.abs(F.col("n") - F.col("forecast")).cast("long").alias("abs_err"),
        F.expr("ABS(n - forecast) * 1000000 DIV n").alias("ape_ppm"),
    )


@register(
    "ts_resample_ohlc",
    section="2.10",
    oracle="""
    WITH e AS (
      SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hr_us,
             epoch_us(ts) AS ts_us, event_id, value
      FROM events),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, hr_us
                                ORDER BY ts_us, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, hr_us
                                ORDER BY ts_us DESC, event_id DESC) AS rn_d
      FROM e)
    SELECT event_type, hr_us,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM r GROUP BY event_type, hr_us
    """,
    notes="OHLC bar resampling (the market-data rollup shape): per "
    "(series, hour) open/high/low/close/count. Open and close are "
    "first/last by a TOTAL order (ts, event_id) via two row_numbers "
    "over the SAME keyed partitioning — one exchange, two frame sorts — "
    "then fold into the bar aggregate; high/low/count are plain exact "
    "aggregates. No float arithmetic anywhere (values pass through "
    "untouched), so the bars are engine-deterministic without rounding",
)
def ts_resample_ohlc(spark, sf_dir):
    e = table(spark, sf_dir, "events").select(
        "event_type",
        epoch_us(F.date_trunc("hour", F.col("ts"))).alias("hr_us"),
        epoch_us("ts").alias("ts_us"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "hr_us").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("event_type", "hr_us").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "*",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "hr_us").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
    )


@register(
    "join_feature_pit",
    section="2.10",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             datediff('day', DATE '1990-01-01', o_orderdate) AS d,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
    SELECT o_orderkey,
           CAST(COALESCE(COUNT(*) OVER w, 0) AS BIGINT) AS n_prior_90d,
           CAST(COALESCE(SUM(cents) OVER w, 0) AS BIGINT)
             AS spend_prior_90d_cents
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                 RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING)
    """,
    notes="point-in-time feature join (the feature-store correctness "
    "shape): each order gets its customer's trailing-90-day order count "
    "and spend computed from STRICTLY EARLIER days — the 1 PRECEDING "
    "upper bound excludes same-day rows, so no label leakage and no "
    "same-day order-dependence. Expressed as one keyed value-RANGE "
    "window over an integer day index (rangeBetween takes ints only) "
    "instead of a self-join: one shuffle on the entity key, frame "
    "evaluation is a sliding two-pointer per key. Cent-integerized "
    "sums keep the trailing spend engine-exact",
)
def join_feature_pit(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date")).alias(
            "d"
        ),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-90, -1)
    )
    return o.select(
        "o_orderkey",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).cast("long").alias(
            "n_prior_90d"
        ),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).cast("long").alias(
            "spend_prior_90d_cents"
        ),
    )


@register(
    "agg_decay_sum",
    section="2.10",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events),
    b AS (SELECT user_id,
                 date_diff('day', CAST(ts AS DATE), mx.d0) // 7 AS age_w,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events, mx
          WHERE event_type = 'purchase'),
    k AS (SELECT user_id, age_w, CAST(SUM(cents) AS BIGINT) AS s
          FROM b GROUP BY 1, 2)
    SELECT user_id,
           CAST(SUM(s) AS BIGINT) AS raw_cents,
           FLOOR(list_reduce(
             list(s * pow(0.5, age_w) ORDER BY age_w),
             (a, x) -> a + x) * 1e2) / 1e2 AS decayed
    FROM k GROUP BY user_id
    """,
    notes="exponentially time-decayed revenue (half-life = 1 week), "
    "computed EXACTLY: ages quantize to integer week buckets, per-"
    "bucket cents sum as exact BIGINTs (order-free), and the decay "
    "fold multiplies each bucket by pow(0.5, k) — an exactly-"
    "representable power of two — then LEFT-FOLDS the few dozen "
    "buckets in age order on both engines. Every floating op is "
    "either exact (2^-k scaling) or sequenced identically, so the "
    "recency-weighted metric needs no tolerance. One keyed aggregate "
    "+ one in-array fold; the decay never touches row-level floats",
)
def agg_decay_sum(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("d0"))
    b = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        (F.datediff(F.col("d0"), F.col("ts").cast("date")) / 7)
        .cast("long")
        .alias("age_w"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    k = b.groupBy("user_id", "age_w").agg(F.sum("cents").cast("long").alias("s"))
    terms = F.array_sort(F.collect_list(F.struct("age_w", "s")))
    decayed = F.aggregate(
        terms,
        F.lit(0.0),
        lambda a, x: a + x["s"] * F.pow(F.lit(0.5), x["age_w"]),
    )
    return k.groupBy("user_id").agg(
        F.sum("s").cast("long").alias("raw_cents"),
        (F.floor(decayed * 1e2) / 1e2).alias("decayed"),
    )


@register(
    "ts_holt",
    section="2.8",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             list(CAST(y AS DOUBLE) ORDER BY day) AS ys
      FROM d GROUP BY event_type),
    f AS (
      SELECT event_type, n_days,
             list_reduce(
               list_transform(ys, y -> [y, 0.0]),
               (acc, x) -> [
                 (x[1] + acc[1] + acc[2]) / 2,
                 ((x[1] + acc[1] + acc[2]) / 2 - acc[1] + acc[2]) / 2
               ]) AS st
      FROM s)
    SELECT event_type, n_days,
           ROUND(st[1], 6) AS level,
           ROUND(st[2], 6) AS trend,
           ROUND(st[1] + st[2], 6) AS forecast_1
    FROM f
    """,
    notes="Holt double-exponential smoothing (alpha = beta = 1/2) over "
    "each type's daily revenue series: level and trend evolve by the "
    "textbook recurrence, folded LEFT over the day-ordered series on "
    "both engines (F.aggregate / list_reduce) so the float sequence "
    "is bit-identical — alpha = 1/2 makes every smoothing step an "
    "exact halving, the same trick the temperature-mix query uses "
    "with sqrt. Daily inputs are exact summed cents. The one-step "
    "forecast level+trend is what a capacity planner actually reads. "
    "State rides a 2-element DOUBLE array because list_reduce seeds "
    "from the first element (l0 = y0, b0 = 0) — no init parameter",
)
def ts_holt(spark, sf_dir):
    """Sequential smoothing as an in-group left fold: the per-type
    series aggregates to ONE row carrying a day-ordered array (exact
    integer cents), and the recurrence runs inside a single aggregate
    expression — no iterative jobs, no window over the whole series,
    one keyed shuffle total. Groups fold independently, so at 100 TB
    a million per-key series smooth in one pass; only a single series
    longer than memory would need the segmented-scan formulation."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))),"
            " x -> CAST(x.y AS DOUBLE))"
        ).alias("ys"),
    )
    st = F.expr(
        "aggregate(slice(ys, 2, greatest(size(ys) - 1, 0)),"
        " array(element_at(ys, 1), CAST(0.0 AS DOUBLE)),"
        " (acc, y) -> array("
        "   (y + acc[0] + acc[1]) / 2,"
        "   ((y + acc[0] + acc[1]) / 2 - acc[0] + acc[1]) / 2))"
    )
    return s.select(
        "event_type",
        "n_days",
        F.round(st.getItem(0), 6).alias("level"),
        F.round(st.getItem(1), 6).alias("trend"),
        F.round(st.getItem(0) + st.getItem(1), 6).alias("forecast_1"),
    )


@register(
    "ts_theil_sen",
    section="2.10",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(datediff('day', DATE '2024-01-01',
                                       CAST(ts AS DATE)) AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    pairs AS (
      SELECT a.event_type,
             (CAST(b.s AS DOUBLE) / b.cnt - CAST(a.s AS DOUBLE) / a.cnt)
               / (b.d - a.d) AS slope,
             a.d AS di, b.d AS dj
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, di, dj) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS np
      FROM pairs)
    SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
           slope / 100.0 AS theil_sen_slope
    FROM ranked WHERE rk = (np + 1) // 2
    """,
    notes="Theil-Sen robust trend per event type: the median of all "
    "pairwise day-to-day slopes of the DAILY MEAN value series. Daily "
    "means are single divisions of exact cent sums, each pairwise "
    "slope is one division of two exact doubles (identical on both "
    "engines), and the median is the percentile_disc-style lower-"
    "median rank pick with (slope, di, dj) tiebreak — bit-exact, no "
    "rounding. The O(days^2) pair join runs on the BOUNDED daily "
    "grid, not the corpus (the exact/sketch routing rule of "
    "SCALING.md: rows-per-group is the dangerous axis, and here it "
    "is calendar-bounded)",
)
def ts_theil_sen(spark, sf_dir):
    """The robust-regression answer to win_rolling_slope's OLS: one
    corpus-sized keyed aggregate to the daily grid, then a grid-sized
    self-join (<= 31x30/2 pairs per key) and a keyed median window.
    At 100 TB the pair stage is unchanged — days don't grow with
    rows."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    mean_a = F.col("a.s").cast("double") / F.col("a.cnt")
    mean_b = F.col("b.s").cast("double") / F.col("b.cnt")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((mean_b - mean_a) / (F.col("b.d") - F.col("a.d"))).alias("slope"),
        F.col("a.d").alias("di"),
        F.col("b.d").alias("dj"),
    )
    w = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number()
        .over(w.orderBy("slope", "di", "dj"))
        .alias("rk"),
        F.count(F.lit(1)).over(w).alias("np"),
    )
    return ranked.where(F.col("rk") == F.expr("(np + 1) div 2")).select(
        "event_type",
        F.col("np").cast("long").alias("n_pairs"),
        (F.col("slope") / 100.0).alias("theil_sen_slope"),
    )


@register(
    "ts_peaks",
    section="2.10",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    nb AS (
      SELECT event_type, d, v,
             LAG(v) OVER (PARTITION BY event_type ORDER BY d) AS pv,
             LEAD(v) OVER (PARTITION BY event_type ORDER BY d) AS nv
      FROM daily)
    SELECT event_type, d AS day_idx, v / 100.0 AS revenue,
           (v - pv) * 1000000 // pv AS over_prev_ppm,
           (v - nv) * 1000000 // nv AS over_next_ppm
    FROM nb
    WHERE pv IS NOT NULL AND nv IS NOT NULL
      AND 10 * v >= 11 * pv AND 10 * v >= 11 * nv
    """,
    notes="peak days per event type: days whose revenue exceeds BOTH "
    "calendar neighbors by >= 10%, detected with the exact integer "
    "cross-multiply 10*v >= 11*neighbor (no float threshold), with "
    "the exceedance margins as exact integer-ppm divisions. One "
    "corpus-sized keyed aggregate to the daily grid, one bounded "
    "keyed window — the anomaly-flagging sibling of ts_anomaly_mad "
    "for level shifts rather than dispersion outliers",
)
def ts_peaks(spark, sf_dir):
    """Local-extremum detection on the calendar grid: the corpus
    reduces to (type, day) cents in one map-side-combined pass; the
    lag/lead window runs on the bounded grid. Scale-independent after
    the first aggregate."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    nb = daily.select(
        "event_type",
        "d",
        "v",
        F.lag("v").over(w).alias("pv"),
        F.lead("v").over(w).alias("nv"),
    )
    return nb.where(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (10 * F.col("v") >= 11 * F.col("pv"))
        & (10 * F.col("v") >= 11 * F.col("nv"))
    ).select(
        "event_type",
        F.col("d").alias("day_idx"),
        (F.col("v") / 100.0).alias("revenue"),
        F.expr("(v - pv) * 1000000 div pv").alias("over_prev_ppm"),
        F.expr("(v - nv) * 1000000 div nv").alias("over_next_ppm"),
    )


_BOLL_W = 7  # trailing window (rows) on the daily grid


@register(
    "ts_bollinger",
    section="2.10",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    st AS (
      SELECT event_type, d, v,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(v) OVER w AS BIGINT) AS sx,
             CAST(SUM(v * v) OVER w AS BIGINT) AS sxx
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND 1 PRECEDING))
    SELECT event_type, d AS day_idx, v / 100.0 AS revenue,
           CAST(sx AS DOUBLE) / n / 100.0 AS ma,
           CAST(n * sxx - sx * sx AS BIGINT) AS var_scaled_n2,
           CAST(CASE WHEN (v * n - sx) * (v * n - sx)
                          > 4 * (n * sxx - sx * sx)
                     AND v * n > sx THEN 1
                WHEN (v * n - sx) * (v * n - sx)
                          > 4 * (n * sxx - sx * sx)
                     AND v * n < sx THEN -1
                ELSE 0 END AS BIGINT) AS breach
    FROM st WHERE n = {_BOLL_W - 1}
    """,
    notes=f"Bollinger-style control bands on the daily revenue grid: "
    f"each day compared against the TRAILING {_BOLL_W - 1} days' mean "
    "+/- 2 population sigma (frame excludes the current row, so a "
    "spike can't mask itself). The breach test is the exact integer "
    "cross-multiply (v*n - sx)^2 > 4*(n*sxx - sx^2) — equivalent to "
    "|v - mean| > 2 sigma with ZERO float comparison, signed by "
    "direction; the reported moving average is a single exact "
    "division. The control-chart sibling of ts_anomaly_mad (mean/"
    "sigma vs median/MAD) and ts_peaks (dispersion vs level shifts)",
)
def ts_bollinger(spark, sf_dir):
    """Anomaly gating the way ops dashboards do it: corpus reduces to
    the (type, day) grid in one map-side-combined pass; the trailing
    frame runs on the bounded grid; the band test never leaves exact
    integers, so alert replays are deterministic."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(_BOLL_W - 1), -1)
    )
    st = daily.select(
        "event_type",
        "d",
        "v",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("v").over(w).cast("long").alias("sx"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("long").alias("sxx"),
    )
    dev = F.col("v") * F.col("n") - F.col("sx")
    var4 = 4 * (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return st.where(F.col("n") == _BOLL_W - 1).select(
        "event_type",
        F.col("d").alias("day_idx"),
        (F.col("v") / 100.0).alias("revenue"),
        (F.col("sx").cast("double") / F.col("n") / 100.0).alias("ma"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("var_scaled_n2"),
        F.when((dev * dev > var4) & (dev > 0), 1)
        .when((dev * dev > var4) & (dev < 0), -1)
        .otherwise(0)
        .cast("long")
        .alias("breach"),
    )


@register(
    "ts_cusum",
    section="2.10",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    m AS (SELECT event_type, CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(COUNT(*) AS BIGINT) AS nd
          FROM daily GROUP BY event_type),
    r AS (SELECT daily.event_type, d,
                 CAST(v * nd - sv AS BIGINT) AS resid, nd
          FROM daily JOIN m USING (event_type)),
    p0 AS (SELECT event_type, d, nd,
                  CAST(SUM(resid) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS pre
           FROM r),
    p AS (SELECT event_type, d, nd, pre,
                 CAST(MIN(pre) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS minpre
          FROM p0),
    s AS (SELECT event_type, d, nd,
                 CAST(pre - LEAST(0, minpre) AS BIGINT) AS cusum
          FROM p),
    best AS (SELECT event_type, d, nd, cusum,
                    ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY cusum DESC, d) AS rk
             FROM s)
    SELECT event_type, nd AS n_days, cusum AS max_cusum_scaled,
           d AS alarm_day
    FROM best WHERE rk = 1
    """,
    notes="one-sided CUSUM drift detector per event type against the "
    "series' own mean, reporting the trajectory peak and its day. The "
    "sequential recurrence S_i = max(0, S_{i-1} + r_i) is rewritten "
    "via the prefix identity S_i = P_i - min(0, min_{j<=i} P_j), so "
    "the whole detector is TWO stacked keyed windows (running sum, "
    "running min of it) instead of a fold — the same "
    "recurrence-to-window collapse as ts_changepoint. Residuals are "
    "mean-centered at scale nd (v*nd - sv), keeping everything exact "
    "BIGINT end to end; ties on the peak break by earliest day",
)
def ts_cusum(spark, sf_dir):
    """Drift detection that parallelizes: the corpus reduces to the
    daily grid once; the 'sequential' CUSUM is two window passes over
    the bounded grid because max(0, .)-folding has a running-min
    closed form. Nothing here grows with event volume."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    m = daily.groupBy("event_type").agg(
        F.sum("v").cast("long").alias("sv"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    r = daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "d",
        "nd",
        (F.col("v") * F.col("nd") - F.col("sv")).cast("long").alias("resid"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = r.select(
        "event_type",
        "d",
        "nd",
        F.sum("resid").over(w).cast("long").alias("pre"),
    )
    p = p.select(
        "event_type",
        "d",
        "nd",
        "pre",
        F.min("pre").over(w).cast("long").alias("minpre"),
    )
    s = p.select(
        "event_type",
        "d",
        "nd",
        (F.col("pre") - F.least(F.lit(0).cast("long"), F.col("minpre")))
        .cast("long")
        .alias("cusum"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc("cusum"), "d")
    )
    return (
        s.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("nd").alias("n_days"),
            F.col("cusum").alias("max_cusum_scaled"),
            F.col("d").alias("alarm_day"),
        )
    )


@register(
    "ts_mann_kendall",
    section="2.10",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.v > a.v THEN 1
                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
      GROUP BY 1),
    nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM daily GROUP BY 1),
    ties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_corr
      FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY 1, 2) WHERE t > 1 GROUP BY event_type),
    f AS (
      SELECT s.event_type, nn.n, s.s_stat,
             CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                  - COALESCE(ties.tie_corr, 0) AS BIGINT) AS var18
      FROM s JOIN nn USING (event_type)
      LEFT JOIN ties ON ties.event_type = s.event_type)
    SELECT event_type, n AS n_days, s_stat, var18,
           FLOOR(CASE WHEN s_stat > 0
                      THEN (s_stat - 1) / SQRT(var18 / 18.0)
                      WHEN s_stat < 0
                      THEN (s_stat + 1) / SQRT(var18 / 18.0)
                      ELSE 0.0 END * 1e6) / 1e6 AS z
    FROM f
    """,
    notes="Mann-Kendall trend test per event type on the daily revenue "
    "grid — the significance companion to ts_theil_sen's slope (the "
    "standard nonparametric pair in hydrology/ops trend detection). "
    "S and the tie-corrected variance (x18 to stay integral: "
    "n(n-1)(2n+5) - sum t(t-1)(2t+5)) are EXACT BIGINTs; the "
    "continuity-corrected z pays one division and one sqrt on "
    "identical doubles, floor-disciplined at 1e-6. The O(days^2) "
    "pair join runs on the calendar-bounded grid, never the corpus",
)
def ts_mann_kendall(spark, sf_dir):
    """Trend significance without distributional assumptions: corpus
    reduces to the grid once; sign pairs, tie groups, and the
    variance are grid-sized integer aggregates. Reuses ts_theil_sen's
    exact pair-stage shape — run both for slope + significance."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("v")
    ).localCheckpoint()
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.v") > F.col("a.v"), 1)
                .when(F.col("b.v") < F.col("a.v"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_corr")
        )
    )
    f = (
        s.join(nn, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_corr"), F.lit(0))
            )
            .cast("long")
            .alias("var18"),
        )
    )
    sd = F.sqrt(F.col("var18") / 18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return f.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        "var18",
        (F.floor(z * 1e6) / 1e6).alias("z"),
    )


@register(
    "ts_pacf",
    section="2.10",
    oracle="""
    WITH d AS (SELECT date_trunc('day', ts) AS day,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    l AS (SELECT n,
                 LAG(n, 1) OVER (ORDER BY day) AS n1,
                 LAG(n, 2) OVER (ORDER BY day) AS n2,
                 LAG(n, 3) OVER (ORDER BY day) AS n3
          FROM d),
    m AS (SELECT
            CAST(COUNT(*) FILTER (n1 IS NOT NULL) AS BIGINT) AS m1,
            CAST(SUM(n) FILTER (n1 IS NOT NULL) AS BIGINT) AS x1,
            CAST(SUM(n1) FILTER (n1 IS NOT NULL) AS BIGINT) AS y1,
            CAST(SUM(n * n1) AS BIGINT) AS xy1,
            CAST(SUM(n * n) FILTER (n1 IS NOT NULL) AS BIGINT) AS xx1,
            CAST(SUM(n1 * n1) AS BIGINT) AS yy1,
            CAST(COUNT(*) FILTER (n2 IS NOT NULL) AS BIGINT) AS m2,
            CAST(SUM(n) FILTER (n2 IS NOT NULL) AS BIGINT) AS x2,
            CAST(SUM(n2) FILTER (n2 IS NOT NULL) AS BIGINT) AS y2,
            CAST(SUM(n * n2) AS BIGINT) AS xy2,
            CAST(SUM(n * n) FILTER (n2 IS NOT NULL) AS BIGINT) AS xx2,
            CAST(SUM(n2 * n2) AS BIGINT) AS yy2,
            CAST(COUNT(*) FILTER (n3 IS NOT NULL) AS BIGINT) AS m3,
            CAST(SUM(n) FILTER (n3 IS NOT NULL) AS BIGINT) AS x3,
            CAST(SUM(n3) FILTER (n3 IS NOT NULL) AS BIGINT) AS y3,
            CAST(SUM(n * n3) AS BIGINT) AS xy3,
            CAST(SUM(n * n) FILTER (n3 IS NOT NULL) AS BIGINT) AS xx3,
            CAST(SUM(n3 * n3) AS BIGINT) AS yy3
          FROM l),
    r AS (SELECT
            (m1 * xy1 - x1 * y1)
              / sqrt(CAST(m1 * xx1 - x1 * x1 AS DOUBLE)
                     * (m1 * yy1 - y1 * y1)) AS r1,
            (m2 * xy2 - x2 * y2)
              / sqrt(CAST(m2 * xx2 - x2 * x2 AS DOUBLE)
                     * (m2 * yy2 - y2 * y2)) AS r2,
            (m3 * xy3 - x3 * y3)
              / sqrt(CAST(m3 * xx3 - x3 * x3 AS DOUBLE)
                     * (m3 * yy3 - y3 * y3)) AS r3
          FROM m),
    dl AS (SELECT r1, r2, r3,
                  (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
           FROM r),
    dl2 AS (SELECT r1, r2, r3, phi22,
                   r1 - phi22 * r1 AS phi21
            FROM dl)
    SELECT FLOOR(r1 * 1e6) / 1e6 AS pacf1,
           FLOOR(phi22 * 1e6) / 1e6 AS pacf2,
           FLOOR((r3 - phi21 * r2 - phi22 * r1)
                 / (1 - phi21 * r1 - phi22 * r2) * 1e6) / 1e6 AS pacf3
    FROM dl2
    """,
    notes="partial autocorrelation (Durbin-Levinson, lags 1-3) of the "
    "daily event-count series — the AR-order diagnostic next to "
    "ts_autocorr's plain ACF. Each lag's Pearson r comes from EXACT "
    "BIGINT moment sums over the lag-pairs (one conditional aggregate "
    "over the calendar-bounded lagged grid, never engine CORR whose "
    "internal float-sum order is unspecified), so r1/r2/r3 are "
    "bit-identical doubles; the Durbin-Levinson recursion is unrolled "
    "into the identical closed-form expression tree on both engines "
    "and floored 6 dp. One corpus-sized keyed aggregate, one "
    "calendar-sized window — flat at any scale",
)
def ts_pacf(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("day")
    lag = daily.select(
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 2).over(w).alias("n2"),
        F.lag("n", 3).over(w).alias("n3"),
    )
    aggs = []
    for k in (1, 2, 3):
        nk = F.col(f"n{k}")
        ok = nk.isNotNull()
        aggs += [
            F.sum(ok.cast("long")).cast("long").alias(f"m{k}"),
            F.sum(F.when(ok, F.col("n"))).cast("long").alias(f"x{k}"),
            F.sum(nk).cast("long").alias(f"y{k}"),
            F.sum(F.col("n") * nk).cast("long").alias(f"xy{k}"),
            F.sum(F.when(ok, F.col("n") * F.col("n")))
            .cast("long")
            .alias(f"xx{k}"),
            F.sum(nk * nk).cast("long").alias(f"yy{k}"),
        ]
    m = lag.agg(*aggs)

    def pearson(k: int):
        mm, x, y = F.col(f"m{k}"), F.col(f"x{k}"), F.col(f"y{k}")
        xy, xx, yy = F.col(f"xy{k}"), F.col(f"xx{k}"), F.col(f"yy{k}")
        return (mm * xy - x * y) / F.sqrt(
            (mm * xx - x * x).cast("double") * (mm * yy - y * y)
        )

    r = m.select(
        pearson(1).alias("r1"), pearson(2).alias("r2"), pearson(3).alias("r3")
    )
    dl = r.select(
        "r1",
        "r2",
        "r3",
        ((F.col("r2") - F.col("r1") * F.col("r1"))
         / (1 - F.col("r1") * F.col("r1"))).alias("phi22"),
    )
    dl2 = dl.select(
        "r1",
        "r2",
        "r3",
        "phi22",
        (F.col("r1") - F.col("phi22") * F.col("r1")).alias("phi21"),
    )
    pacf3 = (
        F.col("r3") - F.col("phi21") * F.col("r2") - F.col("phi22") * F.col("r1")
    ) / (1 - F.col("phi21") * F.col("r1") - F.col("phi22") * F.col("r2"))
    return dl2.select(
        (F.floor(F.col("r1") * 1e6) / 1e6).alias("pacf1"),
        (F.floor(F.col("phi22") * 1e6) / 1e6).alias("pacf2"),
        (F.floor(pacf3 * 1e6) / 1e6).alias("pacf3"),
    )


@register(
    "ts_permutation_entropy",
    section="2.10",
    oracle="""
    WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    l AS (SELECT event_type, n,
                 LEAD(n, 1) OVER (PARTITION BY event_type ORDER BY day)
                   AS v1,
                 LEAD(n, 2) OVER (PARTITION BY event_type ORDER BY day)
                   AS v2
          FROM d),
    tri AS (SELECT event_type,
                   CAST(CAST(n > v1 AS INTEGER) * 4
                        + CAST(n > v2 AS INTEGER) * 2
                        + CAST(v1 > v2 AS INTEGER) AS BIGINT) AS code
            FROM l WHERE v2 IS NOT NULL),
    pc AS (SELECT event_type, code, CAST(COUNT(*) AS BIGINT) AS c
           FROM tri GROUP BY 1, 2),
    pn AS (SELECT event_type, code, c,
                  CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
                    AS nt
           FROM pc),
    tot AS (SELECT event_type, ANY_VALUE(nt) AS nt,
                   CAST(COUNT(*) AS BIGINT) AS n_patterns,
                   list_reduce(
                     list_prepend(0.0,
                       list(-(c / nt) * ln(c / nt) ORDER BY code)),
                     (a, b) -> a + b) AS h
            FROM pn GROUP BY event_type)
    SELECT event_type, nt AS n_triples, n_patterns,
           ROUND(h, 4) AS entropy,
           ROUND(h / ln(6), 4) AS entropy_norm
    FROM tot
    """,
    notes="permutation entropy (Bandt-Pompe, order 3) of the daily "
    "event-count series per type — the model-free complexity/"
    "randomness score used for regime detection, robust to monotone "
    "transforms because only ORDINAL patterns count. Each triple's "
    "pattern is 3 strict integer comparisons packed into a code "
    "(ties resolve to earlier-position order identically in both "
    "engines); pattern counts are exact BIGINTs and the -p*ln(p) "
    "fold is ordered by code with a 0.0 seed, ROUND 4 dp (ln is "
    "libm-variant — the dp_histogram discipline). Corpus -> calendar "
    "grid in one keyed pass; everything after is pattern-sized",
)
def ts_permutation_entropy(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "n",
        F.lead("n", 1).over(w).alias("v1"),
        F.lead("n", 2).over(w).alias("v2"),
    ).where(F.col("v2").isNotNull())
    code = (
        (F.col("n") > F.col("v1")).cast("int") * 4
        + (F.col("n") > F.col("v2")).cast("int") * 2
        + (F.col("v1") > F.col("v2")).cast("int")
    ).cast("long")
    pc = l.groupBy("event_type", code.alias("code")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nt = F.sum("c").over(Window.partitionBy("event_type"))
    terms = pc.select(
        "event_type",
        "code",
        "c",
        (-(F.col("c") / nt) * F.log(F.col("c") / nt)).alias("term"),
    )
    tot = terms.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_triples"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("code", F.col("term")))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("h"),
    )
    import math

    return tot.select(
        "event_type",
        "n_triples",
        "n_patterns",
        F.round("h", 4).alias("entropy"),
        F.round(F.col("h") / math.log(6.0), 4).alias("entropy_norm"),
    )


@register(
    "agg_hurst",
    section="2.10",
    oracle="""
    WITH d AS (SELECT CAST(datediff('day', DATE '2024-01-01',
                                    CAST(ts AS DATE)) AS BIGINT) AS dd,
                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS BIGINT) AS s
               FROM events WHERE value IS NOT NULL GROUP BY 1),
    sc AS (SELECT m.m, d.dd // m.m AS blk,
                  CAST(SUM(d.s) AS BIGINT) AS bs,
                  CAST(COUNT(*) AS BIGINT) AS bc
           FROM d CROSS JOIN (SELECT UNNEST([1, 2, 4, 8]) AS m) m
           GROUP BY 1, 2),
    v AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS nb,
                 CAST(SUM(bs) AS BIGINT) AS s1,
                 list_reduce(
                   list_prepend(0.0,
                     list(CAST(bs AS DOUBLE) * bs ORDER BY blk)),
                   (a, b) -> a + b) AS s2
          FROM sc WHERE bc = m GROUP BY m),
    pts AS (SELECT CAST(CASE m WHEN 1 THEN 0 WHEN 2 THEN 1
                              WHEN 4 THEN 2 ELSE 3 END AS BIGINT) AS k,
                   ln((nb * s2 - CAST(s1 AS DOUBLE) * s1)
                      / (CAST(m AS DOUBLE) * m * nb * nb)) AS y
            FROM v WHERE nb >= 2
              AND nb * s2 - CAST(s1 AS DOUBLE) * s1 > 0),
    fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
                   CAST(SUM(k) AS BIGINT) AS sx,
                   CAST(SUM(k * k) AS BIGINT) AS sxx,
                   list_reduce(list_prepend(0.0, list(y ORDER BY k)),
                               (a, b) -> a + b) AS sy,
                   list_reduce(list_prepend(0.0, list(k * y ORDER BY k)),
                               (a, b) -> a + b) AS sxy
            FROM pts)
    SELECT np AS n_scales,
           ROUND((np * sxy - sx * sy) / (np * sxx - sx * sx) / (2 * ln(2))
                 + 1, 4) AS hurst
    FROM fit
    """,
    notes="Hurst exponent of the daily revenue series by the "
    "aggregated-variance method: block the series at scales m = 1, 2, "
    "4, 8 days, variance of block MEANS scales ~ m^(2H-2), so H = 1 + "
    "slope/2 of the log-log fit. Block sums are exact cent BIGINTs; "
    "each scale's variance is ONE expression of exact integer moments "
    "(nb*s2 - s1^2, rescaled by m^2 nb^2); ln(variance) is the only "
    "libm call, the 4 y-values fold in scale order, the OLS slope is "
    "closed-form on x = log2(m) = 0..3 EXACT integers, and the result "
    "ROUNDs 4 dp. Long-memory vs mean-reverting diagnostic next to "
    "ts_autocorr/ts_pacf; one corpus pass, 4x-grid work after",
)
def agg_hurst(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("dd")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("s")
    )
    scales = F.explode(F.array(*[F.lit(m) for m in (1, 2, 4, 8)])).alias("m")
    sc = (
        d.select("dd", "s", scales)
        .groupBy("m", F.expr("dd div m").alias("blk"))
        .agg(
            F.sum("s").cast("long").alias("bs"),
            F.count(F.lit(1)).cast("long").alias("bc"),
        )
    )
    # bs^2 overflows BIGINT once daily sums reach ~3e9 cents (the
    # agg_ttest_welch lesson); blocks are calendar-bounded, so the
    # squared terms fold as DOUBLES in block order — exact cross-engine
    v = (
        sc.where(F.col("bc") == F.col("m"))
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.sum("bs").cast("long").alias("s1"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "blk",
                            (F.col("bs").cast("double") * F.col("bs")).alias(
                                "t"
                            ),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, r: acc + r["t"],
            ).alias("s2"),
        )
    )
    ss1 = F.col("s1").cast("double") * F.col("s1")
    varm = (F.col("nb") * F.col("s2") - ss1) / (
        F.col("m").cast("double") * F.col("m") * F.col("nb") * F.col("nb")
    )
    pts = v.where(
        (F.col("nb") >= 2) & (F.col("nb") * F.col("s2") - ss1 > 0)
    ).select(
        F.when(F.col("m") == 1, 0)
        .when(F.col("m") == 2, 1)
        .when(F.col("m") == 4, 2)
        .otherwise(3)
        .cast("long")
        .alias("k"),
        F.log(varm).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("k").cast("long").alias("sx"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sxx"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("k", F.col("y").alias("t")))),
            F.lit(0.0),
            lambda acc, r: acc + r["t"],
        ).alias("sy"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("k", (F.col("k") * F.col("y")).alias("t"))
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["t"],
        ).alias("sxy"),
    )
    import math

    slope = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.select(
        F.col("np").alias("n_scales"),
        F.round(slope / (2 * math.log(2.0)) + 1, 4).alias("hurst"),
    )


# SAX breakpoints for a 4-symbol alphabet: standard normal quartiles,
# embedded as identical repr literals in both engines (spec constants,
# the agg_power_analysis discipline).
_SAX_Q1 = -0.6744897501960817
_SAX_Q3 = 0.6744897501960817
_SAX_W = 8  # PAA segments per series


@register(
    "ts_xcorr_lags",
    section="2.10",
    oracle="""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'click')
                           AS BIGINT) AS x,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS y
               FROM events GROUP BY 1),
    lags AS (SELECT CAST(k AS BIGINT) AS k
             FROM generate_series(-7, 7) AS t(k)),
    pair AS (SELECT l.k, a.x, b.y
             FROM lags l
             JOIN d a ON TRUE
             JOIN d b ON b.di = a.di + l.k),
    s AS (SELECT k,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM pair GROUP BY k)
    SELECT k, n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
                 (SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 4) AS xcorr
    FROM s
    WHERE n >= 8 AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0
      AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0
    ORDER BY k
    """,
    notes="cross-correlation function between the daily click and "
    "purchase count series at lags -7..+7 (lead/lag detector: does one "
    "metric anticipate the other?): the daily grid is calendar-bounded "
    "metadata, so the 15-lag self-join is a broadcast of a tiny table "
    "against itself — never event-sized. Six sufficient statistics per "
    "lag are exact integer sums; the cross-products go through DOUBLE "
    "before multiplying (n*sxy overflows BIGINT once daily volume "
    "reaches ~1e7 — the agg_cuped lesson); Pearson r ROUNDed 4 dp. "
    "Generalizes ts_autocorr (self, 2 lags) and ts_corr_series "
    "(rolling, lag 0) to the full +-K CCF",
)
def ts_xcorr_lags(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y"),
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("long").alias("k"))
    a = d.select(F.col("di").alias("dia"), "x")
    b = d.select(F.col("di").alias("dib"), "y")
    pair = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("dib") == F.col("dia") + F.col("k"))
    )
    s = pair.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    )
    vy = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    )
    num = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    return (
        s.where((n >= 8) & (vx > 0) & (vy > 0))
        .select("k", "n", F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 4).alias("xcorr"))
        .orderBy("k")
    )


@register(
    "ts_granger",
    section="2.10",
    oracle="""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'click')
                           AS BIGINT) AS x,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS y
               FROM events GROUP BY 1),
    l AS (SELECT y,
                 LAG(y) OVER (ORDER BY di) AS y1,
                 LAG(x) OVER (ORDER BY di) AS x1
          FROM d),
    p AS (SELECT y, y1, x1 FROM l WHERE y1 IS NOT NULL),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(y1) AS BIGINT) AS s1,
                 CAST(SUM(x1) AS BIGINT) AS s2,
                 CAST(SUM(y * y) AS BIGINT) AS syy,
                 CAST(SUM(y1 * y1) AS BIGINT) AS s11,
                 CAST(SUM(x1 * x1) AS BIGINT) AS s22,
                 CAST(SUM(y1 * x1) AS BIGINT) AS s12,
                 CAST(SUM(y * y1) AS BIGINT) AS s1y,
                 CAST(SUM(y * x1) AS BIGINT) AS s2y
          FROM p),
    c AS (SELECT n,
                 n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy,
                 n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 AS c11,
                 n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 AS c22,
                 n * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 AS c12,
                 n * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy AS c1y,
                 n * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy AS c2y
          FROM s),
    f AS (SELECT n, cyy, c11, c1y, c2y,
                 (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b,
                 (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS g
          FROM c WHERE c11 * c22 - c12 * c12 > 0 AND c11 > 0),
    r AS (SELECT n, b, g,
                 (cyy - (c1y * c1y) / c11) / n AS rss_r,
                 (cyy - b * c1y - g * c2y) / n AS rss_u
          FROM f)
    SELECT n,
           FLOOR(b * 1e6) / 1e6 AS coef_ylag,
           FLOOR(g * 1e6) / 1e6 AS coef_xlag,
           FLOOR((rss_r - rss_u) * (n - 3) / rss_u * 1e6) / 1e6
             AS f_stat
    FROM r WHERE rss_u > 0
    """,
    notes="Granger causality (1 lag): does yesterday's click count "
    "improve the prediction of today's purchase count beyond "
    "yesterday's purchases alone? Restricted (y ~ y_lag) vs "
    "unrestricted (y ~ y_lag + x_lag) OLS in closed form from TEN "
    "exact integer sums over the calendar-bounded daily grid — the "
    "2x2 normal equations solve by Cramer's rule, so no matrix "
    "library exists anywhere; F = (RSS_r - RSS_u)(n-3)/RSS_u. Every "
    "centered moment is n*S - S*S computed in DOUBLE (BIGINT "
    "cross-products overflow near 1e7 daily volume); both engines "
    "evaluate the identical scalar tree, FLOOR 6 dp. The lag window "
    "is over the daily table (metadata-sized), never over events",
)
def ts_granger(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y"),
    )
    w = Window.orderBy("di")  # daily grid: calendar-bounded, never events
    lagged = d.select(
        "y",
        F.lag("y").over(w).alias("y1"),
        F.lag("x").over(w).alias("x1"),
    ).where(F.col("y1").isNotNull())
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("y1").cast("long").alias("s1"),
        F.sum("x1").cast("long").alias("s2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("y1") * F.col("y1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s22"),
        F.sum(F.col("y1") * F.col("x1")).cast("long").alias("s12"),
        F.sum(F.col("y") * F.col("y1")).cast("long").alias("s1y"),
        F.sum(F.col("y") * F.col("x1")).cast("long").alias("s2y"),
    )
    n = F.col("n")
    cyy = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    c11 = n * F.col("s11").cast("double") - F.col("s1").cast("double") * F.col("s1")
    c22 = n * F.col("s22").cast("double") - F.col("s2").cast("double") * F.col("s2")
    c12 = n * F.col("s12").cast("double") - F.col("s1").cast("double") * F.col("s2")
    c1y = n * F.col("s1y").cast("double") - F.col("s1").cast("double") * F.col("sy")
    c2y = n * F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy")
    det = c11 * c22 - c12 * c12
    b = (c1y * c22 - c2y * c12) / det
    g = (c2y * c11 - c1y * c12) / det
    rss_r = (cyy - (c1y * c1y) / c11) / n
    rss_u = (cyy - b * c1y - g * c2y) / n
    fstat = (rss_r - rss_u) * (n - 3) / rss_u
    return (
        s.where((det > 0) & (c11 > 0))
        .select(
            "n",
            (F.floor(b * 1e6) / 1e6).alias("coef_ylag"),
            (F.floor(g * 1e6) / 1e6).alias("coef_xlag"),
            (F.floor(fstat * 1e6) / 1e6).alias("f_stat"),
            rss_u.alias("_rss_u"),
        )
        .where(F.col("_rss_u") > 0)
        .drop("_rss_u")
    )


@register(
    "ts_sax",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT event_type,
                      CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                           AS BIGINT) AS c
               FROM events WHERE value IS NOT NULL
               GROUP BY 1, 2),
    idx AS (SELECT event_type, c,
                   CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                           ORDER BY di) AS BIGINT) - 1
                     AS i,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM d),
    st AS (SELECT event_type,
                  CAST(MAX(n) AS BIGINT) AS n,
                  CAST(SUM(c) AS BIGINT) AS s1,
                  CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2
           FROM idx GROUP BY event_type),
    seg AS (SELECT i.event_type,
                   CAST(i.i * {_SAX_W} // i.n AS BIGINT) AS seg,
                   CAST(SUM(i.c) AS BIGINT) AS segsum,
                   CAST(COUNT(*) AS BIGINT) AS segn
            FROM idx i GROUP BY 1, 2),
    z AS (SELECT g.event_type, g.seg,
                 ((CAST(g.segsum AS DOUBLE) / g.segn)
                  - CAST(t.s1 AS DOUBLE) / t.n)
                 / SQRT(t.s2 / t.n - (CAST(t.s1 AS DOUBLE) / t.n)
                                     * (CAST(t.s1 AS DOUBLE) / t.n)) AS zz
          FROM seg g JOIN st t USING (event_type)
          WHERE t.s2 / t.n - (CAST(t.s1 AS DOUBLE) / t.n)
                             * (CAST(t.s1 AS DOUBLE) / t.n) > 0),
    sym AS (SELECT event_type, seg,
                   CASE WHEN zz < {_SAX_Q1!r} THEN 'a'
                        WHEN zz < 0.0 THEN 'b'
                        WHEN zz < {_SAX_Q3!r} THEN 'c'
                        ELSE 'd' END AS s
            FROM z)
    SELECT event_type,
           STRING_AGG(s, '' ORDER BY seg) AS sax_word
    FROM sym GROUP BY event_type ORDER BY event_type
    """,
    notes=f"SAX symbolization (Lin/Keogh): each event type's daily-spend "
    f"series is z-normalized, PAA-compressed to {_SAX_W} segments "
    "(segment id = i*w div n over the per-series day rank — pure "
    "integer), and each segment mean is binned into a 4-letter "
    "alphabet at the standard-normal quartile breakpoints (embedded "
    "as identical repr literals). The output word is the "
    "indexable shape signature used for motif/similarity search over "
    "billions of series. Per-series stats are exact integer sums "
    "(the squared sum through HUGEINT/DECIMAL for headroom); the "
    "day-rank window is keyed per series and calendar-bounded. "
    "Breakpoint comparisons see identical doubles in both engines",
)
def ts_sax(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("di")
    idx = d.select(
        "event_type",
        "c",
        (F.row_number().over(w).cast("long") - 1).alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n"),
    )
    st = idx.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("s2"),
    )
    seg = idx.groupBy(
        "event_type",
        F.expr(f"CAST(i * {_SAX_W} div n AS BIGINT)").alias("seg"),
    ).agg(
        F.sum("c").cast("long").alias("segsum"),
        F.count(F.lit(1)).cast("long").alias("segn"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2") / F.col("n") - mu * mu
    z = (
        seg.join(F.broadcast(st), "event_type")
        .where(var > 0)
        .select(
            "event_type",
            "seg",
            (
                (F.col("segsum").cast("double") / F.col("segn") - mu)
                / F.sqrt(var)
            ).alias("zz"),
        )
    )
    sym = z.select(
        "event_type",
        "seg",
        F.when(F.col("zz") < _SAX_Q1, "a")
        .when(F.col("zz") < 0.0, "b")
        .when(F.col("zz") < _SAX_Q3, "c")
        .otherwise("d")
        .alias("s"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg", F.col("s").alias("s")))
                    ),
                    lambda r: r["s"],
                ),
                "",
            ).alias("sax_word")
        )
        .orderBy("event_type")
    )


_ITS_CUT_DATE = "2024-01-16"  # single source for BOTH engines' cutpoint


@register(
    "ts_interrupted",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS y
               FROM events GROUP BY 1),
    cut AS (SELECT CAST(epoch_us(TIMESTAMP '{_ITS_CUT_DATE}') // 86400000000
                        AS BIGINT) AS c),
    t AS (SELECT di - c AS t, y, t >= 0 AS post
          FROM d CROSS JOIN cut),
    s AS (SELECT post,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(t) AS BIGINT) AS st,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(t * t) AS BIGINT) AS stt,
                 CAST(SUM(t * y) AS BIGINT) AS sty
          FROM t GROUP BY post),
    fit AS (SELECT post, n,
                   (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
                   / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                     AS b,
                   (CAST(sy AS DOUBLE)
                    - (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
                      / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st)
                      * st) / n AS a
            FROM s
            WHERE n >= 3
              AND n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st > 0),
    pre AS (SELECT n AS n_pre, a AS a_pre, b AS b_pre
            FROM fit WHERE NOT post),
    pst AS (SELECT n AS n_post, a AS a_post, b AS b_post
            FROM fit WHERE post)
    SELECT n_pre, n_post,
           FLOOR(a_pre * 1e6) / 1e6 AS intercept_pre,
           FLOOR(b_pre * 1e6) / 1e6 AS slope_pre,
           FLOOR(a_post * 1e6) / 1e6 AS intercept_post,
           FLOOR(b_post * 1e6) / 1e6 AS slope_post,
           FLOOR((a_post - a_pre) * 1e6) / 1e6 AS level_change,
           FLOOR((b_post - b_pre) * 1e6) / 1e6 AS slope_change
    FROM pre CROSS JOIN pst
    """,
    notes="interrupted time-series (segmented regression) around the "
    "2024-01-16 cutpoint: separate OLS lines fit to the daily purchase "
    "count before and after, with time centered at the cut so the "
    "intercept difference IS the level change and the slope difference "
    "the trend change — the pre/post causal readout evt_did gives for "
    "two GROUPS, here for one series interrupted in time. Both fits "
    "are closed-form from five exact integer sums per segment "
    "(cross-products through DOUBLE — the agg_cuped overflow lesson); "
    "one keyed daily aggregate is the only corpus work, the rest is "
    "calendar-bounded. FLOOR 6 dp",
)
def ts_interrupted(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # epoch day derived from the SAME date string the oracle embeds —
    # the constant cannot drift between the two engines
    cut_di = F.expr(
        f"CAST(datediff(DATE '{_ITS_CUT_DATE}', DATE '1970-01-01')"
        " AS BIGINT)"
    )
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y")
    )
    t = d.select(
        (F.col("di") - cut_di).alias("t"),
        "y",
        ((F.col("di") - cut_di) >= 0).alias("post"),
    )
    s = t.groupBy("post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
    )
    n = F.col("n")
    den = n * F.col("stt").cast("double") - F.col("st").cast("double") * F.col(
        "st"
    )
    b = (
        n * F.col("sty").cast("double")
        - F.col("st").cast("double") * F.col("sy")
    ) / den
    a = (F.col("sy").cast("double") - b * F.col("st")) / n
    fit = (
        s.where((n >= 3) & (den > 0))
        .select("post", "n", b.alias("b"), a.alias("a"))
    )
    pre = fit.where(~F.col("post")).select(
        F.col("n").alias("n_pre"),
        F.col("a").alias("a_pre"),
        F.col("b").alias("b_pre"),
    )
    pst = fit.where(F.col("post")).select(
        F.col("n").alias("n_post"),
        F.col("a").alias("a_post"),
        F.col("b").alias("b_post"),
    )
    return pre.crossJoin(pst).select(
        "n_pre",
        "n_post",
        (F.floor(F.col("a_pre") * 1e6) / 1e6).alias("intercept_pre"),
        (F.floor(F.col("b_pre") * 1e6) / 1e6).alias("slope_pre"),
        (F.floor(F.col("a_post") * 1e6) / 1e6).alias("intercept_post"),
        (F.floor(F.col("b_post") * 1e6) / 1e6).alias("slope_post"),
        (F.floor((F.col("a_post") - F.col("a_pre")) * 1e6) / 1e6).alias(
            "level_change"
        ),
        (F.floor((F.col("b_post") - F.col("b_pre")) * 1e6) / 1e6).alias(
            "slope_change"
        ),
    )


# 5% asymptotic critical value of the Dickey-Fuller tau_mu distribution
# (constant-only regression) — a spec constant embedded identically in
# both engines (MacKinnon 2010 asymptotic table).
_ADF_CRIT_5PCT = -2.86


@register(
    "ts_adf",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    l AS (SELECT y - LAG(y) OVER (ORDER BY di) AS dy,
                 LAG(y) OVER (ORDER BY di) AS y1
          FROM d),
    p AS (SELECT CAST(dy AS BIGINT) AS dy, CAST(y1 AS BIGINT) AS y1
          FROM l WHERE y1 IS NOT NULL),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y1) AS BIGINT) AS sx,
                 CAST(SUM(dy) AS BIGINT) AS sy,
                 CAST(SUM(y1 * y1) AS BIGINT) AS sxx,
                 CAST(SUM(y1 * dy) AS BIGINT) AS sxy,
                 CAST(SUM(dy * dy) AS BIGINT) AS syy
          FROM p),
    c AS (SELECT n,
                 n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS cxx,
                 n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy AS cxy,
                 n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy
          FROM s),
    f AS (SELECT n, cxx, cxy / cxx AS g,
                 (cyy - (cxy * cxy) / cxx) / n AS rss
          FROM c WHERE cxx > 0),
    t AS (SELECT n, g,
                 g / SQRT((rss / (n - 2)) / (cxx / n)) AS df_stat
          FROM f WHERE n > 2 AND rss > 0)
    SELECT n,
           FLOOR(g * 1e6) / 1e6 AS gamma,
           FLOOR(df_stat * 1e6) / 1e6 AS df_stat,
           {_ADF_CRIT_5PCT!r} AS crit_5pct,
           CAST(CASE WHEN df_stat < {_ADF_CRIT_5PCT!r} THEN 1 ELSE 0 END
                AS BIGINT) AS is_stationary
    FROM t
    """,
    notes="Dickey-Fuller unit-root test (constant-only) on the daily "
    "event-count series: regress delta-y on lagged y, DF statistic = "
    "gamma / se(gamma); reject the unit root (declare stationary) "
    "when it falls below the MacKinnon 5% asymptotic tau_mu critical "
    "value, embedded as an identical literal. Closed-form one-"
    "regressor OLS from six exact integer sums over the calendar-"
    "bounded daily grid — centered cross-products in DOUBLE (the "
    "agg_cuped overflow lesson). The unit-root complement of "
    "ts_mann_kendall (monotone trend) and agg_hurst (long memory); "
    "corpus work = one keyed daily rollup. FLOOR 6 dp",
)
def ts_adf(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = Window.orderBy("di")  # daily grid: calendar-bounded
    lagged = d.select(
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("y1"),
    ).where(F.col("y1").isNotNull())
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y1").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("y1") * F.col("y1")).cast("long").alias("sxx"),
        F.sum(F.col("y1") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    n = F.col("n")
    cxx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    cxy = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    cyy = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    g = cxy / cxx
    rss = (cyy - (cxy * cxy) / cxx) / n
    df_stat = g / F.sqrt((rss / (n - 2)) / (cxx / n))
    return (
        s.where((cxx > 0) & (n > 2) & (rss > 0))
        .select(
            "n",
            (F.floor(g * 1e6) / 1e6).alias("gamma"),
            (F.floor(df_stat * 1e6) / 1e6).alias("df_stat"),
            F.lit(_ADF_CRIT_5PCT).alias("crit_5pct"),
            F.when(df_stat < _ADF_CRIT_5PCT, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_stationary"),
        )
    )


@register(
    "agg_tail_dependence",
    section="2.10",
    oracle="""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'click')
                           AS BIGINT) AS x,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS y
               FROM events GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
    qx AS (SELECT x AS q FROM (
             SELECT x, ROW_NUMBER() OVER (ORDER BY x, di) AS rn, nd
             FROM d CROSS JOIN n) WHERE rn = (nd * 3 + 3) // 4),
    qy AS (SELECT y AS q FROM (
             SELECT y, ROW_NUMBER() OVER (ORDER BY y, di) AS rn, nd
             FROM d CROSS JOIN n) WHERE rn = (nd * 3 + 3) // 4),
    t AS (SELECT CAST(COUNT(*) FILTER (d.x > qx.q) AS BIGINT) AS nx,
                 CAST(COUNT(*) FILTER (d.y > qy.q) AS BIGINT) AS ny,
                 CAST(COUNT(*) FILTER (d.x > qx.q AND d.y > qy.q)
                      AS BIGINT) AS nxy,
                 CAST(MAX(n.nd) AS BIGINT) AS nd
          FROM d CROSS JOIN qx CROSS JOIN qy CROSS JOIN n)
    SELECT nd AS n_days, nx, ny, nxy,
           CAST(CASE WHEN ny > 0 THEN nxy * 1000000 // ny END AS BIGINT)
             AS lambda_u_ppm,
           CAST(CASE WHEN nx * ny > 0
                     THEN CAST(nxy AS BIGINT) * nd * 1000000
                          // (nx * ny) END AS BIGINT) AS lift_ppm
    FROM t
    """,
    notes="upper-tail dependence between daily click and purchase "
    "volume: with both 75th-percentile thresholds picked as exact "
    "DISCRETE rank statistics (actual data values, deterministic in "
    "both engines), lambda_U = P(X > qx | Y > qy) estimates whether "
    "extreme days co-occur — the co-movement question Pearson "
    "correlation misses when the middle of the distribution "
    "dominates; lift compares the joint exceedance to independence. "
    "Every number is an exact integer (counts and floor-divided "
    "ppm); the rank windows run on the calendar-bounded daily grid. "
    "One keyed daily rollup is the only corpus work",
)
def agg_tail_dependence(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y"),
    ).localCheckpoint()
    n = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))

    def q_of(col):
        w = Window.orderBy(col, "di")
        return (
            d.crossJoin(F.broadcast(n))
            .select(
                F.col(col).alias("q"),
                F.row_number().over(w).alias("rn"),
                "nd",
            )
            .where(F.col("rn") == F.expr("(nd * 3 + 3) div 4"))
            .select("q")
        )

    qx = q_of("x")
    qy = q_of("y")
    t = (
        d.crossJoin(F.broadcast(qx.select(F.col("q").alias("qx"))))
        .crossJoin(F.broadcast(qy.select(F.col("q").alias("qy"))))
        .crossJoin(F.broadcast(n))
        .agg(
            F.count(F.when(F.col("x") > F.col("qx"), 1))
            .cast("long")
            .alias("nx"),
            F.count(F.when(F.col("y") > F.col("qy"), 1))
            .cast("long")
            .alias("ny"),
            F.count(
                F.when(
                    (F.col("x") > F.col("qx")) & (F.col("y") > F.col("qy")),
                    1,
                )
            )
            .cast("long")
            .alias("nxy"),
            F.max("nd").cast("long").alias("nd"),
        )
    )
    return t.select(
        F.col("nd").alias("n_days"),
        "nx",
        "ny",
        "nxy",
        F.when(
            F.col("ny") > 0, F.expr("CAST(nxy * 1000000 div ny AS BIGINT)")
        ).alias("lambda_u_ppm"),
        F.when(
            F.col("nx") * F.col("ny") > 0,
            F.expr(
                "CAST(CAST(nxy AS BIGINT) * nd * 1000000"
                " div (nx * ny) AS BIGINT)"
            ),
        ).alias("lift_ppm"),
    )


@register(
    "ts_cointegration",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'click')
                           AS BIGINT) AS x,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS y
               FROM events GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM d),
    fit AS (SELECT n,
                   (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     AS b,
                   (CAST(sy AS DOUBLE)
                    - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                      * sx) / n AS a
            FROM s
            WHERE n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0),
    res AS (SELECT d.di,
                   CAST(FLOOR((d.y - (fit.a + fit.b * d.x)) * 1e6)
                        AS BIGINT) AS e
            FROM d CROSS JOIN fit),
    l AS (SELECT e - LAG(e) OVER (ORDER BY di) AS de,
                 LAG(e) OVER (ORDER BY di) AS e1
          FROM res),
    p AS (SELECT de, e1 FROM l WHERE e1 IS NOT NULL),
    s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(e1) AS BIGINT) AS su,
                  CAST(SUM(de) AS BIGINT) AS sv,
                  CAST(SUM(CAST(e1 AS HUGEINT) * e1) AS DOUBLE) AS suu,
                  CAST(SUM(CAST(e1 AS HUGEINT) * de) AS DOUBLE) AS suv,
                  CAST(SUM(CAST(de AS HUGEINT) * de) AS DOUBLE) AS svv
           FROM p),
    c AS (SELECT n,
                 n * suu - CAST(su AS DOUBLE) * su AS cuu,
                 n * suv - CAST(su AS DOUBLE) * sv AS cuv,
                 n * svv - CAST(sv AS DOUBLE) * sv AS cvv
          FROM s2),
    f2 AS (SELECT n, cuu, cuv / cuu AS g,
                  (cvv - (cuv * cuv) / cuu) / n AS rss
           FROM c WHERE cuu > 0),
    t AS (SELECT n, g,
                 g / SQRT((rss / (n - 2)) / (cuu / n)) AS eg_stat
          FROM f2 WHERE n > 2 AND rss > 0)
    SELECT (SELECT n FROM s) AS n_days,
           FLOOR((SELECT b FROM fit) * 1e6) / 1e6 AS hedge_ratio,
           FLOOR(g * 1e6) / 1e6 AS resid_gamma,
           FLOOR(eg_stat * 1e6) / 1e6 AS eg_stat,
           -3.37 AS crit_5pct,
           CAST(CASE WHEN eg_stat < -3.37 THEN 1 ELSE 0 END AS BIGINT)
             AS is_cointegrated
    FROM t
    """,
    notes="Engle-Granger cointegration test between the daily click and "
    "purchase count series: stage 1 fits the long-run relation y ~ x "
    "(closed-form OLS from exact sums), stage 2 runs the Dickey-"
    "Fuller regression on the residuals — which are FLOORed to exact "
    "1e-6 integers the moment they are formed, so every stage-2 sum "
    "is exact (the squared sums through HUGEINT/DECIMAL). Verdict "
    "against the Engle-Granger 5% critical value (-3.37, two-"
    "variable case) embedded as an identical literal. The pairs-"
    "trading / long-run-equilibrium question ts_adf answers for one "
    "series, asked of a pair; corpus work is one keyed daily rollup",
)
def ts_cointegration(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y"),
    ).localCheckpoint()
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nn = F.col("n")
    den = nn * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    b = (
        nn * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / den
    a = (F.col("sy").cast("double") - b * F.col("sx")) / nn
    fit = s.where(den > 0).select(
        "n", b.alias("b"), a.alias("a")
    )
    res = d.crossJoin(F.broadcast(fit)).select(
        "di",
        F.floor(
            (F.col("y") - (F.col("a") + F.col("b") * F.col("x"))) * 1e6
        )
        .cast("long")
        .alias("e"),
        F.col("n").alias("n_days"),
        F.col("b").alias("hedge_ratio"),
    )
    w = Window.orderBy("di")  # daily grid, calendar-bounded
    lagged = res.select(
        "n_days",
        "hedge_ratio",
        (F.col("e") - F.lag("e").over(w)).alias("de"),
        F.lag("e").over(w).alias("e1"),
    ).where(F.col("e1").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2 = lagged.groupBy("n_days", "hedge_ratio").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("e1").cast("long").alias("su"),
        F.sum("de").cast("long").alias("sv"),
        F.sum(dec(F.col("e1")) * F.col("e1")).cast("double").alias("suu"),
        F.sum(dec(F.col("e1")) * F.col("de")).cast("double").alias("suv"),
        F.sum(dec(F.col("de")) * F.col("de")).cast("double").alias("svv"),
    )
    n2 = F.col("n")
    cuu = n2 * F.col("suu") - F.col("su").cast("double") * F.col("su")
    cuv = n2 * F.col("suv") - F.col("su").cast("double") * F.col("sv")
    cvv = n2 * F.col("svv") - F.col("sv").cast("double") * F.col("sv")
    g = cuv / cuu
    rss = (cvv - (cuv * cuv) / cuu) / n2
    eg = g / F.sqrt((rss / (n2 - 2)) / (cuu / n2))
    return (
        s2.where((cuu > 0) & (n2 > 2) & (rss > 0))
        .select(
            "n_days",
            (F.floor(F.col("hedge_ratio") * 1e6) / 1e6).alias("hedge_ratio"),
            (F.floor(g * 1e6) / 1e6).alias("resid_gamma"),
            (F.floor(eg * 1e6) / 1e6).alias("eg_stat"),
            F.lit(-3.37).alias("crit_5pct"),
            F.when(eg < -3.37, 1).otherwise(0).cast("long").alias(
                "is_cointegrated"
            ),
        )
    )


_FOURIER_PI2 = 6.283185307179586  # 2*pi as an identical repr literal


@register(
    "ts_fourier_profile",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    idx AS (SELECT y,
                   CAST(ROW_NUMBER() OVER (ORDER BY di) AS BIGINT) - 1 AS t,
                   CAST(COUNT(*) OVER () AS BIGINT) AS nd
            FROM d),
    kept AS (SELECT y, t, (nd // 7) * 7 AS n
             FROM idx WHERE t < (nd // 7) * 7),
    ks AS (SELECT CAST(k AS BIGINT) AS k FROM range(1, 4) t(k)),
    terms AS (SELECT ks.k, kept.n,
                     CAST(FLOOR(kept.y * COS({_FOURIER_PI2!r} * ks.k
                                * kept.t / 7.0) * 1e6) AS BIGINT) AS tc,
                     CAST(FLOOR(kept.y * SIN({_FOURIER_PI2!r} * ks.k
                                * kept.t / 7.0) * 1e6) AS BIGINT) AS tsn
              FROM kept CROSS JOIN ks),
    s AS (SELECT k, CAST(MAX(n) AS BIGINT) AS n,
                 CAST(SUM(tc) AS BIGINT) AS sc,
                 CAST(SUM(tsn) AS BIGINT) AS ss
          FROM terms GROUP BY k),
    f AS (SELECT k, n,
                 2.0 * (CAST(sc AS DOUBLE) / 1e6) / n AS a,
                 2.0 * (CAST(ss AS DOUBLE) / 1e6) / n AS b
          FROM s)
    SELECT k AS harmonic, n AS n_days_used,
           FLOOR(a * 1e4) / 1e4 AS a_k,
           FLOOR(b * 1e4) / 1e4 AS b_k,
           FLOOR(SQRT(a * a + b * b) * 1e4) / 1e4 AS amplitude,
           FLOOR(ATAN2(b, a) * 1e6) / 1e6 AS phase_rad
    FROM f ORDER BY k
    """,
    notes="weekly Fourier profile of the daily event-count series: the "
    "first three harmonics of the 7-day cycle, fit WITHOUT any matrix "
    "solve by restricting to complete weeks, where the Fourier basis "
    "is exactly orthogonal and each coefficient is an independent "
    "projection a_k = 2/n sum y cos(2 pi k t / 7). Each term is "
    "FLOORed to a 1e-6 integer before the sum (exact BIGINTs, no "
    "float order anywhere); 2*pi is an identical repr literal and "
    "cos/sin/atan2 are libm on identical doubles. The spectral "
    "companion of ts_seasonal_profile (day-of-week means): amplitude "
    "says how strong the cycle is, phase where it peaks. One keyed "
    "daily rollup; everything after is calendar-bounded",
)
def ts_fourier_profile(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = Window.orderBy("di")  # daily grid: calendar-bounded
    idx = d.select(
        "y",
        (F.row_number().over(w).cast("long") - 1).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("nd"),
    )
    kept = idx.where(
        F.col("t") < F.expr("(nd div 7) * 7")
    ).select("y", "t", F.expr("(nd div 7) * 7").alias("n"))
    ks = spark.range(1, 4).select(F.col("id").cast("long").alias("k"))
    ang = F.lit(_FOURIER_PI2) * F.col("k") * F.col("t") / 7.0
    terms = kept.crossJoin(F.broadcast(ks)).select(
        "k",
        "n",
        F.floor(F.col("y") * F.cos(ang) * 1e6).cast("long").alias("tc"),
        F.floor(F.col("y") * F.sin(ang) * 1e6).cast("long").alias("tsn"),
    )
    s = terms.groupBy("k").agg(
        F.max("n").cast("long").alias("n"),
        F.sum("tc").cast("long").alias("sc"),
        F.sum("tsn").cast("long").alias("ss"),
    )
    a = 2.0 * (F.col("sc").cast("double") / 1e6) / F.col("n")
    b = 2.0 * (F.col("ss").cast("double") / 1e6) / F.col("n")
    return s.select(
        F.col("k").alias("harmonic"),
        F.col("n").alias("n_days_used"),
        (F.floor(a * 1e4) / 1e4).alias("a_k"),
        (F.floor(b * 1e4) / 1e4).alias("b_k"),
        (F.floor(F.sqrt(a * a + b * b) * 1e4) / 1e4).alias("amplitude"),
        (F.floor(F.atan2(b, a) * 1e6) / 1e6).alias("phase_rad"),
    ).orderBy("harmonic")


# Shewhart individuals-chart constant: sigma-hat = mean moving range
# / d2 with d2 = 1.128 for subgroups of 2 (spec literal, both engines)
_SPC_D2 = 1.128


@register(
    "ts_control_chart",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                           AS BIGINT) AS y
               FROM events WHERE event_type = 'purchase'
                 AND value IS NOT NULL
               GROUP BY 1),
    mr AS (SELECT di, y,
                  ABS(y - LAG(y) OVER (ORDER BY di)) AS m
           FROM d),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(m) AS BIGINT) AS sm,
                 CAST(COUNT(m) AS BIGINT) AS nm
          FROM mr),
    lim AS (SELECT n,
                   CAST(sy AS DOUBLE) / n AS center,
                   (CAST(sm AS DOUBLE) / nm) / {_SPC_D2!r} AS sigma
            FROM s WHERE nm > 0)
    SELECT mr.di AS day_index, mr.y,
           FLOOR(lim.center * 1e2) / 1e2 AS center,
           FLOOR((lim.center - 3 * lim.sigma) * 1e2) / 1e2 AS lcl,
           FLOOR((lim.center + 3 * lim.sigma) * 1e2) / 1e2 AS ucl,
           CAST(CASE WHEN mr.y < lim.center - 3 * lim.sigma
                       OR mr.y > lim.center + 3 * lim.sigma
                     THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
    FROM mr CROSS JOIN lim
    ORDER BY mr.di
    """,
    notes="Shewhart individuals control chart (I-MR) of daily purchase "
    "revenue: center = mean of the daily totals, sigma estimated from "
    "the mean moving range / d2 (1.128, the n=2 subgroup constant, an "
    "identical literal), 3-sigma limits, and a per-day out-of-control "
    "flag — the SPC readout ops teams put on every metric; ts_cusum "
    "locates a drift, this flags individual excursions. Daily totals "
    "and moving ranges are exact BIGINTs; the limits are one "
    "identical float expression, and the flag compares the same "
    "doubles in both engines. One keyed rollup + a calendar-bounded "
    "lag window",
)
def ts_control_chart(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    w = Window.orderBy("di")  # daily grid: calendar-bounded
    mr = d.select(
        "di", "y", F.abs(F.col("y") - F.lag("y").over(w)).alias("m")
    ).localCheckpoint()
    s = mr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("m").cast("long").alias("sm"),
        F.count("m").cast("long").alias("nm"),
    )
    center = F.col("sy").cast("double") / F.col("n")
    sigma = (F.col("sm").cast("double") / F.col("nm")) / _SPC_D2
    lim = s.where(F.col("nm") > 0).select(
        center.alias("center"), sigma.alias("sigma")
    )
    j = mr.crossJoin(F.broadcast(lim))
    ooc = (F.col("y") < F.col("center") - 3 * F.col("sigma")) | (
        F.col("y") > F.col("center") + 3 * F.col("sigma")
    )
    return j.select(
        F.col("di").alias("day_index"),
        "y",
        (F.floor(F.col("center") * 1e2) / 1e2).alias("center"),
        (F.floor((F.col("center") - 3 * F.col("sigma")) * 1e2) / 1e2).alias(
            "lcl"
        ),
        (F.floor((F.col("center") + 3 * F.col("sigma")) * 1e2) / 1e2).alias(
            "ucl"
        ),
        F.when(ooc, 1).otherwise(0).cast("long").alias("out_of_control"),
    ).orderBy("day_index")


_WMA_FAST = 4  # dyadic-weight window lengths (2^-k weights)
_WMA_SLOW = 8
_WMA_FAST_DEN = (1 << _WMA_FAST) - 1  # sum of weights 2^(L-1-k)
_WMA_SLOW_DEN = (1 << _WMA_SLOW) - 1


def _wma_num_sql(col: str, length: int) -> str:
    """Exact dyadic-weight moving-average NUMERATOR: sum of
    lag(col, k) * 2^(length-1-k) — identical SQL text for both
    engines' window grammar via per-lag terms."""
    return " + ".join(
        f"lag({col}, {k}) OVER (ORDER BY di) * {1 << (length - 1 - k)}"
        if k > 0
        else f"{col} * {1 << (length - 1 - k)}"
        for k in range(length)
    )


@register(
    "ts_wma_crossover",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) AS BIGINT) AS v
               FROM events GROUP BY 1),
    m AS (SELECT di, v,
                 CAST({_wma_num_sql('v', _WMA_FAST)} AS BIGINT) AS fnum,
                 CAST({_wma_num_sql('v', _WMA_SLOW)} AS BIGINT) AS snum,
                 lag(v, {_WMA_SLOW - 1}) OVER (ORDER BY di) AS oldest
          FROM d),
    s AS (SELECT di, fnum, snum,
                 CASE WHEN fnum * {_WMA_SLOW_DEN} > snum * {_WMA_FAST_DEN}
                      THEN 1
                      WHEN fnum * {_WMA_SLOW_DEN} < snum * {_WMA_FAST_DEN}
                      THEN -1 ELSE 0 END AS sgn
          FROM m WHERE oldest IS NOT NULL),
    x AS (SELECT di, fnum, snum, sgn,
                 lag(sgn) OVER (ORDER BY di) AS prev_sgn
          FROM s)
    SELECT di AS day_index,
           CASE WHEN sgn > 0 THEN 'golden' ELSE 'death' END AS crossover,
           CAST(fnum * 1000 // {_WMA_FAST_DEN} AS BIGINT) AS fast_milli,
           CAST(snum * 1000 // {_WMA_SLOW_DEN} AS BIGINT) AS slow_milli
    FROM x
    WHERE prev_sgn IS NOT NULL AND sgn <> 0 AND prev_sgn <> sgn
      AND prev_sgn <> 0
    ORDER BY di
    """,
    notes=f"fast/slow moving-average crossover signal (the trading-"
    f"style trend detector) on daily event volume, with DYADIC weights "
    f"2^-k over {_WMA_FAST}- and {_WMA_SLOW}-day windows: both "
    f"numerators are exact BIGINT lag-chain dot products, and the "
    f"fast-vs-slow comparison cross-multiplies the exact denominators "
    f"({_WMA_FAST_DEN} and {_WMA_SLOW_DEN}) — crossing days are "
    f"INTEGER-decided, no float anywhere (the truncated-EWMA trick: "
    f"halving weights make the weighted sum a bit-shift dot product). "
    f"Only days with a full slow window emit; a crossover is a strict "
    f"sign change. One keyed daily rollup; the lag chain is "
    f"calendar-bounded",
)
def ts_wma_crossover(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(F.count(F.lit(1)).cast("long").alias("v"))
    wd = Window.orderBy("di")

    def num(length):
        terms = [
            (
                F.lag("v", k).over(wd)
                if k > 0
                else F.col("v")
            )
            * F.lit(1 << (length - 1 - k))
            for k in range(length)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.cast("long")

    m = d.select(
        "di",
        num(_WMA_FAST).alias("fnum"),
        num(_WMA_SLOW).alias("snum"),
        F.lag("v", _WMA_SLOW - 1).over(wd).alias("oldest"),
    )
    sgn = (
        F.when(
            F.col("fnum") * _WMA_SLOW_DEN > F.col("snum") * _WMA_FAST_DEN, 1
        )
        .when(
            F.col("fnum") * _WMA_SLOW_DEN < F.col("snum") * _WMA_FAST_DEN, -1
        )
        .otherwise(0)
    )
    s = m.where(F.col("oldest").isNotNull()).select(
        "di", "fnum", "snum", sgn.alias("sgn")
    )
    x = s.select(
        "di",
        "fnum",
        "snum",
        "sgn",
        F.lag("sgn").over(wd).alias("prev_sgn"),
    )
    return (
        x.where(
            F.col("prev_sgn").isNotNull()
            & (F.col("sgn") != 0)
            & (F.col("prev_sgn") != 0)
            & (F.col("prev_sgn") != F.col("sgn"))
        )
        .select(
            F.col("di").alias("day_index"),
            F.when(F.col("sgn") > 0, "golden")
            .otherwise("death")
            .alias("crossover"),
            F.expr(f"fnum * 1000 div {_WMA_FAST_DEN}")
            .cast("long")
            .alias("fast_milli"),
            F.expr(f"snum * 1000 div {_WMA_SLOW_DEN}")
            .cast("long")
            .alias("slow_milli"),
        )
        .orderBy("day_index")
    )


_MP_W = 7  # subsequence length (days)
_MP_EXCL = 3  # trivial-match exclusion zone (~w/2)


@register(
    "ts_matrix_profile",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS y
               FROM events GROUP BY 1),
    o AS (SELECT di, y,
                 CAST(ROW_NUMBER() OVER (ORDER BY di) AS BIGINT) AS k
          FROM d),
    seq AS (SELECT k, di,
                   [{", ".join(
                       f"lead(y, {t}) OVER (ORDER BY k)"
                       for t in range(_MP_W)
                   )}] AS v
            FROM o
            QUALIFY lead(y, {_MP_W - 1}) OVER (ORDER BY k) IS NOT NULL),
    p AS (SELECT a.k AS ka, a.di AS da, b.k AS kb,
                 CAST(list_sum(list_transform(range(1, {_MP_W} + 1),
                       i -> (a.v[CAST(i AS INT)] - b.v[CAST(i AS INT)])
                            * (a.v[CAST(i AS INT)] - b.v[CAST(i AS INT)])))
                   AS BIGINT) AS d2
          FROM seq a JOIN seq b ON ABS(a.k - b.k) > {_MP_EXCL}),
    mp AS (SELECT ka, da, d2, kb,
                  ROW_NUMBER() OVER (PARTITION BY ka
                                     ORDER BY d2, kb) AS rn
           FROM p)
    SELECT ka AS pos, da AS day_index, d2 AS mp_sq, kb AS nn_pos
    FROM mp WHERE rn = 1
    ORDER BY pos
    """,
    notes=f"matrix profile of the daily purchase-count series "
    f"(window {_MP_W} days, exclusion zone {_MP_EXCL}): for every "
    f"subsequence, the squared Euclidean distance to its nearest "
    f"non-trivial neighbor — the motif/discord primitive of the "
    f"SCAMP/STOMP family. Subsequences are lead-chain integer arrays, "
    f"distances exact BIGINT sums, nearest neighbor tiebroken by "
    f"position, so not a float exists anywhere. The profile relation "
    f"is calendar-bounded ((D-{_MP_W - 1})^2 pairs — ~13M at a decade "
    f"of days, trivially partitioned); the only corpus work is the "
    f"daily rollup. The minimum row is the top motif, the maximum the "
    f"top discord",
)
def ts_matrix_profile(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y")
    )
    wd = Window.orderBy("di")
    o = d.select("di", "y", F.row_number().over(wd).cast("long").alias("k"))
    wk = Window.orderBy("k")
    seq = o.select(
        "k",
        "di",
        F.array(
            *[F.lead("y", t).over(wk) for t in range(_MP_W)]
        ).alias("v"),
    ).where(F.element_at("v", _MP_W).isNotNull())
    a = seq.select(
        F.col("k").alias("ka"), F.col("di").alias("da"), F.col("v").alias("va")
    )
    b = seq.select(F.col("k").alias("kb"), F.col("v").alias("vb"))
    d2 = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    p = a.join(b, F.abs(F.col("ka") - F.col("kb")) > _MP_EXCL).select(
        "ka", "da", "kb", d2.alias("d2")
    )
    rn = F.row_number().over(Window.partitionBy("ka").orderBy("d2", "kb"))
    return (
        p.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            F.col("ka").alias("pos"),
            F.col("da").alias("day_index"),
            F.col("d2").alias("mp_sq"),
            F.col("kb").alias("nn_pos"),
        )
        .orderBy("pos")
    )


_DTW_INF = 10**15  # unreachable-cell sentinel; daily-count costs never near it
_DTW_BAND = 7  # Sakoe-Chiba half-width (days) for the banded variant


def _dtw_pairs(spark, sf_dir):
    """Every event-type pair with its ordered daily-count series: the
    shared front half of the exact and banded DTW queries. One keyed
    daily rollup (the only corpus-sized work), then a type×type metadata
    self-join — a handful of rows at any scale."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    s = d.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("di", "y"))),
            lambda r: r["y"],
        ).alias("v"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = s.select(
        F.col("event_type").alias("type_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = s.select(
        F.col("event_type").alias("type_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    return a.join(b, F.col("type_a") < F.col("type_b"))


def _dtw_banded_cost(w):
    """Sakoe-Chiba-banded DTW cost column over (va, vb, nb): the DP row
    is the band SLICE [max(1, i-w), min(nb, i+w)] — days·w cells total,
    not days² with a mask, so the banded variant is the genuine scale
    path (w fixed => linear in calendar days). The fold state is a
    struct {lo, row}: the previous row's slice plus its left edge, so
    neighbor lookups are O(1) null-safe F.get's (NULL => out-of-band =>
    the shared INF sentinel). In-band cells cap at INF (F.least) so
    unreachable cells are EXACTLY the sentinel — the DuckDB oracle masks
    a full DP the same way, making banded results integer-identical."""
    inf = F.lit(_DTW_INF).cast("long")
    wl = F.lit(w).cast("long")

    def step(prev, it):
        i, a = it["i"], it["a"]
        lo = F.greatest(F.lit(1).cast("long"), i - wl)
        hi = F.least(F.col("nb"), i + wl)

        def cell(cur, j):
            b = F.element_at(F.col("vb"), j.cast("int"))
            d_diag = F.coalesce(
                F.get(prev["row"], (j - 1 - prev["lo"]).cast("int")), inf
            )
            d_up = F.coalesce(
                F.get(prev["row"], (j - prev["lo"]).cast("int")), inf
            )
            d_left = F.coalesce(F.get(cur, (j - 1 - lo).cast("int")), inf)
            return F.concat(
                cur,
                F.array(
                    F.least(inf, F.abs(a - b) + F.least(d_diag, d_up, d_left))
                ),
            )

        # empty band (|na-nb| > w tails): sequence(lo>hi) would count DOWN
        # in Spark, so guard to an empty row instead
        js = F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
            F.slice(F.sequence(F.lit(1).cast("long"), F.lit(1).cast("long")), 1, 0)
        )
        row = F.aggregate(
            js, F.slice(F.array(inf), 1, 0), cell
        )
        return F.struct(lo.alias("lo"), row.alias("row"))

    items = F.transform(
        F.col("va"),
        lambda x, i: F.struct((i + 1).cast("long").alias("i"), x.alias("a")),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("lo"),
        F.array(F.lit(0).cast("long")).alias("row"),
    )
    state = F.aggregate(items, zero, step)
    return F.coalesce(
        F.get(state["row"], (F.col("nb") - state["lo"]).cast("int")), inf
    )


@register(
    "ts_dtw",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT event_type,
                      CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, list(y ORDER BY di) AS v,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY event_type),
    pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     a.v AS va, b.v AS vb, a.n AS na, b.n AS nb
              FROM s a JOIN s b ON a.event_type < b.event_type),
    dp AS (SELECT type_a, type_b, na, nb,
                  list_reduce(
                    list_prepend(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(vb, x -> CAST({_DTW_INF} AS BIGINT))),
                      list_transform(va, a -> [a])),
                    (prev, ax) -> list_reduce(
                      list_prepend([CAST({_DTW_INF} AS BIGINT)],
                                   list_transform(vb, x -> [x])),
                      (cur, bx) -> list_append(cur,
                        abs(ax[1] - bx[1])
                        + least(prev[len(cur)], prev[len(cur) + 1],
                                cur[len(cur)])))
                  ) AS row
           FROM pairs)
    SELECT type_a, type_b, na AS n_a, nb AS n_b,
           CAST(row[CAST(nb AS INT) + 1] AS BIGINT) AS dtw_cost
    FROM dp ORDER BY type_a, type_b
    """,
    notes="dynamic time warping between every pair of event-type daily "
    "volume series: the full Sakoe-Chiba-free DP, computed as a NESTED "
    "ordered fold (outer over series A, inner building each DP row "
    "left-to-right) — both engines evaluate the identical recurrence "
    "in the identical order over exact BIGINT costs (|a-b| of daily "
    "counts), so the warped distance is integer-exact with no float "
    "anywhere; the unreachable-cell sentinel is a shared 1e15 "
    "literal. The elastic-alignment companion to ts_xcorr_lags (rigid "
    "shifts only); the DP is calendar-bounded (days^2 cells per pair, "
    "pairs = event-type-squared metadata), the only corpus work is "
    "one keyed daily rollup. The same nested-fold shape certifies "
    "that deep higher-order lambda capture works on both engines — "
    "measured and hand-verified on a 2x2 DP first",
)
def ts_dtw(spark, sf_dir):
    pairs = _dtw_pairs(spark, sf_dir)
    inf = F.lit(_DTW_INF).cast("long")
    init = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform("vb", lambda _: inf),
    )
    row = F.aggregate(
        "va",
        init,
        lambda prev, ax: F.aggregate(
            "vb",
            F.array(inf),
            lambda cur, bx: F.concat(
                cur,
                F.array(
                    F.abs(ax - bx)
                    + F.least(
                        F.element_at(prev, F.size(cur)),
                        F.element_at(prev, F.size(cur) + 1),
                        F.element_at(cur, F.size(cur)),
                    )
                ),
            ),
        ),
    )
    return (
        pairs.select(
            "type_a",
            "type_b",
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.element_at(row, (F.col("nb") + 1).cast("int"))
            .cast("long")
            .alias("dtw_cost"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "ts_dtw_banded",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT event_type,
                      CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, list(y ORDER BY di) AS v,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY event_type),
    pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     a.v AS va, b.v AS vb, a.n AS na, b.n AS nb
              FROM s a JOIN s b ON a.event_type < b.event_type),
    dp AS (SELECT type_a, type_b, na, nb,
                  list_reduce(
                    list_prepend(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(vb, x -> CAST({_DTW_INF} AS BIGINT))),
                      list_transform(va, a -> [a])),
                    (prev, ax, i) -> list_reduce(
                      list_prepend([CAST({_DTW_INF} AS BIGINT)],
                                   list_transform(vb, x -> [x])),
                      (cur, bx, j) -> list_append(cur,
                        CASE WHEN abs(i - j) > {_DTW_BAND}
                             THEN CAST({_DTW_INF} AS BIGINT)
                        ELSE least(CAST({_DTW_INF} AS BIGINT),
                                   abs(ax[1] - bx[1])
                                   + least(prev[len(cur)],
                                           prev[len(cur) + 1],
                                           cur[len(cur)]))
                        END))
                  ) AS row
           FROM pairs)
    SELECT type_a, type_b, na AS n_a, nb AS n_b,
           CAST(row[CAST(nb AS INT) + 1] AS BIGINT) AS dtw_cost
    FROM dp ORDER BY type_a, type_b
    """,
    notes=f"Sakoe-Chiba-banded DTW (|i-j| <= {_DTW_BAND} days) between "
    f"every pair of event-type daily volume series: the scale dial the "
    f"exact ts_dtw names — per-pair work drops from days^2 to "
    f"days*{2 * _DTW_BAND + 1}, linear in the calendar at fixed band. "
    f"The engine folds over the band SLICE (state = struct of the "
    f"previous row's slice + its left edge; O(1) null-safe F.get "
    f"neighbor lookups, NULL => out-of-band => the shared 1e15 "
    f"sentinel); the oracle masks the full DP with the identical CASE, "
    f"which is cell-for-cell the same recurrence, so costs stay "
    f"integer-exact across engines. In-band cells cap at the sentinel "
    f"(least) so unreachable cells are EXACTLY equal, not "
    f"sentinel-plus-noise. Banded cost >= exact cost by construction "
    f"and equals it once the band covers the warping "
    f"(tests/test_round8_dtw_band.py pins both on the fixture)",
)
def ts_dtw_banded(spark, sf_dir):
    pairs = _dtw_pairs(spark, sf_dir)
    return (
        pairs.select(
            "type_a",
            "type_b",
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            _dtw_banded_cost(_DTW_BAND).cast("long").alias("dtw_cost"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "evt_causal_impact",
    section="2.6",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'view')
                           AS BIGINT) AS x,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS y
               FROM events GROUP BY 1),
    cut AS (SELECT CAST(epoch_us(TIMESTAMP '{_ITS_CUT_DATE}')
                        // 86400000000 AS BIGINT) AS c),
    pre AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM d CROSS JOIN cut WHERE di < c),
    fit AS (SELECT n,
                   (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     AS b,
                   (CAST(sy AS DOUBLE)
                    - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                      * sx) / n AS a
            FROM pre),
    postraw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_post,
                       CAST(SUM(y) AS BIGINT) AS actual,
                       CAST(SUM(x) AS BIGINT) AS sx_post
                FROM d CROSS JOIN cut WHERE di >= c),
    post AS (SELECT n_post, actual,
                    fit.a * n_post + fit.b * sx_post AS predicted
             FROM postraw CROSS JOIN fit)
    SELECT fit.n AS n_pre, post.n_post,
           FLOOR(fit.a * 1e4) / 1e4 AS intercept,
           FLOOR(fit.b * 1e6) / 1e6 AS slope,
           post.actual AS actual_post,
           FLOOR(post.predicted * 1e4) / 1e4 AS predicted_post,
           FLOOR((post.actual - post.predicted) * 1e4) / 1e4
             AS cumulative_effect,
           FLOOR((post.actual / post.predicted - 1) * 1e6) / 1e6
             AS relative_lift
    FROM fit CROSS JOIN post
    """,
    notes="causal-impact counterfactual around the shared "
    "2024-01-16 cutpoint: fit purchases ~ views on the PRE period "
    "(closed-form OLS from five exact BIGINT daily sums), project the "
    "counterfactual over the post period from the CONTROL series "
    "(views), and report cumulative and relative lift of actual vs "
    "predicted — the control-series sibling of ts_interrupted (which "
    "extrapolates the treated series' own trend) and evt_did (which "
    "needs a treated/control GROUP split). The post-period predicted "
    "sum uses the algebraic identity SUM(a + b*x) = a*n + b*SUM(x), "
    "so it is one identical double expression over EXACT integer "
    "sums — no row-order float accumulation anywhere (the house "
    "discipline). One keyed daily rollup is the only corpus work",
)
def evt_causal_impact(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("long")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y"),
    )
    cut = F.expr(
        f"CAST(datediff(DATE '{_ITS_CUT_DATE}', DATE '1970-01-01')"
        " AS BIGINT)"
    )
    d = d.withColumn("c", cut)
    pre = d.where(F.col("di") < F.col("c")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    b = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    a = (F.col("sy").cast("double") - b * F.col("sx")) / F.col("n")
    fit = pre.select(F.col("n"), a.alias("a"), b.alias("b"))
    postraw = d.where(F.col("di") >= F.col("c")).agg(
        F.count(F.lit(1)).cast("long").alias("n_post"),
        F.sum("y").cast("long").alias("actual"),
        F.sum("x").cast("long").alias("sx_post"),
    )
    post = postraw.crossJoin(F.broadcast(fit)).select(
        F.col("n").alias("n_pre"),
        "n_post",
        "a",
        "b",
        "actual",
        (
            F.col("a") * F.col("n_post") + F.col("b") * F.col("sx_post")
        ).alias("predicted"),
    )
    return post.select(
        F.col("n_pre"),
        "n_post",
        (F.floor(F.col("a") * 1e4) / 1e4).alias("intercept"),
        (F.floor(F.col("b") * 1e6) / 1e6).alias("slope"),
        F.col("actual").alias("actual_post"),
        (F.floor(F.col("predicted") * 1e4) / 1e4).alias("predicted_post"),
        (
            F.floor((F.col("actual") - F.col("predicted")) * 1e4) / 1e4
        ).alias("cumulative_effect"),
        (
            F.floor((F.col("actual") / F.col("predicted") - 1) * 1e6) / 1e6
        ).alias("relative_lift"),
    )


@register(
    "ts_holt_winters",
    section="2.8",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             list(CAST(y AS DOUBLE) ORDER BY day) AS ys
      FROM d GROUP BY event_type),
    f AS (
      SELECT event_type, n_days,
             list_reduce(
               list_transform(ys, y ->
                 [y, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
               (acc, x) -> [
                 ((x[1] - acc[3]) + (acc[1] + acc[2])) / 2,
                 ((((x[1] - acc[3]) + (acc[1] + acc[2])) / 2 - acc[1])
                  + acc[2]) / 2,
                 acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
                 ((x[1] - ((x[1] - acc[3]) + (acc[1] + acc[2])) / 2)
                  + acc[3]) / 2
               ]) AS st
      FROM s)
    SELECT event_type, n_days,
           ROUND(st[1], 6) AS level,
           ROUND(st[2], 6) AS trend,
           ROUND(st[3], 6) AS season_next,
           ROUND(st[1] + st[2] + st[3], 6) AS forecast_1
    FROM f
    """,
    notes="Holt-Winters additive triple-exponential smoothing (alpha = "
    "beta = gamma = 1/2, weekly season m=7, zero-initialized "
    "seasonals, l0 = y0, b0 = 0) over each type's daily revenue "
    "series: level/trend/seasonal evolve by the textbook recurrence "
    "with the seasonal RING carried as 7 array slots that rotate each "
    "step (slot 1 is always the seasonal applying to the current "
    "observation, the update appends at the back) — so the t-7 lag "
    "needs no day index in the state. Every smoothing step is an "
    "exact halving of sums of previously-identical doubles, folded "
    "LEFT in the same order on both engines (F.aggregate / "
    "list_reduce), so the 9-element float state is bit-identical (the "
    "ts_holt discipline; ROUND 6dp belt-and-braces). Completes the "
    "smoothing ladder: ewma (fixed gain) -> holt (trend) -> "
    "holt_winters (trend + season) -> kalman (adaptive gain). One "
    "keyed shuffle; folds per-type over the calendar-bounded array",
)
def ts_holt_winters(spark, sf_dir):
    """Same in-group left-fold shape as ts_holt: one corpus-keyed
    daily rollup, then the recurrence runs inside a single aggregate
    expression per type — no iterative jobs, groups fold
    independently at any scale."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))),"
            " x -> CAST(x.y AS DOUBLE))"
        ).alias("ys"),
    )
    st = F.expr(
        "aggregate(slice(ys, 2, greatest(size(ys) - 1, 0)),"
        " array(element_at(ys, 1), CAST(0.0 AS DOUBLE),"
        "       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),"
        "       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),"
        "       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),"
        "       CAST(0.0 AS DOUBLE)),"
        " (acc, y) -> array("
        "   ((y - acc[2]) + (acc[0] + acc[1])) / 2,"
        "   ((((y - acc[2]) + (acc[0] + acc[1])) / 2 - acc[0])"
        "    + acc[1]) / 2,"
        "   acc[3], acc[4], acc[5], acc[6], acc[7], acc[8],"
        "   ((y - ((y - acc[2]) + (acc[0] + acc[1])) / 2)"
        "    + acc[2]) / 2))"
    )
    return s.select(
        "event_type",
        "n_days",
        F.round(st.getItem(0), 6).alias("level"),
        F.round(st.getItem(1), 6).alias("trend"),
        F.round(st.getItem(2), 6).alias("season_next"),
        F.round(
            st.getItem(0) + st.getItem(1) + st.getItem(2), 6
        ).alias("forecast_1"),
    )
