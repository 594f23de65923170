"""SURVEY §2.5 — window functions.

Scale notes: every window partitions by a key (user_id / o_custkey), so the
single shuffle distributes by key and sorts within partitions — the same
plan a 1000-executor cluster runs. The one *global* ranking query
(win_ntile_pct) is reformulated as a two-pass value-bucketed rank so even
it has no single-partition exchange (the naive global-window form survives
only as a test cross-check). Deterministic ordering: every ORDER BY
carries a unique tiebreak column (FIXTURES.md gotcha #4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import as_date, epoch_us, money
from ..io import table
from ..registry import register


@register(
    "win_rank",
    section="2.5",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
             CAST(RANK() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      FROM orders)
    WHERE rn <= 3
    """,
)
def win_rank(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "win_lag_lead",
    section="2.5",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
    SELECT user_id, event_id,
           ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us,
           LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - ts_us AS next_us
    FROM e
    """,
)
def win_lag_lead(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", epoch_us("ts").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return e.select(
        "user_id",
        "event_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("next_us"),
    )


@register(
    "win_running",
    section="2.5",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
    FROM orders
    """,
)
def win_running(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        money(F.sum("o_totalprice").over(w)).alias("cum_spend"),
    )


@register(
    "win_sliding_rows",
    section="2.5",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events)
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5
    FROM e
    """,
)
def win_sliding_rows(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", "value", epoch_us("ts").alias("ts_us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("ma5"),
    )


@register(
    "win_range_time",
    section="2.5",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) // 1000000 AS ts_s FROM events)
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS sum_1h
    FROM e
    """,
    notes="trailing 1h value-based frame on epoch seconds (CPiX-style sliding agg)",
)
def win_range_time(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "value",
        (epoch_us("ts") / F.lit(1000000)).cast("long").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return e.select(
        "user_id",
        "event_id",
        money(F.sum("value").over(w)).alias("sum_1h"),
    )


@register(
    "win_first_last",
    section="2.5",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events)
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM e
    """,
)
def win_first_last(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


N_RANK_BUCKETS = 32


def bucketed_global_rank(df, value_col: str, tiebreak_col: str):
    """Distributed global rank: (df + 'rn' column, total row count n).

    Rows are bucketed by deterministic value boundaries
    (percentile_approx), each bucket ranks locally under a keyed window,
    and per-bucket counts (N_RANK_BUCKETS rows — metadata-scale) give the
    offsets that turn local ranks global. The only shuffle is keyed on
    bucket, so the plan survives a 100x scale-up; a unique tiebreak makes
    rank == row_number, from which ntile/percent_rank/cume_dist derive in
    closed form."""
    fracs = [i / N_RANK_BUCKETS for i in range(1, N_RANK_BUCKETS)]
    bounds = df.select(
        F.percentile_approx(value_col, fracs, 10_000).alias("b")
    ).first()["b"]
    # bucket = #boundaries strictly below the value: pure function of the
    # row, so it is identical across the counts job and the final job
    bounds_arr = F.array(*[F.lit(float(b)) for b in bounds])
    bucketed = df.withColumn(
        "bucket", F.size(F.filter(bounds_arr, lambda b: b < F.col(value_col)))
    )
    counts = {
        r["bucket"]: r["cnt"]
        for r in bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_col = F.lit(0)
    for b, off in offsets.items():
        offset_col = F.when(F.col("bucket") == b, off).otherwise(offset_col)
    w = Window.partitionBy("bucket").orderBy(value_col, tiebreak_col)
    rn = (F.row_number().over(w) + offset_col).cast("long")
    return bucketed.withColumn("rn", rn), n


@register(
    "win_ntile_pct",
    section="2.5",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    notes="distributed two-pass global rank: value-bucketed local windows "
    "+ bounded bucket-count offsets; no single-partition exchange",
)
def win_ntile_pct(spark, sf_dir):
    """Global ntile/percent_rank/cume_dist WITHOUT a single-partition
    window — see bucketed_global_rank for the two-pass formulation."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked, n = bucketed_global_rank(o, "o_totalprice", "o_orderkey")
    rn = F.col("rn")
    # NTILE(k): first n%k tiles take ceil(n/k) rows, the rest floor(n/k)
    k = 4
    q, r = n // k, n % k
    big_span = r * (q + 1)
    quartile = F.when(
        rn <= big_span, F.ceil(rn / F.lit(q + 1))
    ).otherwise(r + F.ceil((rn - big_span) / F.lit(max(q, 1))))
    pr = (rn - 1) / F.lit(max(n - 1, 1))
    return ranked.select(
        "o_orderkey",
        quartile.cast("long").alias("quartile"),
        F.round(pr, 6).alias("pr"),
        F.round(rn / F.lit(n), 6).alias("cd"),
    )


@register(
    "win_nth",
    section="2.5",
    oracle="""
    SELECT DISTINCT o_custkey,
           NTH_VALUE(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_price,
           FIRST_VALUE(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS top_price
    FROM orders
    """,
    notes="nth_value over a full frame: per-customer 2nd-highest order value",
)
def win_nth(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first("o_totalprice").over(w).alias("top_price"),
    ).distinct()


@register(
    "win_lag_default",
    section="2.5",
    oracle="""
    WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events)
    SELECT user_id, event_id,
           ROUND(LAG(value, 2, -1.0) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id), 2) AS lag2,
           ROUND(LEAD(value, 3, 0.0) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id), 2) AS lead3
    FROM e
    """,
    notes="lag/lead with offset>1 and explicit defaults",
)
def win_lag_default(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", "value", epoch_us("ts").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.lag("value", 2, -1.0).over(w), 2).alias("lag2"),
        F.round(F.lead("value", 3, 0.0).over(w), 2).alias("lead3"),
    )


@register(
    "win_cume_dist",
    section="2.5",
    oracle="""
    SELECT event_id, event_type,
           CUME_DIST() OVER w AS cume,
           PERCENT_RANK() OVER w AS pct_rank
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    notes="cume_dist + percent_rank per event type: the tiebreak key makes "
    "every ORDER BY key unique, so both are exact integer ratios (k/n) — "
    "identical IEEE divisions on both engines, no rounding needed. "
    "Partitioned by a real key (unlike the global-rank family), so the "
    "window parallelizes per group",
)
def win_cume_dist(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "win_range_value",
    section="2.5",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_orderpriority,
                      CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders)
    SELECT o_orderkey, o_orderpriority,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_near,
           CAST(SUM(cents) OVER w AS BIGINT) AS sum_near_cents
    FROM o
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
                 RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
    """,
    notes="value-based RANGE frame (orders within $1000 below each order's "
    "price): the frame is defined by the ORDER BY *value*, so peer-row "
    "order inside the frame is irrelevant — no tiebreak key needed. "
    "Prices integerized to cents (exact frame bounds + exact integer SUM, "
    "no float-order dependence). Partitioned by priority, so the sort "
    "parallelizes per group at scale",
)
def win_range_value(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rangeBetween(-100000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum("cents").over(w).alias("sum_near_cents"),
    )


@register(
    "win_distinct_sliding",
    section="2.5",
    oracle="""
    SELECT CAST(CAST(d.d AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
    FROM (SELECT DISTINCT date_trunc('day', ts) AS d FROM events) d
    JOIN events e
      ON date_trunc('day', e.ts) BETWEEN d.d - INTERVAL 6 DAY AND d.d
    GROUP BY d.d
    """,
    notes="trailing-7-day distinct users per active day (rolling WAU). "
    "Spark has no DISTINCT aggregate over a window; the scalable shape is "
    "a per-day set aggregate (one shuffle) + a 7-row range frame merging "
    "the daily sets (array_distinct(flatten(collect_list))) — state is "
    "per-day distinct sets, never raw events. The unpartitioned window is "
    "safe HERE because its input is the per-day rollup — cardinality = "
    "active days (thousands at most), unlike the raw-table global windows "
    "flagged in win_ntile_pct. At true scale swap the exact sets for "
    "mergeable HLL sketches (agg_sketch_merge pattern) with identical "
    "plan shape. Oracle = day-range join + COUNT(DISTINCT)",
)
def win_distinct_sliding(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        as_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.collect_set("user_id").alias("users"))
    idx = F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.orderBy(idx.alias("dayidx"))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.size(
            F.array_distinct(F.flatten(F.collect_list("users").over(w)))
        ).cast("long").alias("wau"),
    )


@register(
    "win_median_sliding",
    section="2.5",
    oracle="""
    WITH d AS (SELECT CAST(CAST(date_trunc('day', o_orderdate) AS DATE) AS VARCHAR)
                        AS day,
                      CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                        AS rev_cents
               FROM orders GROUP BY 1)
    SELECT day, rev_cents,
           MEDIAN(rev_cents) OVER (ORDER BY day
                                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS med7
    FROM d
    """,
    notes="trailing-7-day rolling MEDIAN of daily revenue — Spark has no "
    "percentile window aggregate, so the frame's values collect into a "
    "sorted array and the median reads out positionally ((a+b)/2 for "
    "even frames, matching DuckDB's interpolation exactly on integer "
    "cents). Same bounded-rollup argument as win_distinct_sliding: the "
    "unpartitioned window consumes the per-day aggregate (calendar-"
    "bounded), never raw orders",
)
def win_median_sliding(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        as_date(F.date_trunc("day", F.col("o_orderdate"))).cast("string").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    vals = F.array_sort(F.collect_list("rev_cents").over(w))
    n = F.size(vals)
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    return daily.select(
        "day",
        "rev_cents",
        ((lo + hi) / 2.0).alias("med7"),
    )


@register(
    "win_distinct_frame",
    section="2.5",
    oracle="""
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
               FROM events)
    SELECT user_id, event_id,
           CAST(len(list_distinct(list(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))) AS BIGINT)
             AS distinct_types_5
    FROM e
    """,
    notes="distinct count over a sliding ROWS frame (behavioral variety "
    "in the user's last 5 events): collect_set over the frame + size — "
    "the frame is bounded, so per-row state is O(frame), one keyed "
    "window pass. DuckDB spells it list-then-distinct over the same "
    "frame",
)
def win_distinct_frame(spark, sf_dir):
    from pyspark.sql import Window

    from ..core import epoch_us

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"), "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("distinct_types_5"),
    )


@register(
    "win_rolling_slope",
    section="2.5",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS i,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT user_id, event_id, i, y,
             CAST(COUNT(*) OVER f AS BIGINT) AS n,
             CAST(SUM(i) OVER f AS BIGINT) AS sx,
             CAST(SUM(y) OVER f AS BIGINT) AS sy,
             CAST(SUM(i * y) OVER f AS BIGINT) AS sxy,
             CAST(SUM(i * i) OVER f AS BIGINT) AS sxx
      FROM x
      WINDOW f AS (PARTITION BY user_id ORDER BY i
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           CASE WHEN n >= 3
                THEN FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6) / 1e6
           END AS slope_cents
    FROM w
    """,
    notes="per-entity ROLLING regression slope (trailing-10-event "
    "linear trend of spend): the five OLS moment sums ride ONE keyed "
    "sliding frame — n*sxy - sx*sy and n*sxx - sx^2 are exact "
    "integers (index x row number, y integer cents), floats appear "
    "only in the final one-shot division, so the trend signal is "
    "engine-exact with no tolerance. The trend-feature shape risk "
    "models compute per account per day; one shuffle on the entity "
    "key, frame evaluation is O(1) per row amortized. Short frames "
    "(n < 3) emit NULL rather than a degenerate fit",
)
def win_rolling_slope(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    wi = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.select(
        "user_id",
        "event_id",
        F.row_number().over(wi).cast("long").alias("i"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    f = Window.partitionBy("user_id").orderBy("i").rowsBetween(-9, 0)
    w = x.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(f).cast("long").alias("n"),
        F.sum("i").over(f).cast("long").alias("sx"),
        F.sum("y").over(f).cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("y")).over(f).cast("long").alias("sxy"),
        F.sum(F.col("i") * F.col("i")).over(f).cast("long").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = F.when(F.col("n") >= 3, F.floor(num / den * 1e6) / 1e6)
    return w.select("user_id", "event_id", slope.alias("slope_cents"))


@register(
    "win_drawdown",
    section="2.5",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS equity
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    p AS (
      SELECT user_id, equity,
             CAST(MAX(equity) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS peak
      FROM x)
    SELECT user_id,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents
    FROM p GROUP BY user_id
    """,
    notes="maximum drawdown per entity (the risk metric behind every "
    "equity-curve and SLA-budget chart): running cumulative sum -> "
    "running peak -> max shortfall, three stacked keyed windows "
    "sharing ONE (user_id) shuffle and sort, then a keyed max. "
    "Integer cents end to end — running sums never touch floats, so "
    "the metric is engine-exact. The same composition computes burn "
    "rate vs high-water-mark for error budgets",
)
def win_drawdown(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    x = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .cast("long")
        .alias("equity"),
    )
    p = x.select(
        "user_id",
        "equity",
        F.max("equity").over(w).cast("long").alias("peak"),
    )
    return p.groupBy("user_id").agg(
        F.max("peak").cast("long").alias("peak_cents"),
        F.max(F.col("peak") - F.col("equity")).cast("long").alias(
            "max_drawdown_cents"
        ),
    )


@register(
    "agg_spearman",
    section="2.5",
    oracle="""
    WITH x AS (SELECT o_orderkey AS k,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p,
                      CAST(date_diff('day', DATE '1990-01-01',
                                     CAST(o_orderdate AS DATE)) AS BIGINT) AS q
               FROM orders),
    r AS (SELECT k,
                 CAST(ROW_NUMBER() OVER (ORDER BY p, k) AS BIGINT) AS rp,
                 CAST(ROW_NUMBER() OVER (ORDER BY q, k) AS BIGINT) AS rq
          FROM x),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM((rp - rq) * (rp - rq)) AS BIGINT) AS sd2
          FROM r)
    SELECT n,
           FLOOR((1 - CAST(6 * sd2 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                          - 1))) * 1e6) / 1e6 AS rho
    FROM s
    """,
    notes="Spearman rank correlation between order value and order "
    "date (is spend drifting over time?): both "
    "rank permutations come from the DISTRIBUTED two-pass "
    "bucketed_global_rank (value-bucketed keyed windows + driver-side "
    "64-bucket offsets — the oracle's flat ROW_NUMBER is exactly what "
    "the engine must NOT do at scale), joined on the row key, then "
    "rho = 1 - 6*sum(d^2)/(n(n^2-1)) with d^2 accumulated as exact "
    "integers (decimal accumulation guards the sf>=1 overflow; the "
    "final n^3 denominator goes double). Ties break on the unique "
    "row key in both engines, so the permutations are identical — "
    "deterministic without average-rank machinery, documented as the "
    "tie convention",
)
def agg_spearman(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("p"),
        F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("q"),
    )
    # FUSED two-column bucketed rank (round-9 verdict item 2): the two
    # independent bucketed_global_rank passes cost 4 driver actions
    # (2 bounds + 2 counts) plus a rank-join shuffle. Both rank
    # permutations are pure functions of the row, so ONE bounds action
    # (both percentile_approx sketches in one aggregate), ONE counts
    # action (both bucket histograms via a 2-way explode, one shuffle),
    # and STACKED windows (rank-by-p, then rank-by-q — two keyed
    # exchanges in one plan) produce rp and rq on the same row with no
    # join at all. Rank values are identical to the two-pass form
    # (same boundaries, same offsets, same tiebreak), so the hash is
    # unchanged; measured 3.8 -> ~2.3 s isolated at sf0.1.
    fracs = [i / N_RANK_BUCKETS for i in range(1, N_RANK_BUCKETS)]
    row = o.select(
        F.percentile_approx("p", fracs, 10_000).alias("bp"),
        F.percentile_approx("q", fracs, 10_000).alias("bq"),
    ).first()

    # Bucket = count of boundaries strictly below the value, as a
    # codegen'd sum of literal comparisons: the size(filter(...)) HOF
    # form evaluates interpreted per row and made the histogram action
    # alone cost 1.9 s at sf0.1 (now ~0.3 s, same integers). Built as
    # one SQL string per bucket column — composing ~31 when/add Column
    # objects through the Python API costs py4j round-trips per build
    # (same discipline as minhash's key arrays).
    def _bucket(col, bounds):
        terms = " + ".join(
            f"if({col} > {float(b)!r}D, 1, 0)" for b in bounds
        )
        return F.expr(f"({terms})")

    bucketed = o.withColumn("bkp", _bucket("p", row["bp"])).withColumn(
        "bkq", _bucket("q", row["bq"])
    )
    # One 2D cell count instead of a 2-way explode + per-axis groupBy:
    # bounded at N_RANK_BUCKETS^2 (<= 1024) rows — the same
    # metadata-scale bucket-count map bucketed_global_rank fences — and
    # the per-axis histograms are its marginals.
    cells = (
        bucketed.groupBy("bkp", "bkq")
        .agg(F.count(F.lit(1)).alias("hist_cnt"))
        .collect()
    )

    def _offsets(axis):
        counts: dict[int, int] = {}
        for r in cells:
            b = r["bkp"] if axis == 0 else r["bkq"]
            counts[b] = counts.get(b, 0) + r["hist_cnt"]
        name = "bkp" if axis == 0 else "bkq"
        branches, acc = [], 0
        for b in sorted(counts):
            branches.append(f"WHEN {name} = {b} THEN {acc}L")
            acc += counts[b]
        return F.expr("CASE " + " ".join(branches) + " ELSE 0L END")

    off_p = _offsets(0)
    off_q = _offsets(1)
    wp = Window.partitionBy("bkp").orderBy("p", "k")
    wq = Window.partitionBy("bkq").orderBy("q", "k")
    joined = bucketed.select(
        (F.row_number().over(wp) + off_p).cast("long").alias("rp"),
        (F.row_number().over(wq) + off_q).cast("long").alias("rq"),
    )
    d2 = (F.col("rp") - F.col("rq")) * (F.col("rp") - F.col("rq"))
    # sum(d2) stays DECIMAL(38,0): at ~15M rows (the 100x probe) it
    # exceeds BIGINT (~3e21 > 2^63) — found by a CAST_OVERFLOW in
    # --r21-100x; it goes straight to DOUBLE for the rho division
    # (exact through 2^53, i.e. every oracle-checked SF)
    s = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d2.cast("decimal(38,0)")).alias("sd2"),
    )
    nd = F.col("n").cast("double")
    rho = 1 - (F.col("sd2").cast("double") * 6) / (nd * (nd * nd - 1))
    return s.select("n", (F.floor(rho * 1e6) / 1e6).alias("rho"))


@register(
    "win_groups_frame",
    section="2.5",
    oracle="""
    WITH d AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS oday,
                      CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS day_cents,
                      ROW_NUMBER() OVER (PARTITION BY o_custkey
                                         ORDER BY CAST(o_orderdate AS DATE))
                        AS g
               FROM orders GROUP BY 1, 2),
    j AS (SELECT a.o_custkey, a.oday,
                 CAST(SUM(b.day_cents) AS BIGINT) AS grp_cents
          FROM d a JOIN d b
            ON b.o_custkey = a.o_custkey AND b.g BETWEEN a.g - 2 AND a.g
          GROUP BY 1, 2)
    SELECT o.o_custkey, o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS oday,
           j.grp_cents
    FROM orders o
    JOIN j ON j.o_custkey = o.o_custkey
          AND j.oday = CAST(o.o_orderdate AS DATE)
    """,
    notes="GROUPS window frame — the frame type NEITHER engine ships "
    "(Spark: unsupported; DuckDB: 'not implemented yet') — EMULATED "
    "exactly: a GROUPS frame over ORDER BY k is a RANGE frame over "
    "dense_rank(k), because dense_rank is the peer-group ordinal "
    "(consecutive integers, one per distinct key), so '2 peer groups "
    "preceding' becomes the integer range [rank-2, rank]. Two stacked "
    "windows on one (custkey) exchange (the frame re-sorts by the rank "
    "ordinal — cheap; no second shuffle). The oracle is a structurally INDEPENDENT "
    "formulation (day-group rollup + ordinal-interval self-join), so "
    "the hash match proves the emulation's peer semantics rather than "
    "replaying the same trick",
)
def win_groups_frame(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("oday"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    wrank = Window.partitionBy("o_custkey").orderBy("oday")
    ranked = base.withColumn("g", F.dense_rank().over(wrank))
    wg = (
        Window.partitionBy("o_custkey")
        .orderBy("g")
        .rangeBetween(-2, Window.currentRow)
    )
    return ranked.select(
        "o_custkey",
        "o_orderkey",
        "oday",
        F.sum("cents").over(wg).cast("long").alias("grp_cents"),
    )


@register(
    "win_rolling_corr",
    section="2.5",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS i,
             CAST(ROUND(value * 100) AS BIGINT) AS y,
             CAST((epoch_us(ts) -
                   LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                  // 1000000 AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT user_id, event_id,
             CAST(COUNT(*) OVER f AS BIGINT) AS n,
             CAST(SUM(x) OVER f AS BIGINT) AS sx,
             CAST(SUM(y) OVER f AS BIGINT) AS sy,
             CAST(SUM(x * y) OVER f AS BIGINT) AS sxy,
             CAST(SUM(x * x) OVER f AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER f AS BIGINT) AS syy
      FROM seq WHERE x IS NOT NULL
      WINDOW f AS (PARTITION BY user_id ORDER BY i
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           CASE WHEN n >= 5 AND n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                THEN CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                          / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                                 * CAST(n * syy - sy * sy AS DOUBLE))
                          * 1e6) AS BIGINT)
           END AS corr_ppm
    FROM w
    """,
    notes="per-entity ROLLING Pearson correlation between inter-arrival "
    "gap (seconds) and spend (cents) over the trailing 20 events — the "
    "'does waiting longer change what they spend' behavioral feature. "
    "The six moment sums ride ONE keyed sliding frame as exact BIGINTs "
    "(gap <= ~2.6e6 s, cents <= ~5.6e4: every cross term is orders of "
    "magnitude inside BIGINT); floats appear only in the final "
    "division/sqrt on exactly-representable (< 2^53) integers, so both "
    "engines see bit-identical doubles and FLOOR(x*1e6) is "
    "engine-exact with no tolerance. Short (n < 5) or degenerate "
    "(zero-variance) frames emit NULL rather than a garbage fit",
)
def win_rolling_corr(spark, sf_dir):
    """Rolling correlation as window-framed integer moment sums: one
    shuffle on the entity key, one sort, six running sums sharing the
    same frame (O(1) amortized per row), then a single closed-form
    combine. The same composition computes any rolling second-moment
    statistic (beta, R^2) without a second pass."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    wi = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us(F.col("ts"))
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.row_number().over(wi).cast("long").alias("i"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.floor((us - F.lag(us).over(wi)) / 1000000).cast("long").alias("x"),
    ).where(F.col("x").isNotNull())
    # frame ordered by (ts, event_id) — the exact order i numbers, so the
    # row sequence is identical — because ordering by i itself forces a
    # SECOND per-partition sort (Spark can't prove i is sort-equivalent);
    # sharing wi's sort drops that Sort node from the plan
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    w = seq.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(f).cast("long").alias("n"),
        F.sum("x").over(f).cast("long").alias("sx"),
        F.sum("y").over(f).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(f).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(f).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(f).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (F.col("n") >= 5) & (dx > 0) & (dy > 0),
        F.floor(num / F.sqrt(dx.cast("double") * dy.cast("double")) * 1e6).cast(
            "long"
        ),
    )
    return w.select("user_id", "event_id", corr.alias("corr_ppm"))
