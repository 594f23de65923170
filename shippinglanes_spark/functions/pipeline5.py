"""Round-5 session-4 pack: crawl-pipeline URL dedup, STL-style series
decomposition, a windowed multi-step funnel, and a freshness audit.

Four shapes a real lake workload runs daily that the inventory did not
yet cover:

- `pipeline_url_canonicalize`: crawl dedup by CANONICAL URL — the step
  before any content dedup in a web-scale corpus build. URLs arrive in
  messy variants (scheme/host casing, explicit default port, tracking
  params, fragments, trailing slash); canonicalization is a chain of
  per-row regexp rewrites (zero shuffle), then ONE hash-groupBy on the
  canonical key — the same corpus-linear shape as `dedup_exact`, so it
  holds at 100 TB: the shuffle carries (canonical_url, doc_id, n_chars)
  only, never document bodies.
- `ts_stl_decompose`: additive trend/seasonal/residual decomposition of
  the daily revenue series per order priority (STL-lite: centered 7-day
  moving-average trend, day-of-week mean seasonal, MAD-gated residual
  anomalies). The corpus reduces to the bounded daily grid in one keyed
  aggregate; every window after that is over calendar-sized data.
- `evt_funnel_steps`: 3-step ORDERED funnel (view -> click -> purchase)
  with a per-step conversion window — the product-analytics shape
  `evt_funnel` (2 steps, unbounded) cannot express. Each step is a
  keyed min-aggregate joined back (user-level tables are tiny relative
  to the event log, so the joins broadcast); no per-user event sorting,
  no windows over the raw log.
- `profile_freshness`: per-source-stream staleness audit — last arrival,
  lag vs the corpus watermark, and the p95 inter-arrival gap (discrete
  percentile, an actual observed gap). One scan, one lag window keyed by
  stream, one keyed aggregate.

Cross-engine determinism notes: all comparisons and outputs are exact
BIGINTs, single divisions of exact integers, or floors of
deterministic doubles (every float here is produced by the same one-
or two-op IEEE chain on exactly-representable integers in both
engines, so the bits match before the floor).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import epoch_us
from ..io import table
from ..registry import register

_STEP_WINDOW_US = 24 * 3600 * 1_000_000  # per-step funnel window: 24 h
_STALE_MIN = 30  # freshness alert threshold (minutes behind watermark)


@register(
    "pipeline_url_canonicalize",
    section="2.9",
    oracle="""
    WITH raw AS (
      SELECT doc_id, n_chars,
             doc_id % 100 AS k, doc_id % 4 AS m,
             'https://' || source || '.example.com/page/' ||
               CAST(doc_id % 100 AS VARCHAR) AS base,
             source
      FROM documents),
    u AS (
      SELECT doc_id, n_chars,
             CASE m
               WHEN 0 THEN base
               WHEN 1 THEN 'HTTPS://' || UPPER(source) ||
                           '.EXAMPLE.COM:443/page/' ||
                           CAST(k AS VARCHAR) || '/'
               WHEN 2 THEN base || '?utm_source=feed'
               ELSE base || '?id=' || CAST(k AS VARCHAR) ||
                    '&utm_medium=mail#frag'
             END AS url
      FROM raw),
    c AS (
      SELECT doc_id, n_chars,
             LOWER(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(url, '#.*$', ''),
                     '[?&]utm_[a-z]+=[a-z]+', ''),
                   ':443/', '/'),
                 '/$', '')) AS canonical_url
      FROM u)
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM c GROUP BY canonical_url
    """,
    notes="crawl-frontier dedup by canonical URL: variants differing in "
    "scheme/host case, an explicit :443 default port, utm_* tracking "
    "params, fragments, or a trailing slash all collapse to one key. "
    "The URL variants are synthesized deterministically from doc_id "
    "(the fixture has no url column — same device as fn_url); the "
    "canonicalizer itself is the real operator: four regexp rewrites "
    "+ lower, all per-row, then a single hash-groupBy on the canonical "
    "string. Keep-rule is min(doc_id) (first crawl wins)",
)
def pipeline_url_canonicalize(spark, sf_dir):
    """The shuffle key is the ~60-byte canonical URL and the payload is
    two ints — at 100 TB this is a metadata-sized exchange no matter how
    large the documents are, because bodies never enter the plan."""
    d = table(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 100).cast("string")
    m = F.col("doc_id") % 4
    base = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/page/"),
        k,
    )
    url = (
        F.when(m == 0, base)
        .when(
            m == 1,
            F.concat(
                F.lit("HTTPS://"),
                F.upper(F.col("source")),
                F.lit(".EXAMPLE.COM:443/page/"),
                k,
                F.lit("/"),
            ),
        )
        .when(m == 2, F.concat(base, F.lit("?utm_source=feed")))
        .otherwise(
            F.concat(base, F.lit("?id="), k, F.lit("&utm_medium=mail#frag"))
        )
    )
    canon = F.lower(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(url, "#.*$", ""),
                    "[?&]utm_[a-z]+=[a-z]+",
                    "",
                ),
                ":443/",
                "/",
            ),
            "/$",
            "",
        )
    )
    return (
        d.select(
            canon.alias("canonical_url"),
            F.col("doc_id"),
            F.col("n_chars"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "ts_stl_decompose",
    section="2.10",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(datediff('day', DATE '1995-01-01', o_orderdate)
                  AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1, 2),
    tr AS (
      SELECT series, d, v,
             CAST(SUM(v) OVER w AS BIGINT) AS s7,
             CAST(COUNT(*) OVER w AS BIGINT) AS c7
      FROM daily
      WINDOW w AS (PARTITION BY series ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    t AS (
      SELECT series, d, v,
             CAST(FLOOR(CAST(s7 AS DOUBLE) / 7.0) AS BIGINT) AS trend_c,
             CAST(v - CAST(FLOOR(CAST(s7 AS DOUBLE) / 7.0) AS BIGINT)
                  AS BIGINT) AS detr
      FROM tr WHERE c7 = 7),
    se AS (
      SELECT series, d % 7 AS dow,
             CAST(SUM(detr) AS BIGINT) AS sd,
             CAST(COUNT(*) AS BIGINT) AS cd
      FROM t GROUP BY 1, 2),
    r AS (
      SELECT t.series, t.d, t.v, t.trend_c,
             CAST(sd AS DOUBLE) / CAST(cd AS DOUBLE) AS seas,
             CAST(t.detr AS DOUBLE)
               - CAST(sd AS DOUBLE) / CAST(cd AS DOUBLE) AS resid
      FROM t JOIN se ON se.series = t.series AND se.dow = t.d % 7),
    md AS (
      SELECT series, quantile_disc(ABS(resid), 0.5) AS mad
      FROM r GROUP BY series)
    SELECT r.series, r.d, r.v, r.trend_c,
           FLOOR(seas * 10000.0) / 10000.0 AS seas_4,
           FLOOR(resid * 10000.0) / 10000.0 AS resid_4,
           ABS(resid) > 3.0 * mad AS is_anomaly
    FROM r JOIN md ON md.series = r.series
    """,
    notes="STL-lite additive decomposition per order-priority series: "
    "trend = centered 7-row moving average over the daily grid (rows "
    "with a full window only), seasonal = day-of-week mean of the "
    "detrended values, residual anomalies gated at 3x the per-series "
    "MEDIAN absolute residual (a discrete percentile — an observed "
    "value, no interpolation). Exactness: daily cents and the trend "
    "floor are BIGINT; seasonal/residual are one IEEE divide + subtract "
    "on exactly-representable ints, bit-identical across engines, so "
    "the 4-dp floors and the MAD gate compare identical doubles",
)
def ts_stl_decompose(spark, sf_dir):
    """The corpus collapses to (series, day) in one keyed aggregate;
    every later pass (trend window, dow means, MAD medians) runs on the
    calendar-bounded grid, so cost is flat in corpus size."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = Window.partitionBy("series").orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "series",
        "d",
        "v",
        F.sum("v").over(w).cast("long").alias("s7"),
        F.count("*").over(w).cast("long").alias("c7"),
    )
    t = tr.where(F.col("c7") == 7).select(
        "series",
        "d",
        "v",
        F.floor(F.col("s7").cast("double") / 7.0).cast("long").alias(
            "trend_c"
        ),
    )
    t = t.withColumn("detr", (F.col("v") - F.col("trend_c")).cast("long"))
    se = t.groupBy(
        F.col("series").alias("se_series"), (F.col("d") % 7).alias("dow")
    ).agg(
        F.sum("detr").cast("long").alias("sd"),
        F.count("*").cast("long").alias("cd"),
    )
    r = t.join(
        F.broadcast(se),
        (F.col("series") == F.col("se_series"))
        & ((F.col("d") % 7) == F.col("dow")),
    ).select(
        "series",
        "d",
        "v",
        "trend_c",
        (F.col("sd").cast("double") / F.col("cd").cast("double")).alias(
            "seas"
        ),
        (
            F.col("detr").cast("double")
            - F.col("sd").cast("double") / F.col("cd").cast("double")
        ).alias("resid"),
    )
    md = r.groupBy("series").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(resid))"
        ).alias("mad")
    )
    return r.join(F.broadcast(md), "series").select(
        "series",
        "d",
        "v",
        "trend_c",
        (F.floor(F.col("seas") * 10000.0) / 10000.0).alias("seas_4"),
        (F.floor(F.col("resid") * 10000.0) / 10000.0).alias("resid_4"),
        (F.abs(F.col("resid")) > 3.0 * F.col("mad")).alias("is_anomaly"),
    )


@register(
    "evt_funnel_steps",
    section="2.10",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(ts_us) AS t2
           FROM e JOIN s1 USING (user_id)
           WHERE event_type = 'click' AND ts_us >= t1
             AND ts_us - t1 <= {_STEP_WINDOW_US}
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(ts_us) AS t3
           FROM e JOIN s2 USING (user_id)
           WHERE event_type = 'purchase' AND ts_us >= t2
             AND ts_us - t2 <= {_STEP_WINDOW_US}
           GROUP BY e.user_id)
    SELECT s1.user_id, t1, t2, t3,
           CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS furthest_step
    FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
            LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
    notes="ordered 3-step funnel (view -> click -> purchase) where each "
    "step must land within 24 h of the previous step's FIRST qualifying "
    "event — the per-step-window semantics product funnels actually "
    "use (evt_funnel is the unbounded 2-step base case). Each step is "
    "one keyed min-aggregate over a filtered slice joined to the "
    "previous step's user table; step tables shrink monotonically and "
    "are user-level (broadcastable), so the event log is scanned, "
    "never sorted per user",
)
def evt_funnel_steps(spark, sf_dir):
    """Chained earliest-next-within-window aggregates: step k's table is
    a keyed min over (events filtered to step k's type) semi-joined to
    step k-1 — three shuffles on user_id, all combiner-friendly, and the
    join sides after step 1 are user-cardinality (broadcast at scale)."""
    ev = table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type", epoch_us("ts").alias("ts_us"))
    s1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "click")
        .join(F.broadcast(s1.select("user_id", "t1")), "user_id")
        .where(
            (F.col("ts_us") >= F.col("t1"))
            & (F.col("ts_us") - F.col("t1") <= _STEP_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(F.broadcast(s2.select("user_id", "t2")), "user_id")
        .where(
            (F.col("ts_us") >= F.col("t2"))
            & (F.col("ts_us") - F.col("t2") <= _STEP_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t1",
            "t2",
            "t3",
            (
                F.lit(1)
                + F.when(F.col("t2").isNotNull(), 1).otherwise(0)
                + F.when(F.col("t3").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("furthest_step"),
        )
    )


@register(
    "profile_freshness",
    section="2.4",
    oracle=f"""
    WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
    g AS (SELECT event_type, ts_us,
                 ts_us - LAG(ts_us) OVER (PARTITION BY event_type
                                          ORDER BY ts_us) AS gap_us
          FROM e),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(ts_us) AS BIGINT) AS last_ts_us,
             quantile_disc(gap_us, 0.95) AS p95_gap_us
      FROM g GROUP BY event_type),
    wm AS (SELECT CAST(MAX(ts_us) AS BIGINT) AS corpus_max FROM e)
    SELECT event_type, n, last_ts_us, p95_gap_us,
           CAST((corpus_max - last_ts_us) // 60000000 AS BIGINT)
             AS staleness_min,
           (corpus_max - last_ts_us) // 60000000 > {_STALE_MIN}
             AS is_stale
    FROM agg CROSS JOIN wm
    """,
    notes="per-stream freshness audit: last arrival, minutes behind the "
    "corpus watermark, and the p95 inter-arrival gap as a DISCRETE "
    "percentile (an actually-observed gap, exact in both engines). One "
    "scan feeds both the keyed lag window and the 1-row corpus "
    "watermark (broadcast back); staleness is integer-floored minutes "
    "so the alert flag has no float boundary",
)
def profile_freshness(spark, sf_dir):
    """The lag window shuffles once on the stream key; the watermark is
    a 1-row aggregate broadcast back — the audit stays two exchanges of
    (key, ts) pairs regardless of corpus size."""
    ev = table(spark, sf_dir, "events")
    e = ev.select("event_type", epoch_us("ts").alias("ts_us"))
    wl = Window.partitionBy("event_type").orderBy("ts_us")
    g = e.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(wl))
    agg = g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.max("ts_us").cast("long").alias("last_ts_us"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY gap_us)")
        .cast("long")
        .alias("p95_gap_us"),
    )
    wm = e.agg(F.max("ts_us").cast("long").alias("corpus_max"))
    stale_min = F.floor(
        (F.col("corpus_max") - F.col("last_ts_us")) / 60_000_000
    ).cast("long")
    return agg.crossJoin(F.broadcast(wm)).select(
        "event_type",
        "n",
        "last_ts_us",
        "p95_gap_us",
        stale_min.alias("staleness_min"),
        (stale_min > _STALE_MIN).alias("is_stale"),
    )


@register(
    "ts_seasonal_strength",
    section="2.10",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS series,
             CAST(datediff('day', DATE '1995-01-01', o_orderdate)
                  AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1, 2),
    tr AS (
      SELECT series, d, v,
             CAST(SUM(v) OVER w AS BIGINT) AS s7,
             CAST(COUNT(*) OVER w AS BIGINT) AS c7
      FROM daily
      WINDOW w AS (PARTITION BY series ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    t AS (
      SELECT series, d, v,
             CAST(v - CAST(FLOOR(CAST(s7 AS DOUBLE) / 7.0) AS BIGINT)
                  AS BIGINT) AS detr
      FROM tr WHERE c7 = 7),
    se AS (
      SELECT series, d % 7 AS dow,
             CAST(SUM(detr) AS BIGINT) AS sd,
             CAST(COUNT(*) AS BIGINT) AS cd
      FROM t GROUP BY 1, 2),
    r AS (
      SELECT t.series, t.d,
             CAST(t.detr AS DOUBLE) AS detr,
             CAST(t.detr AS DOUBLE)
               - CAST(sd AS DOUBLE) / CAST(cd AS DOUBLE) AS resid
      FROM t JOIN se ON se.series = t.series AND se.dow = t.d % 7),
    f AS (
      SELECT series, CAST(COUNT(*) AS BIGINT) AS n_days,
             list_reduce(list_prepend(0.0, list(resid ORDER BY d)),
                         (a, b) -> a + b) AS sr,
             list_reduce(list_prepend(0.0, list(resid * resid ORDER BY d)),
                         (a, b) -> a + b) AS srr,
             list_reduce(list_prepend(0.0, list(detr ORDER BY d)),
                         (a, b) -> a + b) AS sdt,
             list_reduce(list_prepend(0.0, list(detr * detr ORDER BY d)),
                         (a, b) -> a + b) AS sdd
      FROM r GROUP BY series)
    SELECT series, n_days,
           FLOOR(GREATEST(0.0,
             1.0 - (srr - sr * sr / n_days) / (sdd - sdt * sdt / n_days))
             * 1e4) / 1e4 AS seasonal_strength
    FROM f WHERE sdd - sdt * sdt / n_days > 0
    """,
    notes="seasonal-strength diagnostic (Hyndman's F_s = max(0, 1 - "
    "var(remainder)/var(detrended)) ) on the ts_stl_decompose "
    "components: how much of the non-trend variation the day-of-week "
    "pattern explains — the decide-whether-to-model-seasonality "
    "number behind forecast routing. Every fold (residual and "
    "detrended first/second moments) runs over the calendar-bounded "
    "grid in day order with 0.0 seeds, so both engines produce the "
    "identical doubles; the ratio is floored 4 dp. Shares the STL "
    "corpus pass shape: one keyed aggregate, grid-sized after",
)
def ts_seasonal_strength(spark, sf_dir):
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("series"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = Window.partitionBy("series").orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "series",
        "d",
        "v",
        F.sum("v").over(w).cast("long").alias("s7"),
        F.count("*").over(w).cast("long").alias("c7"),
    )
    t = tr.where(F.col("c7") == 7).select(
        "series",
        "d",
        (
            F.col("v")
            - F.floor(F.col("s7").cast("double") / 7.0).cast("long")
        )
        .cast("long")
        .alias("detr"),
    )
    se = t.groupBy(
        F.col("series").alias("se_series"), (F.col("d") % 7).alias("dow")
    ).agg(
        F.sum("detr").cast("long").alias("sd"),
        F.count("*").cast("long").alias("cd"),
    )
    r = t.join(
        F.broadcast(se),
        (F.col("series") == F.col("se_series"))
        & ((F.col("d") % 7) == F.col("dow")),
    ).select(
        "series",
        "d",
        F.col("detr").cast("double").alias("detrd"),
        (
            F.col("detr").cast("double")
            - F.col("sd").cast("double") / F.col("cd").cast("double")
        ).alias("resid"),
    )

    def fold(col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("d", col.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        )

    f = r.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        fold(F.col("resid")).alias("sr"),
        fold(F.col("resid") * F.col("resid")).alias("srr"),
        fold(F.col("detrd")).alias("sdt"),
        fold(F.col("detrd") * F.col("detrd")).alias("sdd"),
    )
    var_r = F.col("srr") - F.col("sr") * F.col("sr") / F.col("n_days")
    var_d = F.col("sdd") - F.col("sdt") * F.col("sdt") / F.col("n_days")
    return f.where(var_d > 0).select(
        "series",
        "n_days",
        (
            F.floor(F.greatest(F.lit(0.0), 1.0 - var_r / var_d) * 1e4) / 1e4
        ).alias("seasonal_strength"),
    )
