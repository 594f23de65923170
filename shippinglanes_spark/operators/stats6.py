"""Round-6 statistics pack (SURVEY §2.4 extensions): distribution-shape
tests, multiple-testing correction, and empirical-Bayes shrinkage.

Cross-engine float discipline (FIXTURES.md): every per-row quantity is an
exact integer; higher-moment sums that would overflow BIGINT per row
(cents**4 reaches 9.8e18 at the observed value ceiling of 560.21) go
through Spark DECIMAL(38,0) vs DuckDB HUGEINT — both exact 128-bit-class
integer sums, order-independent, identical when cast to DOUBLE. The only
float arithmetic is a scalar expression tree over those exact group
totals, written identically in both engines, then FLOORed at 6 dp.

Scale notes (100 TB): every query here is one keyed aggregate (or one
keyed aggregate + one bounded reduce); nothing collects, nothing joins
beyond broadcast-size group tables. agg_bh_fdr's final window runs over
one row per event TYPE (bounded domain, ~tens), not per event.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

# logistic approximation of the standard normal CDF (Bowling et al. 2009):
# Phi(z) ~= 1 / (1 + exp(-(0.07056 z^3 + 1.5976 z))), |err| < 1.4e-4.
# Spec constants embedded as identical repr literals in both engines
# (neither has erf/invnorm) — the agg_power_analysis discipline.
_PHI_A = 0.07056
_PHI_B = 1.5976
_BH_ALPHA = 0.05


def _cents_events(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "user_id",
            "ts",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )


@register(
    "agg_jarque_bera",
    section="2.4",
    oracle="""
    WITH x AS (SELECT event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS c
               FROM events WHERE value IS NOT NULL),
    s AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2,
                 CAST(SUM(CAST(c AS HUGEINT) * c * c) AS DOUBLE) AS s3,
                 CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) AS s4
          FROM x GROUP BY event_type),
    m AS (SELECT event_type, n, s1 / n AS mu, s2 / n AS r2,
                 s3 / n AS r3, s4 / n AS r4
          FROM s WHERE n >= 8),
    c AS (SELECT event_type, n,
                 r2 - mu * mu AS m2,
                 r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
                 r4 - 4 * mu * r3 + 6 * mu * mu * r2
                    - 3 * mu * mu * mu * mu AS m4
          FROM m),
    g AS (SELECT event_type, n,
                 m3 / POWER(m2, 1.5) AS skew,
                 m4 / (m2 * m2) - 3.0 AS exkurt
          FROM c WHERE m2 > 0)
    SELECT event_type, n,
           FLOOR(skew * 1e6) / 1e6 AS skewness,
           FLOOR(exkurt * 1e6) / 1e6 AS excess_kurtosis,
           FLOOR(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0) * 1e6)
             / 1e6 AS jb_stat
    FROM g ORDER BY event_type
    """,
    notes="Jarque-Bera normality test per event type: skewness and "
    "excess kurtosis from raw power sums S1..S4, JB = n/6 (g1^2 + "
    "g2^2/4). The power sums are exact 128-bit integer sums "
    "(DECIMAL(38,0) vs HUGEINT — cents^4 per row is ~9.8e18, past "
    "BIGINT), so the float expression tree sees identical scalar "
    "inputs per group in both engines; FLOOR 6 dp. One keyed "
    "aggregate at any scale; deliberately avoids the engines' own "
    "skewness()/kurtosis() builtins, which differ in formulation "
    "(sample-vs-population corrections)",
)
def agg_jarque_bera(spark, sf_dir):
    x = _cents_events(spark, sf_dir)
    c = F.col("cents").cast("decimal(38,0)")
    s = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("double").alias("s1"),
        F.sum(c * F.col("cents")).cast("double").alias("s2"),
        F.sum(c * F.col("cents") * F.col("cents")).cast("double").alias("s3"),
        F.sum(c * F.col("cents") * F.col("cents") * F.col("cents"))
        .cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    r2 = F.col("s2") / n
    r3 = F.col("s3") / n
    r4 = F.col("s4") / n
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
    skew = m3 / F.pow(m2, F.lit(1.5))
    exk = m4 / (m2 * m2) - 3.0
    jb = n / F.lit(6.0) * (skew * skew + exk * exk / 4.0)
    return (
        s.where(n >= 8)
        .where(m2 > 0)
        .select(
            "event_type",
            "n",
            (F.floor(skew * 1e6) / 1e6).alias("skewness"),
            (F.floor(exk * 1e6) / 1e6).alias("excess_kurtosis"),
            (F.floor(jb * 1e6) / 1e6).alias("jb_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_theil",
    section="2.4",
    oracle="""
    WITH u AS (SELECT event_type, user_id,
                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                           AS BIGINT) AS x
               FROM events WHERE value IS NOT NULL
               GROUP BY event_type, user_id),
    g AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS t
          FROM u GROUP BY event_type),
    q AS (SELECT u.event_type,
                 CAST(FLOOR(
                   (CAST(u.x AS DOUBLE) * g.n / g.t)
                   * LN(CAST(u.x AS DOUBLE) * g.n / g.t) * 1e6)
                 AS BIGINT) AS term
          FROM u JOIN g USING (event_type)
          WHERE u.x > 0 AND g.t > 0)
    SELECT q.event_type, g.n AS n_users,
           FLOOR(CAST(SUM(q.term) AS DOUBLE) / g.n) / 1e6 AS theil_t
    FROM q JOIN g USING (event_type)
    GROUP BY q.event_type, g.n
    ORDER BY q.event_type
    """,
    notes="Theil T inequality index of per-user spend within each event "
    "type: T = (1/n) sum (x/mu) ln(x/mu). Each user's term is FLOORed "
    "to a 1e-6 integer BEFORE summing (the emb_isotropy quantization "
    "pattern), so the corpus-sized sum is an exact BIGINT in both "
    "engines — sum of terms is bounded by n * ln(n) * 1e6 (since "
    "sum(x/mu) = n), ~2e16 even at a billion users. The ratio x/mu is "
    "computed as (double(x) * n) / t in BOTH engines (identical op "
    "order; x*n as an integer could overflow, double-first cannot). "
    "Complements agg_gini (rank-based) with the decomposable entropy "
    "index; two keyed aggregates + one broadcast join at any scale",
)
def agg_theil(spark, sf_dir):
    ev = _cents_events(spark, sf_dir)
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum("cents").cast("long").alias("x")
    )
    g = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("t"),
    )
    r = F.col("x").cast("double") * F.col("n") / F.col("t")
    q = (
        u.join(F.broadcast(g), "event_type")
        .where((F.col("x") > 0) & (F.col("t") > 0))
        .select(
            "event_type",
            F.floor(r * F.log(r) * 1e6).cast("long").alias("term"),
        )
    )
    return (
        q.groupBy("event_type")
        .agg(F.sum("term").cast("long").alias("s"))
        .join(F.broadcast(g), "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_users"),
            (F.floor(F.col("s").cast("double") / F.col("n")) / 1e6).alias(
                "theil_t"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "agg_bh_fdr",
    section="2.4",
    oracle=f"""
    WITH e AS (SELECT event_type,
                      CAST(ts AS DATE) < DATE '2024-01-16' AS early,
                      CAST(ROUND(value * 100) AS BIGINT) >= 5000 AS hi
               FROM events WHERE value IS NOT NULL),
    t AS (SELECT event_type,
                 CAST(COUNT(*) FILTER (early) AS BIGINT) AS n1,
                 CAST(COUNT(*) FILTER (early AND hi) AS BIGINT) AS x1,
                 CAST(COUNT(*) FILTER (NOT early) AS BIGINT) AS n2,
                 CAST(COUNT(*) FILTER (NOT early AND hi) AS BIGINT) AS x2
          FROM e GROUP BY event_type),
    z AS (SELECT event_type, n1, x1, n2, x2,
                 (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                 / SQRT((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)) AS zstat
          FROM t WHERE n1 > 0 AND n2 > 0
            AND x1 + x2 > 0 AND x1 + x2 < n1 + n2),
    p AS (SELECT event_type, n1, x1, n2, x2, zstat,
                 2 * (1 - 1 / (1 + EXP(-({_PHI_A!r} * ABS(zstat)
                                          * ABS(zstat) * ABS(zstat)
                                        + {_PHI_B!r} * ABS(zstat)))))
                   AS pval
          FROM z),
    r AS (SELECT *,
                 CAST(ROW_NUMBER() OVER (ORDER BY pval, event_type)
                      AS BIGINT) AS k,
                 CAST(COUNT(*) OVER () AS BIGINT) AS m
          FROM p),
    d AS (SELECT *,
                 MAX(CASE WHEN pval <= k * {_BH_ALPHA!r} / m
                          THEN k ELSE 0 END) OVER () AS kmax
          FROM r)
    SELECT event_type, n1, x1, n2, x2,
           FLOOR(zstat * 1e6) / 1e6 AS z,
           FLOOR(pval * 1e6) / 1e6 AS p_value,
           k, CAST(k * 1000 * {_BH_ALPHA!r} / m AS DOUBLE) / 1000
                AS bh_threshold,
           CAST(CASE WHEN k <= kmax THEN 1 ELSE 0 END AS BIGINT)
             AS discovery
    FROM d ORDER BY k
    """,
    notes="Benjamini-Hochberg step-up FDR correction over the per-type "
    "two-proportion z-tests (first-half vs second-half high-value "
    "share): rank raw p ascending, reject all k <= max(k: p_k <= "
    "k*alpha/m). The normal CDF is the Bowling logistic approximation "
    "with spec constants embedded as identical repr literals in both "
    "engines (no erf anywhere); z and p are identical expression "
    "trees over exact counts, so the BH ranking compares identical "
    "doubles. The final window runs over one row per event TYPE — a "
    "bounded domain (~tens), never per event — so the OVER () frames "
    "are metadata-sized at any corpus scale",
)
def agg_bh_fdr(spark, sf_dir):
    ev = _cents_events(spark, sf_dir)
    early = F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    hi = F.col("cents") >= 5000
    t = ev.groupBy("event_type").agg(
        F.count(F.when(early, 1)).cast("long").alias("n1"),
        F.count(F.when(early & hi, 1)).cast("long").alias("x1"),
        F.count(F.when(~early, 1)).cast("long").alias("n2"),
        F.count(F.when(~early & hi, 1)).cast("long").alias("x2"),
    )
    n1, x1, n2, x2 = (F.col(c) for c in ("n1", "x1", "n2", "x2"))
    pool = (x1 + x2).cast("double") / (n1 + n2)
    zstat = (x1.cast("double") / n1 - x2.cast("double") / n2) / F.sqrt(
        pool * (1 - pool) * (1.0 / n1 + 1.0 / n2)
    )
    z = (
        t.where((n1 > 0) & (n2 > 0) & (x1 + x2 > 0) & (x1 + x2 < n1 + n2))
        .withColumn("zstat", zstat)
    )
    az = F.abs(F.col("zstat"))
    pval = 2 * (1 - 1 / (1 + F.exp(-(_PHI_A * az * az * az + _PHI_B * az))))
    p = z.withColumn("pval", pval)
    # bounded domain: one row per event type — the global windows below
    # are over ~tens of rows, not data-sized
    r = p.withColumn(
        "k",
        F.row_number().over(W.orderBy("pval", "event_type")).cast("long"),
    ).withColumn("m", F.count(F.lit(1)).over(W.partitionBy()).cast("long"))
    d = r.withColumn(
        "kmax",
        F.max(
            F.when(
                F.col("pval") <= F.col("k") * _BH_ALPHA / F.col("m"),
                F.col("k"),
            ).otherwise(0)
        ).over(W.partitionBy()),
    )
    return d.select(
        "event_type",
        "n1",
        "x1",
        "n2",
        "x2",
        (F.floor(F.col("zstat") * 1e6) / 1e6).alias("z"),
        (F.floor(F.col("pval") * 1e6) / 1e6).alias("p_value"),
        "k",
        (
            (F.col("k") * 1000 * _BH_ALPHA / F.col("m")).cast("double")
            / 1000
        ).alias("bh_threshold"),
        F.when(F.col("k") <= F.col("kmax"), 1)
        .otherwise(0)
        .cast("long")
        .alias("discovery"),
    ).orderBy("k")


@register(
    "agg_eb_shrinkage",
    section="2.4",
    oracle="""
    WITH pr AS (SELECT l_partkey,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(COUNT(*) FILTER (l_returnflag = 'R')
                            AS BIGINT) AS x
                FROM lineitem GROUP BY l_partkey),
    rp AS (SELECT l_partkey, n, x,
                  CAST(x * 1000000 // n AS BIGINT) AS r_ppm
           FROM pr),
    mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
                   CAST(SUM(r_ppm) AS BIGINT) AS s,
                   CAST(SUM(CAST(r_ppm AS HUGEINT) * r_ppm) AS DOUBLE)
                     AS ss
            FROM rp),
    ab AS (SELECT np,
                  (CAST(s AS DOUBLE) / np) / 1e6 AS m,
                  (ss / np - (CAST(s AS DOUBLE) / np)
                             * (CAST(s AS DOUBLE) / np)) / 1e12 AS v
           FROM mom),
    prior AS (SELECT np, m, v,
                     m * (m * (1 - m) / v - 1) AS alpha,
                     (1 - m) * (m * (1 - m) / v - 1) AS beta
              FROM ab WHERE v > 0 AND m * (1 - m) > v),
    sh AS (SELECT r.l_partkey, r.n, r.x,
                  CAST(r.x AS DOUBLE) / r.n AS raw,
                  (r.x + p.alpha) / (r.n + p.alpha + p.beta) AS shrunk,
                  p.alpha, p.beta
           FROM rp r CROSS JOIN prior p)
    SELECT l_partkey, n, x,
           FLOOR(raw * 1e6) / 1e6 AS raw_rate,
           FLOOR(shrunk * 1e6) / 1e6 AS shrunk_rate,
           FLOOR(alpha * 1e4) / 1e4 AS prior_alpha,
           FLOOR(beta * 1e4) / 1e4 AS prior_beta
    FROM sh
    ORDER BY shrunk DESC, l_partkey LIMIT 20
    """,
    notes="empirical-Bayes (beta-binomial) shrinkage of per-part return "
    "rates: fit the prior by method of moments on the per-part raw "
    "rates, then report each part's posterior-mean rate (x+a)/(n+a+b) "
    "— the small-n parts pull toward the grand mean instead of "
    "topping the leaderboard on 1-for-1 flukes. Rates are integerized "
    "to ppm BEFORE the moment sums (exact BIGINT; the ppm^2 sum goes "
    "through HUGEINT/DECIMAL(38,0) for 100TB headroom), so the MoM "
    "prior is an identical scalar in both engines; ordering for the "
    "top-20 compares identically-computed doubles with a partkey "
    "tiebreak. Plan: one keyed aggregate + 1-row reduce + broadcast "
    "scalar join + TakeOrderedAndProject — no global sort",
)
def agg_eb_shrinkage(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("l_returnflag") == "R", 1))
        .cast("long")
        .alias("x"),
    )
    rp = pr.withColumn(
        "r_ppm", F.expr("CAST(x * 1000000 div n AS BIGINT)")
    )
    mom = rp.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("r_ppm").cast("long").alias("s"),
        F.sum(F.col("r_ppm").cast("decimal(38,0)") * F.col("r_ppm"))
        .cast("double")
        .alias("ss"),
    )
    m = (F.col("s").cast("double") / F.col("np")) / 1e6
    v = (
        F.col("ss") / F.col("np")
        - (F.col("s").cast("double") / F.col("np"))
        * (F.col("s").cast("double") / F.col("np"))
    ) / 1e12
    prior = (
        mom.select(
            F.col("np"),
            m.alias("m"),
            v.alias("v"),
        )
        .where((F.col("v") > 0) & (F.col("m") * (1 - F.col("m")) > F.col("v")))
        .select(
            "np",
            "m",
            "v",
            (
                F.col("m")
                * (F.col("m") * (1 - F.col("m")) / F.col("v") - 1)
            ).alias("alpha"),
            (
                (1 - F.col("m"))
                * (F.col("m") * (1 - F.col("m")) / F.col("v") - 1)
            ).alias("beta"),
        )
    )
    sh = rp.crossJoin(F.broadcast(prior)).select(
        "l_partkey",
        "n",
        "x",
        (F.col("x").cast("double") / F.col("n")).alias("raw"),
        (
            (F.col("x") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta"))
        ).alias("shrunk"),
        "alpha",
        "beta",
    )
    return (
        sh.orderBy(F.col("shrunk").desc(), "l_partkey")
        .limit(20)
        .select(
            "l_partkey",
            "n",
            "x",
            (F.floor(F.col("raw") * 1e6) / 1e6).alias("raw_rate"),
            (F.floor(F.col("shrunk") * 1e6) / 1e6).alias("shrunk_rate"),
            (F.floor(F.col("alpha") * 1e4) / 1e4).alias("prior_alpha"),
            (F.floor(F.col("beta") * 1e4) / 1e4).alias("prior_beta"),
        )
    )


# Fisher's exact test: log-factorial spine size (covers any margin the
# calendar-bounded daily 2x2 can produce) and the standard relative
# tolerance for the two-sided "as extreme" comparison (R/scipy use
# 1e-7; embedded identically in both engines so the included-k set is
# decided on the same doubles).
_FISHER_SPINE = 4096
_FISHER_RELTOL = 1.0000001


@register(
    "agg_fisher_exact",
    section="2.4",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS cnt
               FROM events GROUP BY 1),
    dm AS (SELECT di, cnt,
                  ((di + 3) % 7) >= 5 AS wkend
           FROM d),
    med AS (SELECT cnt AS m FROM (
              SELECT cnt,
                     ROW_NUMBER() OVER (ORDER BY cnt, di) AS rn,
                     COUNT(*) OVER () AS nd
              FROM dm) WHERE rn = (nd + 1) // 2),
    tab AS (SELECT
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(COUNT(*) FILTER (wkend) AS BIGINT) AS r1,
              CAST(COUNT(*) FILTER (NOT wkend) AS BIGINT) AS r2,
              CAST(COUNT(*) FILTER (cnt > m) AS BIGINT) AS c1,
              CAST(COUNT(*) FILTER (wkend AND cnt > m) AS BIGINT) AS a,
              CAST(COUNT(*) FILTER (wkend AND cnt <= m) AS BIGINT) AS b,
              CAST(COUNT(*) FILTER (NOT wkend AND cnt > m) AS BIGINT) AS c,
              CAST(COUNT(*) FILTER (NOT wkend AND cnt <= m) AS BIGINT) AS dd
            FROM dm CROSS JOIN med),
    tabg AS (SELECT * FROM tab
             WHERE CASE WHEN n < {_FISHER_SPINE} THEN TRUE
                   ELSE error('fisher margin n exceeds log-factorial spine')
                   END),
    lft AS (SELECT i,
                   SUM(CASE WHEN i = 0 THEN 0.0 ELSE LN(i) END)
                     OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS lf
            FROM range(0, {_FISHER_SPINE}) t(i)),
    lfa AS (SELECT list(lf ORDER BY i) AS arr FROM lft),
    ks AS (SELECT t.*, lfa.arr, k.k
           FROM tabg t CROSS JOIN lfa
           CROSS JOIN range(0, {_FISHER_SPINE}) k(k)
           WHERE k.k >= GREATEST(0, t.c1 - t.r2)
             AND k.k <= LEAST(t.r1, t.c1)),
    lp AS (SELECT *,
                  arr[CAST(r1 AS INT) + 1] - arr[CAST(k AS INT) + 1]
                    - arr[CAST(r1 - k AS INT) + 1]
                  + arr[CAST(r2 AS INT) + 1] - arr[CAST(c1 - k AS INT) + 1]
                    - arr[CAST(r2 - c1 + k AS INT) + 1]
                  - (arr[CAST(n AS INT) + 1] - arr[CAST(c1 AS INT) + 1]
                     - arr[CAST(n - c1 AS INT) + 1]) AS l
           FROM ks),
    obs AS (SELECT l AS l0 FROM lp WHERE k = a),
    ps AS (SELECT list_reduce(list_prepend(0.0,
             list(CASE WHEN lp.l <= obs.l0 + LN({_FISHER_RELTOL!r})
                       THEN EXP(lp.l) ELSE 0.0 END ORDER BY lp.k)),
             (x, y) -> x + y) AS p
           FROM lp CROSS JOIN obs)
    SELECT t.n AS n_days, t.r1 AS weekend_days, t.c1 AS high_days, t.a,
           FLOOR(LEAST(1.0, ps.p) * 1e6) / 1e6 AS p_two_sided,
           CASE WHEN t.b * t.c > 0
                THEN FLOOR(CAST(t.a * t.dd AS DOUBLE)
                           / (t.b * t.c) * 1e6) / 1e6 END AS odds_ratio
    FROM tab t CROSS JOIN ps
    """,
    notes="Fisher's EXACT test on the calendar 2x2 (weekend day x "
    "above-median purchase volume): the hypergeometric tail summed "
    "over every table as extreme as observed. Log-factorials come "
    "from ONE running-sum spine (4096 rows, a constant — margins are "
    "day counts, calendar-bounded at any corpus scale) evaluated in "
    "identical sequential frame order by both engines, then collected "
    "into an array for O(1) lookups — no gamma function, which "
    "neither engine's SQL exposes portably. The 'as extreme' "
    "comparison uses the standard 1e-7 relative tolerance embedded "
    "identically; the final sum is a k-ordered fold. The small-count "
    "companion to agg_chisq_independence, which is asymptotic and "
    "lies for sparse tables. Corpus work = one keyed daily aggregate",
)
def agg_fisher_exact(spark, sf_dir):
    import math

    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("cnt")
    )
    dm = d.select("di", "cnt", (((F.col("di") + 3) % 7) >= 5).alias("wkend"))
    wmed = W.orderBy("cnt", "di")
    med = (
        dm.select(
            "cnt",
            F.row_number().over(wmed).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("nd"),
        )
        .where(F.col("rn") == F.expr("(nd + 1) div 2"))
        .select(F.col("cnt").alias("m"))
    )
    hi = F.col("cnt") > F.col("m")
    tab = dm.crossJoin(F.broadcast(med)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("wkend"), 1)).cast("long").alias("r1"),
        F.count(F.when(~F.col("wkend"), 1)).cast("long").alias("r2"),
        F.count(F.when(hi, 1)).cast("long").alias("c1"),
        F.count(F.when(F.col("wkend") & hi, 1)).cast("long").alias("a"),
        F.count(F.when(F.col("wkend") & ~hi, 1)).cast("long").alias("b"),
        F.count(F.when(~F.col("wkend") & hi, 1)).cast("long").alias("c"),
        F.count(F.when(~F.col("wkend") & ~hi, 1)).cast("long").alias("dd"),
    ).where(
        # margins past the spine must FAIL LOUDLY, not NULL silently:
        # element_at past the array end would turn the p-value NULL.
        # A filter (not a projected column) so pruning can't drop it.
        F.assert_true(
            F.col("n") < F.lit(_FISHER_SPINE),
            F.lit("fisher margin n exceeds log-factorial spine"),
        ).isNull()
    )
    # constant-size spine: the running sum is a single 4096-row task
    spine = spark.range(0, _FISHER_SPINE).select(F.col("id").alias("i"))
    lft = spine.select(
        "i",
        F.sum(F.when(F.col("i") == 0, 0.0).otherwise(F.log("i")))
        .over(W.orderBy("i").rowsBetween(W.unboundedPreceding, 0))
        .alias("lf"),
    )
    lfa = lft.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "lf"))),
            lambda r: r["lf"],
        ).alias("arr")
    )
    ks = (
        tab.crossJoin(F.broadcast(lfa))
        .crossJoin(F.broadcast(spine.select(F.col("i").alias("k"))))
        .where(
            (F.col("k") >= F.greatest(F.lit(0), F.col("c1") - F.col("r2")))
            & (F.col("k") <= F.least(F.col("r1"), F.col("c1")))
        )
    )

    def lf(col):
        return F.element_at("arr", (col + 1).cast("int"))

    lp = ks.withColumn(
        "l",
        lf(F.col("r1"))
        - lf(F.col("k"))
        - lf(F.col("r1") - F.col("k"))
        + lf(F.col("r2"))
        - lf(F.col("c1") - F.col("k"))
        - lf(F.col("r2") - F.col("c1") + F.col("k"))
        - (
            lf(F.col("n"))
            - lf(F.col("c1"))
            - lf(F.col("n") - F.col("c1"))
        ),
    ).localCheckpoint()
    obs = lp.where(F.col("k") == F.col("a")).select(F.col("l").alias("l0"))
    ps = (
        lp.crossJoin(F.broadcast(obs))
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "k",
                            F.when(
                                F.col("l")
                                <= F.col("l0") + math.log(_FISHER_RELTOL),
                                F.exp(F.col("l")),
                            )
                            .otherwise(0.0)
                            .alias("t"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, r: acc + r["t"],
            ).alias("p")
        )
    )
    return tab.crossJoin(F.broadcast(ps)).select(
        F.col("n").alias("n_days"),
        F.col("r1").alias("weekend_days"),
        F.col("c1").alias("high_days"),
        "a",
        (F.floor(F.least(F.lit(1.0), F.col("p")) * 1e6) / 1e6).alias(
            "p_two_sided"
        ),
        F.when(
            F.col("b") * F.col("c") > 0,
            F.floor(
                F.col("a").cast("double")
                * F.col("dd")
                / (F.col("b") * F.col("c"))
                * 1e6
            )
            / 1e6,
        ).alias("odds_ratio"),
    )


# Gumbel method-of-moments constants (spec literals shared by both
# engines): Euler-Mascheroni and pi.
_EULER_GAMMA = 0.5772156649015329
_PI = 3.141592653589793
_EV_RETURN_T = 100  # return period in blocks (days)


@register(
    "agg_extreme_value",
    section="2.4",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(MAX(CAST(ROUND(value * 100) AS BIGINT))
                           AS BIGINT) AS mx
               FROM events
               WHERE event_type = 'purchase' AND value IS NOT NULL
               GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(mx) AS BIGINT) AS s1,
                 CAST(SUM(CAST(mx AS HUGEINT) * mx) AS DOUBLE) AS s2
          FROM d),
    mom AS (SELECT n,
                   CAST(s1 AS DOUBLE) / n AS m,
                   s2 / n - (CAST(s1 AS DOUBLE) / n)
                            * (CAST(s1 AS DOUBLE) / n) AS v
            FROM s WHERE n >= 5),
    fit AS (SELECT n, m, v,
                   SQRT(6.0 * v) / {_PI!r} AS beta,
                   m - {_EULER_GAMMA!r} * (SQRT(6.0 * v) / {_PI!r}) AS mu
            FROM mom WHERE v > 0)
    SELECT n AS n_blocks,
           FLOOR(mu * 1e4) / 1e4 AS gumbel_mu,
           FLOOR(beta * 1e4) / 1e4 AS gumbel_beta,
           FLOOR((mu - (SQRT(6.0 * v) / {_PI!r})
                  * LN(-LN(1.0 - 1.0 / {_EV_RETURN_T}))) * 1e4) / 1e4
             AS return_level_{_EV_RETURN_T}
    FROM fit
    """,
    notes=f"extreme-value analysis of daily purchase maxima: Gumbel fit "
    "by method of moments (beta = s*sqrt(6)/pi, mu = m - gamma*beta, "
    "with Euler-Mascheroni and pi embedded as identical repr "
    f"literals) and the {_EV_RETURN_T}-day return level mu - beta * "
    "ln(-ln(1 - 1/T)) — the 'how big a spike should we provision "
    "for' number capacity planning and risk teams ask of any metric. "
    "Block maxima are exact integer cents (MAX is order-free); the "
    "squared-sum goes through HUGEINT/DECIMAL(38,0); the two float "
    "moments are single divisions of exact scalars. One keyed daily "
    "aggregate + a 1-row reduce at any scale. FLOOR 4 dp (cents "
    "scale)",
)
def agg_extreme_value(spark, sf_dir):
    ev = (
        table(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
    )
    d = ev.groupBy(
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT)"
        ).alias("di")
    ).agg(
        F.max(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("mx")
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx"))
        .cast("double")
        .alias("s2"),
    )
    n = F.col("n")
    m = F.col("s1").cast("double") / n
    v = F.col("s2") / n - m * m
    beta = F.sqrt(6.0 * v) / _PI
    mu = m - _EULER_GAMMA * beta
    rl = mu - beta * F.log(-F.log(1.0 - 1.0 / F.lit(_EV_RETURN_T)))
    return (
        s.where((n >= 5) & (v > 0))
        .select(
            n.alias("n_blocks"),
            (F.floor(mu * 1e4) / 1e4).alias("gumbel_mu"),
            (F.floor(beta * 1e4) / 1e4).alias("gumbel_beta"),
            (F.floor(rl * 1e4) / 1e4).alias(f"return_level_{_EV_RETURN_T}"),
        )
    )


_KANON_K = 5  # the privacy threshold audited against


@register(
    "profile_k_anonymity",
    section="2.12",
    oracle=f"""
    WITH g AS (SELECT c_nationkey, c_mktsegment,
                      CAST(COUNT(*) AS BIGINT) AS sz,
                      CAST(COUNT(DISTINCT
                             CAST(ROUND(c_acctbal) AS BIGINT) // 1000)
                           AS BIGINT) AS l_div
               FROM customer GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(MIN(sz) AS BIGINT) AS min_class,
           CAST(COALESCE(SUM(sz) FILTER (sz < {_KANON_K}), 0) * 1000000
                // SUM(sz) AS BIGINT) AS rows_below_k_ppm,
           CAST(COALESCE(SUM(sz) FILTER (sz < {_KANON_K}), 0) AS BIGINT)
             AS rows_below_k,
           CAST(COUNT(*) FILTER (sz < {_KANON_K}) AS BIGINT)
             AS classes_below_k,
           CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
    FROM g
    """,
    notes=f"k-anonymity / l-diversity audit of the customer table under "
    "the quasi-identifier pair (nation, market segment): equivalence-"
    f"class sizes, rows and classes below k={_KANON_K}, and the "
    "minimum l-diversity of the banded account balance (distinct "
    "1000-unit bands per class — the sensitive attribute a linker "
    "would learn). The governance gate run before any record-level "
    "export: min_class tells you the strongest re-identification "
    "attack, min_l_diversity whether a class leaks its sensitive "
    "value even without re-identification. One keyed aggregate + a "
    "bounded class-table reduce at any scale (classes are QI-"
    "cardinality, not row count). All exact integers",
)
def profile_k_anonymity(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.countDistinct(
            F.expr("CAST(ROUND(c_acctbal) AS BIGINT) div 1000")
        )
        .cast("long")
        .alias("l_div"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.min("sz").cast("long").alias("min_class"),
        F.expr(
            f"CAST(coalesce(sum(sz) FILTER (WHERE sz < {_KANON_K}), 0)"
            " * 1000000 div sum(sz) AS BIGINT)"
        ).alias("rows_below_k_ppm"),
        F.coalesce(
            F.sum(F.when(F.col("sz") < _KANON_K, F.col("sz"))), F.lit(0)
        )
        .cast("long")
        .alias("rows_below_k"),
        F.count(F.when(F.col("sz") < _KANON_K, 1))
        .cast("long")
        .alias("classes_below_k"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
    )


_IPF_ITERS = 3
# Size gate for the driver-side raking fast path: the cell table is
# QI-cardinality (nations x segments — fixed at ANY corpus size); over
# the cap the distributed loop runs instead (the graph-family
# discipline). The margin tables' domains are subsets of the cells', so
# the one capped probe bounds all three collects.
_IPF_LOCAL_MAX = 4096

_IPF_BASE_SQL = """
    cells AS (SELECT c_nationkey AS n, c_mktsegment AS s,
                     CAST(COUNT(*) AS BIGINT) AS seed
              FROM customer GROUP BY 1, 2),
    trow AS (SELECT c.c_nationkey AS n, CAST(COUNT(*) AS BIGINT) AS t
             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             GROUP BY 1),
    tcol AS (SELECT c.c_mktsegment AS s, CAST(COUNT(*) AS BIGINT) AS t
             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             GROUP BY 1)
"""


def _ipf_oracle() -> str:
    """Unroll IPF: weights live on an exact 1e-6 integer grid (FLOOR
    after every scaling step — the emb_isotropy quantization pattern),
    so every row/column sum is an exact BIGINT and the scaling factor
    is one identical double expression per step."""
    ctes = ["w0 AS (SELECT n, s, seed * 1000000 AS w FROM cells)"]
    prev = "w0"
    for i in range(1, _IPF_ITERS + 1):
        ctes.append(
            f"r{i} AS (SELECT n, CAST(SUM(w) AS BIGINT) AS rs"
            f" FROM {prev} GROUP BY n)"
        )
        ctes.append(
            f"""a{i} AS (
      SELECT p.n, p.s,
             CAST(FLOOR(CAST(p.w AS DOUBLE)
                        * (CAST(tr.t AS DOUBLE) * 1000000.0)
                        / CAST(r{i}.rs AS DOUBLE)) AS BIGINT) AS w
      FROM {prev} p JOIN r{i} USING (n) JOIN trow tr USING (n))"""
        )
        ctes.append(
            f"c{i} AS (SELECT s, CAST(SUM(w) AS BIGINT) AS cs"
            f" FROM a{i} GROUP BY s)"
        )
        ctes.append(
            f"""b{i} AS (
      SELECT p.n, p.s,
             CAST(FLOOR(CAST(p.w AS DOUBLE)
                        * (CAST(tc.t AS DOUBLE) * 1000000.0)
                        / CAST(c{i}.cs AS BIGINT)) AS BIGINT) AS w
      FROM a{i} p JOIN c{i} USING (s) JOIN tcol tc USING (s))"""
        )
        prev = f"b{i}"
    return (
        "WITH "
        + _IPF_BASE_SQL.strip()
        + ",\n    "
        + ",\n    ".join(ctes)
        + f"""
    SELECT c.n AS nationkey, c.s AS mktsegment, c.seed,
           FLOOR(CAST(w.w AS DOUBLE) / 1000000.0 * 1e4) / 1e4
             AS raked_weight
    FROM cells c JOIN {prev} w ON w.n = c.n AND w.s = c.s
    ORDER BY nationkey, mktsegment"""
    )


@register(
    "agg_ipf_raking",
    section="2.4",
    oracle=_ipf_oracle(),
    notes=f"iterative proportional fitting ({_IPF_ITERS} iterations): "
    "calibrate the customer (nation x segment) cell counts so their "
    "margins match the ORDER-volume margins — the survey-statistics "
    "raking every weighted-metrics pipeline needs when the sample "
    "(customers) is distributed differently from the activity it "
    "must represent (orders). Weights live on an exact 1e-6 integer "
    "grid, FLOORed after every scaling step, so all row/column sums "
    "are exact BIGINTs (no float-order anywhere) and the oracle is "
    "the identical recurrence unrolled into CTEs — a fully "
    "value-checked iterative algorithm. The cell table is "
    "QI-cardinality (125 rows); corpus work is the two margin "
    "aggregates",
)
def agg_ipf_raking(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cells = (
        c.groupBy(
            F.col("c_nationkey").alias("n"),
            F.col("c_mktsegment").alias("s"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("seed"))
        .localCheckpoint()
    )
    oc = o.join(c, o.o_custkey == c.c_custkey)
    trow = (
        oc.groupBy(F.col("c_nationkey").alias("n"))
        .agg(F.count(F.lit(1)).cast("long").alias("tr"))
        .localCheckpoint()
    )
    tcol = (
        oc.groupBy(F.col("c_mktsegment").alias("s"))
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .localCheckpoint()
    )
    cell_rows = cells.limit(_IPF_LOCAL_MAX + 1).collect()
    if len(cell_rows) <= _IPF_LOCAL_MAX:
        return _ipf_local(spark, cells, cell_rows, trow, tcol)
    return _ipf_distributed(spark, cells, trow, tcol)


def _ipf_local(spark, cells, cell_rows, trow, tcol):
    """Driver-side exact replica for the size-gated fast path (the
    graph_pagerank discipline): margin sums are exact Python ints, the
    two scaling steps replicate Spark's double expression tree op for
    op (w_double * (t_double * 1000000.0) / margin_double, floored),
    so every weight is bit-identical to the distributed loop's."""
    import math

    from pyspark.sql import types as T

    tr = {r["n"]: r["tr"] for r in trow.collect()}
    tc = {r["s"]: r["tc"] for r in tcol.collect()}
    cl = sorted((r["n"], r["s"], r["seed"]) for r in cell_rows)
    w = {(n, s): seed * 1_000_000 for n, s, seed in cl}
    for _ in range(_IPF_ITERS):
        # margin sums run over the CURRENT cell set, then the inner
        # join with the target margins drops unmatched cells — exactly
        # the distributed plan's order of operations
        rs: dict[int, int] = {}
        for (n, s), wv in w.items():
            rs[n] = rs.get(n, 0) + wv
        w = {
            (n, s): math.floor(
                float(wv) * (float(tr[n]) * 1000000.0) / float(rs[n])
            )
            for (n, s), wv in w.items()
            if n in tr
        }
        cs: dict[str, int] = {}
        for (n, s), wv in w.items():
            cs[s] = cs.get(s, 0) + wv
        w = {
            (n, s): math.floor(
                float(wv) * (float(tc[s]) * 1000000.0) / float(cs[s])
            )
            for (n, s), wv in w.items()
            if s in tc
        }
    ntype = cells.schema["n"].dataType
    stype = cells.schema["s"].dataType
    schema = T.StructType(
        [
            T.StructField("nationkey", ntype, True),
            T.StructField("mktsegment", stype, True),
            T.StructField("seed", T.LongType(), True),
            T.StructField("raked_weight", T.DoubleType(), True),
        ]
    )
    out = [
        (
            n,
            s,
            seed,
            math.floor(float(w[(n, s)]) / 1000000.0 * 1e4) / 1e4,
        )
        for n, s, seed in cl
        if (n, s) in w  # the final cells-to-weights inner join
    ]
    return spark.createDataFrame(out, schema)


def _ipf_distributed(spark, cells, trow, tcol):
    """The original iterative plan — the over-cap fallback."""
    w = cells.select("n", "s", (F.col("seed") * 1000000).alias("w"))
    for _ in range(_IPF_ITERS):
        rs = w.groupBy("n").agg(F.sum("w").cast("long").alias("rs"))
        w = (
            w.join(F.broadcast(rs), "n")
            .join(F.broadcast(trow), "n")
            .select(
                "n",
                "s",
                F.floor(
                    F.col("w").cast("double")
                    * (F.col("tr").cast("double") * 1000000.0)
                    / F.col("rs").cast("double")
                )
                .cast("long")
                .alias("w"),
            )
        )
        cs = w.groupBy("s").agg(F.sum("w").cast("long").alias("cs"))
        w = (
            w.join(F.broadcast(cs), "s")
            .join(F.broadcast(tcol), "s")
            .select(
                "n",
                "s",
                F.floor(
                    F.col("w").cast("double")
                    * (F.col("tc").cast("double") * 1000000.0)
                    / F.col("cs").cast("long")
                )
                .cast("long")
                .alias("w"),
            )
            .localCheckpoint()
        )
    return (
        cells.join(w, ["n", "s"])
        .select(
            F.col("n").alias("nationkey"),
            F.col("s").alias("mktsegment"),
            "seed",
            (F.floor(F.col("w").cast("double") / 1000000.0 * 1e4) / 1e4).alias(
                "raked_weight"
            ),
        )
        .orderBy("nationkey", "mktsegment")
    )
