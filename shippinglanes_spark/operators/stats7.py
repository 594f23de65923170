"""Round-7 statistics pack (SURVEY §2.4 extensions): model-evaluation
and sequential-experimentation analytics.

Cross-engine float discipline (FIXTURES.md): scores, log-likelihood
increments, and estimator numerators are exact integers (milli/ppm
units, literal integer weights, cross-multiplied comparisons); the only
float arithmetic is a final division of exact group totals written
identically in both engines, FLOORed at fixed precision.

Scale notes (100 TB): every query is one or two keyed aggregates plus a
bounded (decile-edge / calendar-day) broadcast relation; nothing joins
at corpus width, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

# linear score weights (milli-units) for the calibration query: a FIXED
# engagement-score model, embedded identically in both engines — the
# query certifies the calibration MACHINERY, not a trained model
_CAL_W_VIEW = 100
_CAL_W_CLICK = 300
_CAL_W_SIGNUP = 500
_CAL_BIAS = -2000
_CAL_BINS = 10

# capture-recapture windows (timestamp literals shared by both engines).
# THREE-HOUR windows: the fixture users average ~2 events/day over a
# 30-day span, so a 3 h window captures ~20% of them — day-sized
# windows capture EVERYONE and the estimator degenerates to n (caught
# by the round-7 value audit before registration)
_CR_A_START = "2024-01-08 00:00:00"
_CR_A_END = "2024-01-08 03:00:00"  # exclusive
_CR_B_START = "2024-01-22 00:00:00"
_CR_B_END = "2024-01-22 03:00:00"  # exclusive

# SPRT spec: H0 p0=0.5 vs H1 p1=0.8 for the daily above-mean-volume
# Bernoulli, alpha=beta=0.05. Per-observation log-likelihood increments
# and the decision boundary ln((1-beta)/alpha) = ln(19) are exact
# MICRO-unit integer literals (same value in both engines, so the
# cumulative walk is an exact BIGINT prefix sum and the crossing day is
# integer-decided). H1 is set a full 0.3 from H0 so a 30-day calendar
# can actually cross a boundary (E[increment | p=0.5] ~ -0.22/day:
# decision near day 13) — a 0.6-vs-0.5 test needs ~150 observations
# and would return empty on the fixture span.
_SPRT_LLR_POS = 470004  # round(ln(0.8/0.5) * 1e6)
_SPRT_LLR_NEG = -916291  # round(ln(0.2/0.5) * 1e6)
_SPRT_BOUND = 2944439  # round(ln(19) * 1e6)


@register(
    "agg_calibration_bins",
    section="2.4",
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
                                    THEN 1 ELSE 0 END) AS BIGINT) AS y
               FROM events GROUP BY user_id),
    s AS (SELECT user_id, y,
                 CAST({_CAL_W_VIEW} * nv + {_CAL_W_CLICK} * nc
                      + {_CAL_W_SIGNUP} * ns + {_CAL_BIAS} AS BIGINT) AS z
          FROM uc),
    e AS (SELECT [{", ".join(
            f"percentile_disc({i / _CAL_BINS}) WITHIN GROUP (ORDER BY z)"
            for i in range(1, _CAL_BINS)
        )}] AS edges FROM s),
    b AS (SELECT s.user_id, s.y, s.z,
                 CAST(len(list_filter(e.edges, q -> q < s.z)) AS BIGINT)
                   AS bin
          FROM s CROSS JOIN e)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(MIN(z) AS BIGINT) AS z_min,
           CAST(MAX(z) AS BIGINT) AS z_max,
           FLOOR(CAST(SUM(z) AS DOUBLE) / COUNT(*) * 1e3) / 1e3
             AS mean_score_milli,
           FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1e6) / 1e6
             AS event_rate
    FROM b GROUP BY bin ORDER BY bin
    """,
    notes="decile calibration table for a fixed linear engagement score "
    "against high-value-purchase outcome: the reliability-diagram "
    "aggregation every trained ranking/quality model needs. Scores are "
    "exact integer milli-units (literal weights); bin edges come from "
    "ONE global percentile_disc aggregate broadcast back (the "
    "evt_rfm_scores pattern — no NTILE over all users, no global "
    "sort); bin assignment counts edges strictly below the score, so "
    "ties land deterministically in the lower bin on both engines. "
    "Corpus work = one user-keyed aggregate + one broadcast join",
)
def agg_calibration_bins(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    y = (F.col("event_type") == "purchase") & (
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
        F.max(y.cast("long")).alias("y"),
    )
    s = uc.select(
        "user_id",
        "y",
        (
            F.lit(_CAL_W_VIEW) * F.col("nv")
            + F.lit(_CAL_W_CLICK) * F.col("nc")
            + F.lit(_CAL_W_SIGNUP) * F.col("ns")
            + F.lit(_CAL_BIAS)
        )
        .cast("long")
        .alias("z"),
    )
    qs = [i / _CAL_BINS for i in range(1, _CAL_BINS)]
    edges = s.agg(
        F.array_sort(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({q}) WITHIN GROUP (ORDER BY z)"
                    )
                    for q in qs
                ]
            )
        ).alias("edges")
    )
    b = s.crossJoin(F.broadcast(edges)).select(
        "y",
        "z",
        F.size(F.filter("edges", lambda q: q < F.col("z")))
        .cast("long")
        .alias("bin"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("y").cast("long").alias("n_pos"),
            F.min("z").cast("long").alias("z_min"),
            F.max("z").cast("long").alias("z_max"),
            (
                F.floor(
                    F.sum("z").cast("double") / F.count(F.lit(1)) * 1e3
                )
                / 1e3
            ).alias("mean_score_milli"),
            (
                F.floor(
                    F.sum("y").cast("double") / F.count(F.lit(1)) * 1e6
                )
                / 1e6
            ).alias("event_rate"),
        )
        .orderBy("bin")
    )


@register(
    "agg_capture_recapture",
    section="2.4",
    oracle=f"""
    WITH w AS (SELECT user_id,
                      MAX(CASE WHEN ts >= TIMESTAMP '{_CR_A_START}'
                                AND ts < TIMESTAMP '{_CR_A_END}'
                               THEN 1 ELSE 0 END) AS in_a,
                      MAX(CASE WHEN ts >= TIMESTAMP '{_CR_B_START}'
                                AND ts < TIMESTAMP '{_CR_B_END}'
                               THEN 1 ELSE 0 END) AS in_b
               FROM events GROUP BY user_id),
    t AS (SELECT CAST(SUM(in_a) AS BIGINT) AS n1,
                 CAST(SUM(in_b) AS BIGINT) AS n2,
                 CAST(SUM(in_a * in_b) AS BIGINT) AS m,
                 CAST(COUNT(*) AS BIGINT) AS n_true
          FROM w)
    SELECT n1, n2, m, n_true,
           CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
             AS chapman_estimate
    FROM t
    """,
    notes="Chapman capture-recapture estimate of the active-user "
    "population from two 3-hour observation windows: N-hat = "
    "(n1+1)(n2+1)/(m+1) - 1, every term an exact BIGINT (integer "
    "division on exact counts — no float anywhere). The windows are "
    "short enough that neither captures everyone (the "
    "agg_hll_intersection partial-overlap lesson), so m < min(n1, n2) "
    "and the estimator actually extrapolates; n_true is reported for "
    "the bias readout. ONE user-keyed aggregate + one global reduce "
    "at any scale; window literals derive from shared date strings",
)
def agg_capture_recapture(spark, sf_dir):
    ev = table(spark, sf_dir, "events")

    def _in(win_start, win_end):
        return F.max(
            F.when(
                (F.col("ts") >= F.lit(win_start).cast("timestamp"))
                & (F.col("ts") < F.lit(win_end).cast("timestamp")),
                1,
            ).otherwise(0)
        )

    w = ev.groupBy("user_id").agg(
        _in(_CR_A_START, _CR_A_END).alias("in_a"),
        _in(_CR_B_START, _CR_B_END).alias("in_b"),
    )
    t = w.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_true"),
    )
    return t.select(
        "n1",
        "n2",
        "m",
        "n_true",
        (
            F.expr("(n1 + 1) * (n2 + 1) div (m + 1)") - 1
        )
        .cast("long")
        .alias("chapman_estimate"),
    )


@register(
    "agg_sprt",
    section="2.4",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) FILTER (event_type = 'purchase')
                           AS BIGINT) AS cnt
               FROM events GROUP BY 1),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(cnt) AS BIGINT) AS tot
          FROM d),
    x AS (SELECT di,
                 CASE WHEN cnt * nd > tot THEN 1 ELSE 0 END AS hit
          FROM d CROSS JOIN g),
    walk AS (SELECT di, hit,
                    CAST(SUM(CASE WHEN hit = 1 THEN {_SPRT_LLR_POS}
                             ELSE {_SPRT_LLR_NEG} END)
                      OVER (ORDER BY di) AS BIGINT) AS llr_micro
             FROM x),
    crossing AS (SELECT di, llr_micro,
                        CASE WHEN llr_micro >= {_SPRT_BOUND} THEN 'accept_h1'
                             WHEN llr_micro <= -{_SPRT_BOUND} THEN 'accept_h0'
                        END AS decision,
                        ROW_NUMBER() OVER (ORDER BY di) AS step
                 FROM walk),
    first_hit AS (SELECT * FROM crossing
                  WHERE decision IS NOT NULL
                  ORDER BY di LIMIT 1)
    SELECT c.step AS n_observations, c.di AS decision_day,
           c.llr_micro, c.decision
    FROM first_hit c
    """,
    notes="sequential probability ratio test over the daily "
    "above-mean-purchase-volume Bernoulli sequence (H0 p=0.5 vs H1 "
    "p=0.8, alpha=beta=0.05): the cumulative log-likelihood-ratio "
    "walk with Wald boundaries +-ln(19). Per-day increments and the "
    "boundary are exact MICRO-unit integer literals (the bootstrap-CI "
    "literal discipline), so the walk is an exact BIGINT prefix sum "
    "and the first-crossing day is integer-decided — no float "
    "comparison anywhere. The early-stopping companion to "
    "agg_power_analysis (fixed-horizon) and evt_ab_srm (hygiene); "
    "corpus work = one keyed daily rollup, the walk is "
    "calendar-bounded",
)
def agg_sprt(spark, sf_dir):
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
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("cnt").cast("long").alias("tot"),
    )
    x = d.crossJoin(F.broadcast(g)).select(
        "di",
        F.when(F.col("cnt") * F.col("nd") > F.col("tot"), 1)
        .otherwise(0)
        .alias("hit"),
    )
    wd = W.orderBy("di")
    walk = x.select(
        "di",
        F.sum(
            F.when(F.col("hit") == 1, _SPRT_LLR_POS).otherwise(
                _SPRT_LLR_NEG
            )
        )
        .over(wd.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("llr_micro"),
        F.row_number().over(wd).alias("step"),
    )
    decision = (
        F.when(F.col("llr_micro") >= _SPRT_BOUND, "accept_h1")
        .when(F.col("llr_micro") <= -_SPRT_BOUND, "accept_h0")
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        walk.select(
            F.col("step").alias("n_observations"),
            F.col("di").alias("decision_day"),
            "llr_micro",
            decision.alias("decision"),
        )
        .where(F.col("decision").isNotNull())
        .orderBy("decision_day")
        .limit(1)
    )


@register(
    "profile_t_closeness",
    section="2.12",
    oracle="""
    WITH r AS (SELECT c_nationkey AS n, c_mktsegment AS s,
                      CAST(ROUND(c_acctbal) AS BIGINT) // 1000 AS band
               FROM customer),
    gb AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS g FROM r GROUP BY band),
    gt AS (SELECT CAST(SUM(g) AS BIGINT) AS ng,
                  CAST(COUNT(*) AS BIGINT) AS m
           FROM gb),
    gc AS (SELECT band,
                  CAST(SUM(g) OVER (ORDER BY band) AS BIGINT) AS gcum
           FROM gb),
    cls AS (SELECT n, s, CAST(COUNT(*) AS BIGINT) AS nc
            FROM r GROUP BY n, s),
    cb AS (SELECT n, s, band, CAST(COUNT(*) AS BIGINT) AS c
           FROM r GROUP BY n, s, band),
    grid AS (SELECT cls.n, cls.s, cls.nc, gc.band, gc.gcum,
                    COALESCE(cb.c, 0) AS c
             FROM cls CROSS JOIN gc
             LEFT JOIN cb ON cb.n = cls.n AND cb.s = cls.s
                          AND cb.band = gc.band),
    cum AS (SELECT n, s, nc, gcum,
                   CAST(SUM(c) OVER (PARTITION BY n, s ORDER BY band)
                        AS BIGINT) AS ccum
            FROM grid),
    emd AS (SELECT n, s, nc,
                   CAST(SUM(ABS(ccum * (SELECT ng FROM gt)
                                - gcum * nc)) AS BIGINT) AS num
            FROM cum GROUP BY n, s, nc)
    SELECT n AS nation_id, s AS segment, nc AS n_rows,
           CAST(num * 1000000
                // (((SELECT m FROM gt) - 1) * nc * (SELECT ng FROM gt))
                AS BIGINT) AS t_ppm
    FROM emd
    ORDER BY t_ppm DESC, nation_id, segment
    """,
    notes="t-closeness audit — the third leg of the release-gate triad "
    "next to profile_k_anonymity's k and l readouts: per QI class "
    "(nation x segment), the earth-mover's distance between the "
    "class's banded-account-balance distribution and the GLOBAL one, "
    "under the standard ordered-distance ground metric (EMD = "
    "sum |CDF_class - CDF_global| / (m-1) over the m value bands). "
    "Both CDFs are rationals over exact counts, compared on the "
    "common denominator nc*ng via cross-multiplied BIGINTs, so t_ppm "
    "is integer-exact — a class whose balances skew from the "
    "population leaks that skew even at high k and l. Corpus work = "
    "two keyed aggregates; the class x band grid is QI-cardinality x "
    "band-count metadata at any scale",
)
def profile_t_closeness(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    r = c.select(
        F.col("c_nationkey").alias("n"),
        F.col("c_mktsegment").alias("s"),
        F.expr("CAST(ROUND(c_acctbal) AS BIGINT) div 1000").alias("band"),
    )
    gb = r.groupBy("band").agg(F.count(F.lit(1)).cast("long").alias("g"))
    gt = gb.agg(
        F.sum("g").cast("long").alias("ng"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    gc = gb.select(
        "band",
        F.sum("g")
        .over(W.orderBy("band").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("gcum"),
    )
    cls = r.groupBy("n", "s").agg(F.count(F.lit(1)).cast("long").alias("nc"))
    cb = r.groupBy("n", "s", "band").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    grid = (
        cls.crossJoin(F.broadcast(gc))
        .join(cb, ["n", "s", "band"], "left")
        .select(
            "n",
            "s",
            "nc",
            "band",
            "gcum",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    cum = grid.select(
        "n",
        "s",
        "nc",
        "gcum",
        F.sum("c")
        .over(
            W.partitionBy("n", "s")
            .orderBy("band")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("ccum"),
    )
    emd = (
        cum.crossJoin(F.broadcast(gt))
        .groupBy("n", "s", "nc", "m", "ng")
        .agg(
            F.sum(
                F.abs(F.col("ccum") * F.col("ng") - F.col("gcum") * F.col("nc"))
            )
            .cast("long")
            .alias("num")
        )
    )
    return emd.select(
        F.col("n").alias("nation_id"),
        F.col("s").alias("segment"),
        F.col("nc").alias("n_rows"),
        F.expr("CAST(num * 1000000 div ((m - 1) * nc * ng) AS BIGINT)").alias(
            "t_ppm"
        ),
    ).orderBy(F.desc("t_ppm"), "nation_id", "segment")


from .aggregation import _PW_ZA, _PW_ZB  # shared spec literals (invnorm)


@register(
    "agg_mde",
    section="2.4",
    oracle=f"""
    WITH u AS (SELECT user_id,
                      ('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)),
                                      1, 13))::BIGINT % 2 AS arm,
                      CAST(MAX(CASE WHEN event_type = 'purchase'
                                     AND CAST(ROUND(value * 100) AS BIGINT)
                                         >= 20000
                                    THEN 1 ELSE 0 END) AS BIGINT) AS conv
               FROM events GROUP BY user_id),
    t AS (SELECT CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n_control,
                 CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                      AS BIGINT) AS x_control,
                 CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n_treat
          FROM u),
    p AS (SELECT n_control, x_control, n_treat,
                 CAST(x_control AS DOUBLE) / n_control AS p0,
                 CASE WHEN n_control < n_treat THEN n_control
                      ELSE n_treat END AS n_arm
          FROM t)
    SELECT n_control, x_control, n_treat,
           FLOOR(p0 * 1e6) / 1e6 AS baseline_rate,
           FLOOR(({_PW_ZA!r} + {_PW_ZB!r})
                 * SQRT(2.0 * p0 * (1 - p0) / n_arm) * 1e6) / 1e6
             AS mde_abs,
           FLOOR(({_PW_ZA!r} + {_PW_ZB!r})
                 * SQRT(2.0 * p0 * (1 - p0) / n_arm) / p0 * 1e6) / 1e6
             AS mde_rel
    FROM p
    """,
    notes="minimum detectable effect — the inverse of "
    "agg_power_analysis: given the experiment's ACTUAL arm sizes "
    "(the content-addressed md5 50/50 split evt_ab_srm audits) and "
    "the control's high-value conversion baseline, the smallest "
    "absolute and relative lift detectable at alpha=0.05 two-sided "
    "with 80% power: MDE = (z_a + z_b) sqrt(2 p(1-p) / n). Same "
    "shared invnorm literals, single divisions of exact counts, sqrt "
    "is correctly-rounded IEEE, FLOOR 6dp — one user-keyed aggregate "
    "+ one 1-row reduce at any scale. Together with "
    "agg_power_analysis (n given effect), agg_sprt (sequential "
    "stopping) and evt_ab_srm (split hygiene), the experiment-design "
    "loop is closed",
)
def agg_mde(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
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
    conv = (F.col("event_type") == "purchase") & (
        F.round(F.col("value") * 100).cast("long") >= 20000
    )
    u = (
        ev.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .agg(F.max(conv.cast("long")).cast("long").alias("conv"))
        .select("user_id", "conv", arm.alias("arm"))
    )
    t = u.agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("long").alias("n_control"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("x_control"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("long").alias("n_treat"),
    )
    p0 = F.col("x_control").cast("double") / F.col("n_control")
    n_arm = F.least("n_control", "n_treat").cast("double")
    mde = (_PW_ZA + _PW_ZB) * F.sqrt(2.0 * p0 * (1 - p0) / n_arm)
    return t.select(
        "n_control",
        "x_control",
        "n_treat",
        (F.floor(p0 * 1e6) / 1e6).alias("baseline_rate"),
        (F.floor(mde * 1e6) / 1e6).alias("mde_abs"),
        (F.floor(mde / p0 * 1e6) / 1e6).alias("mde_rel"),
    )


@register(
    "agg_atkinson",
    section="2.4",
    oracle="""
    WITH u AS (SELECT event_type,
                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                           AS BIGINT) AS x
               FROM events WHERE value IS NOT NULL
               GROUP BY event_type, user_id),
    q AS (SELECT event_type, x,
                 CAST(FLOOR(SQRT(CAST(x AS DOUBLE)) * 1e6) AS BIGINT) AS r
          FROM u WHERE x > 0),
    s AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(r) AS BIGINT) AS sr
          FROM q GROUP BY event_type)
    SELECT event_type, n AS n_users,
           FLOOR((1 - (CAST(sr AS DOUBLE) / n / 1e6)
                      * (CAST(sr AS DOUBLE) / n / 1e6)
                      / (CAST(sx AS DOUBLE) / n)) * 1e6) / 1e6
             AS atkinson_half
    FROM s ORDER BY event_type
    """,
    notes="Atkinson inequality index (epsilon = 1/2) of per-user spend "
    "within each event type: A = 1 - (mean sqrt x)^2 / mean x — the "
    "welfare-theoretic member of the inequality family next to "
    "agg_gini (rank-based) and agg_theil (entropy-based). sqrt is "
    "correctly-rounded IEEE on both engines, and each user's sqrt is "
    "FLOOR-quantized to a 1e-6 integer BEFORE summing, so the corpus "
    "sums are exact BIGINTs (order-free) and the final expression is "
    "one identical scalar tree. epsilon = 1/2 is chosen exactly "
    "because x^(1-eps) = sqrt — any other epsilon routes through "
    "pow(), which is NOT correctly rounded (the round-4 temperature-"
    "mix lesson). One keyed aggregate at any scale",
)
def agg_atkinson(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("value").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    q = u.where(F.col("x") > 0).select(
        "event_type",
        "x",
        F.floor(F.sqrt(F.col("x").cast("double")) * 1e6)
        .cast("long")
        .alias("r"),
    )
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("r").cast("long").alias("sr"),
    )
    mean_sqrt = F.col("sr").cast("double") / F.col("n") / 1e6
    mean_x = F.col("sx").cast("double") / F.col("n")
    return s.select(
        "event_type",
        F.col("n").alias("n_users"),
        (F.floor((1 - mean_sqrt * mean_sqrt / mean_x) * 1e6) / 1e6).alias(
            "atkinson_half"
        ),
    ).orderBy("event_type")


# Brier probability mapping: p = clamp(z - _BR_Z0, 0, _BR_SPAN) / _BR_SPAN
# in exact integer MICRO units (z is the calibration pack's milli score)
_BR_Z0 = 4000
_BR_SPAN = 20000


@register(
    "agg_brier_decomposition",
    section="2.4",
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
                                    THEN 1 ELSE 0 END) AS BIGINT) AS y
               FROM events GROUP BY user_id),
    s AS (SELECT user_id, y,
                 CAST({_CAL_W_VIEW} * nv + {_CAL_W_CLICK} * nc
                      + {_CAL_W_SIGNUP} * ns + {_CAL_BIAS} AS BIGINT) AS z
          FROM uc),
    sp AS (SELECT user_id, y, z,
                  CAST(LEAST(GREATEST(z - {_BR_Z0}, 0), {_BR_SPAN})
                       * 1000000 // {_BR_SPAN} AS BIGINT) AS p_micro
           FROM s),
    e AS (SELECT [{", ".join(
            f"percentile_disc({i / _CAL_BINS}) WITHIN GROUP (ORDER BY z)"
            for i in range(1, _CAL_BINS)
        )}] AS edges FROM sp),
    b AS (SELECT CAST(len(list_filter(e.edges, q -> q < sp.z)) AS BIGINT)
                   AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n_k,
                 CAST(SUM(sp.y) AS BIGINT) AS sy_k,
                 CAST(SUM(sp.p_micro) AS BIGINT) AS sp_k
          FROM sp CROSS JOIN e GROUP BY 1),
    g AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n,
                 CAST(SUM(sy_k) AS BIGINT) AS sy,
                 CAST(COUNT(*) AS BIGINT) AS n_bins
          FROM b),
    t AS (SELECT b.bin, b.n_k, b.sy_k, b.sp_k, g.n, g.sy, g.n_bins,
                 CAST(b.sp_k AS DOUBLE) / b.n_k / 1000000 AS pbar,
                 CAST(b.sy_k AS DOUBLE) / b.n_k AS ybar_k,
                 CAST(g.sy AS DOUBLE) / g.n AS ybar
          FROM b CROSS JOIN g),
    f AS (SELECT n, sy, n_bins, ybar,
                 list_reduce(list_prepend(0.0, list(
                   n_k * pbar * pbar - 2 * pbar * sy_k + sy_k
                   ORDER BY bin)), (x, y) -> x + y) / n AS brier,
                 list_reduce(list_prepend(0.0, list(
                   n_k * (pbar - ybar_k) * (pbar - ybar_k)
                   ORDER BY bin)), (x, y) -> x + y) / n AS rel,
                 list_reduce(list_prepend(0.0, list(
                   n_k * (ybar_k - ybar) * (ybar_k - ybar)
                   ORDER BY bin)), (x, y) -> x + y) / n AS res
          FROM t GROUP BY n, sy, n_bins, ybar)
    SELECT n AS n_users, n_bins, FLOOR(ybar * 1e6) / 1e6 AS base_rate,
           FLOOR(brier * 1e6) / 1e6 AS brier,
           FLOOR(rel * 1e6) / 1e6 AS reliability,
           FLOOR(res * 1e6) / 1e6 AS resolution,
           FLOOR(ybar * (1 - ybar) * 1e6) / 1e6 AS uncertainty
    FROM f
    """,
    notes=f"Murphy decomposition of the Brier score for the BINNED "
    f"engagement forecaster (same linear score, outcome and decile "
    f"edges as agg_calibration_bins; probability = the exact integer "
    f"micro mapping clamp(z - {_BR_Z0}, 0, {_BR_SPAN})/{_BR_SPAN}): "
    f"Brier = REL - RES + UNC holds exactly for a bin-constant "
    f"forecast, and each component is a 10-term float sum folded in "
    f"BIN ORDER on both engines (list_reduce / F.aggregate with a "
    f"prepended 0.0 seed — the agg_chisq_independence discipline), "
    f"so the doubles are bit-identical; inputs to every term are "
    f"exact BIGINT bin sums. The scalar verdict on top of the "
    f"calibration TABLE: reliability says how miscalibrated, "
    f"resolution how much the bins separate outcomes, uncertainty "
    f"the irreducible base-rate floor. Corpus work = one user-keyed "
    f"aggregate + one broadcast edge join",
)
def agg_brier_decomposition(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    y = (F.col("event_type") == "purchase") & (
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
        F.max(y.cast("long")).alias("y"),
    )
    s = uc.select(
        "y",
        (
            F.lit(_CAL_W_VIEW) * F.col("nv")
            + F.lit(_CAL_W_CLICK) * F.col("nc")
            + F.lit(_CAL_W_SIGNUP) * F.col("ns")
            + F.lit(_CAL_BIAS)
        )
        .cast("long")
        .alias("z"),
    ).withColumn(
        "p_micro",
        F.expr(
            f"CAST(LEAST(GREATEST(z - {_BR_Z0}, 0), {_BR_SPAN})"
            f" * 1000000 div {_BR_SPAN} AS BIGINT)"
        ),
    ).localCheckpoint()  # user-sized, read twice (edges + binning)
    qs = [i / _CAL_BINS for i in range(1, _CAL_BINS)]
    edges = s.agg(
        F.array_sort(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({q}) WITHIN GROUP (ORDER BY z)"
                    )
                    for q in qs
                ]
            )
        ).alias("edges")
    )
    b = (
        s.crossJoin(F.broadcast(edges))
        .select(
            "y",
            "p_micro",
            F.size(F.filter("edges", lambda q: q < F.col("z")))
            .cast("long")
            .alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_k"),
            F.sum("y").cast("long").alias("sy_k"),
            F.sum("p_micro").cast("long").alias("sp_k"),
        )
        .localCheckpoint()  # <=10 rows, read twice (globals + terms)
    )
    g = b.agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum("sy_k").cast("long").alias("sy"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    t = b.join(F.broadcast(g)).select(
        "bin",
        "n_k",
        "sy_k",
        "n",
        "sy",
        "n_bins",
        (F.col("sp_k").cast("double") / F.col("n_k") / 1000000).alias(
            "pbar"
        ),
        (F.col("sy_k").cast("double") / F.col("n_k")).alias("ybar_k"),
        (F.col("sy").cast("double") / F.col("n")).alias("ybar"),
    )

    def fold(term: str) -> str:
        # bin-ordered left fold with an explicit 0.0 seed: collect
        # (bin, term) structs, sort by bin, strip to terms, aggregate
        return (
            f"aggregate(transform(array_sort(collect_list("
            f"struct(bin, CAST(({term}) AS DOUBLE) AS v))),"
            f" x -> x.v), CAST(0.0 AS DOUBLE), (x, y) -> x + y)"
        )

    f = t.groupBy("n", "sy", "n_bins", "ybar").agg(
        F.expr(fold("n_k * pbar * pbar - 2 * pbar * sy_k + sy_k")).alias(
            "sb"
        ),
        F.expr(fold("n_k * (pbar - ybar_k) * (pbar - ybar_k)")).alias(
            "sr"
        ),
        F.expr(fold("n_k * (ybar_k - ybar) * (ybar_k - ybar)")).alias(
            "ss"
        ),
    )
    return f.select(
        F.col("n").alias("n_users"),
        "n_bins",
        (F.floor(F.col("ybar") * 1e6) / 1e6).alias("base_rate"),
        (F.floor(F.col("sb") / F.col("n") * 1e6) / 1e6).alias("brier"),
        (F.floor(F.col("sr") / F.col("n") * 1e6) / 1e6).alias(
            "reliability"
        ),
        (F.floor(F.col("ss") / F.col("n") * 1e6) / 1e6).alias(
            "resolution"
        ),
        (
            F.floor(F.col("ybar") * (1 - F.col("ybar")) * 1e6) / 1e6
        ).alias("uncertainty"),
    )
