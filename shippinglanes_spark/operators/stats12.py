"""Round-10 pack 2 (SURVEY §2.4/§2.9/§2.10/§2.11 extensions): the
Lo-MacKinlay variance-ratio test (random-walk vs mean-reversion on the
daily series — the regime diagnostic next to agg_hurst's R/S and
ts_adf's unit root), the turning-points randomness test (local-extrema
counting — the shape-based member next to agg_runs_test's sign-based
one), partial correlations (the "controlling for z" member next to
agg_vif: the fixture's qty-price association vanishes once item count
is partialled out), per-language entropy RATE (conditional bigram
entropy H(w2|w1) — the sequence-aware sibling of text_entropy's
unigram H), cumulative incidence under competing risks (Aalen-Johansen
— the multi-cause extension of evt_survival_km's single-cause KM), and
the Spark 4 SQL session-state surface (DECLARE/SET VAR + EXECUTE
IMMEDIATE + IDENTIFIER in one statement chain).

Cross-engine float discipline (FIXTURES.md):
- Variance ratio: centered sums stay exact by clearing denominators —
  (n*w_i - q*s) is an exact BIGINT per overlapping window, its squared
  sum S2 and the 1-lag moment V = n*ss - s^2 are exact BIGINTs
  (documented BIGINT headroom through ~sf10, the agg_vif discipline),
  and VR = S2/(m*q*V) is ONE float division of exact integers, floored
  6 dp; the regime verdict compares the raw double against 1.
- Turning points: the count is an exact window aggregate; mean
  2(n-2)/3 and variance (16n-29)/90 are the Kendall nulls, z one float
  chain over exact integers, floored 6 dp.
- Partial correlations reuse agg_vif's ten exact BIGINT moments and
  fixed DOUBLE trees; p_xy.z = (rxy - rxz*ryz)/sqrt((1-rxz^2)
  (1-ryz^2)) is evaluated with the identical tree on both engines.
- Entropy rate follows text_entropy's documented relaxation: the only
  order-unpinned float sums are SUM(c * ln c)-shaped over
  vocabulary-sized groups (~3.6k bigram types per language), whose
  1e-14 relative wobble cannot move a 4 dp round of an irrational
  value.
- Aalen-Johansen folds the day-ordered [day, d_p, d_e, n_risk] rows
  (exact integers carried in doubles < 2^53) through the IDENTICAL
  3-state update on both engines (S' = S*(1-(dp+de)/n), cif' +=
  S*d/n) — the evt_survival_km fold pattern with vector state (the
  rank_bradley_terry trick), floored 6 dp.

Scale notes (100 TB): VR / turning points are one daily rollup +
calendar-sized window work; partial correlation is the agg_vif
zero-shuffle moment pass; entropy rate is bigram-explode map work +
two vocabulary-keyed aggregations (map-side combinable); the CIF day
table is corpus-span-bounded (<= 30 rows) after ONE keyed user
aggregation; the SQL surface query is a single scan-side aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import register_views, table
from ..registry import register
from .stats11 import _DAY_GRID_SQL, _ORDER_FEAT_SQL, _RR_SQL, _day_grid

# Variance ratio: holding period q over the 30-day series
_VR_Q = 5

# Turning points: Kendall's normal critical value at 5%
_TP_CRIT = "1.96"

_DAY_US = 86_400_000_000


@register(
    "ts_variance_ratio",
    section="2.4",
    oracle=f"""
    WITH {_DAY_GRID_SQL},
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM d GROUP BY 1),
    w AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER
                  (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
             CAST(SUM(c) OVER
                  (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND {_VR_Q - 1} FOLLOWING)
               AS BIGINT) AS wq
      FROM d),
    s2 AS (
      SELECT w.event_type,
             CAST(SUM((m.n * w.wq - {_VR_Q} * m.s)
                      * (m.n * w.wq - {_VR_Q} * m.s)) AS BIGINT) AS s2,
             MAX(m.n) AS n, MAX(m.s) AS s, MAX(m.ss) AS ss
      FROM w JOIN m ON m.event_type = w.event_type
      WHERE w.i <= m.n - {_VR_Q} + 1
      GROUP BY 1),
    v AS (
      SELECT event_type, n,
             CAST(s2 AS DOUBLE)
             / ((n - {_VR_Q} + 1) * {_VR_Q} * (n * ss - s * s)) AS vr_raw
      FROM s2)
    SELECT event_type, n AS n_days,
           CAST({_VR_Q} AS BIGINT) AS q,
           FLOOR(vr_raw * 1e6) / 1e6 AS vr,
           CASE WHEN vr_raw < 1 THEN 'mean_reverting'
                ELSE 'trending' END AS regime
    FROM v ORDER BY event_type
    """,
    notes=f"Lo-MacKinlay variance ratio VR(q={_VR_Q}) of each event "
    f"type's daily-count series (zero-filled grid): the variance of "
    f"overlapping {_VR_Q}-day sums against {_VR_Q}x the one-day "
    f"variance — a random walk gives VR = 1, negative autocorrelation "
    f"(mean reversion) drives it below, positive drift-persistence "
    f"above; fixture spread 0.40-1.18 across types. Centered sums "
    f"stay exact by clearing denominators: (n*w_i - q*s) is an exact "
    f"BIGINT per window, VR one float division of exact integers, "
    f"floored 6 dp; the regime verdict compares the raw double "
    f"against 1. One daily rollup + a calendar-sized window pass",
)
def ts_variance_ratio(spark, sf_dir):
    q = _VR_Q
    d = _day_grid(spark, sf_dir)  # windowed grid, read by both branches
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    wd = W.partitionBy("event_type").orderBy("day")
    w = d.select(
        "event_type",
        F.row_number().over(wd).cast("long").alias("i"),
        F.sum("c").over(wd.rowsBetween(0, q - 1)).cast("long").alias("wq"),
    )
    s2 = (
        w.join(F.broadcast(m), "event_type")
        .where(F.col("i") <= F.col("n") - q + 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("n") * F.col("wq") - q * F.col("s"))
                * (F.col("n") * F.col("wq") - q * F.col("s"))
            )
            .cast("long")
            .alias("s2"),
            F.max("n").alias("n"),
            F.max("s").alias("s"),
            F.max("ss").alias("ss"),
        )
    )
    vr_raw = F.col("s2").cast("double") / (
        (F.col("n") - q + 1)
        * q
        * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    )
    return s2.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.lit(q).cast("long").alias("q"),
        (F.floor(vr_raw * 1e6) / 1e6).alias("vr"),
        F.when(vr_raw < 1, F.lit("mean_reverting"))
        .otherwise(F.lit("trending"))
        .alias("regime"),
    ).orderBy("event_type")


@register(
    "ts_turning_points",
    section="2.4",
    oracle=f"""
    WITH {_DAY_GRID_SQL},
    l AS (
      SELECT event_type, c,
             LAG(c) OVER (PARTITION BY event_type ORDER BY day) AS pv,
             LEAD(c) OVER (PARTITION BY event_type ORDER BY day) AS nx
      FROM d),
    t AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
                            AND ((c > pv AND c > nx)
                                 OR (c < pv AND c < nx))
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM l GROUP BY 1),
    z AS (
      SELECT event_type, n, tp,
             (tp - CAST(2 * (n - 2) AS DOUBLE) / 3)
             / sqrt(CAST(16 * n - 29 AS DOUBLE) / 90) AS z_raw
      FROM t)
    SELECT event_type, n AS n_days, tp AS turning_points,
           FLOOR(z_raw * 1e6) / 1e6 AS z_tp,
           abs(z_raw) > {_TP_CRIT} AS nonrandom
    FROM z ORDER BY event_type
    """,
    notes=f"Kendall turning-points randomness test per event type: the "
    f"count of STRICT local extrema in the daily series (plateau "
    f"edges excluded — ties break neither way, deterministically on "
    f"both engines) against the i.i.d. nulls E = 2(n-2)/3 and Var = "
    f"(16n-29)/90; too few turns means trend/persistence, too many "
    f"means alternation. The SHAPE-based randomness member next to "
    f"agg_runs_test's sign-based one and ts_variance_ratio's "
    f"moment-based one. Exact integer count, one float chain floored "
    f"6 dp, verdict on the raw double vs {_TP_CRIT}. One daily "
    f"rollup + one calendar-sized window pass",
)
def ts_turning_points(spark, sf_dir):
    d = _day_grid(spark, sf_dir)
    wd = W.partitionBy("event_type").orderBy("day")
    l = d.select(
        "event_type",
        "c",
        F.lag("c").over(wd).alias("pv"),
        F.lead("c").over(wd).alias("nx"),
    )
    is_turn = (
        F.col("pv").isNotNull()
        & F.col("nx").isNotNull()
        & (
            ((F.col("c") > F.col("pv")) & (F.col("c") > F.col("nx")))
            | ((F.col("c") < F.col("pv")) & (F.col("c") < F.col("nx")))
        )
    )
    t = l.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(is_turn.cast("long")).cast("long").alias("tp"),
    )
    z_raw = (
        F.col("tp") - (2 * (F.col("n") - 2)).cast("double") / 3
    ) / F.sqrt((16 * F.col("n") - 29).cast("double") / 90)
    return t.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("tp").alias("turning_points"),
        (F.floor(z_raw * 1e6) / 1e6).alias("z_tp"),
        (F.abs(z_raw) > F.expr(_TP_CRIT)).alias("nonrandom"),
    ).orderBy("event_type")


@register(
    "agg_partial_correlation",
    section="2.4",
    oracle=f"""
    WITH {_ORDER_FEAT_SQL},
    {_RR_SQL}
    SELECT region, n AS n_orders,
           FLOOR(ryz * 1e6) / 1e6 AS r_qty_price,
           FLOOR((ryz - rxy * rxz)
                 / sqrt((1 - rxy * rxy) * (1 - rxz * rxz)) * 1e6) / 1e6
             AS p_qty_price_items,
           FLOOR((rxy - rxz * ryz)
                 / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) * 1e6) / 1e6
             AS p_items_qty_price,
           FLOOR((rxz - rxy * ryz)
                 / sqrt((1 - rxy * rxy) * (1 - ryz * ryz)) * 1e6) / 1e6
             AS p_items_price_qty
    FROM rr ORDER BY region
    """,
    notes="First-order partial correlations per region over agg_vif's "
    "per-order basket features: p_ab.c = (r_ab - r_ac*r_bc) / "
    "sqrt((1-r_ac^2)(1-r_bc^2)). The punchline is p(qty, price | "
    "items): the raw qty-price correlation (~0.74) collapses to ~0 "
    "once item count is partialled out — the association is entirely "
    "MEDIATED by basket size, the confounder-detection move behind "
    "every observational-metrics readout. Same ten exact BIGINT "
    "moments and fixed DOUBLE trees as agg_vif (one moment pass after "
    "broadcast dim joins, region-sized tail), floored 6 dp",
)
def agg_partial_correlation(spark, sf_dir):
    from .stats11 import _order_features, _region_corrs

    rr = _region_corrs(_order_features(spark, sf_dir))

    def _partial(rab, rac, rbc):
        return (F.col(rab) - F.col(rac) * F.col(rbc)) / F.sqrt(
            (1 - F.col(rac) * F.col(rac)) * (1 - F.col(rbc) * F.col(rbc))
        )

    return rr.select(
        "region",
        F.col("n").alias("n_orders"),
        (F.floor(F.col("ryz") * 1e6) / 1e6).alias("r_qty_price"),
        (F.floor(_partial("ryz", "rxy", "rxz") * 1e6) / 1e6).alias(
            "p_qty_price_items"
        ),
        (F.floor(_partial("rxy", "rxz", "ryz") * 1e6) / 1e6).alias(
            "p_items_qty_price"
        ),
        (F.floor(_partial("rxz", "rxy", "ryz") * 1e6) / 1e6).alias(
            "p_items_price_qty"
        ),
    ).orderBy("region")


@register(
    "text_entropy_rate",
    section="2.9",
    oracle="""
    WITH d AS (
      SELECT lang, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    bg AS (
      SELECT lang,
             UNNEST(list_transform(
               generate_series(1, CAST(len(toks) AS BIGINT) - 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS b
      FROM d),
    c2 AS (
      SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2),
    c1 AS (
      SELECT lang, split_part(b, ' ', 1) AS ctx,
             CAST(SUM(c) AS BIGINT) AS cc
      FROM c2 GROUP BY 1, 2),
    j AS (
      SELECT c2.lang, c2.c, c1.cc
      FROM c2 JOIN c1
        ON c1.lang = c2.lang AND c1.ctx = split_part(c2.b, ' ', 1)),
    h AS (
      SELECT lang,
             CAST(SUM(c) AS BIGINT) AS nb,
             SUM(c * (LN(cc) - LN(c))) AS hsum
      FROM j GROUP BY 1),
    hu AS (
      SELECT lang, SUM(cc * LN(cc)) AS husum
      FROM c1 GROUP BY 1)
    SELECT h.lang, h.nb AS n_bigrams,
           ROUND(h.hsum / h.nb, 4) AS h_rate,
           ROUND(LN(h.nb) - hu.husum / h.nb, 4) AS h_context,
           ROUND((LN(h.nb) - hu.husum / h.nb) - h.hsum / h.nb, 4)
             AS info_gain
    FROM h JOIN hu ON hu.lang = h.lang
    ORDER BY h.lang
    """,
    notes="Per-language entropy RATE: conditional bigram entropy "
    "H(w2|w1) = sum c2*(ln c1 - ln c2)/N over within-document adjacent "
    "token pairs, next to the context entropy H(w1) and their gap "
    "(the mutual information the preceding token carries). Unigram "
    "entropy is blind to order; the rate is the sequence-aware "
    "diversity signal (fixture: H(w2|w1) 3.26-3.36 vs H(w1) ~3.40 — "
    "real conditional structure, language-specific). Float discipline "
    "is text_entropy's documented relaxation: the only order-unpinned "
    "sums are c*ln(c)-shaped over vocabulary-sized groups (~3.6k "
    "bigram types per language), rounded 4 dp. Bigram explode is "
    "corpus-linear map work; both aggregations key on "
    "vocabulary-shaped (lang, token) keys with map-side combine",
)
def text_entropy_rate(spark, sf_dir):
    d = (
        table(spark, sf_dir, "documents")
        .select("lang", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 2)
    )
    bg = d.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ',"
                " element_at(toks, i + 1)))"
            )
        ).alias("b"),
    )
    c2 = bg.groupBy("lang", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    c1 = (
        c2.groupBy("lang", F.substring_index("b", " ", 1).alias("ctx"))
        .agg(F.sum("c").cast("long").alias("cc"))
        .select(
            F.col("lang").alias("c1_lang"),
            F.col("ctx").alias("c1_ctx"),
            "cc",
        )
    )
    j = c2.join(
        c1,
        (F.col("c1_lang") == F.col("lang"))
        & (F.col("c1_ctx") == F.substring_index(F.col("b"), " ", 1)),
    ).select("lang", "c", "cc")
    h = j.groupBy("lang").agg(
        F.sum("c").cast("long").alias("nb"),
        F.sum(F.col("c") * (F.log("cc") - F.log("c"))).alias("hsum"),
    )
    hu = c1.groupBy(F.col("c1_lang").alias("lang")).agg(
        F.sum(F.col("cc") * F.log("cc")).alias("husum")
    )
    return (
        h.join(hu, "lang")
        .select(
            "lang",
            F.col("nb").alias("n_bigrams"),
            F.round(F.col("hsum") / F.col("nb"), 4).alias("h_rate"),
            F.round(
                F.log("nb") - F.col("husum") / F.col("nb"), 4
            ).alias("h_context"),
            F.round(
                (F.log("nb") - F.col("husum") / F.col("nb"))
                - F.col("hsum") / F.col("nb"),
                4,
            ).alias("info_gain"),
        )
        .orderBy("lang")
    )


@register(
    "evt_cumulative_incidence",
    section="2.10",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MIN(epoch_us(ts)) AS t0,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN epoch_us(ts) END) AS tp,
             MIN(CASE WHEN event_type = 'error'
                 THEN epoch_us(ts) END) AS te
      FROM events GROUP BY user_id),
    m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
    d AS (
      SELECT CASE
               WHEN u.tp IS NULL AND u.te IS NULL
                 THEN (m.mx - u.t0) // {_DAY_US}
               WHEN u.te IS NULL OR (u.tp IS NOT NULL AND u.tp <= u.te)
                 THEN (u.tp - u.t0) // {_DAY_US}
               ELSE (u.te - u.t0) // {_DAY_US}
             END AS day,
             CASE
               WHEN u.tp IS NULL AND u.te IS NULL THEN 'censored'
               WHEN u.te IS NULL OR (u.tp IS NOT NULL AND u.tp <= u.te)
                 THEN 'purchase'
               ELSE 'error'
             END AS risk
      FROM u CROSS JOIN m),
    g AS (
      SELECT day,
             CAST(SUM(CASE WHEN risk = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS dp,
             CAST(SUM(CASE WHEN risk = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS de,
             CAST(SUM(CASE WHEN risk = 'censored' THEN 1 ELSE 0 END)
               AS BIGINT) AS cn
      FROM d GROUP BY day),
    r AS (
      SELECT day, dp, de,
             CAST(SUM(dp + de + cn) OVER (
               ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n_risk
      FROM g),
    k AS (SELECT day, dp, de, n_risk FROM r WHERE dp + de > 0),
    a AS (
      SELECT list([CAST(day AS DOUBLE), CAST(dp AS DOUBLE),
                   CAST(de AS DOUBLE), CAST(n_risk AS DOUBLE)]
                  ORDER BY day) AS fs
      FROM k),
    o AS (
      SELECT k.day, k.dp, k.de, k.n_risk,
             list_reduce(
               list_prepend(
                 [CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                  CAST(0.0 AS DOUBLE)],
                 [x FOR x IN a.fs IF x[1] <= k.day]),
               (acc, x) -> [acc[1] * (1 - (x[2] + x[3]) / x[4]),
                            acc[2] + acc[1] * x[2] / x[4],
                            acc[3] + acc[1] * x[3] / x[4]]) AS st
      FROM k CROSS JOIN a)
    SELECT day, n_risk, dp AS d_purchase, de AS d_error,
           FLOOR(st[2] * 1e6) / 1e6 AS cif_purchase,
           FLOOR(st[3] * 1e6) / 1e6 AS cif_error
    FROM o ORDER BY day
    """,
    notes="Aalen-Johansen cumulative incidence under COMPETING risks: "
    "from each user's first event, which comes first — purchase or "
    "error? CIF_k(t) = sum_{s<=t} S(s-) * d_k(s)/n(s) with S the "
    "all-cause KM survivor; naive per-cause KM (1 - KM treating the "
    "other cause as censoring) OVERSTATES both incidences — AJ is the "
    "estimator that makes them sum correctly. Simultaneous-microsecond "
    "ties break to purchase, deterministically on both engines. The "
    "day-ordered [day, d_p, d_e, n_risk] rows (exact integers in "
    "doubles) fold through the identical 3-state update on both sides "
    "(evt_survival_km's fold with rank_bradley_terry's vector-state "
    "trick), floored 6 dp. One keyed user aggregation is the only "
    "corpus work; the day table is corpus-span-bounded (<= 30 rows)",
)
def evt_cumulative_incidence(spark, sf_dir):
    from ..core import epoch_us

    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max(epoch_us("ts")).alias("mx"))
    u = ev.groupBy("user_id").agg(
        F.min(epoch_us("ts")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", epoch_us("ts"))
        ).alias("tp"),
        F.min(
            F.when(F.col("event_type") == "error", epoch_us("ts"))
        ).alias("te"),
    )
    purchase_first = F.col("te").isNull() | (
        F.col("tp").isNotNull() & (F.col("tp") <= F.col("te"))
    )
    both_null = F.col("tp").isNull() & F.col("te").isNull()
    d = u.crossJoin(F.broadcast(mx)).select(
        F.when(both_null, F.expr(f"(mx - t0) div {_DAY_US}"))
        .when(purchase_first, F.expr(f"(tp - t0) div {_DAY_US}"))
        .otherwise(F.expr(f"(te - t0) div {_DAY_US}"))
        .alias("day"),
        F.when(both_null, F.lit("censored"))
        .when(purchase_first, F.lit("purchase"))
        .otherwise(F.lit("error"))
        .alias("risk"),
    )
    g = d.groupBy("day").agg(
        F.sum((F.col("risk") == "purchase").cast("long"))
        .cast("long")
        .alias("dp"),
        F.sum((F.col("risk") == "error").cast("long"))
        .cast("long")
        .alias("de"),
        F.sum((F.col("risk") == "censored").cast("long"))
        .cast("long")
        .alias("cn"),
    )
    wsuf = W.orderBy("day").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    r = (
        g.select(
            "day",
            "dp",
            "de",
            F.sum(F.col("dp") + F.col("de") + F.col("cn"))
            .over(wsuf)
            .cast("long")
            .alias("n_risk"),
        )
        .where(F.col("dp") + F.col("de") > 0)
        .localCheckpoint()  # day table: feeds the fold array + output
    )
    a = r.agg(
        F.array_sort(
            F.collect_list(
                F.array(
                    F.col("day").cast("double"),
                    F.col("dp").cast("double"),
                    F.col("de").cast("double"),
                    F.col("n_risk").cast("double"),
                )
            )
        ).alias("fs")
    )
    st = F.aggregate(
        F.filter(
            F.col("fs"), lambda x: F.element_at(x, 1) <= F.col("day")
        ),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)),
        lambda acc, x: F.array(
            F.element_at(acc, 1)
            * (
                1
                - (F.element_at(x, 2) + F.element_at(x, 3))
                / F.element_at(x, 4)
            ),
            F.element_at(acc, 2)
            + F.element_at(acc, 1)
            * F.element_at(x, 2)
            / F.element_at(x, 4),
            F.element_at(acc, 3)
            + F.element_at(acc, 1)
            * F.element_at(x, 3)
            / F.element_at(x, 4),
        ),
    )
    return (
        r.crossJoin(F.broadcast(a))
        .select(
            "day",
            "n_risk",
            F.col("dp").alias("d_purchase"),
            F.col("de").alias("d_error"),
            st.alias("st"),
        )
        .select(
            "day",
            "n_risk",
            "d_purchase",
            "d_error",
            (F.floor(F.element_at(F.col("st"), 2) * 1e6) / 1e6).alias(
                "cif_purchase"
            ),
            (F.floor(F.element_at(F.col("st"), 3) * 1e6) / 1e6).alias(
                "cif_error"
            ),
        )
        .orderBy("day")
    )


@register(
    "sql_variables_exec",
    section="2.11",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_quantity) AS BIGINT) AS qty
    FROM lineitem WHERE l_quantity >= 40
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    notes="Spark 4 SQL session-state surface in one statement chain: "
    "DECLARE OR REPLACE VARIABLE + SET VAR (session variables — the "
    "ANSI way to thread a threshold through SQL without string "
    "interpolation), EXECUTE IMMEDIATE over a query string with a "
    "NAMED parameter, and IDENTIFIER() resolving the table name from "
    "that parameter (injection-safe dynamic SQL — the identifier is "
    "parsed as a name, never spliced as text). The oracle is the "
    "equivalent static statement with every binding inlined, so the "
    "hash match proves the whole indirection chain is semantically "
    "transparent. DECLARE OR REPLACE keeps the query idempotent "
    "within a session. Scan-shaped aggregate underneath",
)
def sql_variables_exec(spark, sf_dir):
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE vmin_qty BIGINT")
    spark.sql("SET VAR vmin_qty = 40")
    return spark.sql(
        "EXECUTE IMMEDIATE"
        " 'SELECT l_returnflag AS flag,"
        " CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(l_quantity) AS BIGINT) AS qty"
        " FROM IDENTIFIER(:tbl) WHERE l_quantity >= vmin_qty"
        " GROUP BY l_returnflag ORDER BY l_returnflag'"
        " USING 'lineitem' AS tbl"
    )


_SSS_START = 10_000_000  # threshold search start: $100k in cents (~13
# 9/8 steps to the fixture's price ceiling; a $1k start measured 52
# sequential COUNT scans = 13 s at sf0.1 for no extra information —
# if every order were under the start, the loop exits immediately)
_SSS_STOP_N = 200  # step only while the NEXT threshold keeps more than
# this many orders — a look-ahead stop rule, so the converged survivor
# set can never overshoot to empty (round-10 vacuous-green fix: the old
# post-step rule landed on 0 survivors at sf>=0.01 because one 9/8 step
# jumped past the $500k price ceiling; count at convergence is now
# 261 / 1117 / 11217 at sf0.001/0.01/0.1)


@register(
    "sql_scripting_surface",
    section="2.11",
    oracle=f"""
    WITH RECURSIVE search(t) AS (
      SELECT CAST({_SSS_START} AS BIGINT)
      UNION ALL
      SELECT t * 9 // 8 FROM search
      WHERE (SELECT COUNT(*) FROM orders
             WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) >= t * 9 // 8)
            > {_SSS_STOP_N}
    ),
    fin AS (SELECT MAX(t) AS t FROM search)
    SELECT COALESCE(o.o_orderpriority, 'ALL') AS priority,
           CAST(f.t AS BIGINT) AS thresh_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders o CROSS JOIN fin f
    WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) >= f.t
    GROUP BY ROLLUP(o.o_orderpriority), f.t
    ORDER BY priority
    """,
    notes="Spark 4 SQL SCRIPTING surface (BEGIN...END compound "
    "statements — the procedural layer ABOVE sql_variables_exec's "
    "session variables): DECLARE'd locals, a data-dependent WHILE "
    "loop whose condition is a scalar subquery against the orders "
    "view (iterative 9/8 threshold search with a LOOK-AHEAD stop "
    f"rule: step only while the next threshold keeps > {_SSS_STOP_N} "
    "orders, so the converged survivor set is provably non-empty — "
    "the adaptive-cutoff pattern a "
    "report author writes procedurally), and a final ROLLUP "
    "aggregate over the survivors at the converged threshold. The "
    "oracle replays the SAME search as a recursive CTE (MAX(t) of "
    "the generated chain = the loop's exit value, threshold updates "
    "are exact integer 9/8 steps in both engines), so the hash match "
    "proves the scripted control flow is sugar over the declarative "
    "fixpoint — the sql_pipe_surface discipline applied to "
    "procedural SQL. Each loop iteration is one scan-shaped COUNT; "
    "the iteration count is log_{{9/8}} of the price range — "
    "corpus-INDEPENDENT (it depends on the price distribution's "
    "spread, not the row count), so the search costs O(log) scans "
    "at any scale",
)
def sql_scripting_surface(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        BEGIN
          DECLARE t BIGINT DEFAULT {_SSS_START};
          WHILE (SELECT COUNT(*) FROM orders
                 WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       >= t * 9 DIV 8)
                > {_SSS_STOP_N} DO
            SET t = t * 9 DIV 8;
          END WHILE;
          SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
                 t AS thresh_cents,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders
          WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) >= t
          GROUP BY ROLLUP(o_orderpriority)
          ORDER BY priority;
        END
        """
    )
