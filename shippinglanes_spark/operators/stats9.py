"""Round-8 pack 2 (SURVEY §2.4/§2.8 extensions): Wilcoxon signed-rank
(the PAIRED nonparametric test the family was missing next to
agg_mannwhitney_auc's independent-samples U), MAP@10 (completing the
retrieval-eval trio with rank_ndcg / rank_mrr), Cohen's d + Hedges' g
effect sizes (the magnitude companion to agg_ttest_welch / agg_mde /
agg_power_analysis), and a local-level Kalman filter (the
state-space smoother next to ts_holt / ts_ewma).

Cross-engine float discipline (FIXTURES.md): Wilcoxon rank sums are
DOUBLED average ranks (2*min_rank + ties - 1) so tie-averaged ranks
stay BIGINT; the z-statistic is one divide + sqrt on exact integers,
floored 6 dp. MAP terms are integer micro divisions (cum_hits * 1e6
div k) summed then integer-divided — not a float anywhere. Effect
sizes follow the agg_ttest_welch recipe: six integer moments, floats
only in the final row-local formula with identical association, sums
cast to DOUBLE before squaring (BIGINT s*s overflows by sf1). The
Kalman fold is the ts_holt discipline: both engines left-fold the
identical expression tree over the day-ordered series (F.aggregate /
list_reduce), so the float sequences are bit-identical.

Scale notes (100 TB): every query is one or two keyed fact rollups
followed by group-sized (per-nation / per-region / per-day) work.
Wilcoxon's rank window is nation-partition-local over paired
customers; MAP's ranking is nation-partition-local; effect sizes are
a zero-shuffle moment pass; the Kalman fold is per-type over a
calendar-bounded array.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

# Wilcoxon pairing: per-customer order spend (exact cents) before vs
# on/after this cut — the two "treatments" of the paired design
_WSR_CUT = "1998-01-01 00:00:00"

# MAP relevance: a customer is relevant when they placed at least one
# HIGH-priority order above this bar (~30% of customers — spreads AP
# without saturating it; the URGENT+450k bar MRR uses is too rare for
# a top-10 precision metric, nearly every nation would report AP=0)
_MAP_PRICE = 400000
_MAP_PRIORITY = "2-HIGH"
_MAP_K = 10

# effect size groups: expedited (urgent/high) vs routine order values,
# in WHOLE DOLLARS — cents² sums would pass 2^63 by ~sf10; dollar²
# sums stay exact past sf100 (5e5² x 3e7 rows ≈ 7.5e18 at sf100)
_ES_EXPEDITED = ("1-URGENT", "2-HIGH")

# Kalman local-level: process noise Q, observation noise R (literal
# doubles shared by both engines; the fold seeds x0 = y0, P0 = 0)
_KF_Q = "25.0"
_KF_R = "100.0"


@register(
    "agg_wilcoxon_signed_rank",
    section="2.4",
    oracle=f"""
    WITH u AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '{_WSR_CUT}'
                 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS pre,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_WSR_CUT}'
                 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS post
      FROM orders GROUP BY o_custkey),
    d AS (
      SELECT c.c_nationkey AS nation_id,
             CAST(u.post - u.pre AS BIGINT) AS d,
             CAST(ABS(u.post - u.pre) AS BIGINT) AS adiff
      FROM u JOIN customer c ON c.c_custkey = u.o_custkey
      WHERE u.pre IS NOT NULL AND u.post IS NOT NULL AND u.pre <> u.post),
    r AS (
      SELECT nation_id, d,
             2 * RANK() OVER (PARTITION BY nation_id ORDER BY adiff)
               + COUNT(*) OVER (PARTITION BY nation_id, adiff) - 1 AS r2,
             COUNT(*) OVER (PARTITION BY nation_id, adiff) AS t
      FROM d),
    a AS (
      SELECT nation_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT)
               AS w2_plus,
             CAST(SUM(t * t - 1) AS BIGINT) AS tie3
      FROM r GROUP BY nation_id)
    SELECT nation_id, n AS n_pairs, w2_plus,
           FLOOR(CAST(w2_plus - n * (n + 1) / 2 AS DOUBLE)
                 / (2 * sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie3
                                  AS DOUBLE) / 48)) * 1e6) / 1e6 AS z
    FROM a
    ORDER BY nation_id
    """,
    notes=f"Wilcoxon signed-rank test per nation on paired customer "
    f"spend (exact cents) before vs after {_WSR_CUT[:10]}: pairs are "
    f"customers ordering in BOTH halves, zero differences dropped per "
    f"the textbook, and tie-averaged ranks stay BIGINT by carrying "
    f"DOUBLED ranks (2*avg_rank = 2*min_rank + tie_count - 1, the "
    f"integer identity). W+ (doubled), n and the tie correction "
    f"sum(t^3-t) = sum over rows of (t^2-1) are exact integers; "
    f"z = (2W+ - n(n+1)/2... the doubled-numerator form) over "
    f"2*sqrt((2n(n+1)(2n+1) - ties)/48) is ONE divide + sqrt on exact "
    f"ints, floored 6 dp — bit-identical cross-engine. The PAIRED "
    f"sibling of agg_mannwhitney_auc (independent U) and the "
    f"nonparametric sibling of agg_ttest_welch. Fact work is one "
    f"customer-keyed conditional rollup; the rank window runs over "
    f"nation-partition-local pairs",
)
def agg_wilcoxon_signed_rank(spark, sf_dir):
    """Corpus reduces to one row per paired customer in a single
    conditional aggregate; ranking is nation-local (customers per
    nation, calendar-independent) so at 100 TB only the first rollup
    grows. No float enters before the final row-local z formula."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    u = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < F.lit(_WSR_CUT).cast("timestamp"), cents)
        ).alias("pre"),
        F.sum(
            F.when(F.col("o_orderdate") >= F.lit(_WSR_CUT).cast("timestamp"), cents)
        ).alias("post"),
    )
    d = (
        u.where(
            F.col("pre").isNotNull()
            & F.col("post").isNotNull()
            & (F.col("pre") != F.col("post"))
        )
        .join(c, u.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").alias("nation_id"),
            (F.col("post") - F.col("pre")).cast("long").alias("d"),
            F.abs(F.col("post") - F.col("pre")).cast("long").alias("adiff"),
        )
    )
    wn = W.partitionBy("nation_id").orderBy("adiff")
    wt = W.partitionBy("nation_id", "adiff")
    r = d.select(
        "nation_id",
        "d",
        (
            F.lit(2) * F.rank().over(wn) + F.count(F.lit(1)).over(wt) - 1
        ).cast("long").alias("r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("t"),
    )
    a = r.groupBy("nation_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.col("t") * F.col("t") - 1).cast("long").alias("tie3"),
    )
    num = (
        F.col("w2_plus") - F.col("n") * (F.col("n") + 1) / F.lit(2)
    ).cast("double")
    var48 = (
        F.lit(2) * F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)
        - F.col("tie3")
    ).cast("double")
    return a.select(
        "nation_id",
        F.col("n").alias("n_pairs"),
        "w2_plus",
        (F.floor(num / (2 * F.sqrt(var48 / 48)) * 1e6) / 1e6).alias("z"),
    ).orderBy("nation_id")


@register(
    "rank_map",
    section="2.4",
    oracle=f"""
    WITH rel AS (
      SELECT c.c_nationkey AS nation_id, c.c_custkey, c.c_acctbal,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_totalprice > {_MAP_PRICE}
                                 AND o.o_orderpriority = '{_MAP_PRIORITY}')
                  THEN 1 ELSE 0 END AS hit
      FROM customer c),
    rk AS (
      SELECT nation_id, hit,
             ROW_NUMBER() OVER (PARTITION BY nation_id
                                ORDER BY c_acctbal DESC, c_custkey) AS rk,
             SUM(hit) OVER (PARTITION BY nation_id
                            ORDER BY c_acctbal DESC, c_custkey) AS cum
      FROM rel),
    a AS (
      SELECT nation_id,
             CAST(SUM(hit) AS BIGINT) AS n_rel,
             CAST(SUM(CASE WHEN hit = 1 AND rk <= {_MAP_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel_topk,
             CAST(SUM(CASE WHEN hit = 1 AND rk <= {_MAP_K}
                      THEN cum * 1000000 // rk ELSE 0 END) AS BIGINT)
               AS term_sum
      FROM rk GROUP BY nation_id)
    SELECT nation_id, n_rel, n_rel_topk,
           CAST(CASE WHEN n_rel = 0 THEN 0
                ELSE term_sum // LEAST(n_rel, {_MAP_K}) END AS BIGINT)
             AS ap_micro
    FROM a
    ORDER BY nation_id
    """,
    notes=f"average precision @ {_MAP_K} of the balance-ranked customer "
    f"list per nation (the MAP ingredient), relevance = placed a "
    f"{_MAP_PRIORITY} order above {_MAP_PRICE}: at each relevant rank "
    f"k <= {_MAP_K} the precision term is the INTEGER micro division "
    f"cum_hits * 1e6 div k, AP the integer division of the term sum "
    f"by min(R, {_MAP_K}) — deterministic in both engines, no float "
    f"anywhere. Nations with no relevant customer report 0 (the "
    f"rank_mrr shape discipline). Completes the retrieval-eval trio: "
    f"nDCG grades, MRR finds-first, AP integrates precision. One "
    f"semi-join-shaped orders rollup; ranking is "
    f"nation-partition-local",
)
def rank_map(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    hits = (
        o.where(
            (F.col("o_totalprice") > _MAP_PRICE)
            & (F.col("o_orderpriority") == _MAP_PRIORITY)
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    rel = c.join(hits, "c_custkey", "left").select(
        F.col("c_nationkey").alias("nation_id"),
        "c_custkey",
        "c_acctbal",
        F.coalesce("hit", F.lit(0)).alias("hit"),
    )
    w = W.partitionBy("nation_id").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    rk = rel.select(
        "nation_id",
        "hit",
        F.row_number().over(w).alias("rk"),
        F.sum("hit").over(w).alias("cum"),
    )
    is_term = (F.col("hit") == 1) & (F.col("rk") <= _MAP_K)
    a = rk.groupBy("nation_id").agg(
        F.sum("hit").cast("long").alias("n_rel"),
        F.sum(F.when(is_term, 1).otherwise(0)).cast("long").alias("n_rel_topk"),
        F.sum(
            F.when(is_term, F.expr("cum * 1000000 div rk")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("term_sum"),
    )
    return a.select(
        "nation_id",
        "n_rel",
        "n_rel_topk",
        F.when(F.col("n_rel") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(f"CAST(term_sum div LEAST(n_rel, {_MAP_K}) AS BIGINT)")
        )
        .alias("ap_micro"),
    ).orderBy("nation_id")


@register(
    "agg_effect_size",
    section="2.4",
    oracle=f"""
    WITH x AS (
      SELECT r.r_regionkey AS region_id,
             CASE WHEN o.o_orderpriority IN
                  ('{_ES_EXPEDITED[0]}', '{_ES_EXPEDITED[1]}')
                  THEN 1 ELSE 0 END AS g,
             CAST(ROUND(o.o_totalprice) AS BIGINT) AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey),
    s AS (
      SELECT region_id,
             CAST(COUNT(*) FILTER (g = 1) AS BIGINT) AS n1,
             CAST(SUM(v) FILTER (g = 1) AS BIGINT) AS s1,
             CAST(SUM(v * v) FILTER (g = 1) AS BIGINT) AS ss1,
             CAST(COUNT(*) FILTER (g = 0) AS BIGINT) AS n2,
             CAST(SUM(v) FILTER (g = 0) AS BIGINT) AS s2,
             CAST(SUM(v * v) FILTER (g = 0) AS BIGINT) AS ss2
      FROM x GROUP BY region_id),
    f AS (
      SELECT region_id, n1, n2,
             CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md,
             ((ss1 - (CAST(s1 AS DOUBLE) / n1) * s1)
              + (ss2 - (CAST(s2 AS DOUBLE) / n2) * s2))
               / (n1 + n2 - 2) AS sp2
      FROM s)
    SELECT region_id, n1, n2,
           FLOOR(md / sqrt(sp2) * 1e6) / 1e6 AS cohens_d,
           FLOOR(md / sqrt(sp2)
                 * (1 - 3 / (4 * CAST(n1 + n2 AS DOUBLE) - 9)) * 1e6) / 1e6
             AS hedges_g
    FROM f
    ORDER BY region_id
    """,
    notes="Cohen's d and Hedges' g per region for expedited "
    "(URGENT/HIGH) vs routine order values: six exact integer moments "
    "per region (n / sum / sum-of-squares per group, values in WHOLE "
    "dollars so the squared sums stay BIGINT past sf100 — cents would "
    "overflow by ~sf10), pooled variance and the small-sample Hedges "
    "correction 1 - 3/(4N-9) computed in the final row-local formula "
    "with identical association on both engines, floored 6 dp. The "
    "effect-MAGNITUDE companion to agg_ttest_welch (significance), "
    "agg_mde (design) and agg_power_analysis: d is what a reviewer "
    "asks for when n makes everything significant. One map-side-"
    "combined moment pass, region-count-sized thereafter",
)
def agg_effect_size(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    x = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_regionkey").alias("region_id"),
            F.col("o_orderpriority").isin(*_ES_EXPEDITED).cast("long").alias("g"),
            F.round(F.col("o_totalprice")).cast("long").alias("v"),
        )
    )
    is1 = F.col("g") == 1
    is0 = F.col("g") == 0
    s = x.groupBy("region_id").agg(
        F.count(F.when(is1, 1)).cast("long").alias("n1"),
        F.sum(F.when(is1, F.col("v"))).cast("long").alias("s1"),
        F.sum(F.when(is1, F.col("v") * F.col("v"))).cast("long").alias("ss1"),
        F.count(F.when(is0, 1)).cast("long").alias("n2"),
        F.sum(F.when(is0, F.col("v"))).cast("long").alias("s2"),
        F.sum(F.when(is0, F.col("v") * F.col("v"))).cast("long").alias("ss2"),
    )
    md = F.col("s1").cast("double") / F.col("n1") - F.col("s2").cast(
        "double"
    ) / F.col("n2")
    sp2 = (
        (
            F.col("ss1")
            - (F.col("s1").cast("double") / F.col("n1")) * F.col("s1")
        )
        + (
            F.col("ss2")
            - (F.col("s2").cast("double") / F.col("n2")) * F.col("s2")
        )
    ) / (F.col("n1") + F.col("n2") - 2)
    f = s.select("region_id", "n1", "n2", md.alias("md"), sp2.alias("sp2"))
    d = F.col("md") / F.sqrt(F.col("sp2"))
    corr = 1 - 3 / (4 * (F.col("n1") + F.col("n2")).cast("double") - 9)
    return f.select(
        "region_id",
        "n1",
        "n2",
        (F.floor(d * 1e6) / 1e6).alias("cohens_d"),
        (F.floor(d * corr * 1e6) / 1e6).alias("hedges_g"),
    ).orderBy("region_id")


@register(
    "ts_kalman_level",
    section="2.8",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             list(CAST(y AS DOUBLE) ORDER BY day) AS ys
      FROM d GROUP BY event_type),
    f AS (
      SELECT event_type, n_days,
             list_reduce(
               list_transform(ys, y -> [y, 0.0]),
               (acc, x) -> [
                 acc[1] + ((acc[2] + {_KF_Q})
                           / ((acc[2] + {_KF_Q}) + {_KF_R}))
                          * (x[1] - acc[1]),
                 (1.0 - (acc[2] + {_KF_Q})
                        / ((acc[2] + {_KF_Q}) + {_KF_R}))
                 * (acc[2] + {_KF_Q})
               ]) AS st
      FROM s)
    SELECT event_type, n_days,
           ROUND(st[1], 6) AS level,
           ROUND(st[2], 6) AS p_var,
           ROUND((st[2] + {_KF_Q}) / ((st[2] + {_KF_Q}) + {_KF_R}), 6)
             AS next_gain
    FROM f
    """,
    notes=f"local-level Kalman filter (Q={_KF_Q}, R={_KF_R}, x0=y0, "
    f"P0=0) over each type's daily event-count series: predict "
    f"P+Q, gain K=(P+Q)/(P+Q+R), update x+K*(y-x), (1-K)*(P+Q) — the "
    f"textbook scalar recurrence folded LEFT over the day-ordered "
    f"series on both engines (F.aggregate / list_reduce) with the "
    f"IDENTICAL expression tree, so every divide/multiply is the same "
    f"correctly-rounded IEEE op in the same order and the float "
    f"sequences are bit-identical (the ts_holt discipline; ROUND 6dp "
    f"is belt-and-braces). State rides a 2-element DOUBLE array "
    f"because list_reduce seeds from the first element. The "
    f"state-space member of the smoothing family: ewma fixes the "
    f"gain, Holt adds trend, Kalman ADAPTS the gain as P converges — "
    f"next_gain is the steady-state Riccati value a monitor would "
    f"use. One keyed shuffle; folds are per-type over the "
    f"calendar-bounded array",
)
def ts_kalman_level(spark, sf_dir):
    """Sequential filter as an in-group left fold (no iterative jobs,
    no full-series window): groups fold independently, so at 100 TB a
    million per-key series filter in one pass — the exact shape of
    ts_holt, with an adaptive gain instead of a fixed alpha."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))),"
            " x -> CAST(x.y AS DOUBLE))"
        ).alias("ys"),
    )
    st = F.expr(
        f"aggregate(slice(ys, 2, greatest(size(ys) - 1, 0)),"
        f" array(element_at(ys, 1), CAST(0.0 AS DOUBLE)),"
        f" (acc, y) -> array("
        f"   acc[0] + ((acc[1] + {_KF_Q}) / ((acc[1] + {_KF_Q}) + {_KF_R}))"
        f"            * (y - acc[0]),"
        f"   (CAST(1.0 AS DOUBLE) - (acc[1] + {_KF_Q})"
        f"          / ((acc[1] + {_KF_Q}) + {_KF_R}))"
        f"   * (acc[1] + {_KF_Q})))"
    )
    # F.lit doubles, not F.expr("25.0") — a bare decimal literal in a
    # SQL string parses as DECIMAL in Spark (round-4 gotcha); the fold
    # string is safe because acc[] is DOUBLE and promotes each op
    q = F.lit(float(_KF_Q))
    rr = F.lit(float(_KF_R))
    return s.select(
        "event_type",
        "n_days",
        F.round(st.getItem(0), 6).alias("level"),
        F.round(st.getItem(1), 6).alias("p_var"),
        F.round(
            (st.getItem(1) + q) / ((st.getItem(1) + q) + rr), 6
        ).alias("next_gain"),
    )


# Friedman: blocks = calendar days, treatments = the 5 event types,
# response = daily event count. 31 tied (day, count) pairs exist at
# sf0.001, so the tie-corrected denominator is genuinely exercised.
_FR_K = 5

# TOST equivalence margin (whole dollars) and one-sided z critical
# value (alpha = 0.05). The margin is sized so fixture classes split
# between equivalent / not-equivalent instead of all passing.
_TOST_MARGIN = 30000
_TOST_CRIT = "1.645"
_TOST_BASE = "5-LOW"

# RBO (rank-biased overlap, Webber et al. 2010) at depth 10 with
# p = 1/2: RBO = sum_d overlap_d / (d * 2^d). The per-depth NANO-unit
# coefficients C[d] = 1e9 div (d * 2^d) and their suffix sums
# S[m] = sum_{d>=m} C[d] are LITERAL integer tables (the rank_ndcg
# discount-table trick), so a common member at ranks (ra, rb)
# contributes exactly S[max(ra, rb)] and the whole score is a BIGINT
# sum. Identical rankings score sum(d * C[d]) ~ 0.999e9; a single
# shared top item scores S[1] ~ 0.693e9 (= ln 2, the p=1/2 series).
_RBO_K = 10
_RBO_C = tuple(10**9 // (d * 2**d) for d in range(1, _RBO_K + 1))
_RBO_S = tuple(sum(_RBO_C[m - 1 :]) for m in range(1, _RBO_K + 1))


@register(
    "agg_friedman",
    section="2.4",
    oracle=f"""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    complete AS (
      SELECT day FROM d0 GROUP BY day HAVING COUNT(*) = {_FR_K}),
    d AS (
      SELECT d0.* FROM d0 JOIN complete USING (day)),
    r AS (
      SELECT day, event_type,
             2 * RANK() OVER (PARTITION BY day ORDER BY c)
               + COUNT(*) OVER (PARTITION BY day, c) - 1 AS r2,
             COUNT(*) OVER (PARTITION BY day, c) AS t
      FROM d),
    blocks AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
                      CAST(SUM(t * t - 1) AS BIGINT) AS ties
               FROM r),
    sums AS (
      SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2_sum
      FROM r GROUP BY event_type),
    q AS (
      SELECT b.n, b.ties,
             CAST(SUM(s.r2_sum * s.r2_sum) AS BIGINT) AS sr2
      FROM sums s CROSS JOIN blocks b GROUP BY b.n, b.ties),
    stat AS (
      SELECT n,
             CAST(3 * sr2 AS DOUBLE) / (n * {_FR_K} * ({_FR_K} + 1))
               - 3 * n * ({_FR_K} + 1) AS q_raw,
             1 - CAST(ties AS DOUBLE)
                 / (n * {_FR_K} * ({_FR_K} * {_FR_K} - 1)) AS denom
      FROM q)
    SELECT s.event_type, s.r2_sum,
           CAST(s.r2_sum * 1000 // (2 * t.n) AS BIGINT) AS mean_rank_milli,
           FLOOR(t.q_raw * 1e6) / 1e6 AS q_stat,
           FLOOR(t.q_raw / t.denom * 1e6) / 1e6 AS q_tie_corrected
    FROM sums s CROSS JOIN stat t
    ORDER BY s.event_type
    """,
    notes=f"Friedman test (k = {_FR_K} event types as treatments, "
    f"calendar days as blocks, daily counts as the response): within "
    f"each day the types are ranked with the DOUBLED-average-rank "
    f"trick (2*min_rank + ties - 1 — the agg_wilcoxon_signed_rank "
    f"identity), so per-type rank sums, their squares and the tie "
    f"term sum(t^3-t) are exact BIGINTs; Q = 3*sum(R2_j^2)/(n k(k+1)) "
    f"- 3n(k+1) (the doubled-rank algebra folds the classic 12/4) and "
    f"the tie-corrected Q divide once each in an identical expression "
    f"tree, floored 6 dp. Completes the nonparametric design grid: "
    f"Mann-Whitney (2 independent), Kruskal-Wallis (k independent), "
    f"Wilcoxon (2 paired), Friedman (k paired). Each treatment row "
    f"carries its rank sum + the global verdict. Blocks are enforced "
    f"COMPLETE (days missing any of the {_FR_K} types are dropped in "
    f"both engines before ranking — an incomplete day would rank only "
    f"the present types while n and k still counted it fully, "
    f"silently biasing Q). One daily rollup; ranks are "
    f"day-partition-local over {_FR_K} rows",
)
def agg_friedman(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d0 = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # Friedman requires COMPLETE blocks: a day missing a type would
    # rank only the present types while n and k still count it fully,
    # biasing Q. Keep only days where all k treatments appear (both
    # engines agree on the filter, so the bias can't hide in the hash).
    complete = (
        d0.groupBy("day")
        .agg(F.count(F.lit(1)).alias("kt"))
        .where(F.col("kt") == _FR_K)
        .select("day")
    )
    d = d0.join(F.broadcast(complete), "day")
    wd = W.partitionBy("day").orderBy("c")
    wt = W.partitionBy("day", "c")
    r = d.select(
        "day",
        "event_type",
        (
            F.lit(2) * F.rank().over(wd) + F.count(F.lit(1)).over(wt) - 1
        ).cast("long").alias("r2"),
        F.count(F.lit(1)).over(wt).cast("long").alias("t"),
    ).localCheckpoint()  # day x type sized, read twice (blocks + sums)
    blocks = r.agg(
        F.countDistinct("day").cast("long").alias("n"),
        F.sum(F.col("t") * F.col("t") - 1).cast("long").alias("ties"),
    )
    sums = r.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("r2_sum")
    ).localCheckpoint()  # k rows, read twice (sr2 + output join)
    q = sums.join(F.broadcast(blocks)).groupBy("n", "ties").agg(
        F.sum(F.col("r2_sum") * F.col("r2_sum")).cast("long").alias("sr2")
    )
    k = _FR_K
    q_raw = (F.lit(3) * F.col("sr2")).cast("double") / (
        F.col("n") * k * (k + 1)
    ) - 3 * F.col("n") * (k + 1)
    denom = 1 - F.col("ties").cast("double") / (
        F.col("n") * k * (k * k - 1)
    )
    stat = q.select(
        "n", q_raw.alias("q_raw"), denom.alias("denom")
    )
    return (
        sums.join(F.broadcast(stat))
        .select(
            "event_type",
            "r2_sum",
            F.expr("CAST(r2_sum * 1000 div (2 * n) AS BIGINT)").alias(
                "mean_rank_milli"
            ),
            (F.floor(F.col("q_raw") * 1e6) / 1e6).alias("q_stat"),
            (F.floor(F.col("q_raw") / F.col("denom") * 1e6) / 1e6).alias(
                "q_tie_corrected"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "agg_tost_equivalence",
    section="2.4",
    oracle=f"""
    WITH x AS (
      SELECT o_orderpriority AS pri,
             CAST(ROUND(o_totalprice) AS BIGINT) AS v
      FROM orders),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(SUM(v) AS BIGINT) AS s2,
             CAST(SUM(v * v) AS BIGINT) AS ss2
      FROM x WHERE pri = '{_TOST_BASE}'),
    grp AS (
      SELECT pri, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(v) AS BIGINT) AS s1,
             CAST(SUM(v * v) AS BIGINT) AS ss1
      FROM x WHERE pri <> '{_TOST_BASE}' GROUP BY pri),
    f AS (
      SELECT g.pri, g.n1, b.n2,
             CAST(g.s1 AS DOUBLE) / g.n1 - CAST(b.s2 AS DOUBLE) / b.n2
               AS md,
             sqrt((g.ss1 - (CAST(g.s1 AS DOUBLE) / g.n1) * g.s1)
                  / (g.n1 - 1) / g.n1
                  + (b.ss2 - (CAST(b.s2 AS DOUBLE) / b.n2) * b.s2)
                    / (b.n2 - 1) / b.n2) AS se
      FROM grp g CROSS JOIN base b)
    SELECT pri, n1, n2,
           FLOOR((md + {_TOST_MARGIN}) / se * 1e6) / 1e6 AS t_lower,
           FLOOR((md - {_TOST_MARGIN}) / se * 1e6) / 1e6 AS t_upper,
           (md + {_TOST_MARGIN}) / se > {_TOST_CRIT}
             AND (md - {_TOST_MARGIN}) / se < -{_TOST_CRIT} AS equivalent
    FROM f
    ORDER BY pri
    """,
    notes=f"TOST equivalence test (two one-sided tests, Welch SE) of "
    f"each priority class's mean order value against the "
    f"'{_TOST_BASE}' baseline, margin +/-{_TOST_MARGIN} dollars: the "
    f"six integer moments per pair are the agg_ttest_welch recipe, "
    f"t_lower/t_upper one identical float chain each (floored 6 dp), "
    f"and the equivalence verdict compares the RAW bit-identical "
    f"doubles against the literal z critical value {_TOST_CRIT} — so "
    f"the boolean cannot disagree across engines. The EQUIVALENCE "
    f"member of the experimentation family: t-tests ask 'different?', "
    f"TOST asks 'same within a margin?' — the question a launch "
    f"review actually asks about a neutral metric. One map-side "
    f"moment pass, priority-count-sized thereafter",
)
def agg_tost_equivalence(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice")).cast("long").alias("v"),
    )
    base = x.where(F.col("pri") == _TOST_BASE).agg(
        F.count(F.lit(1)).cast("long").alias("n2"),
        F.sum("v").cast("long").alias("s2"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss2"),
    )
    grp = x.where(F.col("pri") != _TOST_BASE).groupBy("pri").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss1"),
    )
    md = F.col("s1").cast("double") / F.col("n1") - F.col("s2").cast(
        "double"
    ) / F.col("n2")
    se = F.sqrt(
        (
            F.col("ss1")
            - (F.col("s1").cast("double") / F.col("n1")) * F.col("s1")
        )
        / (F.col("n1") - 1)
        / F.col("n1")
        + (
            F.col("ss2")
            - (F.col("s2").cast("double") / F.col("n2")) * F.col("s2")
        )
        / (F.col("n2") - 1)
        / F.col("n2")
    )
    f = grp.join(F.broadcast(base)).select(
        "pri", "n1", "n2", md.alias("md"), se.alias("se")
    )
    crit = float(_TOST_CRIT)
    t_lo = (F.col("md") + _TOST_MARGIN) / F.col("se")
    t_hi = (F.col("md") - _TOST_MARGIN) / F.col("se")
    return f.select(
        "pri",
        "n1",
        "n2",
        (F.floor(t_lo * 1e6) / 1e6).alias("t_lower"),
        (F.floor(t_hi * 1e6) / 1e6).alias("t_upper"),
        ((t_lo > crit) & (t_hi < -crit)).alias("equivalent"),
    ).orderBy("pri")


def _rbo_s_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {m + 1} THEN {s}" for m, s in enumerate(_RBO_S)
    )
    return f"CASE {col} {cases} ELSE 0 END"


def _rbo_s_col(m_col):
    expr = F.lit(0).cast("long")
    for m, s in enumerate(_RBO_S):
        expr = F.when(m_col == m + 1, F.lit(s).cast("long")).otherwise(expr)
    return expr


@register(
    "rank_rbo",
    section="2.4",
    oracle=f"""
    WITH act AS (
      SELECT c.c_nationkey AS nation_id, c.c_custkey, c.c_acctbal,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3),
    a AS (
      SELECT nation_id, c_custkey,
             ROW_NUMBER() OVER (PARTITION BY nation_id
                                ORDER BY c_acctbal DESC, c_custkey) AS ra
      FROM act QUALIFY ra <= {_RBO_K}),
    b AS (
      SELECT nation_id, c_custkey,
             ROW_NUMBER() OVER (PARTITION BY nation_id
                                ORDER BY n_orders DESC, c_custkey) AS rb
      FROM act QUALIFY rb <= {_RBO_K}),
    j AS (
      SELECT a.nation_id,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM({_rbo_s_sql('GREATEST(a.ra, b.rb)')}) AS BIGINT)
               AS rbo_nano
      FROM a JOIN b ON a.nation_id = b.nation_id
                   AND a.c_custkey = b.c_custkey
      GROUP BY a.nation_id),
    nat AS (SELECT DISTINCT nation_id FROM act)
    SELECT nat.nation_id,
           CAST(COALESCE(j.n_common, 0) AS BIGINT) AS n_common,
           CAST(COALESCE(j.rbo_nano, 0) AS BIGINT) AS rbo_nano
    FROM nat LEFT JOIN j USING (nation_id)
    ORDER BY nat.nation_id
    """,
    notes=f"rank-biased overlap (Webber et al. 2010, p=1/2, depth "
    f"{_RBO_K}) between two top-{_RBO_K} customer rankings per nation "
    f"— wealth (acctbal) vs activity (order count): RBO = sum_d "
    f"overlap_d/(d*2^d) collapses to one BIGINT sum because each "
    f"common member at ranks (ra, rb) contributes exactly the LITERAL "
    f"suffix-sum S[max(ra,rb)] of the nano-unit coefficient table "
    f"1e9 div (d*2^d) — the rank_ndcg discount-table trick applied to "
    f"prefix-overlap weights (identical rankings ~0.999e9; one shared "
    f"top item 0.693e9 = ln 2, the p=1/2 series). The RANKING-"
    f"agreement companion to agg_kendall_tau (value pairs): RBO is "
    f"top-weighted and handles non-conjoint lists, which is what "
    f"comparing two retrieval systems actually needs. One orders "
    f"rollup; rankings nation-partition-local, the join is "
    f"top-{_RBO_K}-sized",
)
def rank_rbo(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    act = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_nationkey", "c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
        .select(
            F.col("c_nationkey").alias("nation_id"),
            "c_custkey",
            "c_acctbal",
            "n_orders",
        )
        # both rankings read the same rollup; checkpoint so the
        # customer/orders join runs once (two fact scans at 100 TB)
        .localCheckpoint()
    )
    wa = W.partitionBy("nation_id").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wb = W.partitionBy("nation_id").orderBy(
        F.col("n_orders").desc(), F.col("c_custkey")
    )
    a = (
        act.withColumn("ra", F.row_number().over(wa))
        .where(F.col("ra") <= _RBO_K)
        .select("nation_id", "c_custkey", "ra")
    )
    b = (
        act.withColumn("rb", F.row_number().over(wb))
        .where(F.col("rb") <= _RBO_K)
        .select("nation_id", "c_custkey", "rb")
    )
    j = (
        a.join(b, ["nation_id", "c_custkey"])
        .select(
            "nation_id",
            _rbo_s_col(F.greatest(F.col("ra"), F.col("rb"))).alias("s"),
        )
        .groupBy("nation_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("s").cast("long").alias("rbo_nano"),
        )
    )
    # left-join from the ranking base: a nation whose two top-K lists
    # share NO members must report rbo_nano = 0, not vanish from the
    # output (the rank_mrr/rank_map "no hit reports 0" discipline)
    nat = act.select("nation_id").distinct()
    return (
        nat.join(j, "nation_id", "left")
        .select(
            "nation_id",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.coalesce("rbo_nano", F.lit(0)).cast("long").alias("rbo_nano"),
        )
        .orderBy("nation_id")
    )


# Croston smoothing constant is 1/2 (exact halvings, the ts_holt trick);
# the first demand seeds z, the first interval is defined as 1.0
_CR_GRID_HOURS = "hour"


@register(
    "ts_croston",
    section="2.8",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch_us(date_trunc('hour', ts)) // 3600000000
                  AS BIGINT) AS hi,
             CAST(COUNT(*) AS BIGINT) AS size
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT event_type, hi, size,
             hi - LAG(hi) OVER (PARTITION BY event_type ORDER BY hi)
               AS gap
      FROM h),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_demand,
             list([CAST(size AS DOUBLE), CAST(COALESCE(gap, 1) AS DOUBLE)]
                  ORDER BY hi) AS xs
      FROM g GROUP BY event_type),
    f AS (
      SELECT event_type, n_demand,
             list_reduce(xs, (acc, x) -> [
               (acc[1] + x[1]) / 2,
               (acc[2] + x[2]) / 2
             ]) AS st
      FROM s)
    SELECT event_type, n_demand,
           ROUND(st[1], 6) AS size_level,
           ROUND(st[2], 6) AS interval_level,
           ROUND(st[1] / st[2], 6) AS demand_rate
    FROM f
    """,
    notes="Croston's method for intermittent demand (alpha = 1/2) on "
    "each type's HOURLY event series: only demand hours enter; the "
    "size level z and the inter-demand interval x smooth as exact "
    "halvings folded LEFT over the hour-ordered (size, gap) pairs on "
    "both engines (first demand seeds z, first interval defined 1.0 "
    "via the transform-then-reduce seed trick), forecast rate = z/x "
    "one division. Sizes and gaps are exact integers so the fold "
    "doubles are bit-identical (ROUND 6dp belt-and-braces). The "
    "intermittent-demand member of the forecasting family: on a "
    "SPARSE series (sf0.001: 176/720 signup hours) the interval "
    "level carries real signal; as density grows every gap is 1 and "
    "Croston converges to plain EWMA of sizes — the textbook "
    "behavior, stated here so the dense-fixture result reads "
    "correctly. One hourly rollup + one lag window; folds are "
    "per-type over the calendar-bounded demand list",
)
def ts_croston(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(date_trunc('hour', ts) AS TIMESTAMP))"
            " div 3600000000 AS BIGINT)"
        ).alias("hi"),
    ).agg(F.count(F.lit(1)).cast("long").alias("size"))
    wl = W.partitionBy("event_type").orderBy("hi")
    g = h.select(
        "event_type",
        "hi",
        "size",
        (F.col("hi") - F.lag("hi").over(wl)).alias("gap"),
    )
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_demand"),
        F.expr(
            "transform(array_sort(collect_list(struct(hi, size, gap))),"
            " x -> array(CAST(x.size AS DOUBLE),"
            "            CAST(COALESCE(x.gap, 1) AS DOUBLE)))"
        ).alias("xs"),
    )
    st = F.expr(
        "aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),"
        " element_at(xs, 1),"
        " (acc, x) -> array((acc[0] + x[0]) / 2, (acc[1] + x[1]) / 2))"
    )
    return s.select(
        "event_type",
        "n_demand",
        F.round(st.getItem(0), 6).alias("size_level"),
        F.round(st.getItem(1), 6).alias("interval_level"),
        F.round(st.getItem(0) / st.getItem(1), 6).alias("demand_rate"),
    )
