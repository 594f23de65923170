"""Round-9 pack (SURVEY §2.4/§2.8 extensions): Bradley-Terry pairwise
ratings (the arena-style preference-rating primitive behind modern
LLM-eval leaderboards, fit by the Hunter-2004 MM iteration), expected
reciprocal rank (the cascade-model member completing the retrieval-eval
family next to rank_ndcg / rank_mrr / rank_map / rank_rbo), the
Ljung-Box portmanteau test (residual-autocorrelation whiteness — the
diagnostic the forecasting ladder was missing), Cronbach's alpha
(internal consistency of the k daily series = the reliability member of
the experimentation family), and the Cochran-Armitage trend test
(ordered-dose proportions — trend across the 1..5 priority scale, per
region).

Cross-engine float discipline (FIXTURES.md):
- Bradley-Terry folds the IDENTICAL expression tree over 30 MM
  iterations on both engines (F.aggregate / list_reduce with the
  prepended-seed trick), from a 5x5 exact-BIGINT win matrix packed
  i-major into one 25-slot array; inner 5-term sums are LEFT folds on
  both sides (Spark aggregate-with-0.0-seed == DuckDB seedless
  list_reduce for non-negative terms since 0.0+x == x), so the float
  sequences are bit-identical. The MM map is 1-homogeneous, so the
  fold runs unnormalized and a single end normalization pins the
  scale (prototype: converged to 1e-13 by iteration ~20; T=30).
- ERR's graded relevance reuses rank_ndcg's rel = order count capped
  at 3, so R = (2^rel - 1)/8 is an EXACT binary fraction {0, 1/8,
  3/8, 7/8}; the cascade fold (err += p*R/rk; p *= 1-R) runs in rank
  order on both engines — products of exact binary fractions stay
  exact, the only rounding is the final /rk, identical either side.
- Ljung-Box avoids the mean entirely: with S = sum(c) and A_t =
  n*c_t - S (exact BIGINT), n^2 * C_k = sum(A_t * A_{t+k}) is an
  exact BIGINT, r_k = C_k/C_0 one float division of exact integers,
  and Q = n(n+2) * sum_k r_k^2/(n-k) an explicit 7-term expression
  tree (never a SUM aggregate whose order could differ).
- Cronbach exploits the shared denominator: with B = n*sum(x^2) -
  S^2 per series (exact BIGINT), alpha = k/(k-1) * (1 - sum(B_i) /
  B_total) — the n(n-1) variance denominators cancel, so the only
  float op is one division of exact integers.
- Cochran-Armitage is five exact moments (N, R, W1=sum w, W2=sum w^2,
  T=sum w*r) per region and one float chain, floored 6 dp; the
  significance verdict compares the RAW double against a literal.

Scale notes (100 TB): every query is one keyed fact rollup (daily
counts, customer counts, priority moments) followed by group-sized
work — the BT fold runs on ONE 25-number row, ERR's fold is
nation-local over <= 10 ranks, Ljung-Box/Cronbach fold calendar-sized
arrays, and the trend test is a zero-shuffle moment pass + a
region-sized tail.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

# Bradley-Terry: k = 5 event types as "players"; one daily-count
# comparison per (day, pair); 30 MM iterations (converged to 1e-13 by
# ~20 on the fixture; the fold is bit-identical cross-engine either way)
_BT_K = 5
_BT_ITERS = 30

# Ljung-Box: m = 7 lags over the 30-day daily-count series; chi2(0.95,
# df=7) literal for the whiteness verdict
_LB_M = 7
_LB_CRIT = "14.067140"

# Cochran-Armitage: dose = priority digit 1..5, response = high-value
# order (> $150k — near the fixture's upper quartile, so the shares sit
# mid-range instead of saturating)
_CA_HI = 150000
_CA_CRIT = "1.96"

# ERR: cascade model at depth 10, graded by rank_ndcg's rel cap (3)
_ERR_K = 10
_ERR_RELCAP = 3


@register(
    "rank_bradley_terry",
    section="2.4",
    oracle=f"""
    WITH d0 AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT day, event_type
      FROM (SELECT DISTINCT day FROM d0)
      CROSS JOIN (SELECT DISTINCT event_type FROM d0)),
    d AS (
      SELECT s.day, s.event_type, COALESCE(d0.c, 0) AS c
      FROM spine s LEFT JOIN d0 USING (day, event_type)),
    t AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS i
      FROM (SELECT DISTINCT event_type FROM d)),
    wins AS (
      SELECT ta.i AS i, tb.i AS j,
             CAST(SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT)
               AS w
      FROM d a JOIN d b ON a.day = b.day
                        AND a.event_type <> b.event_type
      JOIN t ta ON ta.event_type = a.event_type
      JOIN t tb ON tb.event_type = b.event_type
      GROUP BY 1, 2),
    grid AS (
      SELECT t1.i AS i, t2.i AS j, COALESCE(w.w, 0) AS w
      FROM t t1 CROSS JOIN t t2
      LEFT JOIN wins w ON w.i = t1.i AND w.j = t2.i),
    mat AS (
      SELECT list(w ORDER BY i * {_BT_K} + j) AS wm FROM grid),
    fit AS (
      SELECT wm,
             list_reduce(
               list_prepend(
                 list_transform(range({_BT_K}),
                                x -> CAST(1.0 AS DOUBLE)),
                 list_transform(range({_BT_ITERS}),
                                x -> [CAST(0.0 AS DOUBLE)])),
               (acc, x) -> list_transform(range(1, {_BT_K} + 1), i ->
                 list_sum(list_transform(range(1, {_BT_K} + 1),
                          j -> wm[(i - 1) * {_BT_K} + j]))
                 / list_reduce(
                     list_transform(range(1, {_BT_K} + 1), j ->
                       (wm[(i - 1) * {_BT_K} + j]
                        + wm[(j - 1) * {_BT_K} + i])
                       / (acc[i] + acc[j])),
                     (a, b) -> a + b))) AS p
      FROM mat),
    norm AS (
      SELECT p, list_reduce(p, (a, b) -> a + b) AS z FROM fit)
    SELECT t.event_type,
           CAST(list_sum(list_transform(range(1, {_BT_K} + 1),
                j -> f.wm[(t.i - 1) * {_BT_K} + j])) AS BIGINT) AS wins,
           CAST(list_sum(list_transform(range(1, {_BT_K} + 1), j ->
                f.wm[(t.i - 1) * {_BT_K} + j]
                + f.wm[(j - 1) * {_BT_K} + t.i])) AS BIGINT)
             AS comparisons,
           FLOOR(n.p[t.i] / n.z * 1e6) / 1e6 AS rating,
           CAST(ROW_NUMBER() OVER (ORDER BY n.p[t.i] / n.z DESC,
                                   t.event_type) AS BIGINT) AS rk
    FROM t CROSS JOIN fit f CROSS JOIN norm n
    ORDER BY t.event_type
    """,
    notes=f"Bradley-Terry preference ratings over the {_BT_K} event "
    f"types (a 'day' prefers the type with the higher count — one "
    f"pairwise comparison per day per pair; ties excluded, as BT "
    f"requires): the {_BT_K}x{_BT_K} exact-BIGINT win matrix packs "
    f"i-major into one 25-slot array and the Hunter-2004 MM update "
    f"p_i <- W_i / sum_j n_ij/(p_i+p_j) folds {_BT_ITERS} times as an "
    f"IDENTICAL expression tree on both engines (left-fold inner "
    f"sums; unnormalized fold — the map is 1-homogeneous — with one "
    f"end normalization), floored 6 dp, ranks on the raw doubles. "
    f"THE arena-style rating primitive behind LLM-eval leaderboards, "
    f"here as a pure fold: one daily rollup is the only corpus work, "
    f"the comparison grid is days x k^2, and the fit is a single-row "
    f"fold at ANY scale",
)
def rank_bradley_terry(spark, sf_dir):
    k, t_iters = _BT_K, _BT_ITERS
    ev = table(spark, sf_dir, "events")
    d0 = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    days = d0.select("day").distinct()
    types = d0.select("event_type").distinct()
    d = (
        days.crossJoin(F.broadcast(types))
        .join(d0, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
        .localCheckpoint()  # day x type grid, read twice (a and b sides)
    )
    t = types.select(
        "event_type",
        F.row_number()
        .over(W.orderBy("event_type"))
        .cast("long")
        .alias("i"),
    ).localCheckpoint()  # k rows, read four times
    a, b = d.alias("a"), d.alias("b")
    ta = F.broadcast(
        t.select(F.col("event_type").alias("eta"), F.col("i").alias("wi"))
    )
    tb = F.broadcast(
        t.select(F.col("event_type").alias("etb"), F.col("i").alias("wj"))
    )
    wins = (
        a.join(b, (F.col("a.day") == F.col("b.day"))
               & (F.col("a.event_type") != F.col("b.event_type")))
        .join(ta, F.col("a.event_type") == F.col("eta"))
        .join(tb, F.col("b.event_type") == F.col("etb"))
        .groupBy(F.col("wi").alias("i"), F.col("wj").alias("j"))
        .agg(
            F.sum((F.col("a.c") > F.col("b.c")).cast("long"))
            .cast("long")
            .alias("w")
        )
    )
    t1 = t.select(F.col("i").alias("i"))
    t2 = t.select(F.col("i").alias("j"))
    grid = (
        t1.crossJoin(t2)
        .join(wins, ["i", "j"], "left")
        .select("i", "j", F.coalesce("w", F.lit(0)).alias("w"))
    )
    mat = grid.groupBy().agg(
        F.expr(
            f"transform(array_sort(collect_list(struct(i * {k} + j AS k,"
            f" w))), x -> x.w)"
        ).alias("wm")
    )
    # the MM fold: prepended-seed trick (ts_croston), left-fold inner
    # sums — Spark aggregate(0.0-seed) == DuckDB seedless list_reduce
    # for non-negative terms
    fold = (
        f"aggregate(transform(sequence(1, {t_iters}), x -> array(0.0D)),"
        f" transform(sequence(1, {k}), x -> 1.0D),"
        f" (acc, x) -> transform(sequence(1, {k}), i ->"
        f"  CAST(aggregate(transform(sequence(1, {k}),"
        f"        j -> element_at(wm, (i - 1) * {k} + j)),"
        f"       0L, (a, b) -> a + b) AS DOUBLE)"
        f"  / aggregate(transform(sequence(1, {k}), j ->"
        f"      (element_at(wm, (i - 1) * {k} + j)"
        f"       + element_at(wm, (j - 1) * {k} + i))"
        f"      / (element_at(acc, i) + element_at(acc, j))),"
        f"     0.0D, (a, b) -> a + b)))"
    )
    fit = mat.select("wm", F.expr(fold).alias("p")).select(
        "wm",
        "p",
        F.expr("aggregate(p, 0.0D, (a, b) -> a + b)").alias("z"),
    )
    out = t.crossJoin(F.broadcast(fit)).select(
        "event_type",
        F.expr(
            f"CAST(aggregate(transform(sequence(1, {k}),"
            f" j -> element_at(wm, CAST((i - 1) * {k} + j AS INT))), 0L,"
            f" (a, b) -> a + b) AS BIGINT)"
        ).alias("wins"),
        F.expr(
            f"CAST(aggregate(transform(sequence(1, {k}), j ->"
            f" element_at(wm, CAST((i - 1) * {k} + j AS INT))"
            f" + element_at(wm, CAST((j - 1) * {k} + i AS INT))), 0L,"
            f" (a, b) -> a + b) AS BIGINT)"
        ).alias("comparisons"),
        F.expr("element_at(p, CAST(i AS INT)) / z").alias("raw"),
    )
    return out.select(
        "event_type",
        "wins",
        "comparisons",
        (F.floor(F.col("raw") * 1e6) / 1e6).alias("rating"),
        F.row_number()
        .over(W.orderBy(F.col("raw").desc(), "event_type"))
        .cast("long")
        .alias("rk"),
    ).orderBy("event_type")


@register(
    "rank_err",
    section="2.4",
    oracle=f"""
    WITH rel AS (
      SELECT c.c_nationkey AS nation_id, c.c_custkey, c.c_acctbal,
             LEAST(CAST(COUNT(o.o_orderkey) AS BIGINT), {_ERR_RELCAP})
               AS rel
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3),
    sys AS (
      SELECT nation_id, rel,
             ROW_NUMBER() OVER (PARTITION BY nation_id
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM rel QUALIFY rk <= {_ERR_K}),
    ordered AS (
      SELECT nation_id,
             CAST(COUNT(*) AS BIGINT) AS n_ranked,
             list([(pow(2.0, rel) - 1) / 8.0, CAST(rk AS DOUBLE)]
                  ORDER BY rk) AS xs
      FROM sys GROUP BY nation_id),
    f AS (
      SELECT nation_id, n_ranked,
             list_reduce(
               list_prepend([CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)],
                            xs),
               (acc, x) -> [acc[1] + acc[2] * x[1] / x[2],
                            acc[2] * (1 - x[1])]) AS st
      FROM ordered)
    SELECT nation_id, n_ranked,
           FLOOR(st[1] * 1e6) / 1e6 AS err
    FROM f ORDER BY nation_id
    """,
    notes=f"expected reciprocal rank @{_ERR_K} (Chapelle et al. 2009 "
    f"cascade model) of the balance-ranked customer list per nation, "
    f"graded by rank_ndcg's relevance (order count capped at "
    f"{_ERR_RELCAP}): stop probability R = (2^rel - 1)/8 is an EXACT "
    f"binary fraction, so the cascade fold (err += p*R/rk; p *= 1-R) "
    f"over the rank-ordered top-{_ERR_K} keeps p exact and rounds "
    f"only at the /rk divisions — identical IEEE ops both engines, "
    f"floored 6 dp. Completes the retrieval-eval family "
    f"(nDCG position-discounted, MRR first-hit, MAP precision-"
    f"averaged, RBO list-agreement, ERR cascade-satisfaction). One "
    f"orders rollup; the fold is nation-local over <= {_ERR_K} ranks",
)
def rank_err(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    rel = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_nationkey", "c_custkey", "c_acctbal")
        .agg(
            F.least(
                F.count("o_orderkey").cast("long"), F.lit(_ERR_RELCAP)
            ).alias("rel")
        )
        .select(
            F.col("c_nationkey").alias("nation_id"),
            "c_custkey",
            "c_acctbal",
            "rel",
        )
    )
    w_sys = W.partitionBy("nation_id").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    sys = (
        rel.withColumn("rk", F.row_number().over(w_sys))
        .where(F.col("rk") <= _ERR_K)
    )
    ordered = sys.groupBy("nation_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.expr(
            "transform(array_sort(collect_list(struct(rk, rel))),"
            " x -> array((pow(2.0D, x.rel) - 1) / 8.0D,"
            "            CAST(x.rk AS DOUBLE)))"
        ).alias("xs"),
    )
    st = F.expr(
        "aggregate(xs, array(0.0D, 1.0D),"
        " (acc, x) -> array(acc[0] + acc[1] * x[0] / x[1],"
        "                   acc[1] * (1 - x[0])))"
    )
    return ordered.select(
        "nation_id",
        "n_ranked",
        (F.floor(st.getItem(0) * 1e6) / 1e6).alias("err"),
    ).orderBy("nation_id")


@register(
    "ts_ljung_box",
    section="2.8",
    oracle=f"""
    WITH d0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT event_type, day
      FROM (SELECT DISTINCT event_type FROM d0)
      CROSS JOIN (SELECT DISTINCT day FROM d0)),
    d AS (
      SELECT s.event_type, s.day, COALESCE(d0.c, 0) AS c
      FROM spine s LEFT JOIN d0 USING (event_type, day)),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s
      FROM d GROUP BY event_type),
    a AS (
      SELECT d.event_type, d.day, m.n,
             m.n * d.c - m.s AS av
      FROM d JOIN m USING (event_type)),
    aa AS (
      SELECT event_type, n, av,
             {", ".join(
               f"av * LEAD(av, {lag}) OVER "
               f"(PARTITION BY event_type ORDER BY day) AS p{lag}"
               for lag in range(1, _LB_M + 1)
             )}
      FROM a),
    ck AS (
      SELECT event_type, ANY_VALUE(n) AS n,
             CAST(SUM(av * av) AS BIGINT) AS c0,
             {", ".join(
               f"CAST(SUM(p{lag}) AS BIGINT) AS c{lag}"
               for lag in range(1, _LB_M + 1)
             )}
      FROM aa GROUP BY event_type),
    q AS (
      SELECT event_type, n,
             n * (n + 2) * (
               {" + ".join(
                 f"(CAST(c{lag} AS DOUBLE) / c0)"
                 f" * (CAST(c{lag} AS DOUBLE) / c0) / (n - {lag})"
                 for lag in range(1, _LB_M + 1)
               )}) AS q_raw
      FROM ck)
    SELECT event_type, n,
           FLOOR(q_raw * 1e6) / 1e6 AS q_stat,
           q_raw > {_LB_CRIT} AS autocorrelated
    FROM q ORDER BY event_type
    """,
    notes=f"Ljung-Box portmanteau whiteness test (m = {_LB_M} lags) on "
    f"each type's daily-count series over the zero-filled 30-day "
    f"calendar: the mean never appears — with S = sum(c) and A_t = "
    f"n*c_t - S exact BIGINTs, n^2*C_k = sum(A_t * A_(t+k)) stays an "
    f"exact integer (the n^2 scale cancels in r_k = C_k/C_0), each "
    f"r_k is ONE float division of exact integers, and Q = n(n+2) * "
    f"sum r_k^2/(n-k) is an explicit {_LB_M}-term expression tree "
    f"(never an order-unstable SUM aggregate), floored 6 dp with the "
    f"whiteness verdict on the raw double vs the literal chi2(0.95, "
    f"{_LB_M}) = {_LB_CRIT}. The residual-diagnostic member of the "
    f"forecasting family (ewma/holt/HW/kalman/croston fit — Ljung-Box "
    f"asks whether anything predictable REMAINS). One daily rollup; "
    f"lag windows are type-partition-local over the calendar",
)
def ts_ljung_box(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # the daily rollup feeds THREE consumers (spine types, spine days,
    # the zero-fill left join) and m re-derives d — without a cut the
    # planner inlines the subtree everywhere (observed: 6 parquet scans
    # of events for a <= |types|*|days| row relation). localCheckpoint
    # the tiny rollup so the corpus is scanned exactly once.
    d0 = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    types = d0.select("event_type").distinct()
    days = d0.select("day").distinct()
    d = (
        types.crossJoin(days)
        .join(F.broadcast(d0), ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("c", F.lit(0)).alias("c"))
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    a = d.join(F.broadcast(m), "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("n") * F.col("c") - F.col("s")).alias("av"),
    )
    wlag = W.partitionBy("event_type").orderBy("day")
    ck = (
        a.select(
            "event_type",
            "n",
            "av",
            *[
                (F.col("av") * F.lead("av", lag).over(wlag)).alias(f"p{lag}")
                for lag in range(1, _LB_M + 1)
            ],
        )
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.sum(F.col("av") * F.col("av")).cast("long").alias("c0"),
            *[
                F.sum(f"p{lag}").cast("long").alias(f"c{lag}")
                for lag in range(1, _LB_M + 1)
            ],
        )
    )
    terms = None
    for lag in range(1, _LB_M + 1):
        r = F.col(f"c{lag}").cast("double") / F.col("c0")
        t = r * r / (F.col("n") - lag)
        terms = t if terms is None else terms + t
    q_raw = F.col("n") * (F.col("n") + 2) * terms
    return ck.select(
        "event_type",
        "n",
        (F.floor(q_raw * 1e6) / 1e6).alias("q_stat"),
        (q_raw > F.expr(_LB_CRIT)).alias("autocorrelated"),
    ).orderBy("event_type")


@register(
    "agg_cronbach_alpha",
    section="2.4",
    oracle="""
    WITH d0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT event_type, day
      FROM (SELECT DISTINCT event_type FROM d0)
      CROSS JOIN (SELECT DISTINCT day FROM d0)),
    d AS (
      SELECT s.event_type, s.day, COALESCE(d0.c, 0) AS c
      FROM spine s LEFT JOIN d0 USING (event_type, day)),
    item AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) * CAST(SUM(c * c) AS BIGINT)
               - CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT) AS b
      FROM d GROUP BY event_type),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) * CAST(SUM(s * s) AS BIGINT)
               - CAST(SUM(s) AS BIGINT) * CAST(SUM(s) AS BIGINT) AS bt
      FROM (SELECT day, CAST(SUM(c) AS BIGINT) AS s FROM d GROUP BY day)),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(b) AS BIGINT) AS sb
          FROM item)
    SELECT i.event_type, i.b AS b_item, t.bt AS b_total,
           FLOOR(CAST(k.k AS DOUBLE) / (k.k - 1)
                 * (1 - CAST(k.sb AS DOUBLE) / t.bt) * 1e6) / 1e6
             AS alpha
    FROM item i CROSS JOIN tot t CROSS JOIN k
    ORDER BY i.event_type
    """,
    notes="Cronbach's alpha over the k = 5 daily event-type count "
    "series (items = types, subjects = the zero-filled 30-day "
    "calendar): with B = n*sum(x^2) - S^2 per series (exact BIGINT — "
    "the sample-variance numerator scaled by n(n-1)), the shared "
    "denominator CANCELS and alpha = k/(k-1) * (1 - sum(B_i)/B_total) "
    "is ONE float division of exact integers, floored 6 dp. Each item "
    "row carries its exact B next to the global alpha (the "
    "agg_friedman output shape). The reliability member of the "
    "experimentation family: do the k engagement series measure one "
    "underlying activity factor? One daily rollup; everything after "
    "is (k x days)-sized",
)
def agg_cronbach_alpha(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # checkpoint the daily rollup BEFORE its three consumers (types,
    # days, left join) — checkpointing only d still scanned events 3x
    # inside the one materialization job (the ts_ljung_box lesson)
    d0 = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    types = d0.select("event_type").distinct()
    days = d0.select("day").distinct()
    d = (
        types.crossJoin(days)
        .join(F.broadcast(d0), ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("c", F.lit(0)).alias("c"))
        .localCheckpoint()  # k x days grid, read twice (items + totals)
    )
    item = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.count(F.lit(1)).cast("long")
            * F.sum(F.col("c") * F.col("c")).cast("long")
            - F.sum("c").cast("long") * F.sum("c").cast("long")
        ).alias("b"),
    )
    tot = (
        d.groupBy("day")
        .agg(F.sum("c").cast("long").alias("s"))
        .agg(
            (
                F.count(F.lit(1)).cast("long")
                * F.sum(F.col("s") * F.col("s")).cast("long")
                - F.sum("s").cast("long") * F.sum("s").cast("long")
            ).alias("bt")
        )
    )
    kk = item.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("b").cast("long").alias("sb"),
    )
    alpha = F.floor(
        F.col("k").cast("double")
        / (F.col("k") - 1)
        * (1 - F.col("sb").cast("double") / F.col("bt"))
        * 1e6
    ) / 1e6
    return (
        item.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(kk))
        .select(
            "event_type",
            F.col("b").alias("b_item"),
            F.col("bt").alias("b_total"),
            alpha.alias("alpha"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_cochran_armitage",
    section="2.4",
    oracle=f"""
    WITH x AS (
      SELECT r.r_name AS region,
             CAST(SUBSTR(o.o_orderpriority, 1, 1) AS BIGINT) AS w,
             CASE WHEN o.o_totalprice > {_CA_HI} THEN 1 ELSE 0 END AS hi
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey),
    m AS (
      SELECT region,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(hi) AS BIGINT) AS r,
             CAST(SUM(w) AS BIGINT) AS w1,
             CAST(SUM(w * w) AS BIGINT) AS w2,
             CAST(SUM(w * hi) AS BIGINT) AS t
      FROM x GROUP BY region),
    z AS (
      SELECT region, n, r, t,
             (t - CAST(r AS DOUBLE) / n * w1)
             / sqrt(CAST(r AS DOUBLE) / n * (1 - CAST(r AS DOUBLE) / n)
                    * (w2 - CAST(w1 AS DOUBLE) * w1 / n)) AS z_raw
      FROM m)
    SELECT region, n, r AS n_hi, t AS dose_hits,
           FLOOR(z_raw * 1e6) / 1e6 AS z_trend,
           abs(z_raw) > {_CA_CRIT} AS trend_sig
    FROM z ORDER BY region
    """,
    notes=f"Cochran-Armitage trend test per region: dose = the order "
    f"priority digit (1-URGENT .. 5-LOW, a genuinely ORDERED scale), "
    f"response = high-value order (> ${_CA_HI}). T = sum(w*r), E[T] = "
    f"p*W1 and Var(T) = p(1-p)(W2 - W1^2/N) all come from five exact "
    f"BIGINT moments per region; z is one float chain floored 6 dp "
    f"and the significance verdict compares the raw double against "
    f"the literal {_CA_CRIT}. The ORDERED-dose member of the "
    f"categorical-test family (chi-square treats priorities as "
    f"unordered; CA asks for a monotone trend — the fixture's "
    f"priorities are price-independent, so z hovers near 0 and the "
    f"test correctly finds none; regions differ in their exact "
    f"moments, not the verdict). Zero-shuffle moment pass after the "
    f"three dim joins (nation/region broadcast); region-sized tail",
)
def agg_cochran_armitage(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    x = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.substring("o_orderpriority", 1, 1).cast("long").alias("w"),
            (F.col("o_totalprice") > _CA_HI).cast("long").alias("hi"),
        )
    )
    m = x.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hi").cast("long").alias("r"),
        F.sum("w").cast("long").alias("w1"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("w2"),
        F.sum(F.col("w") * F.col("hi")).cast("long").alias("t"),
    )
    p = F.col("r").cast("double") / F.col("n")
    z_raw = (F.col("t") - p * F.col("w1")) / F.sqrt(
        p
        * (1 - p)
        * (F.col("w2") - F.col("w1").cast("double") * F.col("w1") / F.col("n"))
    )
    return m.select(
        "region",
        "n",
        F.col("r").alias("n_hi"),
        F.col("t").alias("dose_hits"),
        (F.floor(z_raw * 1e6) / 1e6).alias("z_trend"),
        (F.abs(z_raw) > F.expr(_CA_CRIT)).alias("trend_sig"),
    ).orderBy("region")


# Isotonic calibration: PAV over agg_calibration_bins' decile table.
# All merge DECISIONS are exact integer cross-multiplies carried in
# doubles (< 2^53), so both engines produce the identical block
# structure; _CAL_BINS-1 conditional merge steps after each push = a
# full "merge while violating" (stack depth never exceeds bins-1 before
# a push). Derived from stats7's shared bin count so raising _CAL_BINS
# keeps the unroll bound in lock-step instead of silently under-merging.
from .stats7 import _CAL_BINS as _PAV_BINS

_PAV_MERGES = _PAV_BINS - 1


@register(
    "agg_isotonic_calibration",
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
                 CAST(100 * nv + 300 * nc + 500 * ns - 2000 AS BIGINT) AS z
          FROM uc),
    e AS (SELECT [{", ".join(
            f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY z)"
            for i in range(1, 10)
        )}] AS edges FROM s),
    b AS (SELECT s.y,
                 CAST(len(list_filter(e.edges, q -> q < s.z)) AS BIGINT)
                   AS bin
          FROM s CROSS JOIN e),
    bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS pos
             FROM b GROUP BY bin),
    items AS (SELECT list([CAST(n AS DOUBLE), CAST(pos AS DOUBLE),
                           CAST(1 AS DOUBLE)] ORDER BY bin) AS xs
              FROM bins),
    fold AS (
      SELECT list_reduce(
        list_prepend(CAST([] AS DOUBLE[]), xs),
        (acc, x) -> list_reduce(
          list_prepend(acc || x,
                       list_transform(range({_PAV_MERGES}),
                                      i -> [CAST(0.0 AS DOUBLE)])),
          (st, d) -> CASE WHEN len(st) >= 6
                AND st[len(st) - 1] * st[len(st) - 5]
                    < st[len(st) - 4] * st[len(st) - 2]
              THEN st[1:len(st) - 6]
                   || [st[len(st) - 5] + st[len(st) - 2],
                       st[len(st) - 4] + st[len(st) - 1],
                       st[len(st) - 3] + st[len(st)]]
              ELSE st END)) AS st
      FROM items),
    blocks AS (
      SELECT UNNEST(list_transform(range(1, len(st) // 3 + 1),
               k -> struct_pack(block := k,
                                n := st[(k - 1) * 3 + 1],
                                pos := st[(k - 1) * 3 + 2],
                                nb := st[(k - 1) * 3 + 3]))) AS u
      FROM fold)
    SELECT CAST(u.block AS BIGINT) AS block,
           CAST(u.nb AS BIGINT) AS n_bins,
           CAST(u.n AS BIGINT) AS n_users,
           CAST(u.pos AS BIGINT) AS n_pos,
           CAST(CAST(u.pos AS BIGINT) * 1000000 // CAST(u.n AS BIGINT)
                AS BIGINT) AS rate_ppm
    FROM blocks ORDER BY block
    """,
    notes="isotonic calibration via pool-adjacent-violators over the "
    "agg_calibration_bins decile table (same score, outcome and "
    "percentile_disc edges): bins fold in score order with a BLOCK "
    "STACK state — push [n, pos, nbins], then merge the top two "
    "blocks while rate_last < rate_prev, the violation decided by "
    "the exact integer cross-multiply pos_last*n_prev < pos_prev*"
    "n_last (never a float rate), 9 unrolled conditional merge steps "
    "per push = a full while-loop (stack depth is bounded by the bin "
    "count). Counts ride in doubles but stay < 2^53, so both engines "
    "compute the IDENTICAL block structure and the fitted rates are "
    "exact integer ppm divisions. THE standard probability-"
    "calibration fit (Zadrozny-Elkan) next to agg_calibration_bins "
    "(the diagnosis) and agg_brier_decomposition (the score): "
    "monotone block rates certified by the python-reference PAV in "
    "tests. One user-keyed rollup + broadcast edges; the fold is one "
    "10-item row at any corpus scale",
)
def agg_isotonic_calibration(spark, sf_dir):
    from .stats7 import (
        _CAL_BIAS,
        _CAL_BINS,
        _CAL_W_CLICK,
        _CAL_W_SIGNUP,
        _CAL_W_VIEW,
    )

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
    bins = (
        s.crossJoin(F.broadcast(edges))
        .select(
            "y",
            F.size(F.filter("edges", lambda q: q < F.col("z")))
            .cast("long")
            .alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
    )
    items = bins.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(bin, n, pos))),"
            " x -> array(CAST(x.n AS DOUBLE), CAST(x.pos AS DOUBLE),"
            " 1.0D))"
        ).alias("xs")
    )
    merge_step = (
        "IF(size(st) >= 6"
        " AND element_at(st, size(st) - 1) * element_at(st, size(st) - 5)"
        "     < element_at(st, size(st) - 4) * element_at(st, size(st) - 2),"
        " concat(slice(st, 1, size(st) - 6),"
        "        array(element_at(st, size(st) - 5)"
        "              + element_at(st, size(st) - 2),"
        "              element_at(st, size(st) - 4)"
        "              + element_at(st, size(st) - 1),"
        "              element_at(st, size(st) - 3)"
        "              + element_at(st, size(st)))),"
        " st)"
    )
    fold = (
        f"aggregate(xs, CAST(array() AS ARRAY<DOUBLE>),"
        f" (acc, x) -> aggregate("
        f"   transform(sequence(1, {_PAV_MERGES}), i -> 0.0D),"
        f"   concat(acc, x),"
        f"   (st, d) -> {merge_step}))"
    )
    st = items.select(F.expr(fold).alias("st"))
    return (
        st.select(
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(st) div 3), k ->"
                    " struct(k AS block,"
                    " element_at(st, CAST((k - 1) * 3 + 1 AS INT)) AS n,"
                    " element_at(st, CAST((k - 1) * 3 + 2 AS INT)) AS pos,"
                    " element_at(st, CAST((k - 1) * 3 + 3 AS INT)) AS nb))"
                )
            ).alias("pos_", "u")
        )
        .select(
            F.col("u.block").cast("long").alias("block"),
            F.col("u.nb").cast("long").alias("n_bins"),
            F.col("u.n").cast("long").alias("n_users"),
            F.col("u.pos").cast("long").alias("n_pos"),
            F.expr(
                "CAST(CAST(u.pos AS BIGINT) * 1000000"
                " div CAST(u.n AS BIGINT) AS BIGINT)"
            ).alias("rate_ppm"),
        )
        .orderBy("block")
    )
