"""Round-8 pack (SURVEY §2.4/§2.10 extensions): retrieval-evaluation
metrics (nDCG@10, MRR), market-concentration / distribution analytics
(Herfindahl-Hirschman, Lorenz curve, trimmed mean), and Page-Hinkley
drift detection.

Cross-engine float discipline (FIXTURES.md): logarithmic rank discounts
are a FIXED 10-entry MICRO-unit literal table (not computed — log2 is
libm-dependent), reciprocal ranks and shares are integer divisions of
exact BIGINTs, walks are integer prefix sums. Not a float exists in any
of these six queries.

Scale notes (100 TB): every query is one or two keyed aggregates over a
fact table followed by metadata-sized (per-nation / per-region /
per-decile / per-day) window work; nothing joins at corpus width,
nothing collects. Rankings are windowed per small group key, so the
sorts are partition-local.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

# MICRO-unit DCG discounts: round(1e6 / log2(rank+1)) for rank 1..10.
# A literal table, identical in both engines, so DCG sums are exact
# BIGINTs — the same literal-integer trick as the SPRT increments.
_NDCG_DISC = (
    1000000,
    630930,
    500000,
    430677,
    386853,
    356207,
    333333,
    315465,
    301030,
    289065,
)
_NDCG_K = 10
# graded relevance cap: rel = LEAST(order count, 3) — 4 grades (0-3)
_NDCG_REL_CAP = 3

# MRR relevance: a customer is "relevant" when they placed at least one
# URGENT order above this literal. The priority conjunct matters: the
# fixture gives nearly EVERY customer some >200k order, so a plain
# price bar makes first_hit_rank identically 1 and the metric says
# nothing (caught by this round's own degeneracy contract before
# commit); urgent-and-expensive is rare enough that ranks spread 1-16
# and some sf0.001 nations legitimately report the 0/0 no-hit shape
_MRR_PRICE = 450000
_MRR_PRIORITY = "1-URGENT"

# trimmed mean: drop floor(n/10) rows at each end (10% trim)
_TRIM_DEN = 10

# Page-Hinkley: monitor daily purchase counts after the shared
# 2024-01-16 cutpoint against the pre-period mean; alarm when the
# PH statistic exceeds _PH_LAMBDA counts (scaled exact — see notes)
_PH_CUT_DATE = "2024-01-16 00:00:00"
_PH_LAMBDA = 30


def _disc_sql(col: str) -> str:
    """DuckDB CASE mapping rank -> micro discount literal."""
    cases = " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_NDCG_DISC)
    )
    return f"CASE {col} {cases} ELSE 0 END"


def _disc_col(rank_col):
    """Spark CASE mapping rank -> micro discount literal."""
    expr = F.lit(0).cast("long")
    for i, d in enumerate(_NDCG_DISC):
        expr = F.when(rank_col == i + 1, F.lit(d).cast("long")).otherwise(
            expr
        )
    return expr


@register(
    "rank_ndcg",
    section="2.4",
    oracle=f"""
    WITH rel AS (
      SELECT c.c_nationkey AS nation_id, c.c_custkey,
             c.c_acctbal,
             LEAST(CAST(COUNT(o.o_orderkey) AS BIGINT), {_NDCG_REL_CAP})
               AS rel
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3),
    sys AS (
      SELECT nation_id, rel,
             ROW_NUMBER() OVER (PARTITION BY nation_id
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM rel),
    ideal AS (
      SELECT nation_id, rel,
             ROW_NUMBER() OVER (PARTITION BY nation_id
                                ORDER BY rel DESC, c_custkey) AS rk
      FROM rel),
    dcg AS (SELECT nation_id,
                   CAST(SUM(rel * ({_disc_sql('rk')})) AS BIGINT) AS dcg
            FROM sys WHERE rk <= {_NDCG_K} GROUP BY nation_id),
    idcg AS (SELECT nation_id,
                    CAST(SUM(rel * ({_disc_sql('rk')})) AS BIGINT) AS idcg
             FROM ideal WHERE rk <= {_NDCG_K} GROUP BY nation_id)
    SELECT d.nation_id, d.dcg AS dcg_micro, i.idcg AS idcg_micro,
           CAST(d.dcg * 1000000 // i.idcg AS BIGINT) AS ndcg_ppm
    FROM dcg d JOIN idcg i USING (nation_id)
    WHERE i.idcg > 0
    ORDER BY d.nation_id
    """,
    notes=f"nDCG@{_NDCG_K} of the balance-ranked customer list per "
    f"nation, graded by order activity (rel = order count capped at "
    f"{_NDCG_REL_CAP}): DCG/IDCG are BIGINT sums of rel x a literal "
    f"MICRO-unit discount table (log2 never computed at query time — "
    f"the 10 discounts are shared integer literals), nDCG an integer "
    f"ppm division, ties broken by c_custkey so both rankings are "
    f"total orders. The retrieval-eval companion to "
    f"agg_calibration_bins: per-group windowed ranking over one "
    f"customer-keyed count — rankings are nation-partition-local, the "
    f"only corpus work is the orders rollup",
)
def rank_ndcg(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    rel = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_nationkey", "c_custkey", "c_acctbal")
        .agg(
            F.least(
                F.count("o_orderkey").cast("long"), F.lit(_NDCG_REL_CAP)
            ).alias("rel")
        )
        .select(
            F.col("c_nationkey").alias("nation_id"),
            "c_custkey",
            "c_acctbal",
            "rel",
        )
        # rel feeds BOTH rankings; without this the customer/orders
        # join runs twice (two fact scans at 100 TB)
        .localCheckpoint()
    )
    w_sys = W.partitionBy("nation_id").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ideal = W.partitionBy("nation_id").orderBy(
        F.col("rel").desc(), F.col("c_custkey")
    )
    gain_sys = (F.col("rel") * _disc_col(F.col("rk"))).cast("long")
    dcg = (
        rel.withColumn("rk", F.row_number().over(w_sys))
        .where(F.col("rk") <= _NDCG_K)
        .groupBy("nation_id")
        .agg(F.sum(gain_sys).cast("long").alias("dcg_micro"))
    )
    idcg = (
        rel.withColumn("rk", F.row_number().over(w_ideal))
        .where(F.col("rk") <= _NDCG_K)
        .groupBy("nation_id")
        .agg(F.sum(gain_sys).cast("long").alias("idcg_micro"))
    )
    return (
        dcg.join(idcg, "nation_id")
        .where(F.col("idcg_micro") > 0)
        .select(
            "nation_id",
            "dcg_micro",
            "idcg_micro",
            F.expr("CAST(dcg_micro * 1000000 div idcg_micro AS BIGINT)")
            .alias("ndcg_ppm"),
        )
        .orderBy("nation_id")
    )


@register(
    "rank_mrr",
    section="2.4",
    oracle=f"""
    WITH rel AS (
      SELECT c.c_nationkey AS nation_id, c.c_custkey, c.c_acctbal,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_totalprice > {_MRR_PRICE}
                                 AND o.o_orderpriority = '{_MRR_PRIORITY}')
                  THEN 1 ELSE 0 END AS hit
      FROM customer c),
    rk AS (SELECT nation_id, hit,
                  ROW_NUMBER() OVER (PARTITION BY nation_id
                                     ORDER BY c_acctbal DESC, c_custkey)
                    AS rk
           FROM rel)
    SELECT nation_id,
           CAST(COALESCE(MIN(CASE WHEN hit = 1 THEN rk END), 0) AS BIGINT)
             AS first_hit_rank,
           CAST(COALESCE(1000000 // MIN(CASE WHEN hit = 1 THEN rk END), 0)
                AS BIGINT) AS rr_micro
    FROM rk GROUP BY nation_id
    ORDER BY nation_id
    """,
    notes=f"mean-reciprocal-rank ingredients per nation for the "
    f"balance-ranked customer list: the first rank at which a customer "
    f"with an urgent order above {_MRR_PRICE} appears, its reciprocal in "
    f"MICRO units (1e6 integer-divided by the rank — exact, no float). "
    f"Nations with no relevant customer report 0/0 rather than "
    f"dropping (the shape survives sparse fixtures). Relevance is one "
    f"semi-join-shaped orders rollup; the ranking is "
    f"nation-partition-local",
)
def rank_mrr(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    hits = (
        o.where(
            (F.col("o_totalprice") > _MRR_PRICE)
            & (F.col("o_orderpriority") == _MRR_PRIORITY)
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
    first_hit = F.min(F.when(F.col("hit") == 1, F.col("rk")))
    return (
        rel.withColumn("rk", F.row_number().over(w))
        .groupBy("nation_id")
        .agg(
            F.coalesce(first_hit, F.lit(0)).cast("long").alias(
                "first_hit_rank"
            ),
            F.coalesce(
                F.expr(
                    "CAST(1000000 div MIN(CASE WHEN hit = 1 THEN rk END)"
                    " AS BIGINT)"
                ),
                F.lit(0).cast("long"),
            ).alias("rr_micro"),
        )
        .orderBy("nation_id")
    )


@register(
    "agg_hhi",
    section="2.4",
    oracle="""
    WITH m AS (
      SELECT r.r_regionkey AS region_id, l.l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2),
    tot AS (SELECT region_id, CAST(SUM(cnt) AS BIGINT) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers
            FROM m GROUP BY region_id)
    SELECT m.region_id, t.n_suppliers,
           CAST(SUM((m.cnt * 1000000 // t.tot)
                    * (m.cnt * 1000000 // t.tot)) AS BIGINT) AS hhi_e12
    FROM m JOIN tot t USING (region_id)
    GROUP BY m.region_id, t.n_suppliers
    ORDER BY m.region_id
    """,
    notes="Herfindahl-Hirschman concentration of supplier market share "
    "(by lineitem count) within each region: shares are integer ppm "
    "divisions of exact counts, HHI the BIGINT sum of squared ppm "
    "shares (1e12 = monopoly) — the market-concentration member of the "
    "inequality family (gini/theil/atkinson measure dispersion, HHI "
    "measures dominance). Share-then-square keeps every term bounded "
    "(<= 1e12 per supplier) at ANY scale — no tot^2 overflow. One "
    "supplier-keyed fact rollup; everything after is supplier-count-"
    "sized",
)
def agg_hhi(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    m = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_regionkey").alias("region_id"), "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # supplier-count-sized and read twice (totals + share join):
        # checkpoint so the lineitem rollup runs once
        .localCheckpoint()
    )
    tot = m.groupBy("region_id").agg(
        F.sum("cnt").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    share = F.expr("CAST(cnt * 1000000 div tot AS BIGINT)")
    return (
        m.join(F.broadcast(tot), "region_id")
        .select("region_id", "n_suppliers", (share * share).alias("s2"))
        .groupBy("region_id", "n_suppliers")
        .agg(F.sum("s2").cast("long").alias("hhi_e12"))
        .orderBy("region_id")
    )


@register(
    "agg_lorenz",
    section="2.4",
    oracle="""
    WITH pos AS (
      SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer WHERE c_acctbal > 0),
    dec AS (SELECT bal_cents,
                   NTILE(10) OVER (ORDER BY bal_cents, c_custkey) AS decile
            FROM pos),
    g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
                 CAST(SUM(bal_cents) AS BIGINT) AS bal
          FROM dec GROUP BY decile),
    tot AS (SELECT CAST(SUM(bal) AS BIGINT) AS tb,
                   CAST(SUM(n_cust) AS BIGINT) AS tn FROM g)
    SELECT g.decile, g.n_cust,
           CAST(SUM(g.n_cust) OVER (ORDER BY g.decile) * 1000000 // t.tn
                AS BIGINT) AS cum_cust_ppm,
           CAST(SUM(g.bal) OVER (ORDER BY g.decile) * 1000000 // t.tb
                AS BIGINT) AS cum_bal_ppm
    FROM g, tot t
    ORDER BY g.decile
    """,
    notes="Lorenz curve of positive customer account balances: cumulative "
    "population share vs cumulative balance share (ppm) at each decile "
    "— gini's graphical companion (the area between this curve and the "
    "diagonal IS the gini). Balances in exact cents, deciles a total "
    "order (balance, custkey), cumulative shares integer ppm divisions "
    "of BIGINT prefix sums. One customer-keyed pass; the decile "
    "relation is 10 rows at any scale. NTILE over a global order is "
    "the one scale caveat: at 100 TB swap in the percentile-bucket "
    "two-pass (as agg_quantiles does) — same 10-row output",
)
def agg_lorenz(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    pos = c.where(F.col("c_acctbal") > 0).select(
        "c_custkey",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("bal_cents"),
    )
    dec = pos.select(
        "bal_cents",
        F.ntile(10)
        .over(W.orderBy(F.col("bal_cents"), F.col("c_custkey")))
        .alias("decile"),
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("bal_cents").cast("long").alias("bal"),
    ).localCheckpoint()  # 10 rows, read twice (totals + cumulative)
    tot = g.agg(
        F.sum("bal").cast("long").alias("tb"),
        F.sum("n_cust").cast("long").alias("tn"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum_cust = F.sum("n_cust").over(wc)
    cum_bal = F.sum("bal").over(wc)
    return (
        g.join(F.broadcast(tot))
        .withColumn("cc", cum_cust.cast("long"))
        .withColumn("cb", cum_bal.cast("long"))
        .select(
            "decile",
            "n_cust",
            F.expr("CAST(cc * 1000000 div tn AS BIGINT)").alias(
                "cum_cust_ppm"
            ),
            F.expr("CAST(cb * 1000000 div tb AS BIGINT)").alias(
                "cum_bal_ppm"
            ),
        )
        .orderBy("decile")
    )


@register(
    "agg_trimmed_mean",
    section="2.4",
    oracle=f"""
    WITH r AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
               AS n
      FROM orders)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(cents) * 10000 // COUNT(*) AS BIGINT) AS mean_micro
    FROM r
    WHERE rn > n // {_TRIM_DEN} AND rn <= n - n // {_TRIM_DEN}
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    notes=f"10%-trimmed mean of order value per priority class: drop "
    f"floor(n/{_TRIM_DEN}) rows at each end of the (price, orderkey) "
    f"total order, then mean the exact-cents middle as a MICRO-dollar "
    f"integer division — the robust-location companion to "
    f"agg_winsorized_mean (winsorize clamps the tails, trimming "
    f"removes them). The rank pass is partition-local per priority "
    f"class; sums are BIGINT cents so the trimmed mean is "
    f"integer-exact",
)
def agg_trimmed_mean(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    wp = W.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.row_number()
        .over(wp.orderBy(F.col("o_totalprice"), F.col("o_orderkey")))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    k = F.expr(f"n div {_TRIM_DEN}")
    return (
        r.where((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            "o_orderpriority",
            "n_kept",
            "sum_cents",
            F.expr("CAST(sum_cents * 10000 div n_kept AS BIGINT)").alias(
                "mean_micro"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "ts_page_hinkley",
    section="2.10",
    oracle=f"""
    WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                           AS BIGINT) AS di,
                      CAST(COUNT(*) AS BIGINT) AS x
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
    cut AS (SELECT CAST(epoch_us(TIMESTAMP '{_PH_CUT_DATE}')
                        // 86400000000 AS BIGINT) AS c),
    pre AS (SELECT CAST(SUM(x) AS BIGINT) AS ps,
                   CAST(COUNT(*) AS BIGINT) AS pd
            FROM d CROSS JOIN cut WHERE di < c),
    post AS (SELECT di, x FROM d CROSS JOIN cut WHERE di >= c),
    walk AS (SELECT di, x,
                    CAST(SUM(pre.pd * post.x - pre.ps)
                         OVER (ORDER BY di) AS BIGINT) AS m_scaled
             FROM post CROSS JOIN pre),
    ph AS (SELECT di, x, m_scaled,
                  m_scaled - MIN(m_scaled) OVER (ORDER BY di) AS ph_scaled
           FROM walk)
    SELECT ph.di AS day_index, ph.x AS purchases,
           ph.m_scaled, CAST(ph.ph_scaled AS BIGINT) AS ph_scaled,
           ph.ph_scaled > {_PH_LAMBDA} * pre.pd AS alarm
    FROM ph CROSS JOIN pre
    ORDER BY day_index
    """,
    notes=f"Page-Hinkley drift test on the post-{_PH_CUT_DATE[:10]} "
    f"daily purchase-count series against the pre-period mean: the "
    f"deviation walk m_t = sum(x_i - mean_pre) is computed SCALED by "
    f"pre_days (m_scaled = pre_days*x_i - pre_sum summed), so the walk "
    f"is an exact BIGINT prefix sum with no float mean anywhere; "
    f"PH_t = m_t - min(m_<=t) compares against lambda={_PH_LAMBDA} "
    f"counts cross-multiplied by pre_days — the same "
    f"integer-cross-multiply discipline as SPRT/CUSUM. The "
    f"drift-detection sibling of ts_cusum (CUSUM resets, PH tracks "
    f"the running minimum). One daily rollup; the walk is "
    f"calendar-bounded",
)
def ts_page_hinkley(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(
            F.expr(
                "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
                " div 86400000000 AS BIGINT)"
            ).alias("di")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    cut_di = F.expr(
        f"CAST(unix_micros(CAST('{_PH_CUT_DATE}' AS TIMESTAMP))"
        " div 86400000000 AS BIGINT)"
    )
    d = d.withColumn("c", cut_di).localCheckpoint()  # ~30 rows, read twice
    pre = d.where(F.col("di") < F.col("c")).agg(
        F.sum("x").cast("long").alias("ps"),
        F.count(F.lit(1)).cast("long").alias("pd"),
    )
    post = d.where(F.col("di") >= F.col("c")).select("di", "x")
    wo = W.orderBy("di").rowsBetween(W.unboundedPreceding, 0)
    walk = post.join(F.broadcast(pre)).withColumn(
        "m_scaled",
        F.sum(F.col("pd") * F.col("x") - F.col("ps")).over(wo).cast("long"),
    )
    return (
        walk.withColumn(
            "ph_scaled",
            (F.col("m_scaled") - F.min("m_scaled").over(wo)).cast("long"),
        )
        .select(
            F.col("di").alias("day_index"),
            F.col("x").alias("purchases"),
            "m_scaled",
            "ph_scaled",
            (F.col("ph_scaled") > F.lit(_PH_LAMBDA) * F.col("pd")).alias(
                "alarm"
            ),
        )
        .orderBy("day_index")
    )


# total-user denominator note: support is over users with ANY event
@register(
    "evt_seq_support",
    section="2.10",
    oracle="""
    WITH day AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE ts >= TIMESTAMP '2024-01-08'
        AND ts < TIMESTAMP '2024-01-09'),
    u AS (
      SELECT user_id, event_type,
             CAST(MIN(us) AS BIGINT) AS f,
             CAST(MAX(us) AS BIGINT) AS l
      FROM day GROUP BY 1, 2),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM day),
    sup AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM u a JOIN u b ON a.user_id = b.user_id AND a.f < b.l
      GROUP BY 1, 2)
    SELECT s.type_a, s.type_b, s.n_users,
           CAST(s.n_users * 1000000 // t.n AS BIGINT) AS support_ppm
    FROM sup s CROSS JOIN tot t
    ORDER BY s.type_a, s.type_b
    """,
    notes="order-preserving sequential-pattern support (PrefixSpan's "
    "length-2 layer) over ONE day's sessions (2024-01-08): for every "
    "ordered event-type pair (a, b) — including a=b, the repeat "
    "pattern — the number of that day's users whose events contain "
    "some a BEFORE some b, as first-occurrence(a) < last-occurrence(b) "
    "(exactly the exists-subsequence condition for k=2). The day slice "
    "is the informative window: over the full 30-day history every "
    "active user exhibits every pair and support collapses to 1e6 ppm "
    "uniformly (caught by this round's degeneracy contract "
    "pre-commit). One user-type-keyed min/max rollup, then a "
    "user-co-keyed self-join with bounded 5x5 fanout; support in "
    "integer ppm of the day's active users. The subsequence companion "
    "to evt_transitions (consecutive bigrams) and evt_assoc_rules "
    "(unordered baskets)",
)
def evt_seq_support(spark, sf_dir):
    from ..core import epoch_us

    ev = table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-09").cast("timestamp"))
    )
    u = ev.groupBy("user_id", "event_type").agg(
        F.min(epoch_us("ts")).cast("long").alias("f"),
        F.max(epoch_us("ts")).cast("long").alias("l"),
    ).localCheckpoint()  # user-type-sized, read twice (both join sides)
    tot = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    a = u.select("user_id", F.col("event_type").alias("type_a"), "f")
    b = u.select("user_id", F.col("event_type").alias("type_b"), "l")
    sup = (
        a.join(b, "user_id")
        .where(F.col("f") < F.col("l"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    return (
        sup.join(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_users",
            F.expr("CAST(n_users * 1000000 div n AS BIGINT)").alias(
                "support_ppm"
            ),
        )
        .orderBy("type_a", "type_b")
    )
