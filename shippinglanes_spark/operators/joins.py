"""SURVEY §2.3 — joins.

Scale notes: dims (region/nation/customer/supplier/part) sit far under the
broadcast threshold, so every fact->dim join here compiles to a
BroadcastHashJoin (no shuffle of the fact side); `join_broadcast` pins the
hint explicitly. The theta/range join broadcasts the tiny bands table so it
becomes a BroadcastNestedLoopJoin over a 3-row build side rather than a
cartesian shuffle. The as-of join is the union+running-max idiom: one
shuffle on the key, no point-in-time self-join explosion — the standard
scalable formulation Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import epoch_us, money
from ..io import table
from ..registry import register


@register(
    "join_inner_eq",
    section="2.3",
    oracle="""
    SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 300000
    """,
)
def join_inner_eq(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.where(F.col("o_totalprice") > 300000)
        .join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
    )


@register(
    "join_multi5",
    section="2.3",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def join_multi5(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r.where(F.col("r_name") == "ASIA"), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_left",
    section="2.3",
    oracle="""
    SELECT n_name, CAST(COUNT(c_custkey) AS BIGINT) AS cust_cnt
    FROM nation LEFT JOIN customer
      ON c_nationkey = n_nationkey AND c_acctbal > 9000
    GROUP BY n_name
    """,
)
def join_left(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    return (
        n.join(c, (c.c_nationkey == n.n_nationkey) & (c.c_acctbal > 9000), "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("cust_cnt"))
    )


@register(
    "join_full",
    section="2.3",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS nc
      FROM customer WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS ns
      FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
    )
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(nc, 0) AS nc, COALESCE(ns, 0) AS ns
    FROM c FULL JOIN s ON c.k = s.k
    """,
)
def join_full(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    c = (
        cust.where(F.col("c_mktsegment") == "AUTOMOBILE")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    s = (
        sup.where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    return c.join(s, c.ck == s.sk, "full").select(
        F.coalesce(c.ck, s.sk).alias("nationkey"),
        F.coalesce("nc", F.lit(0)).alias("nc"),
        F.coalesce("ns", F.lit(0)).alias("ns"),
    )


@register(
    "join_semi",
    section="2.3",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    section="2.3",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    notes="Anti-join on the filtered subset join_semi selects FROM — "
    "customers with NO order over $400k, the exact complement of "
    "join_semi's survivors, so (semi UNION anti) partitions customer. "
    "The filter keeps the anti set provably non-empty at every fixture "
    "SF (20 / 202 / 1997 rows at sf0.001/0.01/0.1); the round-10 "
    "unfiltered form matched on 0-vs-0 rows at sf0.01 because every "
    "customer has at least one order — a vacuous certificate. The "
    "o_totalprice filter is pushed below the anti-join build side, so "
    "the shuffled build input shrinks ~25x before the exchange",
)
def join_anti(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast",
    section="2.3",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cust_cnt,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_broadcast(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("cust_cnt"),
            money(F.sum("c_acctbal")).alias("total_bal"),
        )
    )


@register(
    "join_theta_range",
    section="2.3",
    oracle="""
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 51.0, 'high'))
         AS b(lo, hi, band)
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
)
def join_theta_range(spark, sf_dir):
    # No fan_out: a 3-row broadcast BNLJ evaluates ~3 comparisons/row —
    # far cheaper than the repartition shuffle would be (measured 4.2s
    # fanned vs 0.9s plain at sf0.1).
    li = table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 51.0, "high")],
        "lo double, hi double, band string",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("l_extendedprice")).alias("total_price"),
        )
    )


@register(
    "join_asof",
    section="2.3",
    oracle="""
    WITH vp AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_us
      FROM events WHERE event_type IN ('view', 'purchase')
    )
    SELECT user_id, event_id, ts_us, last_view_us
    FROM vp WHERE event_type = 'purchase'
    """,
    notes="as-of via union + running max: one shuffle, no self-join explosion",
)
def join_asof(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    vp = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        vp.withColumn(
            "last_view_us",
            F.max(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
        )
        .where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts_us", "last_view_us")
    )


@register(
    "join_self_pairs",
    section="2.3",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
    """,
)
def join_self_pairs(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_name") < F.col("b.n_name")),
    ).select(
        F.col("a.n_name").alias("n1"),
        F.col("b.n_name").alias("n2"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@register(
    "join_interval",
    section="2.3",
    oracle="""
    SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_quick
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY l_orderkey
    """,
    notes="equi key + time-interval containment (ship within 30 days of order)",
)
def join_interval(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        )
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_quick"))
    )


@register(
    "join_range_binned",
    section="2.3",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
    e AS (SELECT ts AS e_ts FROM events WHERE event_type = 'error')
    SELECT p_id, CAST(COUNT(*) AS BIGINT) AS n_errors
    FROM p JOIN e ON e_ts >= p_ts AND e_ts < p_ts + INTERVAL 1 HOUR
    GROUP BY p_id
    """,
    notes="PURE range join (no equi key) done the scale-safe way: hour-bin "
    "bucketing turns it into an equi-join on bin + exact residual filter. "
    "Each probe interval spans <=2 bins and each event belongs to exactly "
    "one, so no dedup is needed. The naive plan is a BroadcastNestedLoop "
    "over |purchases| x |errors|; the binned plan shuffles once on bin "
    "(asserted BNLJ-free in tests/test_plans.py). Oracle = DuckDB's IEJoin "
    "over the same predicate",
)
def join_range_binned(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    hour = F.expr("INTERVAL 1 HOUR")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    # a [ts, ts+1h) interval overlaps exactly the bins of its endpoints
    p_bins = p.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("p_ts")),
                F.date_trunc("hour", F.col("p_ts") + hour),
                hour,
            )
        ),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("ts").alias("e_ts"),
        F.date_trunc("hour", F.col("ts")).alias("bin"),
    )
    return (
        p_bins.join(e, "bin")
        .where(
            (F.col("e_ts") >= F.col("p_ts"))
            & (F.col("e_ts") < F.col("p_ts") + hour)
        )
        .groupBy("p_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )


@register(
    "join_spatial_grid",
    section="2.3",
    oracle="""
    WITH fixes AS (
      SELECT user_id, (value % 180) - 90 AS lat, ((value * 2) % 360) - 180 AS lon
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1)
    SELECT a.user_id AS id_a, b.user_id AS id_b,
           FLOOR(GREATEST(ABS(a.lat - b.lat), ABS(a.lon - b.lon)) * 100) / 100.0
             AS cheb_deg
    FROM fixes a JOIN fixes b
      ON a.user_id < b.user_id
     AND ABS(a.lat - b.lat) <= 5 AND ABS(a.lon - b.lon) <= 5
    """,
    notes="spatial proximity self-join (vessels whose latest fixes sit "
    "within a 5-degree box) via GRID-CELL BUCKETING: one side replicates "
    "to its 3x3 neighbor cells, the other stays home, so the join is a "
    "plain equi-join on cell id + exact residual filter — no "
    "BroadcastNestedLoop/cartesian (the 2D analogue of join_range_binned; "
    "each pair meets in exactly one cell, so no dedup pass). Oracle = "
    "DuckDB's IEJoin over the raw predicate. Distance presented as "
    "floor(x*100)/100 (exact IEEE ops; ROUND(double) is not cross-engine "
    "stable)",
)
def join_spatial_grid(spark, sf_dir):
    """AIS proximity screening: which vessel pairs are currently near each
    other. Grid cells of edge = the search radius (5 deg) guarantee every
    qualifying pair shares (probe cell of a) = (home cell of b) for
    exactly one of the 9 probe cells, turning the pure spatial theta-join
    into a keyed shuffle that scales with cell occupancy, not n^2."""
    EPS = 5.0
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc(epoch_us("ts")), F.desc("event_id")
    )
    fixes = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            ((F.col("value") % 180) - 90).alias("lat"),
            (((F.col("value") * 2) % 360) - 180).alias("lon"),
        )
    )
    cx = F.floor(F.col("lon") / EPS)
    cy = F.floor(F.col("lat") / EPS)
    home = fixes.select(
        F.col("user_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    cells = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    offsets = F.expr(f"explode(array({cells}))")
    probe = fixes.select(
        F.col("user_id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        cx.alias("pcx"),
        cy.alias("pcy"),
        offsets.alias("o"),
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("pcx") + F.col("o.dx")).alias("cx"),
        (F.col("pcy") + F.col("o.dy")).alias("cy"),
    )
    cheb = F.greatest(
        F.abs(F.col("lat_a") - F.col("lat_b")),
        F.abs(F.col("lon_a") - F.col("lon_b")),
    )
    return (
        probe.join(home, ["cx", "cy"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("lat_a") - F.col("lat_b")) <= EPS)
            & (F.abs(F.col("lon_a") - F.col("lon_b")) <= EPS)
        )
        .select(
            "id_a",
            "id_b",
            (F.floor(cheb * 100) / 100.0).alias("cheb_deg"),
        )
    )


@register(
    "join_scd2_asof",
    section="2.3",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(json_extract(props, '$.k') AS INT) AS k
      FROM events WHERE event_type = 'signup'
    ),
    chg AS (
      SELECT * FROM (
        SELECT user_id, event_id, ts_us, k,
               LAG(k) OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) AS prev_k
        FROM e)
      WHERE prev_k IS NULL OR k <> prev_k
    ),
    dim AS (
      SELECT user_id, k, ts_us AS valid_from_us,
             LEAD(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS valid_to_us
      FROM chg
    ),
    fact AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts_us, d.k AS k_at_purchase
    FROM fact f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts_us >= d.valid_from_us
     AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
    """,
    notes="temporal dimension lookup: purchases joined to the SCD2 "
    "dimension version valid at event time (composes the evt_scd2 "
    "build). Equi-key on user_id with the validity range as a residual "
    "predicate — a keyed join, never a nested loop; at most one version "
    "matches per fact row by construction (intervals partition time)",
)
def join_scd2_asof(spark, sf_dir):
    """The warehouse point-in-time join: facts see the dimension row
    that was current WHEN THEY HAPPENED, not today's. Validity
    intervals are disjoint per user, so the user_id equi-join plus
    range residual yields at most one match — same cost shape as a
    plain keyed join, co-partitionable on user_id at any scale."""
    from .events import evt_scd2
    from ..core import epoch_us

    dim = evt_scd2(spark, sf_dir).select(
        F.col("user_id").alias("d_user"),
        F.col("k").alias("k_at_purchase"),
        "valid_from_us",
        "valid_to_us",
    )
    ev = table(spark, sf_dir, "events")
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", epoch_us("ts").alias("ts_us")
    )
    return fact.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts_us") >= F.col("valid_from_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("ts_us") < F.col("valid_to_us"))
        ),
        "left",
    ).select("event_id", "user_id", "ts_us", "k_at_purchase")


@register(
    "join_salted",
    section="2.3",
    oracle="""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    notes="the skew-mitigation machinery as a driver-checked query: "
    "salted_join (8-way fact salt, dim replicated per salt) must "
    "produce row-identical results to the plain join — the oracle IS "
    "the plain join. This is the explicit fallback for hot keys AQE's "
    "skew splitting can't fix (e.g. a hot key against a dim that must "
    "shuffle); salting spreads one hot key over n tasks",
)
def join_salted(spark, sf_dir):
    """Skewed-join execution, value-checked: the salt changes the
    physical key distribution, never the logical result. Aggregating
    after the salted join collapses the salt away; any salting bug
    (lost rows, duplicated dim matches) breaks the hash match."""
    from ..plans.skew import salted_join

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = salted_join(o, c, F.col("o_custkey"), F.col("c_custkey"), n_salts=8)
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "join_cross",
    section="2.3",
    oracle="""
    SELECT n_name, r_name,
           CAST(n_regionkey = r_regionkey AS INT) AS is_home
    FROM nation CROSS JOIN region
    """,
    notes="explicit cartesian product of two broadcast-size dims (25 x 5): "
    "the only sane cross-join shape at scale — at least one side must be "
    "broadcastable, which Spark compiles to BroadcastNestedLoopJoin",
)
def join_cross(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select(
        "n_name",
        "r_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).cast("int").alias("is_home"),
    )


@register(
    "join_asof_forward",
    section="2.3",
    oracle="""
    WITH vp AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_us
      FROM events WHERE event_type IN ('view', 'purchase')
    )
    SELECT user_id, event_id, ts_us, next_purchase_us,
           next_purchase_us - ts_us AS wait_us
    FROM vp WHERE event_type = 'view'
    """,
    notes="FORWARD as-of (each view matched to the user's next purchase at "
    "or after it): mirror of join_asof via a running MIN over the "
    "following frame — still one shuffle on the key, no self-join; NULL "
    "when no later purchase exists",
)
def join_asof_forward(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    vp = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        vp.withColumn(
            "next_purchase_us",
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts_us"))
            ).over(w),
        )
        .where(F.col("event_type") == "view")
        .select(
            "user_id",
            "event_id",
            "ts_us",
            "next_purchase_us",
            (F.col("next_purchase_us") - F.col("ts_us")).alias("wait_us"),
        )
    )


@register(
    "join_null_safe",
    section="2.3",
    oracle="""
    WITH a AS (SELECT event_id,
                      CASE WHEN value >= 100 THEN CAST(FLOOR(value) AS BIGINT) % 10 END AS k
               FROM events WHERE event_type = 'view'),
    b AS (SELECT CASE WHEN value >= 100 THEN CAST(FLOOR(value) AS BIGINT) % 10 END AS k,
                 CAST(COUNT(*) AS BIGINT) AS n_purchases
          FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT a.event_id, a.k, b.n_purchases
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    notes="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "MATCH each other instead of vanishing — the semantics CDC/merge keys "
    "with optional fields need; still compiles to a hash join (null-safe "
    "equality is hashable), not a nested loop",
)
def join_null_safe(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # FLOOR before the integer cast: DuckDB's double->BIGINT cast ROUNDS
    # while Spark's truncates — floor makes both exact and identical
    k = F.when(
        F.col("value") >= 100, F.floor(F.col("value")).cast("long") % 10
    )
    a = ev.where(F.col("event_type") == "view").select(
        "event_id", k.alias("ka")
    )
    b = (
        ev.where(F.col("event_type") == "purchase")
        .select(k.alias("kb"))
        .groupBy("kb")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return a.join(b, a.ka.eqNullSafe(b.kb)).select(
        "event_id", F.col("ka").alias("k"), "n_purchases"
    )


@register(
    "join_asof_nearest",
    section="2.3",
    oracle="""
    WITH vp AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_view_us,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_view_us
      FROM events WHERE event_type IN ('view', 'purchase')
    )
    SELECT user_id, event_id, ts_us,
           CASE
             WHEN prev_view_us IS NULL THEN next_view_us
             WHEN next_view_us IS NULL THEN prev_view_us
             WHEN ts_us - prev_view_us <= next_view_us - ts_us
               THEN prev_view_us
             ELSE next_view_us
           END AS nearest_view_us,
           LEAST(COALESCE(ts_us - prev_view_us, 9223372036854775807),
                 COALESCE(next_view_us - ts_us, 9223372036854775807))
             AS gap_us
    FROM vp WHERE event_type = 'purchase'
    """,
    notes="NEAREST as-of join (backward/forward exist as join_asof / "
    "join_asof_forward): each purchase pairs with whichever view is "
    "closest in time on either side, ties to the earlier one. Same "
    "union + two running extrema formulation — ONE keyed shuffle, two "
    "frames over one sort, no self-join; the sensor-alignment "
    "semantics fusion pipelines want when drift can go either way",
)
def join_asof_nearest(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    vp = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts_us"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    MAXL = 9223372036854775807
    both = vp.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.max(view_ts).over(wb).alias("prev_view_us"),
        F.min(view_ts).over(wf).alias("next_view_us"),
    ).where(F.col("event_type") == "purchase")
    back_gap = F.col("ts_us") - F.col("prev_view_us")
    fwd_gap = F.col("next_view_us") - F.col("ts_us")
    nearest = (
        F.when(F.col("prev_view_us").isNull(), F.col("next_view_us"))
        .when(F.col("next_view_us").isNull(), F.col("prev_view_us"))
        .when(back_gap <= fwd_gap, F.col("prev_view_us"))
        .otherwise(F.col("next_view_us"))
    )
    return both.select(
        "user_id",
        "event_id",
        "ts_us",
        nearest.alias("nearest_view_us"),
        F.least(
            F.coalesce(back_gap, F.lit(MAXL)), F.coalesce(fwd_gap, F.lit(MAXL))
        ).alias("gap_us"),
    )


@register(
    "join_entity_resolution",
    section="2.3",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey + 1000000 AS dirty_id,
             translate(c_name, '012', 'OIZ') AS dirty_name,
             c_nationkey, c_mktsegment
      FROM customer),
    cand AS (
      SELECT d.dirty_id, c.c_custkey,
             CAST(levenshtein(d.dirty_name, c.c_name) AS BIGINT) AS dist
      FROM dirty d
      JOIN customer c
        ON c.c_nationkey = d.c_nationkey
       AND c.c_mktsegment = d.c_mktsegment),
    best AS (
      SELECT dirty_id, c_custkey, dist,
             ROW_NUMBER() OVER (PARTITION BY dirty_id
                                ORDER BY dist, c_custkey) AS rn
      FROM cand)
    SELECT dirty_id, c_custkey AS matched_key, dist
    FROM best WHERE rn = 1
    """,
    notes="end-to-end entity resolution (the record-linkage pipeline): "
    "a corrupted registry (digits OCR-swapped to letters) is matched "
    "back to the clean table by BLOCK -> SCORE -> PICK-BEST. Blocking "
    "on clean attributes (nation x segment) bounds candidate pairs to "
    "block-size x records — the all-pairs levenshtein join never "
    "exists (the fn_fuzzy lesson as a full pipeline). Before scoring, "
    "two LOSSLESS prunes from the string-similarity-join literature "
    "cut the edit-distance work ~12x: (1) a SEED pass — exact match "
    "after OCR normalization (O/I/Z -> 0/1/2, the canonical confusion "
    "pairs) — gives each dirty record a VERIFIED upper bound on its "
    "best distance, and (2) character-count filtering (the count "
    "filter of Ed-Join/Gram-Count): lev(a,b) >= ceil(L1(charcounts)/2) "
    "is a rigorous lower bound, so any pair whose bound exceeds the "
    "seed's upper bound can never win and is dropped BEFORE the DP. "
    "Survivors verify with edit distance after chunked common-prefix "
    "stripping (lev(p||a, p||b) = lev(a, b) — block-mates share "
    "structural prefixes, so the DP runs on the differing tail only); "
    "best-match is one keyed window rank with a deterministic "
    "tiebreak. Ties at the minimum all carry lower bound <= true "
    "distance <= upper bound, so the winner (and its tiebreak set) is "
    "IDENTICAL to the unpruned join the oracle runs. At 100 TB "
    "blocking keys get finer (phonetic + zip + birth-year), the plan "
    "shape stays: equi-joins on block keys, never a theta join",
)
def join_entity_resolution(spark, sf_dir):
    from pyspark.sql import Window as W

    # character classes tracked by the count filter: the OCR letters
    # plus all digits (the chars that actually vary between records)
    tracked = list("OIZ0123456789")

    def _counts(col, prefix):
        return [
            (
                F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))
            ).alias(f"{prefix}{i}")
            for i, ch in enumerate(tracked)
        ]

    c = table(spark, sf_dir, "customer")
    dirty = c.select(
        (F.col("c_custkey") + 1000000).alias("dirty_id"),
        F.translate("c_name", "012", "OIZ").alias("dirty_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
    )
    # seed pass: exact match after OCR normalization, inside the block.
    # Each hit's edit distance is an ACHIEVED distance, hence an upper
    # bound on the block minimum for that dirty record.
    seed = (
        dirty.join(
            c,
            (F.col("c_nationkey") == F.col("d_nationkey"))
            & (F.col("c_mktsegment") == F.col("d_mktsegment"))
            & (
                F.col("c_name")
                == F.translate("dirty_name", "OIZ", "012")
            ),
        )
        .groupBy("dirty_id")
        .agg(F.min(F.levenshtein("dirty_name", "c_name")).alias("ub"))
    )
    probe = dirty.select(
        "dirty_id",
        "dirty_name",
        "d_nationkey",
        "d_mktsegment",
        *_counts(F.col("dirty_name"), "da"),
    ).join(seed, "dirty_id", "left")
    build = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        *_counts(F.col("c_name"), "ca"),
    )
    pairs = probe.join(
        build,
        (F.col("c_nationkey") == F.col("d_nationkey"))
        & (F.col("c_mktsegment") == F.col("d_mktsegment")),
    )
    # count filter: lev >= ceil(sum_x |cnt_x(a)-cnt_x(b)| / 2) — every
    # edit changes the tracked-character L1 by at most 2. A missing
    # seed (no normalized match) falls back to the trivial upper bound
    # max(len a, len b), keeping every pair for that record.
    l1 = " + ".join(f"abs(da{i} - ca{i})" for i in range(len(tracked)))
    lower = F.expr(f"({l1} + 1) div 2")
    upper = F.coalesce(
        F.col("ub").cast("long"),
        F.greatest(F.length("dirty_name"), F.length("c_name")).cast("long"),
    )
    # chunked common-prefix strip (exact LCP via 8/4/2/1 probes): edit
    # distance is invariant under common-prefix removal, and the DP is
    # quadratic in what remains.
    lcp = "0"
    for chunk in (8, 4, 2, 1):
        lcp = (
            f"({lcp} + CASE WHEN substring(dirty_name, {lcp} + 1, {chunk})"
            f" = substring(c_name, {lcp} + 1, {chunk})"
            f" THEN {chunk} ELSE 0 END)"
        )
    dist = F.expr(
        f"levenshtein(substring(dirty_name, {lcp} + 1),"
        f" substring(c_name, {lcp} + 1))"
    ).cast("long")
    cand = (
        pairs.where(lower <= upper)
        .select("dirty_id", "c_custkey", dist.alias("dist"))
    )
    w = W.partitionBy("dirty_id").orderBy("dist", "c_custkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("dirty_id", F.col("c_custkey").alias("matched_key"), "dist")
    )


_BLOOM_WORDS = 256
_BLOOM_BITS = _BLOOM_WORDS * 63  # 63 usable bits/word keeps 1<<pos sign-safe
_BLOOM_MULT = 2654435761  # Knuth multiplicative hash; custkey*mult < 2^63
_BLOOM_PRICE = 490000


@register(
    "join_bloom_prefilter",
    section="2.3",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_hi
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > {_BLOOM_PRICE}
    GROUP BY 1, 2
    """,
    notes="customers with premium orders, computed through an engine-"
    "level BLOOM-FILTER SEMI-JOIN built from relational primitives "
    "(this Spark build lacks bloom_filter_agg/might_contain, so the "
    f"filter is {_BLOOM_WORDS} BIGINT words x 63 bits populated by "
    "bit_or over two multiplicative-hash bit positions per build key). "
    "The bloom only PRUNES the probe side — false positives are "
    "eliminated by the exact join that follows — so the result is "
    "identical to the plain join the oracle runs; a plan/selectivity "
    "unit test asserts the prefilter actually drops most probe rows "
    "before the shuffle",
)
def join_bloom_prefilter(spark, sf_dir):
    """The join-prefilter pattern for 100 TB probes: aggregate the
    SELECTIVE build side's keys into a fixed 2 KB bit array (one
    map-side-combined bit_or), broadcast it, and bit-test the probe
    rows BEFORE the join shuffle — rows that cannot match never leave
    their partition. Spark's own runtime row-level filtering does this
    automatically only when bloom_filter_agg exists; this shows the
    engine-level construction with exact-integer hashing so the
    filter itself is deterministic and cross-engine checkable."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    hi = o.where(F.col("o_totalprice") > _BLOOM_PRICE).select(
        F.col("o_custkey").cast("long").alias("k"), "o_totalprice"
    )

    def _bits(key):
        b1 = key % _BLOOM_BITS
        b2 = (key * F.lit(_BLOOM_MULT)) % _BLOOM_BITS
        return b1, b2

    kb1, kb2 = _bits(F.col("k"))
    bloom = (
        hi.select("k")
        .distinct()
        .select(F.explode(F.array(kb1, kb2)).alias("bit"))
        .groupBy(F.expr("bit div 63").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 63 AS INT))")
            ).alias("bits")
        )
        .localCheckpoint()  # the 2 KB filter, built once
    )

    cust = c.select(
        "c_custkey", "c_name", F.col("c_custkey").cast("long").alias("k")
    )
    probe = cust.select(
        "c_custkey",
        "c_name",
        "k",
        F.expr(f"CAST(c_custkey AS BIGINT) % {_BLOOM_BITS} div 63").alias(
            "w1"
        ),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(CAST(c_custkey AS BIGINT) % {_BLOOM_BITS} % 63 AS INT))"
        ).alias("m1"),
        F.expr(
            f"CAST(c_custkey AS BIGINT) * {_BLOOM_MULT} % {_BLOOM_BITS}"
            " div 63"
        ).alias("w2"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(CAST(c_custkey AS BIGINT)"
            f" * {_BLOOM_MULT} % {_BLOOM_BITS} % 63 AS INT))"
        ).alias("m2"),
    )
    b1 = bloom.select(
        F.col("word").alias("word1"), F.col("bits").alias("bits1")
    )
    b2 = bloom.select(
        F.col("word").alias("word2"), F.col("bits").alias("bits2")
    )
    pruned = (
        probe.join(F.broadcast(b1), probe.w1 == b1.word1)
        .where(F.col("bits1").bitwiseAND(F.col("m1")) != 0)
        .join(F.broadcast(b2), probe.w2 == b2.word2)
        .where(F.col("bits2").bitwiseAND(F.col("m2")) != 0)
        .select("c_custkey", "c_name", "k")
    )
    return (
        pruned.join(hi, pruned.k == hi.k)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("total_hi"),
        )
    )


_ASOF_TOL_US = 3_600_000_000  # 1 hour staleness bound


@register(
    "join_asof_tolerance",
    section="2.3",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS kind
      FROM events WHERE event_type IN ('view', 'click')),
    m AS (
      SELECT user_id, event_id, ts_us, kind,
             LAST_VALUE(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
               OVER w AS v_id,
             LAST_VALUE(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS)
               OVER w AS v_ts
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, kind, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id AS click_id, ts_us AS click_us,
           CASE WHEN ts_us - v_ts <= {_ASOF_TOL_US}
                THEN v_id END AS view_id,
           CASE WHEN ts_us - v_ts <= {_ASOF_TOL_US}
                THEN CAST(ts_us - v_ts AS BIGINT) END AS staleness_us
    FROM m WHERE kind = 1
    """,
    notes="as-of join with a STALENESS TOLERANCE (pandas merge_asof's "
    "tolerance= axis, absent from join_asof/_forward/_nearest): each "
    "click matches its most recent view only if it is <= 1h old, else "
    "the left row survives UNMATCHED — bounded-staleness semantics "
    "for feature freshness rules. Same single-shuffle union-window "
    "formulation as join_asof (views sort before clicks at equal "
    "timestamps so a same-instant view is eligible); matched id and "
    "timestamp come from the SAME ordered LAST_VALUE IGNORE NULLS "
    "frame so the pair can never disagree",
)
def join_asof_tolerance(spark, sf_dir):
    """The asof family's freshness-bounded member: one keyed sort
    drives both IGNORE NULLS carries; the tolerance check is a
    row-local integer comparison after the window, so bounding
    staleness costs nothing over the plain as-of."""
    ev = table(spark, sf_dir, "events")
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("ts_us"),
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = t.select(
        "user_id",
        "event_id",
        "ts_us",
        "kind",
        F.last(
            F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True
        )
        .over(w)
        .alias("v_id"),
        F.last(
            F.when(F.col("kind") == 0, F.col("ts_us")), ignorenulls=True
        )
        .over(w)
        .alias("v_ts"),
    )
    fresh = F.col("ts_us") - F.col("v_ts") <= _ASOF_TOL_US
    return m.where(F.col("kind") == 1).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_us"),
        F.when(fresh, F.col("v_id")).alias("view_id"),
        F.when(fresh, (F.col("ts_us") - F.col("v_ts")).cast("long")).alias(
            "staleness_us"
        ),
    )
