"""SURVEY §2.4 — aggregation.

Scale notes: every groupBy here compiles to partial (map-side) + final
HashAggregate, so the shuffle carries pre-aggregated partials, not rows.
ROUND on float aggregates keeps the driver's value-hash stable across
summation orders (FIXTURES.md gotcha #2); DuckDB integer aggregates are
CAST to BIGINT because sum(int) there is HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import fan_out, money
from ..io import table
from ..registry import register


@register(
    "agg_global",
    section="2.4",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(MIN(l_discount), 4) AS min_disc,
           ROUND(MAX(l_tax), 4) AS max_tax,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum("l_quantity")).alias("sum_qty"),
        money(F.avg("l_extendedprice")).alias("avg_price"),
        F.round(F.min("l_discount"), 4).alias("min_disc"),
        F.round(F.max("l_tax"), 4).alias("max_tax"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "agg_groupby",
    section="2.4",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    notes="flagship: TPC-H Q1 shape (entry() runs this at sf0.001)",
)
def agg_groupby(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price)).alias("sum_disc_price"),
            money(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    section="2.4",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_approx_distinct",
    section="2.4",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BIGINT) AS within_5pct
    FROM events GROUP BY event_type
    """,
    notes="HLL sketch certified by DERIVED-PROPERTY oracle: the sketch "
    "value itself is engine-specific, so the declared output carries "
    "the EXACT per-group distinct count (hash-checked against DuckDB) "
    "plus a flag that the rsd=0.01 sketch landed within ±5%% of it — "
    "a bound DuckDB asserts as the constant-true row. The exact "
    "distinct costs one extra Expand pass at fixture scale; at 100 TB "
    "a user keeps only the sketch column and the mergeability story "
    "(agg_sketch_merge). Tightness additionally asserted in "
    "tests/test_aggregation.py",
)
def agg_approx_distinct(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # Distinct-first, then ONE aggregation: HLL register state is
    # duplicate-insensitive, so the sketch over deduped (event_type,
    # user_id) pairs is bit-identical to the sketch over raw events —
    # and countDistinct becomes a plain count. The fused form planned
    # the distinct rewrite's 4 HashAggregates with the rsd=0.01 sketch's
    # 2^14-register buffer carried through BOTH exchanges: 2.27 s vs
    # 0.92 s at sf0.1, values identical (exceptAll = 0 both ways).
    g = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("a"),
            F.count(F.lit(1)).cast("long").alias("exact_users"),
        )
    )
    bound = 0.05 * F.col("exact_users")
    return g.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("a") - F.col("exact_users")) <= bound)
        .cast("long")
        .alias("within_5pct"),
    )


@register(
    "agg_quantiles",
    section="2.4",
    oracle="""
    SELECT event_type,
           ROUND(MEDIAN(value), 4) AS med,
           ROUND(QUANTILE_CONT(value, 0.95), 4) AS p95
    FROM events GROUP BY event_type
    """,
    notes="exact interpolated quantiles on both sides (not approx sketches)",
)
def agg_quantiles(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("med"),
        F.round(F.percentile("value", 0.95), 4).alias("p95"),
    )


@register(
    "agg_rollup",
    section="2.4",
    oracle="""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        money(F.sum("c_acctbal")).alias("total_bal"),
    )


@register(
    "agg_cube",
    section="2.4",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum("o_totalprice")).alias("total"),
    )


@register(
    "agg_collect",
    section="2.4",
    oracle="""
    SELECT o_custkey AS custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
    FROM orders GROUP BY o_custkey
    """,
    notes="collect_list is order-nondeterministic -> array_sort + join to string",
)
def agg_collect(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.array_join(F.array_sort(F.collect_list("o_orderkey")), ",").alias("order_keys")
    )


@register(
    "agg_having",
    section="2.4",
    oracle="""
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 60
    """,
)
def agg_having(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 60)
    )


@register(
    "agg_pivot",
    section="2.4",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS clicks,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS views,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchases,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signups,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS errors
    FROM events GROUP BY user_id
    """,
    notes="pivot via conditional aggregation (one pass; same plan df.pivot emits)",
)
def agg_pivot(spark, sf_dir):
    ev = table(spark, sf_dir, "events")

    def cnt(t, alias):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(alias)

    return ev.groupBy("user_id").agg(
        cnt("click", "clicks"),
        cnt("view", "views"),
        cnt("purchase", "purchases"),
        cnt("signup", "signups"),
        cnt("error", "errors"),
    )


@register(
    "agg_grouping_sets",
    section="2.4",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum("o_totalprice")).alias("total"),
    )


@register(
    "agg_quantile_sketch",
    section="2.4",
    oracle="""
    SELECT event_type,
           CAST(1 AS BIGINT) AS med_ok,
           CAST(1 AS BIGINT) AS p95_ok
    FROM events GROUP BY event_type
    """,
    notes="percentile_approx sketch (mergeable across partitions), "
    "certified by DERIVED-PROPERTY oracle: the sketch value is exact "
    "only up to its rank-error guarantee, so the declared output is a "
    "per-group flag that the approx median/p95 lies between the exact "
    "interpolated percentiles at q +/- 0.02 (200x the sketch's 1e-4 "
    "rank-error budget at accuracy=10000; the margin must also cover "
    ">= 1 whole element at the smallest fixture, where 1e-3 of a "
    "~200-row group is a fifth of a rank) — a bound DuckDB can assert "
    "as the constant-true row without replaying the sketch. Accuracy "
    "vs exact additionally asserted in tests/test_events_edge.py",
)
def agg_quantile_sketch(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("ma"),
        F.percentile_approx("value", 0.95, 10000).alias("pa"),
        F.expr("percentile(value, 0.48)").alias("mlo"),
        F.expr("percentile(value, 0.52)").alias("mhi"),
        F.expr("percentile(value, 0.93)").alias("plo"),
        F.expr("percentile(value, 0.97)").alias("phi"),
    )
    return g.select(
        "event_type",
        F.col("ma").between(F.col("mlo"), F.col("mhi")).cast("long").alias("med_ok"),
        F.col("pa").between(F.col("plo"), F.col("phi")).cast("long").alias("p95_ok"),
    )


@register(
    "agg_stats",
    section="2.4",
    oracle="""
    SELECT event_type,
           ROUND(CORR(value, CAST(json_extract(props, '$.k') AS INT)), 6) AS corr_vk,
           ROUND(COVAR_POP(value, CAST(json_extract(props, '$.k') AS INT)), 4)
             AS covar_vk,
           ROUND(VAR_POP(value), 4) AS var_v,
           ROUND(STDDEV_POP(value), 4) AS std_v,
           CAST(BOOL_AND(value > 0) AS INT) AS all_pos,
           CAST(BOOL_OR(value > 400) AS INT) AS any_big
    FROM events GROUP BY event_type
    """,
    notes="statistical aggregates: Pearson corr, population covar/var/stddev, bool_and/or",
)
def agg_stats(spark, sf_dir):
    # fan_out + variant: the JSON parse dominates and the fixture scans
    # as one split (see core.fan_out)
    ev = fan_out(table(spark, sf_dir, "events").select("event_type", "value", "props"))
    k = F.expr("try_variant_get(parse_json(props), '$.k', 'int')")
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", k), 6).alias("corr_vk"),
        F.round(F.covar_pop("value", k), 4).alias("covar_vk"),
        F.round(F.var_pop("value"), 4).alias("var_v"),
        F.round(F.stddev_pop("value"), 4).alias("std_v"),
        F.bool_and(F.col("value") > 0).cast("int").alias("all_pos"),
        F.bool_or(F.col("value") > 400).cast("int").alias("any_big"),
    )


@register(
    "agg_argminmax",
    section="2.4",
    oracle="""
    SELECT o_orderstatus,
           CAST(arg_max(o_orderkey,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey)
             AS BIGINT) AS priciest_order,
           CAST(arg_min(o_orderkey,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey)
             AS BIGINT) AS cheapest_order
    FROM orders GROUP BY o_orderstatus
    """,
    notes="arg_max/arg_min == max_by/min_by; ordering key is an integer "
    "(cents*1e10 + key) so ties are impossible and both engines agree",
)
def agg_argminmax(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    ordkey = (
        F.floor(F.col("o_totalprice") * 100).cast("long") * F.lit(10000000000)
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", ordkey).alias("priciest_order"),
        F.min_by("o_orderkey", ordkey).alias("cheapest_order"),
    )


@register(
    "agg_mode",
    section="2.4",
    oracle="""
    WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY user_id, event_type)
    SELECT user_id, event_type AS top_type, n AS n_top FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY n DESC, event_type) AS rn FROM c)
    WHERE rn = 1
    """,
    notes="per-key mode (most frequent value) with deterministic "
    "lexicographic tie-break - count + windowed argmax, two keyed "
    "shuffles, no value buffering (unlike a naive collect-and-count)",
)
def agg_mode(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), F.col("n").alias("n_top"))
    )


@register(
    "agg_sketch_merge",
    section="2.4",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BIGINT) AS merged_within_5pct
    FROM events GROUP BY event_type
    """,
    notes="the 100 TB pre-aggregation pattern: per-day HLL sketches "
    "(hll_sketch_agg) union-merged to per-type totals (hll_union_agg) — "
    "sketches are mergeable state, so daily rollups re-aggregate without "
    "touching raw data. DERIVED-PROPERTY oracle (the hll_intersection "
    "discipline): the oracle computes the exact per-type distincts and "
    "asserts the merged estimate lands within 5% (lgK=14 => ~0.8% "
    "rse, so the flag is deterministically 1); merged-vs-single-pass "
    "equality asserted in tests/test_aggregation2.py",
)
def agg_sketch_merge(spark, sf_dir):
    """Distinct users per event type computed by MERGING daily sketches,
    never re-reading raw events: the shape that lets a lake keep compact
    per-partition sketch columns and answer distinct-count queries over
    arbitrary date ranges by union-merge alone. HLL union (same lgConfigK)
    is lossless, so the merged estimate equals the single-pass one. The
    exact distinct rides along only to audit the estimate in place."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        )
        .cast("long")
        .alias("merged_within_5pct"),
    )


@register(
    "profile_columns",
    section="2.4",
    oracle="""
    SELECT 'l_quantity' AS col, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(MIN(l_quantity) AS VARCHAR) AS min_v,
           CAST(MAX(l_quantity) AS VARCHAR) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
           MIN(l_returnflag), MAX(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
           CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
           CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR),
           CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR)
    FROM lineitem
    """,
    notes="data-profiling pass (lake onboarding / data-quality gate): "
    "per-column row count, null count, exact distinct, min/max — one scan, "
    "all aggregates partial map-side; values stringified so heterogeneous "
    "column types share one result schema. CAST(qty AS VARCHAR) prints "
    "'1.0' on both engines for double; dates go through DATE for a "
    "format-stable string",
)
def profile_columns(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")

    def prof(col, minmax=None):
        c = F.col(col)
        mn = minmax(F.min(c)) if minmax else F.min(c).cast("string")
        mx = minmax(F.max(c)) if minmax else F.max(c).cast("string")
        return li.agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.count_distinct(c).alias("n_distinct"),
            mn.alias("min_v"),
            mx.alias("max_v"),
        ).select(F.lit(col).alias("col"), "n", "n_null", "n_distinct", "min_v", "max_v")
    as_date_str = lambda e: e.cast("date").cast("string")  # noqa: E731
    return (
        prof("l_quantity")
        .unionByName(prof("l_returnflag"))
        .unionByName(prof("l_shipdate", minmax=as_date_str))
    )


@register(
    "profile_histogram",
    section="2.4",
    oracle="""
    WITH mm AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
                FROM orders),
    b AS (SELECT LEAST(CAST(FLOOR((o_totalprice - mn) * 10 / (mx - mn))
                            AS BIGINT), 9) AS bucket
          FROM orders CROSS JOIN mm),
    cnts AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM b GROUP BY bucket)
    SELECT c.bucket,
           FLOOR((mm.mn + c.bucket * (mm.mx - mm.mn) / 10) * 100)
             / 100.0 AS lo,
           FLOOR((mm.mn + (c.bucket + 1) * (mm.mx - mm.mn) / 10) * 100)
             / 100.0 AS hi,
           c.cnt
    FROM cnts c CROSS JOIN mm
    """,
    notes="equi-width histogram of o_totalprice in 10 buckets: the "
    "standard two-phase distributed shape — a scalar min/max aggregate "
    "broadcast against the scan, then a keyed bucket count (10 groups). "
    "Bucket arithmetic is the identical IEEE expression on both engines; "
    "bound outputs are floor-disciplined to 2 dp",
)
def profile_histogram(spark, sf_dir):
    """Histogram for data profiling / range-partition planning. Pass 1
    computes global min/max (partial aggregate, one scalar row); pass 2
    re-scans with the broadcast bounds and counts per bucket. At 100 TB
    both passes are single map-side-combined scans; nothing driver-side
    but the 1-row bounds table."""
    o = table(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    span = F.col("mx") - F.col("mn")
    b = o.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("mn")) * 10 / span),
            F.lit(9).cast("long"),
        ).alias("bucket")
    )
    cnts = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return cnts.crossJoin(F.broadcast(mm)).select(
        "bucket",
        (F.floor((F.col("mn") + F.col("bucket") * span / 10) * 100) / 100.0).alias(
            "lo"
        ),
        (
            F.floor((F.col("mn") + (F.col("bucket") + 1) * span / 10) * 100) / 100.0
        ).alias("hi"),
        "cnt",
    )


@register(
    "agg_bitmap_distinct",
    section="2.4",
    oracle="""
    WITH chunks AS (
      SELECT event_type,
             user_id // 32 AS chunk,
             CAST(bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS BIGINT)
               AS bm
      FROM events
      GROUP BY event_type, user_id // 32)
    SELECT event_type,
           CAST(SUM(bit_count(bm)) AS BIGINT) AS n_users
    FROM chunks
    GROUP BY event_type
    """,
    notes="exact distinct via mergeable bitmaps (the roaring-bitmap "
    "idea in 64-bit chunks): OR per (key, id-chunk), then popcount-sum. "
    "Unlike count_distinct the partial state is a fixed-width bitmap "
    "per chunk — mergeable across days/partitions like an HLL sketch "
    "but EXACT, the right tool when the id domain is dense. Verified "
    "equal to count_distinct by the oracle",
)
def agg_bitmap_distinct(spark, sf_dir):
    """Distinct users per event type without shipping raw ids twice:
    map-side bit_or compresses each 64-id chunk to one long, the final
    merge ORs longs and popcounts. State size is domain/64 longs per
    key — independent of row count, mergeable for incremental rollups
    (bit_or is algebraic like sum). 32-bit chunks keep the set bit off
    the sign position (DuckDB range-checks 1<<63 on BIGINT)."""
    ev = table(spark, sf_dir, "events")
    chunks = ev.groupBy(
        "event_type", (F.col("user_id") / 32).cast("long").alias("chunk")
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(user_id % 32 AS INT))")).alias("bm")
    )
    return chunks.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("n_users")
    )


@register(
    "agg_distinct_multi",
    section="2.4",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    notes="multiple DISTINCT aggregates over different columns in one "
    "groupBy — Catalyst compiles this to a single Expand (one row per "
    "distinct-column set) + two-level aggregate rather than per-distinct "
    "self-joins; one logical pass over the fact",
)
def agg_distinct_multi(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_cust"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_prio"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_moments",
    section="2.4",
    oracle="""
    WITH m AS (SELECT event_type, AVG(value) AS mu, STDDEV_POP(value) AS sd
               FROM events GROUP BY event_type)
    SELECT e.event_type,
           ROUND(AVG(POW((e.value - m.mu) / m.sd, 3)), 4) AS skew,
           ROUND(AVG(POW((e.value - m.mu) / m.sd, 4)) - 3, 4) AS kurt
    FROM events e JOIN m USING (event_type)
    GROUP BY e.event_type
    """,
    notes="3rd/4th standardized moments per group: Spark's skewness/"
    "kurtosis are the POPULATION definitions (g1, excess g2), which the "
    "oracle reconstructs from raw central moments (DuckDB's named "
    "functions use sample-corrected formulas — verified equal to 4dp "
    "this way, not via skewness()/kurtosis()); single partial-agg pass "
    "on the Spark side",
)
def agg_moments(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.skewness("value"), 4).alias("skew"),
        F.round(F.kurtosis("value"), 4).alias("kurt"),
    )


@register(
    "agg_concentration",
    section="2.4",
    oracle="""
    WITH p AS (SELECT quantile_cont(o_totalprice, 0.9) AS p90 FROM orders),
    s AS (SELECT
            CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS total_cents,
            CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                 FILTER (WHERE o_totalprice >= p90) AS BIGINT) AS top_cents,
            CAST(COUNT(*) FILTER (WHERE o_totalprice >= p90) AS BIGINT)
              AS n_top
          FROM orders, p)
    SELECT total_cents, top_cents, n_top,
           FLOOR(CAST(top_cents AS DOUBLE) / total_cents * 1000000) / 1000000.0
             AS top_share
    FROM s
    """,
    notes="revenue concentration: share of total revenue held by orders at "
    "or above the 90th price percentile — exact interpolated percentile "
    "(Spark percentile == DuckDB quantile_cont) joined back as a scalar "
    "(broadcast 1-row cross join, the TPC-H Q22 idiom), cent-integerized "
    "exact sums, floor-disciplined ratio",
)
def agg_concentration(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    p = o.agg(F.percentile("o_totalprice", F.lit(0.9)).alias("p90"))
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    top = F.col("o_totalprice") >= F.col("p90")
    s = o.crossJoin(F.broadcast(p)).agg(
        F.sum(cents).cast("long").alias("total_cents"),
        F.sum(F.when(top, cents)).cast("long").alias("top_cents"),
        F.count(F.when(top, 1)).alias("n_top"),
    )
    return s.select(
        "total_cents",
        "top_cents",
        "n_top",
        (
            F.floor(
                F.col("top_cents").cast("double") / F.col("total_cents") * 1_000_000
            )
            / 1_000_000.0
        ).alias("top_share"),
    )


@register(
    "agg_weighted_median",
    section="2.4",
    oracle="""
    WITH g AS (SELECT l_returnflag,
                      CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
               FROM lineitem GROUP BY 1, 2),
    c AS (SELECT l_returnflag, cents, q,
                 SUM(q) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cq,
                 SUM(q) OVER (PARTITION BY l_returnflag) AS tq
          FROM g)
    SELECT l_returnflag,
           CAST(MIN(cents) AS BIGINT) AS wmedian_cents
    FROM c WHERE 2 * cq >= tq GROUP BY l_returnflag
    """,
    notes="weighted median (quantity-weighted price): collapse to "
    "(key, value) weight sums first — the shuffle carries distinct "
    "values, not rows — then a keyed cumulative-weight window and the "
    "smallest value whose cumweight crosses half. Exact integer cents "
    "and weights, so no float-boundary ambiguity; the general weighted- "
    "quantile shape importance-sampling pipelines need",
)
def agg_weighted_median(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.sum("q").cast("long").alias("q"))
    )
    wc = Window.partitionBy("l_returnflag").orderBy("cents")
    wt = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "cents",
        F.sum("q").over(wc).alias("cq"),
        F.sum("q").over(wt).alias("tq"),
    )
    return (
        c.where(2 * F.col("cq") >= F.col("tq"))
        .groupBy("l_returnflag")
        .agg(F.min("cents").cast("long").alias("wmedian_cents"))
    )


@register(
    "agg_percentile_disc",
    section="2.4",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50_disc,
           quantile_disc(value, 0.9) AS p90_disc
    FROM events GROUP BY event_type
    """,
    notes="DISCRETE percentiles (an actual data value, never an "
    "interpolation — what latency SLO reporting wants): Spark's "
    "percentile_disc ordered-set aggregate vs DuckDB quantile_disc, "
    "both 'smallest value with cume_dist >= q'. Complements "
    "agg_quantiles' interpolated pair; no float arithmetic at all, so "
    "no rounding discipline needed",
)
def agg_percentile_disc(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "p50_disc"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias(
            "p90_disc"
        ),
    )


@register(
    "agg_bool_logic",
    section="2.4",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'P') AS any_partial,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_filled
    FROM orders GROUP BY o_orderpriority
    """,
    notes="boolean aggregate surface: bool_and / bool_or / count_if — "
    "the data-quality-assertion trio (\"do ALL rows satisfy X, does ANY "
    "row violate Y\"); partial-agg combinable like any other aggregate",
)
def agg_bool_logic(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_partial"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_filled"),
    )


@register(
    "agg_grouping_id",
    section="2.4",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    notes="GROUPING() indicator columns disambiguate real NULL keys from "
    "subtotal rows in GROUPING SETS output — the OLAP-client contract "
    "for cube/rollup consumers; same Expand-based single pass",
)
def agg_grouping_id(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "profile_assertions",
    section="2.4",
    oracle="""
    SELECT * FROM (
      SELECT 'orders_pk_unique' AS check_name,
             CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey)
                   FROM orders) AS BIGINT) AS violations
      UNION ALL
      SELECT 'lineitem_fk_orders',
             CAST((SELECT COUNT(*) FROM lineitem l
                   WHERE NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_orderkey = l.l_orderkey))
                  AS BIGINT)
      UNION ALL
      SELECT 'orders_fk_customer',
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey))
                  AS BIGINT)
      UNION ALL
      SELECT 'lineitem_qty_positive',
             CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
                  AS BIGINT)
      UNION ALL
      SELECT 'events_ts_not_null',
             CAST((SELECT COUNT(*) FROM events WHERE ts IS NULL) AS BIGINT)
      UNION ALL
      SELECT 'events_type_in_domain',
             CAST((SELECT COUNT(*) FROM events
                   WHERE event_type NOT IN
                         ('click','view','purchase','signup','error'))
                  AS BIGINT)
    ) ORDER BY check_name
    """,
    notes="the dbt-test-style data-quality audit as ONE query: PK "
    "uniqueness, two FK integrity anti-joins, domain and null checks — "
    "each a count of VIOLATIONS (0 = pass), unioned into a single "
    "report. Anti-joins broadcast the smaller side; every check is one "
    "aggregate, so the whole audit is a handful of map-side-combined "
    "passes a scheduler can run nightly at 100 TB",
)
def profile_assertions(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    ev = table(spark, sf_dir, "events")

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("long").alias("violations"),
        )

    checks = [
        one(
            "orders_pk_unique",
            o.agg(
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v")
            ),
        ),
        one(
            "lineitem_fk_orders",
            li.join(
                o.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
        one(
            "orders_fk_customer",
            o.join(
                c.select("c_custkey"),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
        one(
            "lineitem_qty_positive",
            li.where(F.col("l_quantity") <= 0).agg(
                F.count(F.lit(1)).alias("v")
            ),
        ),
        one(
            "events_ts_not_null",
            ev.where(F.col("ts").isNull()).agg(F.count(F.lit(1)).alias("v")),
        ),
        one(
            "events_type_in_domain",
            ev.where(
                ~F.col("event_type").isin(
                    "click", "view", "purchase", "signup", "error"
                )
            ).agg(F.count(F.lit(1)).alias("v")),
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out.orderBy("check_name")


def _corr_sql(a: str, b: str) -> str:
    """Pearson corr from exact integer sums, identical expression tree
    on both engines: cov/var terms are single-division doubles."""
    # 1e6 (not 1000000.0): Spark SQL parses the latter as a DECIMAL
    # literal and the whole expression tree goes decimal, while DuckDB
    # stays double — 1e6 is a DOUBLE literal in both grammars
    return (
        f"FLOOR((sp_{a}{b} / n - (s_{a} / n) * (s_{b} / n)) / "
        f"(sqrt(ss_{a} / n - (s_{a} / n) * (s_{a} / n)) * "
        f"sqrt(ss_{b} / n - (s_{b} / n) * (s_{b} / n))) * 1e6) "
        f"/ 1e6"
    )


_CORR_PAIRS = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]


@register(
    "agg_corr_matrix",
    section="2.4",
    oracle=f"""
    WITH x AS (
      SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice) AS BIGINT) AS p,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS t
      FROM lineitem),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             {", ".join(f"CAST(SUM({v}) AS BIGINT) AS s_{v}, CAST(SUM({v} * {v}) AS BIGINT) AS ss_{v}" for v in "qpdt")},
             {", ".join(f"CAST(SUM({a} * {b}) AS BIGINT) AS sp_{a}{b}" for a, b in _CORR_PAIRS)}
      FROM x)
    {" UNION ALL ".join(f"SELECT '{a}_{b}' AS pair, {_corr_sql(a, b)} AS corr FROM s" for a, b in _CORR_PAIRS)}
    """,
    notes="full pairwise Pearson correlation matrix over the fact "
    "table's four numeric measures in ONE pass: all 15 sufficient "
    "statistics (count, 4 sums, 4 sum-of-squares, 6 cross-products) "
    "come from a single map-side-combined aggregate whose shuffle is "
    "ONE row, then the 6 correlations are row-local arithmetic — never "
    "6 passes, never a corr() call per pair. Inputs are integerized "
    "(dollars / percent units) so the distributed sums are BIGINT-exact "
    "and order-free; the corr formula is the identical single-division "
    "expression tree on both engines, floor-disciplined to 1e-6",
)
def agg_corr_matrix(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("long").alias("q"),
        F.round("l_extendedprice").cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for v in "qpdt":
        aggs.append(F.sum(v).cast("long").alias(f"s_{v}"))
        aggs.append(F.sum(F.col(v) * F.col(v)).cast("long").alias(f"ss_{v}"))
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(F.col(a) * F.col(b)).cast("long").alias(f"sp_{a}{b}"))
    s = li.agg(*aggs)
    pairs = ", ".join(f"'{a}_{b}', {_corr_sql(a, b)}" for a, b in _CORR_PAIRS)
    return s.selectExpr(f"stack({len(_CORR_PAIRS)}, {pairs}) AS (pair, corr)")


def _ols_sql() -> dict[str, str]:
    """Closed-form 2-feature OLS from the 9 exact integer moment sums,
    as one shared expression text so Spark and DuckDB evaluate the
    identical IEEE double tree. Solved on CENTERED covariances (2x2
    system + intercept recovery), not the raw 3x3 normal-equation
    determinant — the raw Cramer expansion cancels ~12 digits when the
    feature means are large (caught by the numpy lstsq cross-check in
    tests/test_round4_props.py); the centered form loses only the
    raw-to-centered magnitude ratio. Moments (already CAST AS DOUBLE):
    n, s1, s2, s11, s12, s22, sy, s1y, s2y."""
    c11 = "(n * s11 - s1 * s1)"
    c12 = "(n * s12 - s1 * s2)"
    c22 = "(n * s22 - s2 * s2)"
    c1y = "(n * s1y - s1 * sy)"
    c2y = "(n * s2y - s2 * sy)"
    det = f"({c11} * {c22} - {c12} * {c12})"
    b1 = f"(({c1y} * {c22} - {c2y} * {c12}) / {det})"
    b2 = f"(({c2y} * {c11} - {c1y} * {c12}) / {det})"
    b0 = f"((sy - {b1} * s1 - {b2} * s2) / n)"
    return {
        "b0": f"FLOOR({b0} * 1e6) / 1e6",
        "b1": f"FLOOR({b1} * 1e6) / 1e6",
        "b2": f"FLOOR({b2} * 1e6) / 1e6",
    }


@register(
    "agg_ols",
    section="2.4",
    oracle=f"""
    WITH x AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity) AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
             CAST(ROUND(l_extendedprice) AS BIGINT) AS y
      FROM lineitem),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x1) AS BIGINT) AS DOUBLE) AS s1,
             CAST(CAST(SUM(x2) AS BIGINT) AS DOUBLE) AS s2,
             CAST(CAST(SUM(x1 * x1) AS BIGINT) AS DOUBLE) AS s11,
             CAST(CAST(SUM(x1 * x2) AS BIGINT) AS DOUBLE) AS s12,
             CAST(CAST(SUM(x2 * x2) AS BIGINT) AS DOUBLE) AS s22,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x1 * y) AS BIGINT) AS DOUBLE) AS s1y,
             CAST(CAST(SUM(x2 * y) AS BIGINT) AS DOUBLE) AS s2y
      FROM x GROUP BY l_returnflag)
    SELECT l_returnflag,
           {_ols_sql()["b0"]} AS b0,
           {_ols_sql()["b1"]} AS b1,
           {_ols_sql()["b2"]} AS b2
    FROM m
    """,
    notes="distributed closed-form linear regression: per group, fit "
    "price ~ intercept + quantity + discount by solving the 3x3 normal "
    "equations with Cramer's rule from NINE moment sums — one "
    "map-side-combined aggregate whose shuffle is one 10-number row "
    "per group, then the solve is row-local arithmetic. No gradient "
    "loops, no driver-side matrix library, no per-group data movement: "
    "this is how GLM-sized models fit at 100 TB. Inputs integerized "
    "(dollars / percent), so the moments are BIGINT-exact and "
    "order-free; the determinant formulas are one shared expression "
    "text evaluated identically by both engines, floor-disciplined",
)
def agg_ols(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("long").cast("double").alias("s1"),
        F.sum("x2").cast("long").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").cast("double").alias("s22"),
        F.sum("y").cast("long").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").cast("double").alias("s2y"),
    )
    sql = _ols_sql()
    return m.selectExpr(
        "l_returnflag",
        f"{sql['b0']} AS b0",
        f"{sql['b1']} AS b1",
        f"{sql['b2']} AS b2",
    )


@register(
    "agg_anova",
    section="2.4",
    oracle="""
    WITH x AS (SELECT event_type AS grp,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS s,
                 CAST(SUM(v * v) AS BIGINT) AS ss
          FROM x GROUP BY grp),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts,
                 CAST(SUM(ss) AS BIGINT) AS tss,
                 CAST(COUNT(*) AS BIGINT) AS k,
                 list_reduce(list((s / n) * s ORDER BY grp),
                             (a, b) -> a + b) AS gm
          FROM g),
    d AS (SELECT gm - (ts / tn) * ts AS ss_between,
                 tss - gm AS ss_within,
                 k, tn
          FROM t)
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(tn AS BIGINT) AS n_rows,
           FLOOR(ss_between / 10000.0 * 1e2) / 1e2 AS ss_between,
           FLOOR(ss_within / 10000.0 * 1e2) / 1e2 AS ss_within,
           FLOOR((ss_between / (k - 1)) / (ss_within / (tn - k)) * 1e6) / 1e6
             AS f_stat
    FROM d
    """,
    notes="one-way ANOVA (between/within variance decomposition + "
    "F-statistic) across event types: the does-the-group-matter test "
    "behind every A/B readout and feature-importance screen. The whole "
    "decomposition comes from per-group (n, sum, sum-of-squares) — one "
    "map-side-combined aggregate over integer cents, one k-row fold — "
    "never a second pass for deviations-from-mean. Group means enter "
    "as (s/n)*s single-division doubles with an identical expression "
    "tree on both engines; SS values are rescaled from cents^2 to "
    "units^2 and floor-disciplined",
)
def agg_anova(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    # fold the k group rows in one tiny aggregate. The between-group
    # term sums k DOUBLES, and distributed SUM order is arbitrary — so
    # the terms are collected, sorted by group, and LEFT-FOLDED (the
    # emb_quantize_int8 discipline); DuckDB's list_reduce(ORDER BY grp)
    # is the same sequential fold
    term = (F.col("s") / F.col("n")) * F.col("s")
    d = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
        F.sum("ss").cast("long").alias("tss"),
        F.array_sort(F.collect_list(F.struct(F.col("grp"), term.alias("t"))))
        .alias("terms"),
    ).select(
        "k",
        "tn",
        "ts",
        "tss",
        F.aggregate(
            F.transform("terms", lambda x: x["t"]),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("gm"),
    )
    ss_between = F.col("gm") - (F.col("ts") / F.col("tn")) * F.col("ts")
    ss_within = F.col("tss") - F.col("gm")
    f_stat = (ss_between / (F.col("k") - 1)) / (ss_within / (F.col("tn") - F.col("k")))
    return d.select(
        F.col("k").alias("k_groups"),
        F.col("tn").alias("n_rows"),
        (F.floor(ss_between / 10000.0 * 1e2) / 1e2).alias("ss_between"),
        (F.floor(ss_within / 10000.0 * 1e2) / 1e2).alias("ss_within"),
        (F.floor(f_stat * 1e6) / 1e6).alias("f_stat"),
    )


@register(
    "profile_histogram_log2",
    section="2.4",
    oracle="""
    SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS lo,
           CAST(MAX(n_chars) AS BIGINT) AS hi
    FROM documents WHERE n_chars > 0 GROUP BY 1
    """,
    notes="log2 (power-of-two bucket) histogram of document lengths — "
    "the right profiling tool for heavy-tailed size distributions "
    "where profile_histogram's equi-width bins put everything in "
    "bucket 0. floor(log2(x)) is computed as length(bin(x)) - 1: a "
    "pure integer/string operation identical on both engines, with "
    "none of log2()'s boundary-rounding hazard at exact powers of "
    "two. Single map-side-combined aggregate; bucket count is "
    "~64 regardless of corpus size",
)
def profile_histogram_log2(spark, sf_dir):
    d = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    bucket = (F.length(F.bin(F.col("n_chars"))) - 1).cast("long")
    return d.groupBy(bucket.alias("log2_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("lo"),
        F.max("n_chars").cast("long").alias("hi"),
    )


@register(
    "agg_mannwhitney_auc",
    section="2.4",
    oracle="""
    WITH x AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE event_type IN ('click', 'view')
                 AND value IS NOT NULL),
    d AS (SELECT v,
                 CAST(COUNT(*) FILTER (g = 1) AS BIGINT) AS c1,
                 CAST(COUNT(*) AS BIGINT) AS c_all
          FROM x GROUP BY v),
    p AS (SELECT v, c1, c_all,
                 CAST(COALESCE(SUM(c_all) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS cb
          FROM d),
    s AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c_all - c1) AS BIGINT) AS n2,
                 CAST(SUM(c1 * (2 * cb + c_all + 1)) AS BIGINT) AS r1_x2
          FROM p)
    SELECT n1, n2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST((r1_x2 - n1 * (n1 + 1)) * 1000000 // (2 * n1 * n2)
                AS BIGINT) AS auc_ppm
    FROM s
    """,
    notes="Mann-Whitney U / rank-sum test between two groups' value "
    "distributions, with EXACT tie handling and zero floats: instead "
    "of ranking every row (a data-sized global sort), the statistic "
    "folds over DISTINCT values — 2*R1 = sum c1*(2*cum_below + c + 1) "
    "gives doubled average-ranks as exact integers. The one ordered "
    "window runs on the distinct-VALUE table (bounded by cent "
    "cardinality, orders of magnitude below row count; the "
    "bucketed_global_rank two-pass is the documented path if value "
    "cardinality ever goes data-sized). U1/(n1*n2) is exactly the "
    "AUC of 'value predicts group' — the ML evaluation metric, "
    "reported as exact integer ppm",
)
def agg_mannwhitney_auc(spark, sf_dir):
    from pyspark.sql import Window as W

    # NULL values are excluded on BOTH sides: a NULL distinct-value row
    # would sort NULLS FIRST on Spark but NULLS LAST on DuckDB, silently
    # shifting every cumulative count (same guard as agg_anova/agg_psi)
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
        & F.col("value").isNotNull()
    )
    x = ev.select(
        (F.col("event_type") == "click").cast("long").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    d = x.groupBy("v").agg(
        F.sum("g").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("c_all"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    p = d.select(
        "v",
        "c1",
        "c_all",
        F.coalesce(F.sum("c_all").over(w), F.lit(0)).cast("long").alias("cb"),
    )
    s = p.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c_all") - F.col("c1")).cast("long").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cb") + F.col("c_all") + 1))
        .cast("long")
        .alias("r1_x2"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        "n1",
        "n2",
        u1_x2.alias("u1_x2"),
        ((u1_x2 * 1000000) / (2 * F.col("n1") * F.col("n2")))
        .cast("long")
        .alias("auc_ppm"),
    )


@register(
    "agg_ks_test",
    section="2.4",
    oracle="""
    WITH x AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE event_type IN ('click', 'view')
                 AND value IS NOT NULL),
    d AS (SELECT v,
                 CAST(COUNT(*) FILTER (g = 1) AS BIGINT) AS c1,
                 CAST(COUNT(*) FILTER (g = 0) AS BIGINT) AS c2
          FROM x GROUP BY v),
    p AS (SELECT v,
                 CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
                 CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2
          FROM d),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
          FROM d)
    SELECT t.n1, t.n2,
           CAST(MAX(ABS(p.f1 * t.n2 - p.f2 * t.n1)) AS BIGINT) AS d_num,
           CAST(MAX(ABS(p.f1 * t.n2 - p.f2 * t.n1)) * 1000000
                // (t.n1 * t.n2) AS BIGINT) AS d_ppm
    FROM p CROSS JOIN t
    GROUP BY t.n1, t.n2
    """,
    notes="two-sample Kolmogorov-Smirnov statistic (max empirical-CDF "
    "gap) with ZERO floats: cumulative counts over distinct values "
    "cross-multiplied — |F1(v)-F2(v)| maximized as the exact integer "
    "|cum1*n2 - cum2*n1| and reported as integer ppm of n1*n2. The "
    "drift-detection statistic every feature-monitoring pipeline "
    "computes between yesterday's and today's distribution; same "
    "distinct-value prefix machinery as agg_mannwhitney_auc (ordered "
    "window on the value-cardinality table, two-pass bucketed path "
    "documented if values go data-sized)",
)
def agg_ks_test(spark, sf_dir):
    from pyspark.sql import Window as W

    # NULL guard: see agg_mannwhitney_auc (cross-engine NULL sort order)
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
        & F.col("value").isNotNull()
    )
    x = ev.select(
        (F.col("event_type") == "click").cast("long").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    d = x.groupBy("v").agg(
        F.sum("g").cast("long").alias("c1"),
        F.sum(1 - F.col("g")).cast("long").alias("c2"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    p = d.select(
        "v",
        F.sum("c1").over(w).cast("long").alias("f1"),
        F.sum("c2").over(w).cast("long").alias("f2"),
    )
    t = d.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    gap = F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
    return (
        p.crossJoin(F.broadcast(t))
        .groupBy("n1", "n2")
        .agg(F.max(gap).cast("long").alias("d_num"))
        .select(
            "n1",
            "n2",
            "d_num",
            ((F.col("d_num") * 1000000) / (F.col("n1") * F.col("n2")))
            .cast("long")
            .alias("d_ppm"),
        )
    )


@register(
    "agg_psi",
    section="2.4",
    oracle="""
    WITH x AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
                      CAST(length(bin(CAST(ROUND(value * 100) AS BIGINT) + 1))
                           AS BIGINT) - 1 AS bucket
               FROM events WHERE event_type IN ('click', 'view')
                 AND value IS NOT NULL),
    d AS (SELECT bucket,
                 CAST(COUNT(*) FILTER (g = 1) AS BIGINT) AS c1,
                 CAST(COUNT(*) FILTER (g = 0) AS BIGINT) AS c2
          FROM x GROUP BY bucket
          HAVING COUNT(*) FILTER (g = 1) > 0
             AND COUNT(*) FILTER (g = 0) > 0),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
                 list_reduce(
                   list((c1 / (SELECT SUM(c1) FROM d)
                         - c2 / (SELECT SUM(c2) FROM d))
                        * ln((c1 * (SELECT SUM(c2) FROM d))
                             / (c2 * (SELECT SUM(c1) FROM d)))
                        ORDER BY bucket),
                   (a, b) -> a + b) AS psi
          FROM d)
    SELECT n1, n2, FLOOR(psi * 1e6) / 1e6 AS psi
    FROM t
    """,
    notes="Population Stability Index between two groups' value "
    "distributions over power-of-two buckets (the credit-risk / "
    "feature-drift score): PSI = sum (p - q) ln(p/q). Buckets are "
    "exact integer log2 bins (length(bin(x+1))-1); p/q enter as "
    "single divisions of exact counts and the ln ratio is computed "
    "from the exact integer cross-product c1*n2 / (c2*n1); the "
    "per-bucket terms are LEFT-FOLDED in bucket order on both "
    "engines (the agg_anova discipline), so the only nondeterminism "
    "float sums could add is gone. Empty-on-either-side buckets are "
    "excluded (standard practice — ln blows up); one aggregate + a "
    "~60-element fold",
)
def agg_psi(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    bucket = (
        F.length(F.bin(F.round(F.col("value") * 100).cast("long") + 1)) - 1
    ).cast("long")
    x = ev.select(
        (F.col("event_type") == "click").cast("long").alias("g"),
        bucket.alias("bucket"),
    )
    d = (
        x.groupBy("bucket")
        .agg(
            F.sum("g").cast("long").alias("c1"),
            F.sum(1 - F.col("g")).cast("long").alias("c2"),
        )
        .where((F.col("c1") > 0) & (F.col("c2") > 0))
    )
    t = d.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.array_sort(F.collect_list(F.struct("bucket", "c1", "c2"))).alias(
            "terms"
        ),
    )
    term = lambda s: (
        s["c1"] / F.col("n1") - s["c2"] / F.col("n2")
    ) * F.log((s["c1"] * F.col("n2")) / (s["c2"] * F.col("n1")))
    psi = F.aggregate(
        F.col("terms"), F.lit(0.0), lambda a, s: a + term(s)
    )
    return t.select(
        "n1", "n2", (F.floor(psi * 1e6) / 1e6).alias("psi")
    )


@register(
    "agg_cramers_v",
    section="2.4",
    oracle="""
    WITH x AS (SELECT event_type AS et,
                      CAST(dayofweek(ts) AS BIGINT) AS dw
               FROM events),
    o AS (SELECT et, dw, CAST(COUNT(*) AS BIGINT) AS o FROM x GROUP BY 1, 2),
    r AS (SELECT et, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY et),
    c AS (SELECT dw, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY dw),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS t,
                 CAST(COUNT(DISTINCT et) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT dw) AS BIGINT) AS nc
          FROM o),
    cells AS (SELECT o.et, o.dw, o.o, r.r, c.c
              FROM o JOIN r USING (et) JOIN c USING (dw)),
    s AS (SELECT t.t, t.nr, t.nc,
                 list_reduce(
                   list(CAST((o * t.t - r * c) AS DOUBLE)
                        * CAST((o * t.t - r * c) AS DOUBLE)
                        / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)
                           * CAST(t.t AS DOUBLE))
                        ORDER BY et, dw),
                   (a, b) -> a + b) AS chi2
          FROM cells CROSS JOIN t
          GROUP BY t.t, t.nr, t.nc)
    SELECT t AS n_rows,
           FLOOR(chi2 * 1e4) / 1e4 AS chi2,
           FLOOR(sqrt(chi2 / (t * (least(nr, nc) - 1))) * 1e6) / 1e6
             AS cramers_v
    FROM s
    """,
    notes="chi-square independence + Cramer's V between event type and "
    "day-of-week (is behavior day-dependent?): every cell term is "
    "(o*t - r*c)^2 / (r*c*t) built from exact integer contingency "
    "marginals — the numerator is an exact integer BEFORE the one "
    "division — and the ~35 cell terms LEFT-FOLD in (row, col) order "
    "on both engines. One aggregate for the contingency table, "
    "marginals join back as vocabulary-sized broadcasts, V "
    "normalizes by sqrt (exact IEEE). The categorical-association "
    "screen for feature selection, engine-deterministic end to end. "
    "(Label caveat: Spark dayofweek is 1-7, DuckDB 0-6 — a constant "
    "shift, so cell identities, marginals, fold ORDER and the "
    "statistic are all unchanged; dw itself is deliberately not an "
    "output column)",
)
def agg_cramers_v(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    x = ev.select(
        F.col("event_type").alias("et"), F.dayofweek("ts").cast("long").alias("dw")
    )
    o = x.groupBy("et", "dw").agg(F.count(F.lit(1)).cast("long").alias("o"))
    r = o.groupBy("et").agg(F.sum("o").cast("long").alias("r"))
    c = o.groupBy("dw").agg(F.sum("o").cast("long").alias("c"))
    t = o.agg(
        F.sum("o").cast("long").alias("t"),
        F.count_distinct("et").cast("long").alias("nr"),
        F.count_distinct("dw").cast("long").alias("nc"),
    )
    cells = o.join(F.broadcast(r), "et").join(F.broadcast(c), "dw").crossJoin(
        F.broadcast(t)
    )
    term = lambda s: (
        (s["o"] * s["t"] - s["r"] * s["c"]).cast("double")
        * (s["o"] * s["t"] - s["r"] * s["c"]).cast("double")
        / (s["r"].cast("double") * s["c"].cast("double") * s["t"].cast("double"))
    )
    agg = cells.groupBy("t", "nr", "nc").agg(
        F.array_sort(
            F.collect_list(F.struct("et", "dw", "o", "r", "c", "t"))
        ).alias("terms")
    )
    chi2 = F.aggregate(F.col("terms"), F.lit(0.0), lambda a, s: a + term(s))
    v = F.sqrt(chi2 / (F.col("t") * (F.least("nr", "nc") - 1)))
    return agg.select(
        F.col("t").alias("n_rows"),
        (F.floor(chi2 * 1e4) / 1e4).alias("chi2"),
        (F.floor(v * 1e6) / 1e6).alias("cramers_v"),
    )


@register(
    "agg_gini",
    section="2.4",
    oracle="""
    WITH u AS (SELECT event_type,
                      user_id,
                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                        AS cents
               FROM events WHERE value IS NOT NULL
               GROUP BY event_type, user_id),
    r AS (SELECT event_type, cents,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY cents, user_id) AS BIGINT)
                   AS i
          FROM u),
    s AS (SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS t,
                 CAST(SUM(i * cents) AS BIGINT) AS wt
          FROM r GROUP BY event_type)
    SELECT event_type, n,
           FLOOR(CAST(2 * wt - (n + 1) * t AS DOUBLE)
                 / CAST(n * t AS DOUBLE) * 1e6) / 1e6 AS gini
    FROM s WHERE t > 0
    """,
    notes="per-group Gini coefficient of the per-user value "
    "distribution (how concentrated is each event type's spend?): "
    "the Lorenz-sum formulation G = (2*sum(i*x) - (n+1)*sum(x)) / "
    "(n*sum(x)) over ranks WITHIN each group — the rank window is "
    "KEYED (per event type), so no global sort exists; at a billion "
    "users per group the two-pass bucketed_global_rank substitutes "
    "for the window, same formula. Every sum is an exact integer "
    "(rank x cents), the single division is the only float. "
    "Complements agg_concentration's top-decile share with the full "
    "inequality index",
)
def agg_gini(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "cents"
        )
    )
    w = W.partitionBy("event_type").orderBy("cents", "user_id")
    r = u.select(
        "event_type", "cents", F.row_number().over(w).cast("long").alias("i")
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("wt"),
    )
    gini = (
        F.floor(
            (2 * F.col("wt") - (F.col("n") + 1) * F.col("t")).cast("double")
            / (F.col("n") * F.col("t")).cast("double")
            * 1e6
        )
        / 1e6
    )
    return s.where(F.col("t") > 0).select("event_type", "n", gini.alias("gini"))


@register(
    "agg_mutual_info",
    section="2.4",
    oracle="""
    WITH x AS (SELECT event_type AS et,
                      CAST(dayofweek(ts) AS BIGINT) - 
                        (SELECT MIN(CAST(dayofweek(ts) AS BIGINT)) FROM events)
                        AS dw
               FROM events),
    o AS (SELECT et, dw, CAST(COUNT(*) AS BIGINT) AS o FROM x GROUP BY 1, 2),
    r AS (SELECT et, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY et),
    c AS (SELECT dw, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY dw),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS t FROM o),
    cells AS (SELECT o.et, o.dw, o.o, r.r, c.c
              FROM o JOIN r USING (et) JOIN c USING (dw)),
    s AS (SELECT t.t,
                 list_reduce(
                   list((o / t.t) * ln(CAST(o * t.t AS DOUBLE)
                                       / CAST(r * c AS DOUBLE))
                        ORDER BY et, dw),
                   (a, b) -> a + b) AS mi
          FROM cells CROSS JOIN t GROUP BY t.t)
    SELECT t AS n_rows, FLOOR(mi * 1e6) / 1e6 AS mi_nats
    FROM s
    """,
    notes="mutual information I(event_type; day-of-week) in nats — the "
    "information-theoretic cousin of agg_cramers_v and the standard "
    "categorical feature-selection score: each cell contributes "
    "(o/t) ln(o*t / (r*c)) where o*t and r*c are EXACT integer "
    "products before the one division, and the ~35 terms left-fold in "
    "cell order on both engines. The day-of-week label is normalized "
    "to a 0-based offset via the min (Spark 1-7 vs DuckDB 0-6 — the "
    "shift cancels, making the key explicitly engine-neutral rather "
    "than accidentally so). Same contingency + vocabulary-broadcast "
    "plan as the chi-square screen",
)
def agg_mutual_info(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("et"),
        F.dayofweek("ts").cast("long").alias("dwr"),
    )
    mn = base.agg(F.min("dwr").alias("m"))
    x = base.crossJoin(F.broadcast(mn)).select(
        "et", (F.col("dwr") - F.col("m")).alias("dw")
    )
    o = x.groupBy("et", "dw").agg(F.count(F.lit(1)).cast("long").alias("o"))
    r = o.groupBy("et").agg(F.sum("o").cast("long").alias("r"))
    c = o.groupBy("dw").agg(F.sum("o").cast("long").alias("c"))
    t = o.agg(F.sum("o").cast("long").alias("t"))
    cells = (
        o.join(F.broadcast(r), "et")
        .join(F.broadcast(c), "dw")
        .crossJoin(F.broadcast(t))
    )
    term = lambda s: (s["o"] / s["t"]) * F.log(
        (s["o"] * s["t"]).cast("double") / (s["r"] * s["c"]).cast("double")
    )
    agg = cells.groupBy("t").agg(
        F.array_sort(
            F.collect_list(F.struct("et", "dw", "o", "r", "c", "t"))
        ).alias("terms")
    )
    mi = F.aggregate(F.col("terms"), F.lit(0.0), lambda a, s: a + term(s))
    return agg.select(
        F.col("t").alias("n_rows"), (F.floor(mi * 1e6) / 1e6).alias("mi_nats")
    )


@register(
    "agg_benford",
    section="2.4",
    oracle="""
    WITH x AS (SELECT substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), 1, 1) AS digit
               FROM orders WHERE o_totalprice > 0),
    d AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
    SELECT d.digit, d.n,
           CAST(d.n * 1000000 // t.total AS BIGINT) AS observed_ppm
    FROM d CROSS JOIN t
    """,
    notes="Benford first-digit distribution of order amounts (the "
    "classic fabricated-numbers screen in fraud/forensic analytics): "
    "the leading digit is extracted from the INTEGER-cents string — "
    "no log10, whose rounding at exact powers of ten differs between "
    "engines — and shares are exact integer ppm. One "
    "map-side-combined aggregate + a 1-row broadcast total; comparing "
    "observed_ppm to log10(1+1/d) is a reader-side one-liner",
)
def agg_benford(spark, sf_dir):
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    )
    d = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = d.agg(F.sum("n").cast("long").alias("total"))
    return d.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        ((F.col("n") * 1000000) / F.col("total")).cast("long").alias(
            "observed_ppm"
        ),
    )


@register(
    "agg_ttest_welch",
    section="2.4",
    oracle="""
    WITH x AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE event_type IN ('click', 'view')
                 AND value IS NOT NULL),
    s AS (SELECT CAST(COUNT(*) FILTER (g = 1) AS BIGINT) AS n1,
                 CAST(SUM(v) FILTER (g = 1) AS BIGINT) AS s1,
                 CAST(SUM(v * v) FILTER (g = 1) AS BIGINT) AS ss1,
                 CAST(COUNT(*) FILTER (g = 0) AS BIGINT) AS n2,
                 CAST(SUM(v) FILTER (g = 0) AS BIGINT) AS s2,
                 CAST(SUM(v * v) FILTER (g = 0) AS BIGINT) AS ss2
          FROM x),
    f AS (SELECT n1, n2,
                 (ss1 - (CAST(s1 AS DOUBLE) / n1) * s1) / (n1 - 1) / n1 AS q1,
                 (ss2 - (CAST(s2 AS DOUBLE) / n2) * s2) / (n2 - 1) / n2 AS q2,
                 CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md
          FROM s)
    SELECT n1, n2,
           FLOOR(md / sqrt(q1 + q2) * 1e6) / 1e6 AS t_stat,
           FLOOR((q1 + q2) * (q1 + q2)
                 / (q1 * q1 / (n1 - 1) + q2 * q2 / (n2 - 1)) * 1e3) / 1e3
             AS df_welch
    FROM f
    """,
    notes="Welch's unequal-variance t-test between two groups' value "
    "distributions, from SIX exact integer sums (n/sum/sum-of-squares "
    "per group) in ONE map-side-combined pass — the zero-shuffle "
    "moment discipline of agg_anova/agg_corr_matrix. Floats appear "
    "only in the final row-local formula, written with identical "
    "association on both engines so the doubles are bit-identical "
    "(sqrt and arithmetic are correctly-rounded IEEE); t and the "
    "Welch-Satterthwaite df are floor-disciplined. The variance terms "
    "cast the sum to DOUBLE before squaring: BIGINT s*s would "
    "overflow near 3e9 cents-sum, an SF-dependent trap",
)
def agg_ttest_welch(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    x = ev.select(
        (F.col("event_type") == "click").cast("long").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    is1 = F.col("g") == 1
    is0 = F.col("g") == 0
    s = x.agg(
        F.count(F.when(is1, 1)).cast("long").alias("n1"),
        F.sum(F.when(is1, F.col("v"))).cast("long").alias("s1"),
        F.sum(F.when(is1, F.col("v") * F.col("v"))).cast("long").alias("ss1"),
        F.count(F.when(is0, 1)).cast("long").alias("n2"),
        F.sum(F.when(is0, F.col("v"))).cast("long").alias("s2"),
        F.sum(F.when(is0, F.col("v") * F.col("v"))).cast("long").alias("ss2"),
    )
    q1 = (
        (F.col("ss1") - (F.col("s1").cast("double") / F.col("n1")) * F.col("s1"))
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    q2 = (
        (F.col("ss2") - (F.col("s2").cast("double") / F.col("n2")) * F.col("s2"))
        / (F.col("n2") - 1)
        / F.col("n2")
    )
    md = F.col("s1").cast("double") / F.col("n1") - F.col("s2").cast(
        "double"
    ) / F.col("n2")
    f = s.select("n1", "n2", q1.alias("q1"), q2.alias("q2"), md.alias("md"))
    return f.select(
        "n1",
        "n2",
        (F.floor(F.col("md") / F.sqrt(F.col("q1") + F.col("q2")) * 1e6) / 1e6).alias(
            "t_stat"
        ),
        (
            F.floor(
                (F.col("q1") + F.col("q2"))
                * (F.col("q1") + F.col("q2"))
                / (
                    F.col("q1") * F.col("q1") / (F.col("n1") - 1)
                    + F.col("q2") * F.col("q2") / (F.col("n2") - 1)
                )
                * 1e3
            )
            / 1e3
        ).alias("df_welch"),
    )


@register(
    "agg_cuped",
    section="2.4",
    oracle="""
    WITH u AS (SELECT user_id,
                      CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                               THEN CAST(FLOOR(value) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS pre,
                      CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                               THEN CAST(FLOOR(value) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS post
               FROM events WHERE value IS NOT NULL
               GROUP BY user_id),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pre) AS BIGINT) AS sx,
                 CAST(SUM(post) AS BIGINT) AS sy,
                 CAST(SUM(pre * pre) AS BIGINT) AS sxx,
                 CAST(SUM(pre * post) AS BIGINT) AS sxy
          FROM u),
    t AS (SELECT n, sx,
                 (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   AS theta
          FROM m),
    g AS (SELECT user_id % 2 AS grp,
                 CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(pre) AS BIGINT) AS sxg,
                 CAST(SUM(post) AS BIGINT) AS syg
          FROM u GROUP BY 1)
    SELECT g.grp, g.n_users,
           FLOOR(CAST(g.syg AS DOUBLE) / g.n_users * 1e6) / 1e6 AS post_mean,
           FLOOR((g.syg - t.theta
                  * (g.sxg - CAST(g.n_users AS DOUBLE)
                     * (CAST(t.sx AS DOUBLE) / t.n)))
                 / g.n_users * 1e6) / 1e6 AS cuped_mean,
           FLOOR(t.theta * 1e6) / 1e6 AS theta
    FROM g CROSS JOIN t
    """,
    notes="CUPED variance-reduced A/B metric (experimentation-platform "
    "staple): per-user pre-period spend is the covariate, "
    "theta = cov(pre, post)/var(pre) from FIVE exact integer moments "
    "over users, and each arm's adjusted mean subtracts "
    "theta * (pre - mean_pre). Two keyed aggregates + a 1-row "
    "broadcast — no per-user regression, no second scan. Moment "
    "cross-products cast to DOUBLE before multiplying (n*sxy "
    "overflows BIGINT by sf1); whole-dollar units keep the integer "
    "moments exact and order-free below that",
)
def agg_cuped(spark, sf_dir):
    cut = "2024-01-16"
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    unit = F.floor(F.col("value")).cast("long")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < F.lit(cut).cast("timestamp"), unit).otherwise(0))
        .cast("long")
        .alias("pre"),
        F.sum(
            F.when(F.col("ts") >= F.lit(cut).cast("timestamp"), unit).otherwise(0)
        )
        .cast("long")
        .alias("post"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pre").cast("long").alias("sx"),
        F.sum("post").cast("long").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).cast("long").alias("sxx"),
        F.sum(F.col("pre") * F.col("post")).cast("long").alias("sxy"),
    )
    theta = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    t = m.select("n", "sx", theta.alias("theta"))
    g = u.groupBy((F.col("user_id") % 2).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("pre").cast("long").alias("sxg"),
        F.sum("post").cast("long").alias("syg"),
    )
    cuped = (
        F.col("syg")
        - F.col("theta")
        * (
            F.col("sxg")
            - F.col("n_users").cast("double")
            * (F.col("sx").cast("double") / F.col("n"))
        )
    ) / F.col("n_users")
    return g.crossJoin(F.broadcast(t)).select(
        "grp",
        "n_users",
        (
            F.floor(F.col("syg").cast("double") / F.col("n_users") * 1e6) / 1e6
        ).alias("post_mean"),
        (F.floor(cuped * 1e6) / 1e6).alias("cuped_mean"),
        (F.floor(F.col("theta") * 1e6) / 1e6).alias("theta"),
    )


@register(
    "agg_winsorized_mean",
    section="2.4",
    oracle="""
    WITH x AS (SELECT event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    q AS (SELECT event_type,
                 CAST(quantile_disc(v, 0.05) AS BIGINT) AS lo,
                 CAST(quantile_disc(v, 0.95) AS BIGINT) AS hi
          FROM x GROUP BY event_type)
    SELECT x.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(LEAST(GREATEST(x.v, q.lo), q.hi)) AS BIGINT)
             AS wsum_cents,
           CAST(SUM(LEAST(GREATEST(x.v, q.lo), q.hi)) * 100 // COUNT(*)
                AS BIGINT) AS wmean_centi
    FROM x JOIN q USING (event_type)
    GROUP BY x.event_type
    """,
    notes="winsorized mean (outlier-robust metric): per-group p05/p95 "
    "edges via the DISCRETE percentile (an actual data value — exact "
    "and engine-deterministic, unlike interpolation), values clamped "
    "to the edges, then an exact integer mean. Two passes over one "
    "scan lineage: a tiny per-group quantile aggregate broadcasts "
    "back onto the stream — never a sort of the data, never a "
    "re-scan at 100 TB (the quantile table is group-cardinality). "
    "Everything integer until the final reported centi-cents ratio",
)
def agg_winsorized_mean(spark, sf_dir):
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    q = x.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY v)")
        .cast("long")
        .alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)")
        .cast("long")
        .alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        x.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(clamped).cast("long").alias("wsum_cents"),
        )
        .select(
            "event_type",
            "n",
            "wsum_cents",
            F.expr("wsum_cents * 100 div n").cast("long").alias("wmean_centi"),
        )
    )


@register(
    "profile_expectations",
    section="2.4",
    oracle="""
    WITH k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                        AS viol
               FROM orders),
    r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) FILTER (
                   o_orderkey IS NULL) AS BIGINT) AS viol
          FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) FILTER (value IS NULL) AS BIGINT) AS viol
          FROM events),
    p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT) AS viol
          FROM orders),
    u AS (
      SELECT 'orders_pk_unique' AS check_name, n, viol FROM k
      UNION ALL
      SELECT 'lineitem_fk_orders', n, viol FROM r
      UNION ALL
      SELECT 'events_value_not_null', n, viol FROM v
      UNION ALL
      SELECT 'orders_price_positive', n, viol FROM p)
    SELECT check_name, n AS n_checked, viol AS n_violations,
           CAST(CASE WHEN viol = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
    FROM u
    """,
    notes="declarative data-quality EXPECTATIONS (the dbt-test / "
    "great-expectations shape): primary-key uniqueness, referential "
    "integrity (fact -> dim anti-join), not-null, and range checks, "
    "each reported as (checked, violations, passed) — the verdict "
    "table a lake onboarding gate publishes. Each check is one "
    "aggregate over its own scan (the FK check a broadcast left "
    "join); verdicts union into a bounded table. Exact counts, no "
    "sampling — at 100 TB these are the same map-side-combined "
    "aggregates as any groupBy, and the FK anti-join shuffles only "
    "if the dim outgrows broadcast",
)
def profile_expectations(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")
    pk = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("viol"),
    ).select(F.lit("orders_pk_unique").alias("check_name"), "n", "viol")
    fk = (
        li.join(
            o.select(F.col("o_orderkey").alias("k")),
            li.l_orderkey == F.col("k"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("viol"),
        )
        .select(F.lit("lineitem_fk_orders").alias("check_name"), "n", "viol")
    )
    nn = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("value").isNull(), 1)).cast("long").alias("viol"),
    ).select(F.lit("events_value_not_null").alias("check_name"), "n", "viol")
    rng = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
        .cast("long")
        .alias("viol"),
    ).select(F.lit("orders_price_positive").alias("check_name"), "n", "viol")
    u = pk.unionByName(fk).unionByName(nn).unionByName(rng)
    return u.select(
        "check_name",
        F.col("n").alias("n_checked"),
        F.col("viol").alias("n_violations"),
        F.when(F.col("viol") == 0, 1).otherwise(0).cast("long").alias("passed"),
    )


@register(
    "agg_hll_intersection",
    section="2.4",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value > 200
                      THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN event_type = 'click' AND value > 200
                      THEN 1 ELSE 0 END) AS in_b
      FROM events GROUP BY user_id)
    SELECT CAST(SUM(in_a) AS BIGINT) AS exact_a,
           CAST(SUM(in_b) AS BIGINT) AS exact_b,
           CAST(SUM(CASE WHEN in_a = 1 OR in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_union,
           CAST(SUM(in_a * in_b) AS BIGINT) AS exact_intersection,
           CAST(1 AS BIGINT) AS within_5pct_of_union
    FROM f
    """,
    notes="sketch-based SEGMENT OVERLAP (high-value purchasers x "
    "high-value clickers) via inclusion-exclusion over HLL sketches: "
    "|A^B| ~ est(A) + est(B) - est(A|B), where the union estimate "
    "comes from hll_union of the two sketches — the composition that "
    "lets 100 TB audience-overlap queries run on pre-aggregated "
    "per-segment sketches without re-touching raw data. Certified by "
    "DERIVED-PROPERTY oracle: the declared output carries the four "
    "EXACT counts (hash-checked) plus a flag that the sketch "
    "intersection landed within 5%% of the exact union — the "
    "inclusion-exclusion error scale (intersection error is bounded "
    "by union magnitude, the standard caveat). lgK=14 sketches",
)
def agg_hll_intersection(spark, sf_dir):
    """Inclusion-exclusion on mergeable sketches. One keyed pass builds
    per-user segment flags; the 1-row combine then computes exact
    counts (the oracle check) alongside the three sketch estimates.
    In production only the sketch columns survive (agg_sketch_merge
    shows the merge); the exact columns exist here because an exact
    oracle can, and so should, certify the pipeline end to end."""
    ev = table(spark, sf_dir, "events")
    in_a = (
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    ).cast("int")
    in_b = ((F.col("event_type") == "click") & (F.col("value") > 200)).cast(
        "int"
    )
    f = ev.groupBy("user_id").agg(
        F.max(in_a).alias("in_a"), F.max(in_b).alias("in_b")
    )
    g = f.agg(
        F.sum("in_a").cast("long").alias("exact_a"),
        F.sum("in_b").cast("long").alias("exact_b"),
        F.sum(
            ((F.col("in_a") == 1) | (F.col("in_b") == 1)).cast("int")
        )
        .cast("long")
        .alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b"))
        .cast("long")
        .alias("exact_intersection"),
        F.hll_sketch_agg(
            F.when(F.col("in_a") == 1, F.col("user_id")), 14
        ).alias("ska"),
        F.hll_sketch_agg(
            F.when(F.col("in_b") == 1, F.col("user_id")), 14
        ).alias("skb"),
    )
    est_a = F.hll_sketch_estimate(F.col("ska"))
    est_b = F.hll_sketch_estimate(F.col("skb"))
    est_u = F.hll_sketch_estimate(F.hll_union(F.col("ska"), F.col("skb")))
    est_int = est_a + est_b - est_u
    return g.select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersection",
        (
            F.abs(est_int - F.col("exact_intersection"))
            <= 0.05 * F.col("exact_union")
        )
        .cast("long")
        .alias("within_5pct_of_union"),
    )


_BS_REPS = 40
_BS_TWO_52 = 4503599627370496.0  # 2^52: 13 hex chars of md5 -> exact double
# Poisson(1) CDF P(X <= k), k = 0..7, accumulated in IEEE order so both
# engines compare the SAME literal doubles (repr round-trips exactly).
_BS_POIS_CDF = []
_bs_acc = 0.0
_bs_term = 0.36787944117144233  # e^-1
for _bs_k in range(8):
    _bs_acc += _bs_term
    _BS_POIS_CDF.append(_bs_acc)
    _bs_term /= _bs_k + 1
del _bs_acc, _bs_term, _bs_k

_BS_W_SQL = " + ".join(
    f"(CASE WHEN u > {c!r} THEN 1 ELSE 0 END)" for c in _BS_POIS_CDF
)


@register(
    "agg_bootstrap_poisson",
    section="2.4",
    oracle=f"""
    WITH x AS (SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    r AS (SELECT x.v, t.b,
                 (('0x' || substr(md5('bs:' || CAST(x.event_id AS VARCHAR)
                                   || ':' || CAST(t.b AS VARCHAR)), 1, 13))
                  ::BIGINT + 1.0) / {_BS_TWO_52!r} AS u
          FROM x CROSS JOIN range(0, {_BS_REPS}) t(b)),
    w AS (SELECT b, v, ({_BS_W_SQL}) AS w FROM r),
    m AS (SELECT b, CAST(SUM(w * v) AS DOUBLE) / SUM(w) AS mean_c
          FROM w GROUP BY b),
    o AS (SELECT mean_c, ROW_NUMBER() OVER (ORDER BY mean_c, b) AS rk FROM m),
    pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_c FROM x)
    SELECT pt.n, pt.mean_c / 100.0 AS mean_value,
           (SELECT mean_c FROM o WHERE rk = 1) / 100.0 AS ci_lo,
           (SELECT mean_c FROM o WHERE rk = {_BS_REPS - 1}) / 100.0 AS ci_hi
    FROM pt
    """,
    notes=f"95% bootstrap CI for the mean event value via the POISSON "
    f"bootstrap ({_BS_REPS} replicates): each row contributes a "
    "Poisson(1)-distributed weight per replicate instead of being "
    "resampled, so the whole procedure is one pass with per-partition "
    "partial sums — the published formulation for bootstrap on "
    "clusters, where true n-out-of-n resampling would shuffle the "
    "corpus B times. Weights are DERANDOMIZED via the content-"
    "addressed 52-bit md5 uniform (dp_histogram discipline) fed "
    "through the Poisson inverse CDF with literal thresholds shared "
    "by both engines, so every weight is bit-identical; values are "
    "cent-integers, replicate means are single divisions of exact "
    "BIGINT sums, and the CI bounds are percentile_disc-style rank "
    "picks (ranks 1 and 39 of 40) — no float tolerance anywhere",
)
def agg_bootstrap_poisson(spark, sf_dir):
    """The scalable bootstrap: B Poisson weights per row replace B
    resamples, so the shuffle carries only B partial (sum_wv, sum_w)
    pairs per partition no matter the corpus size. The 40-row
    replicate table then sorts driver-side-free through one bounded
    window. At 100 TB this is a single map-side-combined pass."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # fan_out: the B x md5-per-row weight evaluation dominates and the
    # fixture scans as one split (see core.fan_out)
    x = fan_out(
        ev.select(
            "event_id", F.round(F.col("value") * 100).cast("long").alias("v")
        )
    )
    r = x.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_BS_REPS - 1))).alias("b"),
        "event_id",
    )
    h = F.md5(
        F.concat(
            F.lit("bs:"),
            F.col("event_id").cast("string"),
            F.lit(":"),
            F.col("b").cast("string"),
        )
    )
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0) / F.lit(
        _BS_TWO_52
    )
    w_expr = None
    for c in _BS_POIS_CDF:
        term = F.when(u > F.lit(c), 1).otherwise(0)
        w_expr = term if w_expr is None else w_expr + term
    m = (
        r.withColumn("w", w_expr)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("v")).cast("double") / F.sum("w")
            ).alias("mean_c")
        )
    )
    rk = F.row_number().over(Window.orderBy("mean_c", "b"))
    ci = m.withColumn("rk", rk).agg(
        F.min(F.when(F.col("rk") == 1, F.col("mean_c"))).alias("lo_c"),
        F.min(
            F.when(F.col("rk") == _BS_REPS - 1, F.col("mean_c"))
        ).alias("hi_c"),
    )
    pt = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_c"),
    )
    return pt.crossJoin(F.broadcast(ci)).select(
        "n",
        (F.col("mean_c") / 100.0).alias("mean_value"),
        (F.col("lo_c") / 100.0).alias("ci_lo"),
        (F.col("hi_c") / 100.0).alias("ci_hi"),
    )


@register(
    "agg_chisq_independence",
    section="2.4",
    oracle="""
    WITH cells AS (
      SELECT event_type, isodow(ts) - 1 AS dow,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS r
           FROM cells GROUP BY event_type),
    ct AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY dow),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
                   CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc
            FROM cells),
    contrib AS (
      SELECT cells.event_type, cells.dow,
             (CAST(cells.n AS DOUBLE) * big_n - CAST(rt.r AS DOUBLE) * ct.c)
           * (CAST(cells.n AS DOUBLE) * big_n - CAST(rt.r AS DOUBLE) * ct.c)
           / (CAST(rt.r AS DOUBLE) * ct.c) / big_n AS x
      FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
      CROSS JOIN tot),
    folded AS (
      SELECT list_reduce(list(x ORDER BY event_type, dow),
                         (a, b) -> a + b) AS chi2
      FROM contrib)
    SELECT big_n AS n, (nr - 1) * (nc - 1) AS dof, chi2
    FROM folded CROSS JOIN tot
    """,
    notes="chi-square test of independence on the event_type x ISO-"
    "weekday contingency table. Every cell contribution is "
    "(n*N - r*c)^2 / (r*c) / N with the products formed as exact "
    "integer-valued doubles (< 2^53) in identical association, and the "
    "cross-cell SUM — the one float-order hazard — is a LEFT FOLD over "
    "the cells in (type, dow) order on both engines (list ORDER BY + "
    "list_reduce vs array_sort + aggregate; a 0.0 seed is exact), so "
    "chi2 is bit-identical with no rounding. dow is isodow-1 / "
    "weekday() — the one cross-engine weekday convention that agrees",
)
def agg_chisq_independence(spark, sf_dir):
    """Independence testing at scale: the contingency table is one
    map-side-combined groupBy (cells are bounded: types x 7), margins
    are broadcast back, and the fold runs over the bounded cell array
    — corpus size only touches the first aggregate. The deterministic
    fold replaces SUM(double) so replays and engine ports are
    bit-stable."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.weekday("ts").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    rt = cells.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("r")
    )
    ct = cells.groupBy("dow").agg(F.sum("n").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("n").cast("long").alias("big_n"),
        F.countDistinct("event_type").cast("long").alias("nr"),
        F.countDistinct("dow").cast("long").alias("nc"),
    )
    num = F.col("n").cast("double") * F.col("big_n") - F.col("r").cast(
        "double"
    ) * F.col("c")
    contrib = (
        cells.join(rt, "event_type")
        .join(ct, "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            "big_n",
            "nr",
            "nc",
            (
                num * num / (F.col("r").cast("double") * F.col("c"))
                / F.col("big_n")
            ).alias("x"),
        )
    )
    folded = contrib.groupBy("big_n", "nr", "nc").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("event_type", "dow", "x"))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("chi2")
    )
    return folded.select(
        F.col("big_n").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        "chi2",
    )


_DID_CUT = "2024-01-16"


@register(
    "evt_did",
    section="2.4",
    oracle=f"""
    WITH x AS (
      SELECT user_id % 2 = 0 AS treated,
             ts >= TIMESTAMP '{_DID_CUT}' AS post,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    g AS (SELECT treated, post, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS s
          FROM x GROUP BY 1, 2),
    m AS (SELECT
            MAX(CASE WHEN treated AND post THEN CAST(s AS DOUBLE) / n END)
              AS m11,
            MAX(CASE WHEN treated AND NOT post THEN CAST(s AS DOUBLE) / n
                END) AS m10,
            MAX(CASE WHEN NOT treated AND post THEN CAST(s AS DOUBLE) / n
                END) AS m01,
            MAX(CASE WHEN NOT treated AND NOT post
                THEN CAST(s AS DOUBLE) / n END) AS m00,
            CAST(SUM(n) AS BIGINT) AS n_total
          FROM g)
    SELECT n_total, m11 / 100.0 AS treat_post, m10 / 100.0 AS treat_pre,
           m01 / 100.0 AS ctrl_post, m00 / 100.0 AS ctrl_pre,
           ((m11 - m10) - (m01 - m00)) / 100.0 AS did
    FROM m
    """,
    notes="difference-in-differences estimate of the mid-month "
    "treatment effect on event value, with user parity as the "
    "(synthetic) treatment assignment. The 2x2 cell means are single "
    "divisions of exact BIGINT cent sums, and the DiD contrast "
    "(m11-m10)-(m01-m00) uses identical association on both engines — "
    "bit-exact with no rounding. The causal-analytics shape: ONE "
    "map-side-combined pass builds all four cohort cells",
)
def evt_did(spark, sf_dir):
    """The four cohort cells reduce in one pass (partial aggregation
    carries 4 partial sums per partition); everything after is 4-row
    arithmetic. At 100 TB this is exactly a word-count."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.col("ts") >= F.lit(_DID_CUT).cast("timestamp")).alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    g = x.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    m = g.agg(
        F.max(F.when(F.col("treated") & F.col("post"), mean)).alias("m11"),
        F.max(F.when(F.col("treated") & ~F.col("post"), mean)).alias("m10"),
        F.max(F.when(~F.col("treated") & F.col("post"), mean)).alias("m01"),
        F.max(F.when(~F.col("treated") & ~F.col("post"), mean)).alias(
            "m00"
        ),
        F.sum("n").cast("long").alias("n_total"),
    )
    return m.select(
        "n_total",
        (F.col("m11") / 100.0).alias("treat_post"),
        (F.col("m10") / 100.0).alias("treat_pre"),
        (F.col("m01") / 100.0).alias("ctrl_post"),
        (F.col("m00") / 100.0).alias("ctrl_pre"),
        (
            ((F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00")))
            / 100.0
        ).alias("did"),
    )


@register(
    "agg_ratio_delta_ci",
    section="2.4",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS x,
             CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS y
      FROM events GROUP BY user_id),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM u),
    f AS (SELECT n, sx, sy, CAST(sx AS DOUBLE) / sy AS r,
                 sxx, syy, sxy FROM m),
    g AS (SELECT n, r,
                 SQRT((sxx - 2 * r * sxy + r * r * syy) * n / (n - 1)) / sy
                   AS se
          FROM f)
    SELECT n AS n_users,
           FLOOR(r * 1e6) / 1e6 AS ratio,
           FLOOR(se * 1e6) / 1e6 AS se,
           FLOOR((r - 1.96 * se) * 1e6) / 1e6 AS ci_lo,
           FLOOR((r + 1.96 * se) * 1e6) / 1e6 AS ci_hi
    FROM g
    """,
    notes="delta-method 95% CI for the ratio-of-sums metric clicks/"
    "views — THE estimator for per-user ratio metrics where the unit "
    "of randomization (user) differs from the unit of analysis "
    "(event), so naive binomial CIs are wrong. se^2 = (n/(n-1)) * "
    "sum((x_i - R*y_i)^2) / (sum y)^2 expands to six exact BIGINT "
    "moments in ONE map-side-combined pass; floats only in the final "
    "row-local formula with identical association on both engines; "
    "floor-disciplined at 1e-6",
)
def agg_ratio_delta_ci(spark, sf_dir):
    """The linearization trick makes the CI a word-count: per-user
    conditional counts, then one 6-moment global reduce. No
    resampling, no second pass — the form that costs nothing at
    100 TB (contrast agg_bootstrap_poisson, the resampling answer
    when no closed form exists)."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("long")
        .alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    r = F.col("sx").cast("double") / F.col("sy")
    f = m.select("n", "sx", "sy", r.alias("r"), "sxx", "syy", "sxy")
    se = (
        F.sqrt(
            (
                F.col("sxx")
                - 2 * F.col("r") * F.col("sxy")
                + F.col("r") * F.col("r") * F.col("syy")
            )
            * F.col("n")
            / (F.col("n") - 1)
        )
        / F.col("sy")
    )
    g = f.select("n", "r", se.alias("se"))
    return g.select(
        F.col("n").alias("n_users"),
        (F.floor(F.col("r") * 1e6) / 1e6).alias("ratio"),
        (F.floor(F.col("se") * 1e6) / 1e6).alias("se"),
        (F.floor((F.col("r") - 1.96 * F.col("se")) * 1e6) / 1e6).alias(
            "ci_lo"
        ),
        (F.floor((F.col("r") + 1.96 * F.col("se")) * 1e6) / 1e6).alias(
            "ci_hi"
        ),
    )


@register(
    "agg_runs_test",
    section="2.4",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    m AS (SELECT event_type,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(COUNT(*) AS BIGINT) AS nd
          FROM daily GROUP BY event_type),
    sg AS (SELECT daily.event_type, d,
                  CASE WHEN v * nd > sv THEN 1 ELSE 0 END AS up
           FROM daily JOIN m USING (event_type)),
    lagged AS (
      SELECT event_type, up,
             LAG(up) OVER (PARTITION BY event_type ORDER BY d) AS pup
      FROM sg),
    agg AS (
      SELECT event_type,
             CAST(1 + SUM(CASE WHEN pup IS NOT NULL AND up <> pup
                          THEN 1 ELSE 0 END) AS BIGINT) AS runs,
             CAST(SUM(up) AS BIGINT) AS n_up,
             CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_dn,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lagged GROUP BY event_type)
    SELECT event_type, n AS n_days, runs, n_up, n_dn,
           FLOOR((runs - (1.0 + 2.0 * n_up * n_dn / n))
                 / SQRT(2.0 * n_up * n_dn
                        * (2.0 * n_up * n_dn - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))) * 1e6)
             / 1e6 AS z
    FROM agg WHERE n_up > 0 AND n_dn > 0
    """,
    notes="Wald-Wolfowitz runs test per event type: is the daily "
    "above/below-mean sequence random, or does it streak? The "
    "above-mean flag uses the exact integer cross-multiply v*nd > sv "
    "(no float mean), runs count from one lag pass, and n_up/n_dn "
    "are exact — only the final z formula touches doubles, with "
    "identical association on both engines and floor discipline. "
    "Completes the trend-diagnosis trio with ts_mann_kendall "
    "(monotone trend) and ts_cusum (drift location)",
)
def agg_runs_test(spark, sf_dir):
    """Randomness testing as two grid-sized passes: corpus to daily
    grid once, one keyed lag window, one keyed aggregate. Degenerate
    all-up/all-down series are excluded on exact counts."""
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
    sg = daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "d",
        F.when(F.col("v") * F.col("nd") > F.col("sv"), 1)
        .otherwise(0)
        .alias("up"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = sg.select(
        "event_type", "up", F.lag("up").over(w).alias("pup")
    )
    agg = lagged.groupBy("event_type").agg(
        (
            1
            + F.sum(
                F.when(
                    F.col("pup").isNotNull()
                    & (F.col("up") != F.col("pup")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
        F.sum("up").cast("long").alias("n_up"),
        (F.count(F.lit(1)) - F.sum("up")).cast("long").alias("n_dn"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    nu, nd_, n = F.col("n_up"), F.col("n_dn"), F.col("n")
    mu = 1.0 + 2.0 * nu * nd_ / n
    sigma = F.sqrt(
        2.0
        * nu
        * nd_
        * (2.0 * nu * nd_ - n)
        / (n.cast("double") * n * (n - 1))
    )
    return agg.where((nu > 0) & (nd_ > 0)).select(
        "event_type",
        n.alias("n_days"),
        "runs",
        "n_up",
        "n_dn",
        (F.floor((F.col("runs") - mu) / sigma * 1e6) / 1e6).alias("z"),
    )


@register(
    "agg_powerlaw_fit",
    section="2.4",
    oracle="""
    WITH uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
                FROM events GROUP BY user_id),
    vc AS (SELECT c AS v, CAST(COUNT(*) AS BIGINT) AS n_v FROM uc
           GROUP BY c),
    tot AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n,
                   CAST(MIN(v) AS BIGINT) AS xmin FROM vc),
    folded AS (
      SELECT list_reduce(
               list_prepend(0.0,
                 list(n_v * ln(v * 2.0 / (2 * xmin - 1)) ORDER BY v)),
               (a, b) -> a + b) AS lnsum,
             ANY_VALUE(n) AS n, ANY_VALUE(xmin) AS xmin
      FROM vc CROSS JOIN tot)
    SELECT n AS n_users, xmin,
           ROUND(1.0 + n / lnsum, 4) AS alpha_hat
    FROM folded
    """,
    notes="discrete power-law (Pareto) MLE for the per-user activity "
    "distribution: alpha = 1 + n / sum ln(x_i/(xmin - 1/2)) (Clauset/"
    "Shalizi/Newman's discrete approximation). The ln-sum — the float "
    "hazard — is grouped BY DISTINCT COUNT VALUE first (n_v * ln(v) "
    "over the bounded value set), then folded in value order with a "
    "0.0 seed, so the result is order-pinned without ever collecting "
    "per-user terms; ln is libm-variant, hence ROUND 4 dp (the "
    "dp_histogram discipline). The heavy-tail sibling of "
    "text_zipf_fit, applied to behavioral counts",
)
def agg_powerlaw_fit(spark, sf_dir):
    """Tail-exponent estimation that scales: per-user counts reduce to
    the DISTINCT-VALUE histogram (bounded — activity counts are small
    integers), so the ln fold runs over at most max-activity terms no
    matter how many users exist. A per-user ln sum would be exact too
    but unfoldable at 1e9 users; the value-grouped form is the same
    number computed over the bounded support."""
    ev = table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    vc = uc.groupBy(F.col("c").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("n_v")
    )
    tot = vc.agg(
        F.sum("n_v").cast("long").alias("n"),
        F.min("v").cast("long").alias("xmin"),
    )
    terms = vc.crossJoin(F.broadcast(tot)).select(
        "n",
        "xmin",
        "v",
        (
            F.col("n_v")
            * F.log(F.col("v") * 2.0 / (2 * F.col("xmin") - 1))
        ).alias("term"),
    )
    folded = terms.groupBy("n", "xmin").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("v", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("lnsum")
    )
    return folded.select(
        F.col("n").alias("n_users"),
        "xmin",
        F.round(1.0 + F.col("n") / F.col("lnsum"), 4).alias("alpha_hat"),
    )


@register(
    "agg_kendall_tau",
    section="2.4",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(datediff('day', DATE '2024-01-01',
                                       CAST(ts AS DATE)) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    pr AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1
                           WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN -1
                           ELSE 0 END) AS BIGINT) AS s,
             CAST(COUNT(*) FILTER (b.x = a.x) AS BIGINT) AS nx0,
             CAST(COUNT(*) FILTER (b.y = a.y) AS BIGINT) AS ny0,
             CAST(COUNT(*) AS BIGINT) AS n0
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
      GROUP BY 1)
    SELECT event_type, n0 AS n_pairs, s AS s_stat,
           FLOOR(s / sqrt(CAST((n0 - nx0) * (n0 - ny0) AS DOUBLE)) * 1e6)
             / 1e6 AS tau_b
    FROM pr
    """,
    notes="Kendall tau-b rank correlation between two metrics of the "
    "same series — daily event volume vs daily revenue per event type "
    "— with exact tie handling: S = sum of sign(dx)*sign(dy) over day "
    "pairs and the tie-pair counts nx0/ny0 are all exact BIGINTs from "
    "ONE pair join; tau_b = S / sqrt((n0-nx0)(n0-ny0)) is a single "
    "correctly-rounded sqrt + divide on exact integers, so both "
    "engines produce the identical double (floored 6 dp for belt-and-"
    "braces). Completes the rank-association family next to "
    "agg_spearman (value-pair ranks) and ts_mann_kendall (trend vs "
    "time). The O(days^2) stage runs on the calendar-bounded daily "
    "grid, never the corpus",
)
def agg_kendall_tau(spark, sf_dir):
    """Corpus reduces to the daily grid in one keyed aggregate; the
    pair stage is grid-sized (days choose 2 per key, calendar-bounded)
    so at 100 TB only the first aggregate grows — the SCALING.md
    exact-vs-sketch routing rule with rows-per-group bounded by the
    calendar."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    dx = F.col("b.x") - F.col("a.x")
    dy = F.col("b.y") - F.col("a.y")
    prod = dx * dy
    pr = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(prod > 0, 1).when(prod < 0, -1).otherwise(0)
            )
            .cast("long")
            .alias("s"),
            F.sum((dx == 0).cast("long")).cast("long").alias("nx0"),
            F.sum((dy == 0).cast("long")).cast("long").alias("ny0"),
            F.count(F.lit(1)).cast("long").alias("n0"),
        )
    )
    den = F.sqrt(
        ((F.col("n0") - F.col("nx0")) * (F.col("n0") - F.col("ny0"))).cast(
            "double"
        )
    )
    return pr.select(
        "event_type",
        F.col("n0").alias("n_pairs"),
        F.col("s").alias("s_stat"),
        (F.floor(F.col("s") / den * 1e6) / 1e6).alias("tau_b"),
    )


@register(
    "agg_kruskal_wallis",
    section="2.4",
    oracle="""
    WITH x AS (SELECT event_type AS g,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    gv AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c_gv
           FROM x GROUP BY g, v),
    dv AS (SELECT v, CAST(SUM(c_gv) AS BIGINT) AS c_all
           FROM gv GROUP BY v),
    p AS (SELECT v, c_all,
                 CAST(2 * COALESCE(SUM(c_all) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) + c_all + 1 AS BIGINT) AS dr2
          FROM dv),
    r AS (SELECT gv.g, CAST(SUM(gv.c_gv) AS BIGINT) AS n_g,
                 CAST(SUM(gv.c_gv * p.dr2) AS BIGINT) AS r2_g
          FROM gv JOIN p ON gv.v = p.v GROUP BY gv.g),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n_g) AS BIGINT) AS n,
                 list_reduce(
                   list_prepend(0.0,
                     list((r2_g / (4 * n_g)) * r2_g ORDER BY g)),
                   (a, b) -> a + b) AS rsum
          FROM r),
    ties AS (SELECT list_reduce(
                      list_prepend(0.0,
                        list((CAST(c_all AS DOUBLE) * c_all * c_all)
                             - c_all ORDER BY v)),
                      (a, b) -> a + b) AS tsum
             FROM dv),
    h AS (SELECT k, n,
                 12.0 * rsum / (n * (n + 1)) - 3 * (n + 1) AS h_stat,
                 1.0 - tsum / ((CAST(n AS DOUBLE) * n * n) - n) AS tc
          FROM t CROSS JOIN ties)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_rows,
           FLOOR(h_stat * 1e6) / 1e6 AS h_stat,
           FLOOR(h_stat / tc * 1e6) / 1e6 AS h_corrected
    FROM h
    """,
    notes="Kruskal-Wallis H (k-group rank ANOVA) with exact tie "
    "handling and no data-sized sort: doubled average ranks come from "
    "the distinct-value prefix sums (the agg_mannwhitney_auc "
    "machinery, generalized from 2 groups to k), per-group doubled "
    "rank sums are exact BIGINTs, and the two float reductions — "
    "sum of R_g^2/n_g over groups and the tie term sum(c^3-c) over "
    "values — are ordered left-folds with 0.0 seeds (cubes go through "
    "DOUBLE before multiplying: c^3 overflows BIGINT by sf1, the "
    "agg_ttest_welch lesson). The nonparametric sibling of agg_anova "
    "on the identical grouping",
)
def agg_kruskal_wallis(spark, sf_dir):
    """One corpus-sized (group, value) aggregate, then everything runs
    on the distinct-value table (bounded by cent cardinality) and the
    k-row group table. The one ordered window is value-cardinality-
    sized; bucketed_global_rank is the documented path if values ever
    go data-sized."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    # gv is the ONE corpus-sized pass; it is bounded by (k x cent
    # cardinality) rows, so checkpoint it — dv, the rank prefix table
    # and the per-group rank sums all derive from it, and without the
    # pin each derivation would re-scan the corpus (3 scans observed)
    gv = (
        x.groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c_gv"))
        .localCheckpoint()
    )
    dv = gv.groupBy("v").agg(F.sum("c_gv").cast("long").alias("c_all"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    p = dv.select(
        "v",
        "c_all",
        (
            2 * F.coalesce(F.sum("c_all").over(w), F.lit(0))
            + F.col("c_all")
            + 1
        )
        .cast("long")
        .alias("dr2"),
    )
    r = (
        gv.join(F.broadcast(p.select("v", "dr2")), "v")
        .groupBy("g")
        .agg(
            F.sum("c_gv").cast("long").alias("n_g"),
            F.sum(F.col("c_gv") * F.col("dr2")).cast("long").alias("r2_g"),
        )
    )
    # ordered fold over the k group terms (float-sum order pinning)
    term = (F.col("r2_g") / (4 * F.col("n_g"))) * F.col("r2_g")
    t = r.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("g"), term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("rsum"),
    )
    # tie-term fold over distinct values; cubes in DOUBLE (BIGINT c^3
    # overflows by sf1)
    tie_term = (
        F.col("c_all").cast("double") * F.col("c_all") * F.col("c_all")
    ) - F.col("c_all")
    ties = dv.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("v"), tie_term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("tsum")
    )
    h = t.crossJoin(F.broadcast(ties)).select(
        "k",
        "n",
        (
            12.0 * F.col("rsum") / (F.col("n") * (F.col("n") + 1))
            - 3 * (F.col("n") + 1)
        ).alias("h_stat"),
        (
            1.0
            - F.col("tsum")
            / ((F.col("n").cast("double") * F.col("n") * F.col("n")) - F.col("n"))
        ).alias("tc"),
    )
    return h.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_rows"),
        (F.floor(F.col("h_stat") * 1e6) / 1e6).alias("h_stat"),
        (F.floor(F.col("h_stat") / F.col("tc") * 1e6) / 1e6).alias(
            "h_corrected"
        ),
    )


@register(
    "agg_mcnemar",
    section="2.4",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'purchase'
                            AND CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(MAX(CASE WHEN event_type = 'purchase'
                            AND CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(x * (1 - y)) AS BIGINT) AS b,
                 CAST(SUM((1 - x) * y) AS BIGINT) AS c,
                 CAST(SUM(x * y) AS BIGINT) AS n11
          FROM u)
    SELECT n_users, b, c, n11,
           CASE WHEN b + c = 0 THEN NULL
                ELSE FLOOR(((b - c) * (b - c)) / (b + c) * 1e6) / 1e6
           END AS chi2
    FROM t
    """,
    notes="McNemar's test for paired binary outcomes — did each user "
    "purchase in the first vs the second half of the observation "
    "window — the within-subject sibling of agg_ab_test (which "
    "compares independent groups). The discordant-pair counts b "
    "(converted then lapsed) and c (newly converted) are exact "
    "BIGINTs from one per-user conditional aggregate; the statistic "
    "(b-c)^2/(b+c) is a single division of exact integers, so both "
    "engines produce the identical double (floored 6 dp). Two "
    "map-side-combined aggregates, no window, no join — the plan is "
    "one keyed shuffle at any scale",
)
def agg_mcnemar(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("date")
    is_p = F.col("event_type") == "purchase"
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(is_p & (F.col("ts").cast("date") < split), 1).otherwise(0)
        )
        .cast("long")
        .alias("x"),
        F.max(
            F.when(is_p & (F.col("ts").cast("date") >= split), 1).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    t = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("x")) * F.col("y")).cast("long").alias("c"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("n11"),
    )
    diff = F.col("b") - F.col("c")
    return t.select(
        "n_users",
        "b",
        "c",
        "n11",
        F.when(F.col("b") + F.col("c") == 0, F.lit(None)).otherwise(
            F.floor((diff * diff) / (F.col("b") + F.col("c")) * 1e6) / 1e6
        ).alias("chi2"),
    )


@register(
    "agg_levene",
    section="2.4",
    oracle="""
    WITH x AS (SELECT event_type AS g,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL),
    gv AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
           FROM x GROUP BY g, v),
    ng AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM gv GROUP BY g),
    cum AS (SELECT g, v, c,
                   CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cm
            FROM gv),
    med AS (SELECT cum.g, CAST(MIN(cum.v) AS BIGINT) AS med
            FROM cum JOIN ng ON ng.g = cum.g
            WHERE cum.cm >= (ng.n + 1) // 2 GROUP BY cum.g),
    z AS (SELECT gv.g, ABS(gv.v - med.med) AS z, gv.c
          FROM gv JOIN med ON gv.g = med.g),
    grp AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(c * z) AS BIGINT) AS s,
                   CAST(SUM(c * z * z) AS BIGINT) AS ss
            FROM z GROUP BY g),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n) AS BIGINT) AS tn,
                 CAST(SUM(s) AS BIGINT) AS ts,
                 CAST(SUM(ss) AS BIGINT) AS tss,
                 list_reduce(list((s / n) * s ORDER BY g),
                             (a, b) -> a + b) AS gm
          FROM grp)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(tn AS BIGINT) AS n_rows,
           FLOOR(((tn - k) / (k - 1))
                 * ((gm - (ts / tn) * ts) / (tss - gm)) * 1e6) / 1e6
             AS w_stat
    FROM t
    """,
    notes="Levene's test (Brown-Forsythe variant: deviations from the "
    "group MEDIAN) for homogeneity of variance across event types — "
    "the assumption check behind agg_anova/agg_ttest_welch routing. "
    "Everything happens on the distinct-value table: the group median "
    "comes from cumulative counts (smallest v with cum >= (n+1) div 2 "
    "— never a data-sized sort), and the ANOVA-on-|v - med| moments "
    "are EXACT BIGINT sums weighted by the value counts, so the "
    "corpus is scanned exactly once. The k group-mean terms fold in "
    "group order (the agg_anova discipline); the final W is two "
    "divisions of exact sums, floored 6 dp",
)
def agg_levene(spark, sf_dir):
    """One corpus pass to (group, cent) counts; median, deviations and
    all moments derive from that bounded table, so the 100 TB cost is
    one map-side-combined aggregate + value-cardinality-sized work."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    gv = (
        x.groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    ng = gv.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    w = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = gv.select("g", "v", "c", F.sum("c").over(w).cast("long").alias("cm"))
    med = (
        cum.join(F.broadcast(ng), "g")
        .where(F.col("cm") >= F.expr("(n + 1) div 2"))
        .groupBy("g")
        .agg(F.min("v").cast("long").alias("med"))
    )
    z = gv.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("med")).alias("z"), "c"
    )
    grp = z.groupBy("g").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("z")).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("z") * F.col("z")).cast("long").alias("ss"),
    )
    term = (F.col("s") / F.col("n")) * F.col("s")
    t = grp.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
        F.sum("ss").cast("long").alias("tss"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("g"), term.alias("t")))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("gm"),
    )
    sb = F.col("gm") - (F.col("ts") / F.col("tn")) * F.col("ts")
    sw = F.col("tss") - F.col("gm")
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("tn").alias("n_rows"),
        (
            F.floor(
                ((F.col("tn") - F.col("k")) / (F.col("k") - 1))
                * (sb / sw)
                * 1e6
            )
            / 1e6
        ).alias("w_stat"),
    )


# alpha=0.05 two-sided and power=0.80 normal quantiles, embedded as
# the same repr() literals in BOTH engines (the bootstrap-CI pattern:
# neither engine has invnorm, and these are spec constants, not data)
_PW_ZA = 1.959963984540054
_PW_ZB = 0.8416212335729143


@register(
    "agg_power_analysis",
    section="2.4",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS in1,
             CAST(MAX(CASE WHEN event_type = 'purchase'
                            AND CAST(ROUND(value * 100) AS BIGINT) >= 5000
                            AND CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(MAX(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS in2,
             CAST(MAX(CASE WHEN event_type = 'purchase'
                            AND CAST(ROUND(value * 100) AS BIGINT) >= 5000
                            AND CAST(ts AS DATE) >= DATE '2024-01-16'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM events GROUP BY user_id),
    t AS (SELECT CAST(SUM(in1) AS BIGINT) AS n1,
                 CAST(SUM(c1) AS BIGINT) AS x1,
                 CAST(SUM(in2) AS BIGINT) AS n2,
                 CAST(SUM(c2) AS BIGINT) AS x2
          FROM u),
    p AS (SELECT n1, x1, n2, x2,
                 CAST(x1 AS DOUBLE) / n1 AS p1,
                 CAST(x2 AS DOUBLE) / n2 AS p2
          FROM t)
    SELECT n1, x1, n2, x2,
           FLOOR(p1 * 1e6) / 1e6 AS p1,
           FLOOR(p2 * 1e6) / 1e6 AS p2,
           CAST(CEIL(({_PW_ZA!r} + {_PW_ZB!r})
                     * ({_PW_ZA!r} + {_PW_ZB!r})
                     * (p1 * (1 - p1) + p2 * (1 - p2))
                     / ((p1 - p2) * (p1 - p2))) AS BIGINT)
             AS n_required_per_arm
    FROM p WHERE p1 <> p2
    """,
    notes="two-proportion power analysis: given the observed first-half "
    "vs second-half HIGH-VALUE-purchase conversion rates (>= 50 units — every user purchases SOMETHING in both halves in these fixtures, so plain conversion is degenerately 1.0), the per-arm sample size "
    "needed to detect that difference at alpha=0.05 (two-sided) with "
    "80% power — n = (z_a + z_b)^2 (p1 q1 + p2 q2) / (p1 - p2)^2. The "
    "normal quantiles are spec CONSTANTS embedded as identical repr "
    "literals in both engines (the agg_bootstrap_poisson discipline — "
    "neither engine has invnorm); p1/p2 are single divisions of exact "
    "user counts, the whole formula is one identical expression tree, "
    "and CEIL of the same double is the same BIGINT. The planning "
    "companion to agg_ab_test/agg_ttest_welch: one keyed aggregate + "
    "one 1-row reduce at any scale",
)
def agg_power_analysis(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("date")
    early = F.col("ts").cast("date") < split
    is_p = (F.col("event_type") == "purchase") & (
        F.round(F.col("value") * 100).cast("long") >= 5000
    )
    u = ev.groupBy("user_id").agg(
        F.max(early.cast("long")).cast("long").alias("in1"),
        F.max((is_p & early).cast("long")).cast("long").alias("c1"),
        F.max((~early).cast("long")).cast("long").alias("in2"),
        F.max((is_p & ~early).cast("long")).cast("long").alias("c2"),
    )
    t = u.agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("c1").cast("long").alias("x1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum("c2").cast("long").alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    z2 = (_PW_ZA + _PW_ZB) * (_PW_ZA + _PW_ZB)
    n_req = F.ceil(
        z2 * (p1 * (1 - p1) + p2 * (1 - p2)) / ((p1 - p2) * (p1 - p2))
    ).cast("long")
    return (
        t.select(
            "n1",
            "x1",
            "n2",
            "x2",
            (F.floor(p1 * 1e6) / 1e6).alias("p1"),
            (F.floor(p2 * 1e6) / 1e6).alias("p2"),
            n_req.alias("n_required_per_arm"),
            p1.alias("_p1raw"),
            p2.alias("_p2raw"),
        )
        .where(F.col("_p1raw") != F.col("_p2raw"))
        .drop("_p1raw", "_p2raw")
    )
