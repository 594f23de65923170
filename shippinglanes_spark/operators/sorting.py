"""SURVEY §2.6 — sort / limit / top-k / sample.

Scale notes: global ORDER BY + LIMIT k compiles to TakeOrderedAndProject —
per-partition top-k then a k-row merge on the driver, never a full sort
shuffle. Verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "sort_multi",
    section="2.6",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_multi(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


@register(
    "limit_topk",
    section="2.6",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def limit_topk(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@register(
    "sample_frac",
    section="2.6",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(100 AS BIGINT) AS target_pm,
           CAST(1 AS BIGINT) AS in_ci,
           CAST(0 AS BIGINT) AS alien_rows
    FROM lineitem
    """,
    notes="seeded Bernoulli sample, certified by DERIVED-PROPERTY oracle "
    "(sample rows themselves are engine-specific): the audit row "
    "reports the exact population count, that the sample size lands "
    "inside a 5-sigma binomial CI around fraction*N, and that an "
    "anti-join of sample vs population returns zero alien rows — all "
    "three exactly computable in DuckDB without replaying Spark's "
    "sampler. Fraction accuracy is additionally unit-tested",
)
def sample_frac(spark, sf_dir):
    """The sample itself: li.sample(fraction=0.1, seed=42). The declared
    output is the audit row — population count (exact), a binomial-CI
    membership flag for the sample size, and the alien-row count from an
    anti-join of the sample against its source (Bernoulli sampling must
    be a subset, never invent rows)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    s = li.sample(fraction=0.1, seed=42)
    tot = li.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    ns = s.agg(F.count(F.lit(1)).cast("long").alias("n_sample"))
    alien = s.join(
        li, ["l_orderkey", "l_linenumber", "l_extendedprice"], "left_anti"
    ).agg(F.count(F.lit(1)).cast("long").alias("alien_rows"))
    sigma5 = 5.0 * F.sqrt(F.col("n_total") * 0.1 * 0.9)
    return (
        tot.crossJoin(ns)
        .crossJoin(alien)
        .select(
            "n_total",
            F.lit(100).cast("long").alias("target_pm"),
            (
                F.abs(F.col("n_sample") - 0.1 * F.col("n_total")) <= sigma5
            )
            .cast("long")
            .alias("in_ci"),
            "alien_rows",
        )
    )


@register(
    "sample_stratified",
    section="2.6",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_stratum,
           CAST(CASE event_type
                WHEN 'click' THEN 500 WHEN 'view' THEN 100
                WHEN 'purchase' THEN 1000 WHEN 'signup' THEN 1000
                ELSE 0 END AS BIGINT) AS target_pm,
           CAST(1 AS BIGINT) AS in_ci
    FROM events GROUP BY event_type
    """,
    notes="per-stratum seeded sampling (df.sampleBy), certified by "
    "DERIVED-PROPERTY oracle (the sample_frac discipline): per stratum "
    "the audit row reports the exact population count, the target "
    "fraction in per-mille, and a 5-sigma binomial CI flag on the "
    "sampled size — deterministic strata (fraction 0 and 1) must hit "
    "their targets EXACTLY, which the CI bound degenerates to. "
    "Fraction accuracy additionally unit-tested",
)
def sample_stratified(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    fractions = {"click": 0.5, "view": 0.1, "purchase": 1.0, "signup": 1.0, "error": 0.0}
    s = ev.sampleBy("event_type", fractions, seed=42).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sample")
    )
    pop = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_stratum")
    )
    frac = F.when(F.col("event_type") == "click", 0.5).when(
        F.col("event_type") == "view", 0.1
    ).when(F.col("event_type").isin("purchase", "signup"), 1.0).otherwise(0.0)
    j = pop.join(s, "event_type", "left").select(
        "event_type",
        "n_stratum",
        F.coalesce("n_sample", F.lit(0)).alias("n_sample"),
        frac.alias("p"),
    )
    sigma5 = 5.0 * F.sqrt(F.col("n_stratum") * F.col("p") * (1.0 - F.col("p")))
    return j.select(
        "event_type",
        "n_stratum",
        (F.col("p") * 1000).cast("long").alias("target_pm"),
        (
            F.abs(F.col("n_sample") - F.col("p") * F.col("n_stratum")) <= sigma5
        )
        .cast("long")
        .alias("in_ci"),
    )


@register(
    "sample_per_key",
    section="2.6",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 5
    """,
    notes="deterministic fixed-size per-key sample (5 docs per source): "
    "rank by a salted md5 within each key. Unlike seeded Bernoulli "
    "sampling this is content-addressed — reproducible across engines "
    "AND stable under corpus growth — so it gets a full VALUE oracle "
    "where sample_frac/sample_stratified (engine-specific samplers) "
    "carry derived-property audit oracles instead",
)
def sample_per_key(spark, sf_dir):
    """Fixed-size uniform sample per key without rand(): order each
    key's rows by a salted hash and keep the first k. One keyed shuffle;
    the window never sees more than one key's rows per partition."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", F.row_number().over(w).cast("long").alias("rn"))
        .where(F.col("rn") <= 5)
    )


@register(
    "layout_zorder",
    section="2.6",
    oracle="""
    WITH d AS (
      SELECT o_orderkey,
             CAST(o_custkey % 256 AS BIGINT) AS xb,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) % 256 AS BIGINT) AS yb
      FROM orders)
    SELECT o_orderkey, xb, yb,
           CAST(((xb >> 0) & 1) * 1 + ((yb >> 0) & 1) * 2
              + ((xb >> 1) & 1) * 4 + ((yb >> 1) & 1) * 8
              + ((xb >> 2) & 1) * 16 + ((yb >> 2) & 1) * 32
              + ((xb >> 3) & 1) * 64 + ((yb >> 3) & 1) * 128
              + ((xb >> 4) & 1) * 256 + ((yb >> 4) & 1) * 512
              + ((xb >> 5) & 1) * 1024 + ((yb >> 5) & 1) * 2048
              + ((xb >> 6) & 1) * 4096 + ((yb >> 6) & 1) * 8192
              + ((xb >> 7) & 1) * 16384 + ((yb >> 7) & 1) * 32768
             AS BIGINT) AS zkey
    FROM d
    """,
    notes="Z-order (Morton) layout key: interleave the bits of two "
    "bucketized dimensions (customer bucket x order-date bucket) so a "
    "sort by zkey clusters BOTH dimensions at once — range-partitioning "
    "data written in this order gives parquet min/max skipping on either "
    "predicate, which single-column sorting cannot. Pure integer bit "
    "arithmetic, identical on both engines; row-local (no shuffle)",
)
def layout_zorder(spark, sf_dir):
    """The multi-dimensional clustering primitive behind Delta/Iceberg
    OPTIMIZE ZORDER: compute the interleaved-bit key per row. The
    declared query checks the key math; the clustering payoff (both
    dims' min/max spans shrink per range partition) is asserted in
    tests/test_plans.py."""
    o = table(spark, sf_dir, "orders")
    xb = (F.col("o_custkey") % 256).cast("long")
    yb = (
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        % 256
    ).cast("long")
    d = o.select("o_orderkey", xb.alias("xb"), yb.alias("yb"))
    z = F.lit(0).cast("long")
    for i in range(8):
        z = z + F.shiftright(F.col("xb"), i).bitwiseAND(F.lit(1)) * (1 << (2 * i))
        z = z + F.shiftright(F.col("yb"), i).bitwiseAND(F.lit(1)) * (1 << (2 * i + 1))
    return d.select("o_orderkey", "xb", "yb", z.cast("long").alias("zkey"))


@register(
    "sort_skyline",
    section="2.6",
    oracle="""
    WITH d AS (
      SELECT o_orderkey, o_totalprice AS price,
             CAST(o_orderdate AS DATE) AS od
      FROM orders),
    g AS (SELECT price, MAX(od) AS m2 FROM d GROUP BY price),
    p AS (SELECT price, m2,
                 MAX(m2) OVER (ORDER BY price DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS m1
          FROM g)
    SELECT d.o_orderkey, d.price, CAST(d.od AS VARCHAR) AS odate
    FROM d JOIN p ON d.price = p.price
    WHERE d.od = p.m2 AND (p.m1 IS NULL OR p.m2 > p.m1)
    """,
    notes="2D skyline (Pareto frontier) over (price max, recency max): a "
    "row survives iff no other row is >= in both dims and > in one. "
    "Spark side decomposes the prefix-max over descending price into "
    "price-band buckets (within-band keyed window + metadata-sized "
    "cross-band carry, the ts_concurrency pattern) — no single-partition "
    "window touches the data-sized table. Oracle is the plain global "
    "sweep; all comparisons on exact parquet doubles / integer days",
)
def sort_skyline(spark, sf_dir):
    """Multi-objective top set: orders not dominated on (totalprice,
    orderdate). Per-price max-date groups first (keyed shuffle), then
    the strictly-greater-price prefix max runs banded: a window inside
    each ~10k-wide price band plus a carry computed on the ~60-row
    band-max table. Frontier test is row-local after one broadcast-able
    join of the surviving price groups."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    )
    g = d.groupBy("price").agg(F.max("day").alias("m2"))
    g = g.withColumn("bucket", F.floor(F.col("price") / 10000).cast("long"))
    w_loc = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = g.withColumn("loc_max", F.max("m2").over(w_loc))
    w_carry = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        g.groupBy("bucket")
        .agg(F.max("m2").alias("bmax"))
        .withColumn("carry", F.max("bmax").over(w_carry))
        .select("bucket", "carry")
    )
    p = loc.join(F.broadcast(carry), "bucket").select(
        "price", "m2", F.greatest("loc_max", "carry").alias("m1")
    )
    return (
        d.join(p, "price")
        .where(
            (F.col("day") == F.col("m2"))
            & (F.col("m1").isNull() | (F.col("m2") > F.col("m1")))
        )
        .select(
            "o_orderkey",
            "price",
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("day"))
            .cast("string")
            .alias("odate"),
        )
    )


@register(
    "sort_paginate",
    section="2.6",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    notes="keyset-free pagination: ORDER BY ... LIMIT k OFFSET m — Spark "
    "plans offset+limit as a single TakeOrdered of the first m+k rows "
    "and drops the prefix, so page depth m is the real cost driver (the "
    "reason deep pagination should switch to keyset predicates at "
    "scale; noted, not hidden)",
)
def sort_paginate(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(40)
        .limit(20)
    )
