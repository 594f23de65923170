"""Round-10 pack (SURVEY §2.4/§2.8 extensions): the two-sample
Anderson-Darling test (the tail-weighted distribution-comparison member
next to agg_ks_test's sup-norm and agg_mannwhitney_auc's rank-sum),
variance inflation factors (the multicollinearity diagnostic over
per-order basket features), Deming regression (errors-in-variables /
total-least-squares line, showing the OLS attenuation the fixture's
noisy regressor produces), sample entropy (the Richman-Moorman
complexity measure over the zero-filled hourly series), MATTR
(moving-average type-token ratio — the windowed lexical-diversity
measure that, unlike raw TTR, doesn't shrink with document length),
ranking exposure fairness (per-group share of log-discounted exposure
in the top-K — the position-bias audit behind fair-ranking work), a
nested-path VARIANT surface (Spark 4 semi-structured type: object /
array-index / missing-path / strict-cast semantics), and listagg
WITHIN GROUP (the Spark 4 ordered string aggregate).

Cross-engine float discipline (FIXTURES.md):
- Anderson-Darling is computed on the POOLED ORDER with a fully
  deterministic tie-break (value, side, day), so both engines see the
  identical M_i sequence; each positional term is an exact-BIGINT
  integer division ((M_i*N - n*i)^2 * 1e9) div (i*(N-i)) — the 1e-9
  per-term quantization is documented and applied identically on both
  sides — and the only float op is the final S/(n*m*1e9), floored 6 dp.
- VIF and Deming carry ten exact BIGINT moments per region (sums of
  integer features and their products; prices integerized to cents per
  item, then floored to whole dollars per order via integer div). The
  centered combinations n*Sxx - Sx^2 exceed 2^53 by sf1, so they go
  through DOUBLE as a fixed expression tree (IEEE multiply/subtract of
  identical exact integers is correctly rounded, hence bit-identical
  cross-engine — the evt_burstiness pattern); one sqrt each, floored.
- Sample entropy's tolerance r = floor(0.2 * sigma) is derived from
  exact integer moments (one sqrt, one floor), making every template
  comparison |x_i - x_j| <= r integer-exact; A and B are exact BIGINT
  pair counts and the statistic is ONE float op: ln(B/A), floored.
- MATTR is all-integer end to end: window distinct counts are exact,
  the per-doc ratio is an integer div to ppm, and the bucket mean is
  an integer div of ppm sums.
- Exposure discounts floor(1e9/log2(k+1)) are PYTHON-computed literals
  embedded in both engines (the rank_ndcg discount-table trick), so no
  runtime log is ever compared cross-engine; shares are integer ppm.

Scale notes (100 TB): AD and sample entropy do one keyed fact rollup
(daily / hourly counts) and then work on CALENDAR-sized frames (60-row
pair partitions; a 720-hour spine self-join of 2.6M rows at ANY corpus
size). VIF/Deming are one per-order rollup plus a zero-shuffle moment
pass after broadcast dim joins, with a region-sized tail (BIGINT-exact
through ~sf10 per region; beyond that the documented path is two-pass
centered moments, which shrinks the squared magnitudes ~100x). MATTR
fans each document out to tokens x window-starts (bounded by doc
length x 20) and aggregates back on doc_id — one shuffle, corpus-
linear. Exposure is a global top-K (TakeOrderedAndProject — no full
sort materializes) followed by a 100-row tail. The VARIANT and listagg
queries are scan-shaped / dim-sized respectively (listagg payloads are
nations-per-region; a fact-scale listagg would need an explicit cap,
noted inline).
"""

from __future__ import annotations

import math

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..core import fan_out
from ..io import table
from ..registry import register

# Anderson-Darling: per-term quantization scale and the 5% critical
# point of the two-sample A^2 statistic (Pettitt 1976, table 1)
_AD_SCALE = 1_000_000_000
_AD_CRIT = "2.492"

# Sample entropy: template length m = 2 (matches use m and m+1), with
# tolerance r = floor(0.2 * population sigma) — the standard 0.2-sigma
# choice, floored to keep every comparison integer-exact. The analysis
# window is PINNED to the first 720 hours of the corpus calendar (a
# no-op at the committed fixtures, which span exactly 30 days): SampEn
# is all-pairs in HISTORY length by definition, so the window is what
# keeps the self-join calendar-CONSTANT at any corpus scale
_SE_RNUM = 0.2
_SE_HOURS = 720

# MATTR window length (docs are 10-99 tokens; windows shrink to the
# whole doc below 20 tokens, where MATTR degenerates to plain TTR)
_MATTR_W = 20

# Exposure: top-K depth and the python-computed integer discount table
# w_k = floor(1e9 / log2(k+1)) shared as literals by BOTH engines
_EXP_K = 100
_EXP_W = [math.floor(1e9 / math.log2(k + 1)) for k in range(1, _EXP_K + 1)]
_EXP_TOTAL = sum(_EXP_W)
_EXP_SQL = "[" + ", ".join(str(w) for w in _EXP_W) + "]"
_EXP_SPARK = "array(" + ", ".join(str(w) for w in _EXP_W) + ")"

# Shared oracle fragment: the zero-filled day x type count grid (same
# spine as rank_bradley_terry's), PINNED to a fixed 30-day analysis
# window from the corpus start. At the committed fixtures the calendar
# IS 30 days, so the window is a no-op; at any longer history it keeps
# the grid calendar-CONSTANT (the production monitoring semantics, and
# what keeps agg_anderson_darling's exact-integer terms inside BIGINT:
# the term bound needs pooled N <~ 400)
_AD_WINDOW_DAYS = 30
_DAY_GRID_SQL = f"""
    d0r AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    d0 AS (
      SELECT * FROM d0r
      WHERE day < (SELECT MIN(day) FROM d0r)
                  + INTERVAL {_AD_WINDOW_DAYS} DAY),
    spine AS (
      SELECT day, event_type
      FROM (SELECT DISTINCT day FROM d0)
      CROSS JOIN (SELECT DISTINCT event_type FROM d0)),
    d AS (
      SELECT s.day, s.event_type, COALESCE(d0.c, 0) AS c
      FROM spine s LEFT JOIN d0 USING (day, event_type))
"""

# Shared oracle fragment: per-order basket features — x = item count,
# y = total quantity (integral doubles, exact), z = total price in
# whole dollars (per-item cents are exact BIGINTs; the order total is
# floored to dollars by integer div so no half-dollar rounding rule is
# ever exercised)
_ORDER_FEAT_SQL = """
    f AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(l_quantity) AS BIGINT) AS y,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) // 100 AS z
      FROM lineitem GROUP BY 1),
    fr AS (
      SELECT r.r_name AS region, f.x, f.y, f.z
      FROM f
      JOIN orders o ON f.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey)
"""

# Shared oracle fragment: ten exact BIGINT moments per region + the
# three pairwise Pearson correlations — the SQL twin of _region_corrs
# (used by agg_vif here and agg_partial_correlation in stats12, ONE
# definition so the moment discipline can never diverge)
_RR_SQL = """
    m AS (
      SELECT region,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(z * z) AS BIGINT) AS szz,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * z) AS BIGINT) AS sxz,
             CAST(SUM(y * z) AS BIGINT) AS syz
      FROM fr GROUP BY 1),
    rr AS (
      SELECT region, n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)) AS rxy,
             (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * szz
                       - CAST(sz AS DOUBLE) * sz)) AS rxz,
             (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
             / sqrt((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                    * (CAST(n AS DOUBLE) * szz
                       - CAST(sz AS DOUBLE) * sz)) AS ryz
      FROM m)
"""


def _day_grid(spark, sf_dir):
    """The zero-filled (day, event_type, c) grid over the FIRST
    {_AD_WINDOW_DAYS} calendar days — the Spark side of _DAY_GRID_SQL.
    localCheckpoint'ed: every consumer reads it at least twice."""
    ev = table(spark, sf_dir, "events")
    d0r = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    b = d0r.agg(F.min("day").alias("dmin"))
    d0 = (
        d0r.crossJoin(F.broadcast(b))
        .where(F.col("day") < F.date_add("dmin", _AD_WINDOW_DAYS))
        .drop("dmin")
    )
    days = d0.select("day").distinct()
    types = d0.select("event_type").distinct()
    return (
        days.crossJoin(F.broadcast(types))
        .join(d0, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
        .localCheckpoint()
    )


def _order_features(spark, sf_dir):
    """Per-order (region, x=items, y=qty, z=dollars) — the Spark side
    of _ORDER_FEAT_SQL. Dim joins broadcast; one shuffle on orderkey."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    f = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum("l_quantity").cast("long").alias("y"),
        F.expr(
            "sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) div 100"
        ).alias("z"),
    )
    return (
        f.join(o, f.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), "x", "y", "z")
    )


@register(
    "agg_anderson_darling",
    section="2.4",
    oracle=f"""
    WITH {_DAY_GRID_SQL},
    t AS (SELECT DISTINCT event_type FROM d),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM t a JOIN t b ON a.event_type < b.event_type),
    u AS (
      SELECT p.ta, p.tb, CAST(0 AS BIGINT) AS grp, d.day, d.c
      FROM pairs p JOIN d ON d.event_type = p.ta
      UNION ALL
      SELECT p.ta, p.tb, CAST(1 AS BIGINT), d.day, d.c
      FROM pairs p JOIN d ON d.event_type = p.tb),
    w AS (
      SELECT ta, tb,
             CAST(ROW_NUMBER() OVER
                  (PARTITION BY ta, tb ORDER BY c, grp, day)
               AS BIGINT) AS i,
             CAST(SUM(1 - grp) OVER
                  (PARTITION BY ta, tb ORDER BY c, grp, day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS mi,
             CAST(COUNT(*) OVER (PARTITION BY ta, tb) AS BIGINT) AS nn,
             CAST(SUM(1 - grp) OVER (PARTITION BY ta, tb) AS BIGINT) AS na
      FROM u),
    s AS (
      SELECT ta, tb, MAX(nn) AS nn, MAX(na) AS na,
             SUM(CASE WHEN i < nn THEN
                 ((mi * nn - na * i) * (mi * nn - na * i)
                  * CAST({_AD_SCALE} AS BIGINT)) // (i * (nn - i))
                 ELSE 0 END) AS s
      FROM w GROUP BY 1, 2)
    SELECT ta AS type_a, tb AS type_b, na AS n_days,
           FLOOR(CAST(s AS DOUBLE)
                 / (na * (nn - na) * CAST({_AD_SCALE} AS BIGINT))
                 * 1e6) / 1e6 AS a2,
           CAST(s AS DOUBLE)
             / (na * (nn - na) * CAST({_AD_SCALE} AS BIGINT))
             > {_AD_CRIT} AS signif
    FROM s ORDER BY 1, 2
    """,
    notes=f"Two-sample Anderson-Darling A^2 between every pair of event "
    f"types' 30-day daily-count distributions (zero-filled calendar "
    f"grid, same spine as rank_bradley_terry): A^2 = (1/nm) * "
    f"sum_i (M_i*N - n*i)^2 / (i*(N-i)) over pooled positions, with "
    f"ties broken deterministically by (value, side, day) so both "
    f"engines walk the identical pooled order. Each positional term "
    f"is an exact integer division at 1e-9 granularity; the only "
    f"float op is the final normalization, floored 6 dp, and the 5% "
    f"verdict compares the raw double against Pettitt's literal "
    f"{_AD_CRIT}. The TAIL-WEIGHTED member of the two-sample family "
    f"(KS takes the sup, Mann-Whitney the rank sum; AD integrates "
    f"with 1/(F(1-F)) weight, so tail mass counts). The analysis "
    f"window is pinned to the corpus' first {_AD_WINDOW_DAYS} calendar "
    f"days (a no-op at the committed fixtures), so one daily rollup is "
    f"the only corpus work and pair partitions are 60 rows at ANY "
    f"scale — also what keeps the exact terms inside BIGINT (the "
    f"algebra needs pooled N <~ 400)",
)
def agg_anderson_darling(spark, sf_dir):
    d = _day_grid(spark, sf_dir)  # windowed grid, read twice (a/b sides)
    types = d.select("event_type").distinct()
    ta = types.select(F.col("event_type").alias("ta"))
    tb = types.select(F.col("event_type").alias("tb"))
    pairs = ta.join(tb, F.col("ta") < F.col("tb")).localCheckpoint()
    left = (
        F.broadcast(pairs)
        .join(d, d.event_type == F.col("ta"))
        .select("ta", "tb", F.lit(0).cast("long").alias("grp"), "day", "c")
    )
    right = (
        F.broadcast(pairs)
        .join(d, d.event_type == F.col("tb"))
        .select("ta", "tb", F.lit(1).cast("long").alias("grp"), "day", "c")
    )
    u = left.unionByName(right)
    wo = W.partitionBy("ta", "tb").orderBy("c", "grp", "day")
    wall = W.partitionBy("ta", "tb")
    w = u.select(
        "ta",
        "tb",
        F.row_number().over(wo).cast("long").alias("i"),
        F.sum(1 - F.col("grp"))
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("mi"),
        F.count(F.lit(1)).over(wall).cast("long").alias("nn"),
        F.sum(1 - F.col("grp")).over(wall).cast("long").alias("na"),
    )
    term = F.expr(
        f"((mi * nn - na * i) * (mi * nn - na * i)"
        f" * CAST({_AD_SCALE} AS BIGINT)) div (i * (nn - i))"
    )
    s = w.groupBy("ta", "tb").agg(
        F.max("nn").alias("nn"),
        F.max("na").alias("na"),
        F.sum(F.when(F.col("i") < F.col("nn"), term).otherwise(F.lit(0)))
        .cast("long")
        .alias("s"),
    )
    a2_raw = F.col("s").cast("double") / (
        F.col("na") * (F.col("nn") - F.col("na")) * F.lit(_AD_SCALE)
    )
    return s.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("na").alias("n_days"),
        (F.floor(a2_raw * 1e6) / 1e6).alias("a2"),
        (a2_raw > F.expr(_AD_CRIT)).alias("signif"),
    ).orderBy("type_a", "type_b")


def _region_corrs(fr):
    """(region, n, rxy, rxz, ryz) from ten exact BIGINT moments over the
    per-order basket features — the shared first stage of agg_vif and
    agg_partial_correlation (stats12), kept in ONE place so the moment
    discipline (and its documented two-pass scale path) can never
    diverge between the two. The SQL twin is _RR_SQL below."""
    m = fr.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("syz"),
    )

    def _corr(sa, sb, sab, saa, sbb):
        nd = F.col("n").cast("double")
        return (nd * F.col(sab) - F.col(sa).cast("double") * F.col(sb)) / (
            F.sqrt(
                (nd * F.col(saa) - F.col(sa).cast("double") * F.col(sa))
                * (nd * F.col(sbb) - F.col(sb).cast("double") * F.col(sb))
            )
        )

    return m.select(
        "region",
        "n",
        _corr("sx", "sy", "sxy", "sxx", "syy").alias("rxy"),
        _corr("sx", "sz", "sxz", "sxx", "szz").alias("rxz"),
        _corr("sy", "sz", "syz", "syy", "szz").alias("ryz"),
    )



@register(
    "agg_vif",
    section="2.4",
    oracle=f"""
    WITH {_ORDER_FEAT_SQL},
    {_RR_SQL},
    dd AS (
      SELECT region, n, rxy, rxz, ryz,
             1 + 2 * rxy * rxz * ryz
               - rxy * rxy - rxz * rxz - ryz * ryz AS det
      FROM rr)
    SELECT region, n AS n_orders,
           FLOOR(rxy * 1e6) / 1e6 AS r_items_qty,
           FLOOR(rxz * 1e6) / 1e6 AS r_items_price,
           FLOOR(ryz * 1e6) / 1e6 AS r_qty_price,
           FLOOR((1 - ryz * ryz) / det * 1e6) / 1e6 AS vif_items,
           FLOOR((1 - rxz * rxz) / det * 1e6) / 1e6 AS vif_qty,
           FLOOR((1 - rxy * rxy) / det * 1e6) / 1e6 AS vif_price
    FROM dd ORDER BY region
    """,
    notes="Variance inflation factors per region over per-order basket "
    "features (item count, total quantity, total whole-dollar price) — "
    "the multicollinearity diagnostic: VIF_j = (1 - r_kl^2)/det(R) from "
    "the closed-form 3x3 correlation-matrix inverse. Item count drives "
    "both totals (fixture r ~ 0.86/0.86/0.74), so VIFs sit well above "
    "the independence value 1 and differ per region at micro "
    "precision. Ten exact BIGINT moments per region (prices "
    "integerized to cents per item, floored to dollars per order); "
    "centered combinations go through DOUBLE as one fixed tree "
    "(exact through ~sf10 per region; the documented scale path "
    "beyond is two-pass centered moments). One per-order rollup + "
    "broadcast dim joins + a zero-shuffle moment pass; region-sized "
    "tail",
)
def agg_vif(spark, sf_dir):
    fr = _order_features(spark, sf_dir)
    rr = _region_corrs(fr)
    det = (
        1
        + 2 * F.col("rxy") * F.col("rxz") * F.col("ryz")
        - F.col("rxy") * F.col("rxy")
        - F.col("rxz") * F.col("rxz")
        - F.col("ryz") * F.col("ryz")
    )
    dd = rr.select("region", "n", "rxy", "rxz", "ryz", det.alias("det"))
    return dd.select(
        "region",
        F.col("n").alias("n_orders"),
        (F.floor(F.col("rxy") * 1e6) / 1e6).alias("r_items_qty"),
        (F.floor(F.col("rxz") * 1e6) / 1e6).alias("r_items_price"),
        (F.floor(F.col("ryz") * 1e6) / 1e6).alias("r_qty_price"),
        (
            F.floor(
                (1 - F.col("ryz") * F.col("ryz")) / F.col("det") * 1e6
            )
            / 1e6
        ).alias("vif_items"),
        (
            F.floor(
                (1 - F.col("rxz") * F.col("rxz")) / F.col("det") * 1e6
            )
            / 1e6
        ).alias("vif_qty"),
        (
            F.floor(
                (1 - F.col("rxy") * F.col("rxy")) / F.col("det") * 1e6
            )
            / 1e6
        ).alias("vif_price"),
    ).orderBy("region")


@register(
    "agg_deming",
    section="2.4",
    oracle=f"""
    WITH {_ORDER_FEAT_SQL},
    m AS (
      SELECT region,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM fr GROUP BY 1),
    v AS (
      SELECT region, n, sx, sy,
             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vxx,
             CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vyy,
             CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS vxy
      FROM m),
    fit AS (
      SELECT region, n, sx, sy, vxx, vyy, vxy,
             ((vyy - vxx) + sqrt((vyy - vxx) * (vyy - vxx)
                                 + 4 * vxy * vxy))
             / (2 * vxy) AS slope
      FROM v)
    SELECT region, n AS n_orders,
           FLOOR(vxy / vxx * 1e6) / 1e6 AS slope_ols,
           FLOOR(slope * 1e6) / 1e6 AS slope_deming,
           FLOOR((CAST(sy AS DOUBLE) - slope * sx) / n * 1e6) / 1e6
             AS intercept
    FROM fit ORDER BY region
    """,
    notes="Deming (errors-in-variables / total-least-squares, delta=1) "
    "regression of per-order total quantity on item count, per region, "
    "next to the OLS slope on the same moments: OLS attenuates toward "
    "zero when the regressor carries noise, so slope_deming >= "
    "slope_ols whenever the covariance is positive (it is, fixture "
    "r ~ 0.86) — the property test asserts the gap. Slope is the "
    "closed-form TLS eigenvector ((vyy-vxx) + sqrt((vyy-vxx)^2 + "
    "4*vxy^2)) / (2*vxy) over the same exact-BIGINT moment machinery "
    "as agg_vif (fixed DOUBLE tree, one sqrt, floored 6 dp). One "
    "per-order rollup + zero-shuffle moment pass; region-sized tail",
)
def agg_deming(spark, sf_dir):
    fr = _order_features(spark, sf_dir)
    m = fr.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    v = m.select(
        "region",
        "n",
        "sx",
        "sy",
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")).alias(
            "vxx"
        ),
        (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")).alias(
            "vyy"
        ),
        (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")).alias(
            "vxy"
        ),
    )
    slope = (
        (F.col("vyy") - F.col("vxx"))
        + F.sqrt(
            (F.col("vyy") - F.col("vxx")) * (F.col("vyy") - F.col("vxx"))
            + 4 * F.col("vxy") * F.col("vxy")
        )
    ) / (2 * F.col("vxy"))
    fit = v.select("region", "n", "sx", "sy", "vxx", "vxy", slope.alias("slope"))
    return fit.select(
        "region",
        F.col("n").alias("n_orders"),
        (F.floor(F.col("vxy") / F.col("vxx") * 1e6) / 1e6).alias("slope_ols"),
        (F.floor(F.col("slope") * 1e6) / 1e6).alias("slope_deming"),
        (
            F.floor(
                (F.col("sy").cast("double") - F.col("slope") * F.col("sx"))
                / F.col("n")
                * 1e6
            )
            / 1e6
        ).alias("intercept"),
    ).orderBy("region")


@register(
    "ts_sample_entropy",
    section="2.4",
    oracle=f"""
    WITH h0 AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT MIN(h) AS h0,
             LEAST(MAX(h), MIN(h) + INTERVAL {_SE_HOURS - 1} HOUR) AS h1
      FROM h0),
    spine AS (
      SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    t AS (SELECT DISTINCT event_type FROM h0),
    g AS (
      SELECT t.event_type, s.h, COALESCE(h0.c, 0) AS c
      FROM t CROSS JOIN spine s
      LEFT JOIN h0 ON h0.event_type = t.event_type AND h0.h = s.h),
    st AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM g GROUP BY 1),
    rt AS (
      SELECT event_type, n,
             CAST(FLOOR({_SE_RNUM} * sqrt(CAST(n * ss - s * s AS DOUBLE))
                        / n) AS BIGINT) AS r
      FROM st),
    idx AS (
      SELECT event_type, c,
             CAST(ROW_NUMBER() OVER
                  (PARTITION BY event_type ORDER BY h) AS BIGINT) AS t,
             LEAD(c, 1) OVER (PARTITION BY event_type ORDER BY h) AS c1,
             LEAD(c, 2) OVER (PARTITION BY event_type ORDER BY h) AS c2
      FROM g),
    p AS (
      SELECT a.event_type,
             SUM(CASE WHEN a.c1 IS NOT NULL AND b.c1 IS NOT NULL
                       AND GREATEST(ABS(a.c - b.c), ABS(a.c1 - b.c1))
                           <= rt.r
                 THEN 1 ELSE 0 END) AS b_pairs,
             SUM(CASE WHEN a.c2 IS NOT NULL AND b.c2 IS NOT NULL
                       AND GREATEST(ABS(a.c - b.c), ABS(a.c1 - b.c1),
                                    ABS(a.c2 - b.c2)) <= rt.r
                 THEN 1 ELSE 0 END) AS a_pairs
      FROM idx a
      JOIN idx b ON a.event_type = b.event_type AND b.t > a.t
      JOIN rt ON rt.event_type = a.event_type
      GROUP BY 1)
    SELECT p.event_type, rt.r,
           CAST(b_pairs AS BIGINT) AS b_pairs,
           CAST(a_pairs AS BIGINT) AS a_pairs,
           FLOOR(ln(CAST(b_pairs AS DOUBLE) / NULLIF(a_pairs, 0) ) * 1e6)
             / 1e6 AS sampen
    FROM p JOIN rt ON rt.event_type = p.event_type
    ORDER BY 1
    """,
    notes=f"Sample entropy (Richman-Moorman SampEn, m=2) of each event "
    f"type's zero-filled hourly count series: B counts template pairs "
    f"(i<j) whose length-2 windows stay within Chebyshev tolerance r, "
    f"A the same for length-3; SampEn = ln(B/A). Tolerance r = "
    f"floor({_SE_RNUM} * sigma) comes from exact integer moments "
    f"(one sqrt, one floor), so every comparison is integer-exact and "
    f"A/B are exact BIGINT counts — the ONLY float op in the "
    f"statistic is the single ln, floored 6 dp (null if A = 0; the "
    f"fixture keeps A >= ~1000 at every SF, probed before design). "
    f"The regularity/complexity member of the ts family (permutation "
    f"entropy ranks order patterns; SampEn measures amplitude-scale "
    f"self-similarity). SampEn is all-pairs in HISTORY length by "
    f"definition, so the analysis window is pinned to the corpus' "
    f"first {_SE_HOURS} hours (a no-op at the committed fixtures): "
    f"one hourly rollup is the only corpus work and the per-type "
    f"self-join stays ~260k pairs at ANY corpus scale",
)
def ts_sample_entropy(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # hourly rollup feeds bounds, types AND the zero-fill left join —
    # checkpoint it so the corpus is scanned once, not 3x, inside the
    # grid materialization (the ts_ljung_box lesson)
    h0 = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    bounds = h0.agg(
        F.min("h").alias("hmin"),
        F.expr(
            f"least(max(h), min(h) + interval {_SE_HOURS - 1} hour)"
        ).alias("hmax"),
    )
    spine = bounds.select(
        F.explode(
            F.expr("sequence(hmin, hmax, interval 1 hour)")
        ).alias("h")
    )
    types = h0.select("event_type").distinct()
    g = (
        types.crossJoin(spine)
        .join(F.broadcast(h0), ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("c", F.lit(0)).alias("c"))
        .localCheckpoint()  # calendar-sized grid, read twice below
    )
    st = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    rt = st.select(
        "event_type",
        F.floor(
            F.lit(_SE_RNUM)
            * F.sqrt(
                (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
                    "double"
                )
            )
            / F.col("n")
        )
        .cast("long")
        .alias("r"),
    )
    wh = W.partitionBy("event_type").orderBy("h")
    idx = g.select(
        "event_type",
        "c",
        F.row_number().over(wh).cast("long").alias("t"),
        F.lead("c", 1).over(wh).alias("c1"),
        F.lead("c", 2).over(wh).alias("c2"),
    )
    a = idx.alias("a")
    b = idx.select(
        F.col("event_type").alias("bet"),
        F.col("c").alias("bc"),
        F.col("t").alias("bt"),
        F.col("c1").alias("bc1"),
        F.col("c2").alias("bc2"),
    )
    # b is calendar-bounded (<= |types| * _SE_HOURS rows at ANY corpus
    # size) — broadcast it deliberately: the checkpointed grid carries
    # no size stats, so the estimate-driven BHJ stopped firing once g
    # became an RDD (observed BHJ->SMJ flip at the audit SF)
    j = (
        a.join(F.broadcast(b), (F.col("a.event_type") == F.col("bet")))
        .where(F.col("bt") > F.col("a.t"))
        .join(F.broadcast(rt), F.col("a.event_type") == rt.event_type)
    )
    bcond = (
        F.col("a.c1").isNotNull()
        & F.col("bc1").isNotNull()
        & (
            F.greatest(
                F.abs(F.col("a.c") - F.col("bc")),
                F.abs(F.col("a.c1") - F.col("bc1")),
            )
            <= F.col("r")
        )
    )
    acond = (
        F.col("a.c2").isNotNull()
        & F.col("bc2").isNotNull()
        & (
            F.greatest(
                F.abs(F.col("a.c") - F.col("bc")),
                F.abs(F.col("a.c1") - F.col("bc1")),
                F.abs(F.col("a.c2") - F.col("bc2")),
            )
            <= F.col("r")
        )
    )
    p = j.groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.first("r").alias("r"),
        F.sum(bcond.cast("long")).cast("long").alias("b_pairs"),
        F.sum(acond.cast("long")).cast("long").alias("a_pairs"),
    )
    sampen = (
        F.floor(
            F.log(
                F.col("b_pairs").cast("double")
                / F.nullif(F.col("a_pairs"), F.lit(0))
            )
            * 1e6
        )
        / 1e6
    )
    return p.select(
        "event_type", "r", "b_pairs", "a_pairs", sampen.alias("sampen")
    ).orderBy("event_type")


@register(
    "text_mattr",
    section="2.8",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    dims AS (
      SELECT doc_id, lang, source, n,
             LEAST({_MATTR_W}, n) AS l,
             n - LEAST({_MATTR_W}, n) + 1 AS w
      FROM d),
    tok AS (
      SELECT doc_id, UNNEST(generate_series(1, n)) AS pos FROM d),
    tok2 AS (
      SELECT t.doc_id, t.pos, d.toks[t.pos] AS tok
      FROM tok t JOIN d USING (doc_id)),
    st AS (
      SELECT doc_id, lang, source, l, w,
             UNNEST(generate_series(1, w)) AS s
      FROM dims),
    win AS (
      SELECT st.doc_id, st.lang, st.source, st.l, st.w, st.s,
             CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS dk
      FROM st JOIN tok2 t
        ON t.doc_id = st.doc_id
       AND t.pos BETWEEN st.s AND st.s + st.l - 1
      GROUP BY 1, 2, 3, 4, 5, 6),
    doc AS (
      SELECT doc_id, lang, source,
             (SUM(dk) * 1000000) // (MAX(l) * MAX(w)) AS m
      FROM win GROUP BY 1, 2, 3)
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           SUM(m) // COUNT(*) AS avg_mattr_ppm,
           MIN(m) AS min_mattr_ppm, MAX(m) AS max_mattr_ppm
    FROM doc GROUP BY 1, 2 ORDER BY 1, 2
    """,
    notes=f"MATTR (moving-average type-token ratio, Covington-McFall) "
    f"per (lang, source): every window of {_MATTR_W} consecutive tokens "
    f"gets its own distinct-type count, the per-doc MATTR is the mean "
    f"window TTR (all-integer: ppm = sum(distinct) * 1e6 div (L * "
    f"#windows)), and buckets report the doc-mean/min/max. Unlike raw "
    f"TTR (which falls mechanically with doc length — Heaps' law), "
    f"MATTR is length-stable, so it separates genuinely repetitive "
    f"documents from merely long ones; docs shorter than {_MATTR_W} "
    f"tokens degrade to plain TTR (L = least({_MATTR_W}, n)). "
    f"Integer-exact end to end. Scale: the oracle materializes every "
    f"(token, window) pair; the engine does NOT — a token position p "
    f"is counted by the windows in which it is the LAST occurrence of "
    f"its type (distinct-per-window = last-occurrences-per-window), "
    f"so sum(distinct over windows) = sum over positions of "
    f"max(0, min(w, p, nxt-L) - max(1, p-L+1) + 1) where nxt is the "
    f"next position of the same token (lead() over (doc, token); "
    f"sentinel n+1 when it never recurs). One token row per position "
    f"instead of {_MATTR_W} — two keyed shuffles (the lead window on "
    f"(doc, token), the per-doc sum), corpus-linear, no join at all. "
    f"Round-11 rewrite: hash-identical to the fan-out formulation, "
    f"~{_MATTR_W}x fewer intermediate rows",
)
def text_mattr(spark, sf_dir):
    docs = fan_out(table(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.split("text", " ").alias("toks"),
    ).withColumn("n", F.size("toks").cast("long"))
    tok = d.select(
        "doc_id",
        "lang",
        "source",
        "n",
        F.posexplode("toks").alias("p0", "tok"),
    ).select(
        "doc_id",
        "lang",
        "source",
        "n",
        (F.col("p0") + 1).cast("long").alias("pos"),
        "tok",
    )
    lead_pos = F.lead("pos").over(
        W.partitionBy("doc_id", "tok").orderBy("pos")
    )
    t = (
        tok.withColumn("nxt", F.coalesce(lead_pos, F.col("n") + 1))
        .withColumn("l", F.least(F.lit(_MATTR_W).cast("long"), F.col("n")))
        .withColumn("w", F.col("n") - F.col("l") + 1)
    )
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("w"), F.col("pos"), F.col("nxt") - F.col("l"))
        - F.greatest(F.lit(1).cast("long"), F.col("pos") - F.col("l") + 1)
        + 1,
    )
    doc = (
        t.withColumn("contrib", contrib)
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.expr(
                "(sum(contrib) * 1000000) div (max(l) * max(w))"
            ).alias("m")
        )
    )
    return doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("sum(m) div count(*)").alias("avg_mattr_ppm"),
        F.min("m").alias("min_mattr_ppm"),
        F.max("m").alias("max_mattr_ppm"),
    ).orderBy("lang", "source")


@register(
    "rank_exposure",
    section="2.8",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               * 1000
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
      FROM documents),
    top AS (
      SELECT doc_id, lang, score,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS BIGINT) AS rk
      FROM s ORDER BY score DESC, doc_id LIMIT {_EXP_K}),
    wt AS (
      SELECT lang, ({_EXP_SQL})[rk] AS w FROM top)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS docs_top,
           CAST(COUNT(*) AS BIGINT) * 1000000 // {_EXP_K} AS docs_ppm,
           CAST(SUM(w) AS BIGINT) * 1000000
             // CAST({_EXP_TOTAL} AS BIGINT) AS exposure_ppm,
           (CAST(SUM(w) AS BIGINT) * 1000000
             // CAST({_EXP_TOTAL} AS BIGINT)) * 1000
             // (CAST(COUNT(*) AS BIGINT) * 1000000 // {_EXP_K})
             AS fairness_milli
    FROM wt GROUP BY 1 ORDER BY 1
    """,
    notes=f"Ranking exposure fairness over the global quality top-"
    f"{_EXP_K}: documents ranked by exact milli-TTR (the "
    f"pipeline_preference_pairs score; ties broken by doc_id), each "
    f"rank k carries exposure w_k = floor(1e9/log2(k+1)) — the "
    f"python-computed integer discount table embedded as literals in "
    f"BOTH engines (the rank_ndcg trick), so no runtime log is "
    f"compared cross-engine. Per language: share of total exposure "
    f"vs share of top-{_EXP_K} slots, and their ratio (milli) — the "
    f"position-bias audit (equal slot counts do NOT mean equal "
    f"exposure when one group clusters at the top). All-integer "
    f"(exact BIGINT weight sums, ppm by integer div). Scale: the "
    f"global top-K is a TakeOrderedAndProject (no full sort "
    f"materializes); everything after runs on {_EXP_K} rows",
)
def rank_exposure(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000"
            " div size(split(text, ' '))"
        ).alias("score"),
    )
    top = s.orderBy(F.col("score").desc(), "doc_id").limit(_EXP_K)
    # the window below runs on the K retained rows only — the global
    # ordering was already resolved by the TakeOrdered top-K above
    rk = F.row_number().over(W.orderBy(F.col("score").desc(), "doc_id"))
    wt = top.select(
        "lang",
        F.element_at(
            F.expr(_EXP_SPARK), rk.cast("int")
        )
        .cast("long")
        .alias("w"),
    )
    g = wt.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("docs_top"),
        F.sum("w").cast("long").alias("ws"),
    )
    return g.select(
        "lang",
        "docs_top",
        F.expr(f"docs_top * 1000000 div {_EXP_K}").alias("docs_ppm"),
        F.expr(
            f"ws * 1000000 div CAST({_EXP_TOTAL} AS BIGINT)"
        ).alias("exposure_ppm"),
        F.expr(
            f"(ws * 1000000 div CAST({_EXP_TOTAL} AS BIGINT)) * 1000"
            f" div (docs_top * 1000000 div {_EXP_K})"
        ).alias("fairness_milli"),
    ).orderBy("lang")


@register(
    "fn_variant_nested",
    section="2.8",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
             '{"ok":' || CAST(o_orderkey AS VARCHAR)
             || ',"st":"' || o_orderpriority
             || '","c":{"key":' || CAST(o_custkey AS VARCHAR)
             || ',"mod":[' || CAST(o_custkey % 3 AS VARCHAR)
             || ',' || CAST(o_custkey % 7 AS VARCHAR) || ']}}' AS js
      FROM orders WHERE o_orderkey % 7 = 0)
    SELECT o_orderkey,
           json_extract_string(js, '$.st') AS pri,
           CAST(json_extract(js, '$.c.key') AS BIGINT) AS ckey,
           CAST(json_extract(js, '$.c.mod[1]') AS BIGINT) AS mod7,
           json_extract_string(js, '$.c.mod[0]') AS mod3_str,
           CAST(json_extract(js, '$.c.nope') AS BIGINT) AS missing,
           TRY_CAST(json_extract_string(js, '$.st') AS BIGINT) AS strict
    FROM j ORDER BY o_orderkey
    """,
    notes="Spark 4 VARIANT nested-path surface (fn_json covers the flat "
    "parse_json + try_variant_get hot path; this exercises the rest of "
    "the semi-structured contract): object member access ($.c.key), "
    "array indexing ($.c.mod[1], 0-based like JSON path), string "
    "extraction of a non-string leaf, a missing path (NULL, not an "
    "error), and try_variant_get's strict-cast semantics (a "
    "non-numeric string requested as bigint yields NULL — no partial "
    "'1-URGENT' -> 1 parsing). The JSON is built in-engine from "
    "integer/text columns only (no doubles — float-to-text formatting "
    "is not a cross-engine contract). Scan-shaped: parse and extract "
    "are per-row codegen'd expressions, no shuffle, no UDF",
)
def fn_variant_nested(spark, sf_dir):
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    js = F.concat(
        F.lit('{"ok":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"st":"'),
        F.col("o_orderpriority"),
        F.lit('","c":{"key":'),
        F.col("o_custkey").cast("string"),
        F.lit(',"mod":['),
        (F.col("o_custkey") % 3).cast("string"),
        F.lit(","),
        (F.col("o_custkey") % 7).cast("string"),
        F.lit("]}}"),
    )
    v = o.select("o_orderkey", F.parse_json(js).alias("v"))
    return v.select(
        "o_orderkey",
        F.expr("variant_get(v, '$.st', 'string')").alias("pri"),
        F.expr("variant_get(v, '$.c.key', 'bigint')").alias("ckey"),
        F.expr("variant_get(v, '$.c.mod[1]', 'bigint')").alias("mod7"),
        F.expr("variant_get(v, '$.c.mod[0]', 'string')").alias("mod3_str"),
        F.expr("variant_get(v, '$.c.nope', 'bigint')").alias("missing"),
        F.expr("try_variant_get(v, '$.st', 'bigint')").alias("strict"),
    ).orderBy("o_orderkey")


@register(
    "agg_listagg",
    section="2.4",
    oracle="""
    SELECT r.r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_alpha,
           string_agg(n.n_name, '|' ORDER BY n.n_nationkey DESC)
             AS nations_bykey_desc
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1 ORDER BY 1
    """,
    notes="listagg WITHIN GROUP (Spark 4's ANSI ordered string "
    "aggregate — the last holdout that used to force "
    "array_join(sort_array(collect_list(...)))): nations per region "
    "concatenated under two different explicit orderings (alphabetical "
    "with ',' and key-descending with '|'). The WITHIN GROUP ordering "
    "is part of the result contract, so the output is deterministic "
    "without any post-sort. Scale: group payloads here are dim-sized "
    "(<= 5 nations per region); a fact-scale listagg concatenates "
    "unboundedly and would need an explicit slice/cap first — "
    "documented, not exercised",
)
def agg_listagg(spark, sf_dir):
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations_alpha"),
            F.expr(
                "listagg(n_name, '|') WITHIN GROUP"
                " (ORDER BY n_nationkey DESC)"
            ).alias("nations_bykey_desc"),
        )
        .orderBy("region")
    )
