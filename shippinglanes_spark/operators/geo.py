"""AIS trajectory analytics (SURVEY §2.10 — the reference's home domain).

The reference wrangles AIS vessel fixes: clean pings, build per-vessel
tracks, detect port calls, aggregate traffic. The fixtures lack geo
columns (SURVEY §0), so fixes reuse the established synthetic projection
from evt_track_length / join_spatial_grid — lat = (value % 180) - 90,
lon = ((value * 2) % 360) - 180 — pure modular arithmetic, so both
engines derive bit-identical coordinates.

Plan shapes (all keyed, no cartesian anywhere):

- speed/course: one per-vessel window pass (lag) + codegen trig — the
  standard hop-derivation; at 100 TB the only shuffle is the keyed sort
  by vessel, which every per-track operator shares.
- port visits: geofence membership is a row-local broadcast-size cross
  of 3 port literals, then gaps-and-islands per (vessel, port) — the
  sessionize pattern on a filtered stream.
- OD matrix: first/last fix per (vessel, day) via full-frame
  first/last_value, then a counted groupBy over cell pairs — output is
  cell²-bounded, independent of fix count.
- density stencil: per-cell counts (bounded: 18x36 cells), then each
  cell replicates to its 3x3 neighbors and re-aggregates — the
  distributed stencil idiom; cost scales with cells, not fixes.
- simplification: Visvalingam-style course-change filter via lag/lead —
  row-local trig, no state, keeps endpoints.

Float discipline: coordinates/cells are exact modular arithmetic;
anything through libm trig (distance, speed, bearing) is ROUNDed on
both sides, and keep/flag thresholds compare the ROUNDed value so a
boundary can't flip one engine only (same rule as sim_cosine_pairs).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import as_date, epoch_us
from ..io import table
from ..registry import register
from ..functions.scalar import haversine_km

_LAT = "(value % 180) - 90"
_LON = "((value * 2) % 360) - 180"

# (port_id, lat, lon): synthetic "ports" for the geofence queries.
_PORTS = ((1, 0.0, 0.0), (2, 40.0, -70.0), (3, -30.0, 120.0))
_PORT_RADIUS_KM = 2000.0
_VISIT_GAP_US = 6 * 3600 * 1_000_000  # new visit after 6h out of sight

_FIXES_SQL = f"""
    fixes AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             {_LAT} AS lat, {_LON} AS lon
      FROM events)
"""


def _fixes(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("ts_us"),
        ((F.col("value") % 180) - 90).alias("lat"),
        (((F.col("value") * 2) % 360) - 180).alias("lon"),
    )


def bearing_deg(lat1, lon1, lat2, lon2):
    """Initial great-circle bearing in [0, 360), built-ins only."""
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(F.radians(lat2))
    x = F.cos(F.radians(lat1)) * F.sin(F.radians(lat2)) - F.sin(
        F.radians(lat1)
    ) * F.cos(F.radians(lat2)) * F.cos(dlon)
    deg = F.degrees(F.atan2(y, x))
    return ((deg % 360) + 360) % 360


def _bearing_sql(lat1="lat1", lon1="lon1", lat2="lat2", lon2="lon2"):
    return (
        "((degrees(atan2("
        f"sin(radians({lon2} - {lon1})) * cos(radians({lat2})), "
        f"cos(radians({lat1})) * sin(radians({lat2})) - "
        f"sin(radians({lat1})) * cos(radians({lat2})) * cos(radians({lon2} - {lon1}))"
        ")) % 360) + 360) % 360"
    )


_BEARING_SQL = _bearing_sql()

_HAV_SQL = (
    "2 * 6371.0 * ASIN(SQRT("
    "SIN(RADIANS(lat2 - lat1) / 2) ^ 2 "
    "+ COS(RADIANS(lat1)) * COS(RADIANS(lat2)) "
    "* SIN(RADIANS(lon2 - lon1) / 2) ^ 2))"
)


@register(
    "geo_speed_course",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    hops AS (
      SELECT user_id, event_id, ts_us,
             LAG(lat) OVER w AS lat1, LAG(lon) OVER w AS lon1,
             LAG(ts_us) OVER w AS ts1, lat AS lat2, lon AS lon2
      FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
    SELECT user_id, event_id,
           ROUND({_HAV_SQL}, 4) AS hop_km,
           ROUND({_HAV_SQL} / ((ts_us - ts1) / 3600000000.0), 2) AS speed_kmh,
           ROUND({_BEARING_SQL}, 4) AS course_deg,
           ROUND({_HAV_SQL} / ((ts_us - ts1) / 3600000000.0), 2) > 2000.0
             AS is_teleport
    FROM hops WHERE lat1 IS NOT NULL AND ts_us > ts1
    """,
    notes="AIS hop derivation: per-vessel lag window -> haversine distance, "
    "speed, initial bearing; teleport flag (impossible speed = bad fix) "
    "thresholds the ROUNDed speed on both sides. One keyed window pass, "
    "all trig in codegen",
)
def geo_speed_course(spark, sf_dir):
    """The first stage of every AIS pipeline: turn raw pings into hops
    with distance / speed-over-ground / course, and flag physically
    impossible hops (position noise) for cleaning. One window shuffle
    keyed by vessel; everything else is row-local codegen trig."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    hops = _fixes(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts_us",
        F.lag("lat").over(w).alias("lat1"),
        F.lag("lon").over(w).alias("lon1"),
        F.lag("ts_us").over(w).alias("ts1"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    hop_km = haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
    speed = F.round(hop_km / ((F.col("ts_us") - F.col("ts1")) / 3.6e9), 2)
    return (
        hops.where(F.col("lat1").isNotNull() & (F.col("ts_us") > F.col("ts1")))
        .select(
            "user_id",
            "event_id",
            F.round(hop_km, 4).alias("hop_km"),
            speed.alias("speed_kmh"),
            F.round(
                bearing_deg(
                    F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
                ),
                4,
            ).alias("course_deg"),
            (speed > 2000.0).alias("is_teleport"),
        )
    )


@register(
    "geo_port_visits",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    ports(port_id, plat, plon) AS (VALUES {", ".join(f"({i}, {la}, {lo})" for i, la, lo in _PORTS)}),
    inport AS (
      SELECT f.user_id, p.port_id, f.ts_us, f.event_id
      FROM fixes f JOIN ports p
        ON 2 * 6371.0 * ASIN(SQRT(
             SIN(RADIANS(f.lat - p.plat) / 2) ^ 2
             + COS(RADIANS(p.plat)) * COS(RADIANS(f.lat))
             * SIN(RADIANS(f.lon - p.plon) / 2) ^ 2)) <= {_PORT_RADIUS_KM}),
    flagged AS (
      SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > {_VISIT_GAP_US}
                       OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_visit
      FROM inport WINDOW w AS (PARTITION BY user_id, port_id ORDER BY ts_us, event_id)),
    visits AS (
      SELECT *, SUM(new_visit) OVER (PARTITION BY user_id, port_id
                                     ORDER BY ts_us, event_id) AS visit_n
      FROM flagged)
    SELECT user_id, port_id, CAST(visit_n AS BIGINT) AS visit_n,
           MIN(ts_us) AS entry_us, MAX(ts_us) AS exit_us,
           CAST(COUNT(*) AS BIGINT) AS n_fixes
    FROM visits GROUP BY user_id, port_id, visit_n
    """,
    notes="geofenced port-call detection: membership vs 3 port literals "
    "(row-local haversine), then gaps-and-islands per (vessel, port) with "
    "a 6h re-entry gap -> visit spans. The sessionize pattern applied to "
    "a geofence-filtered stream; one keyed window + one keyed agg",
)
def geo_port_visits(spark, sf_dir):
    """Port-call extraction — the AIS question 'when did each vessel
    call at each port'. The port table is a literal broadcast (ports
    are always dimension-scale); in-zone membership is row-local, and
    visit assembly is the standard gap-break islands build keyed by
    (vessel, port)."""
    ports = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({i} AS port_id, CAST({la} AS DOUBLE) AS plat, "
            f"CAST({lo} AS DOUBLE) AS plon)"
            for i, la, lo in _PORTS
        )
        + "))"
    )
    fx = _fixes(spark, sf_dir).select("*", ports.alias("p")).select(
        "user_id", "event_id", "ts_us", "lat", "lon", "p.*"
    )
    inport = fx.where(
        haversine_km(F.col("lat"), F.col("lon"), F.col("plat"), F.col("plon"))
        <= _PORT_RADIUS_KM
    ).select("user_id", "port_id", "ts_us", "event_id")
    w = Window.partitionBy("user_id", "port_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    flagged = inport.withColumn(
        "new_visit",
        (prev.isNull() | ((F.col("ts_us") - prev) > _VISIT_GAP_US)).cast("int"),
    )
    visits = flagged.withColumn(
        "visit_n", F.sum("new_visit").over(w).cast("long")
    )
    return visits.groupBy("user_id", "port_id", "visit_n").agg(
        F.min("ts_us").alias("entry_us"),
        F.max("ts_us").alias("exit_us"),
        F.count(F.lit(1)).alias("n_fixes"),
    )


@register(
    "geo_od_matrix",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    located AS (
      SELECT user_id, CAST(ts_us // 86400000000 AS BIGINT) AS day_n,
             ts_us, event_id,
             CAST(FLOOR(lat / 10) AS BIGINT) AS cy,
             CAST(FLOOR(lon / 10) AS BIGINT) AS cx
      FROM fixes),
    ends AS (
      SELECT DISTINCT user_id, day_n,
             FIRST_VALUE(cx) OVER w AS o_cx, FIRST_VALUE(cy) OVER w AS o_cy,
             LAST_VALUE(cx) OVER w AS d_cx, LAST_VALUE(cy) OVER w AS d_cy
      FROM located
      WINDOW w AS (PARTITION BY user_id, day_n ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
    SELECT o_cx, o_cy, d_cx, d_cy, CAST(COUNT(*) AS BIGINT) AS n_legs
    FROM ends GROUP BY o_cx, o_cy, d_cx, d_cy
    """,
    notes="origin-destination traffic matrix: first/last 10-deg grid cell "
    "per (vessel, day) via full-frame first/last_value, counted by cell "
    "pair. Output is cell-pair-bounded regardless of fix volume",
)
def geo_od_matrix(spark, sf_dir):
    """Where do voyages start and end: per (vessel, day) the first and
    last fix's grid cell, aggregated into an OD flow matrix. The window
    is keyed by (vessel, day); the final aggregate's key space is cells²
    — bounded, so the result never grows with the corpus."""
    fx = _fixes(spark, sf_dir).select(
        "user_id",
        (F.col("ts_us") / F.lit(86400000000)).cast("long").alias("day_n"),
        "ts_us",
        "event_id",
        F.floor(F.col("lat") / 10).cast("long").alias("cy"),
        F.floor(F.col("lon") / 10).cast("long").alias("cx"),
    )
    w = (
        Window.partitionBy("user_id", "day_n")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ends = fx.select(
        "user_id",
        "day_n",
        F.first("cx").over(w).alias("o_cx"),
        F.first("cy").over(w).alias("o_cy"),
        F.last("cx").over(w).alias("d_cx"),
        F.last("cy").over(w).alias("d_cy"),
    ).distinct()
    return ends.groupBy("o_cx", "o_cy", "d_cx", "d_cy").agg(
        F.count(F.lit(1)).alias("n_legs")
    )


@register(
    "geo_density_smooth",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    counts AS (
      SELECT CAST(FLOOR(lon / 10) AS BIGINT) AS cx,
             CAST(FLOOR(lat / 10) AS BIGINT) AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM fixes GROUP BY 1, 2)
    SELECT a.cx, a.cy, a.n,
           CAST(SUM(b.n) AS BIGINT) AS n_smooth
    FROM counts a JOIN counts b
      ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
     AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
    GROUP BY a.cx, a.cy, a.n
    """,
    notes="traffic density heatmap with 3x3 neighborhood smoothing: "
    "per-cell fix counts (bounded 18x36 key space), then the distributed "
    "stencil idiom — each cell's count replicates to its 9 neighbors and "
    "re-aggregates; cost scales with cells, not fixes. Edge cells simply "
    "have fewer contributors (no wraparound) on both sides",
)
def geo_density_smooth(spark, sf_dir):
    """Shipping-lane density map: the raw per-cell histogram is one
    map-side-combined groupBy over the fixes; the smoothing pass then
    runs entirely on the cell table (bounded at 648 rows at any data
    scale), replicating each count to its 3x3 neighborhood — a stencil
    as a keyed join, never touching the fix-level data again."""
    fx = _fixes(spark, sf_dir)
    counts = fx.groupBy(
        F.floor(F.col("lon") / 10).cast("long").alias("cx"),
        F.floor(F.col("lat") / 10).cast("long").alias("cy"),
    ).agg(F.count(F.lit(1)).alias("n"))
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx} AS dx, {dy} AS dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    contrib = counts.select("cx", "cy", "n", offsets.alias("o")).select(
        (F.col("cx") + F.col("o.dx")).alias("tx"),
        (F.col("cy") + F.col("o.dy")).alias("ty"),
        "n",
    )
    smooth = contrib.groupBy("tx", "ty").agg(F.sum("n").alias("n_smooth"))
    return counts.join(
        smooth, (counts.cx == smooth.tx) & (counts.cy == smooth.ty)
    ).select("cx", "cy", "n", F.col("n_smooth").cast("long"))


@register(
    "geo_track_simplify",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    ctx AS (
      SELECT user_id, event_id, ts_us, lat, lon,
             LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon,
             LEAD(lat) OVER w AS nlat, LEAD(lon) OVER w AS nlon
      FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    turns AS (
      SELECT user_id, event_id, ts_us, lat, lon,
             plat IS NULL OR nlat IS NULL AS endpoint,
             {_bearing_sql("plat", "plon", "lat", "lon")} AS b_in,
             {_bearing_sql("lat", "lon", "nlat", "nlon")} AS b_out
      FROM ctx)
    SELECT user_id, event_id, ts_us, lat, lon,
           ROUND(LEAST(ABS(b_out - b_in), 360 - ABS(b_out - b_in)), 4)
             AS turn_deg
    FROM turns
    WHERE endpoint
       OR ROUND(LEAST(ABS(b_out - b_in), 360 - ABS(b_out - b_in)), 4) > 30.0
    """,
    notes="track simplification: keep endpoints and fixes whose course "
    "change exceeds 30 deg (wrapped bearing delta via lag/lead) — the "
    "streaming-friendly cousin of Douglas-Peucker (row-local, no "
    "recursion). Keep predicate compares the ROUNDed turn on both sides",
)
def geo_track_simplify(spark, sf_dir):
    """Polyline reduction for track storage/rendering: a fix survives if
    it is a track endpoint or the course changes by > 30 degrees there.
    Unlike Douglas-Peucker (recursive, needs the whole line in memory),
    the turn test is lag/lead-local — one keyed window pass, so a
    100 TB fix table simplifies in a single shuffle."""
    fx = _fixes(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ctx = fx.select(
        "user_id",
        "event_id",
        "ts_us",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        F.lead("lat").over(w).alias("nlat"),
        F.lead("lon").over(w).alias("nlon"),
    )
    b_in = bearing_deg(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon"))
    b_out = bearing_deg(F.col("lat"), F.col("lon"), F.col("nlat"), F.col("nlon"))
    raw = F.abs(b_out - b_in)
    turn = F.round(F.least(raw, 360 - raw), 4)
    endpoint = F.col("plat").isNull() | F.col("nlat").isNull()
    return (
        ctx.select(
            "user_id", "event_id", "ts_us", "lat", "lon", turn.alias("turn_deg")
        )
        .where(endpoint | (F.col("turn_deg") > 30.0))
    )


_SLOW_KMH = 100.0


@register(
    "geo_stop_detect",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    hops AS (
      SELECT user_id, event_id, ts_us, lat, lon,
             ROW_NUMBER() OVER w AS rn_all,
             LAG(lat) OVER w AS lat1, LAG(lon) OVER w AS lon1,
             LAG(ts_us) OVER w AS ts1, lat AS lat2, lon AS lon2
      FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    slow AS (
      SELECT user_id, event_id, ts_us, lat, lon, rn_all
      FROM hops
      WHERE lat1 IS NOT NULL AND ts_us > ts1
        AND ROUND({_HAV_SQL} / ((ts_us - ts1) / 3600000000.0), 2)
              <= {_SLOW_KMH}),
    isl AS (
      SELECT *, rn_all - ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY rn_all) AS island
      FROM slow)
    SELECT user_id,
           CAST(MIN(ts_us) AS BIGINT) AS stop_start_us,
           CAST(MAX(ts_us) AS BIGINT) AS stop_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_fixes,
           MIN(lat) AS min_lat, MAX(lat) AS max_lat
    FROM isl
    GROUP BY user_id, island
    HAVING COUNT(*) >= 2
    """,
    notes="AIS stop/berth detection: hops slower than the ROUNDed "
    f"{_SLOW_KMH} km/h threshold, grouped into consecutive runs with "
    "the rn-difference island trick (consecutive slow fixes share "
    "rn_all - rn_slow). Both windows and the final aggregate share the "
    "one user-keyed shuffle; extent is min/max (order-independent), no "
    "float means",
)
def geo_stop_detect(spark, sf_dir):
    """Where did each vessel stop: runs of >= 2 consecutive slow fixes.
    The island id subtracts the slow-only row_number from the all-fixes
    row_number, so a single fast fix breaks the run. Same partitioning
    as every per-track operator — the sort by (vessel, time) is paid
    once across the family."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    hops = _fixes(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts_us",
        "lat",
        "lon",
        F.row_number().over(w).alias("rn_all"),
        F.lag("lat").over(w).alias("lat1"),
        F.lag("lon").over(w).alias("lon1"),
        F.lag("ts_us").over(w).alias("ts1"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    speed = F.round(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
        / ((F.col("ts_us") - F.col("ts1")) / 3.6e9),
        2,
    )
    slow = hops.where(
        F.col("lat1").isNotNull()
        & (F.col("ts_us") > F.col("ts1"))
        & (speed <= _SLOW_KMH)
    )
    wslow = Window.partitionBy("user_id").orderBy("rn_all")
    isl = slow.withColumn(
        "island", F.col("rn_all") - F.row_number().over(wslow)
    )
    return (
        isl.groupBy("user_id", "island")
        .agg(
            F.min("ts_us").cast("long").alias("stop_start_us"),
            F.max("ts_us").cast("long").alias("stop_end_us"),
            F.count(F.lit(1)).cast("long").alias("n_fixes"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
        )
        .where(F.col("n_fixes") >= 2)
        .drop("island")
    )


@register(
    "geo_encounters",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL}
    SELECT a.user_id AS id_a, b.user_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_meetings
    FROM fixes a JOIN fixes b
      ON a.user_id < b.user_id
     AND ABS(a.lat - b.lat) <= 0.5 AND ABS(a.lon - b.lon) <= 0.5
     AND ABS(a.ts_us - b.ts_us) <= 3600000000
    GROUP BY 1, 2
    """,
    notes="AIS encounter detection: vessel pairs with fixes within 0.5 "
    "degrees AND 1 hour of each other, counted per pair. Spatio-TEMPORAL "
    "grid bucketing (double-cell scheme: 2*eps cells, probes replicate "
    "to the <= 2 cells per axis their eps-ball touches, <= 8 copies), "
    "homes stay put, so the spacetime "
    "theta-join becomes a plain equi-join on (cell, bucket) + exact "
    "residual filter — keyed shuffle scaling with bucket occupancy, "
    "never n²; every qualifying fix pair meets exactly once (home cell "
    "and bucket are unique). Oracle = DuckDB IEJoin over the raw "
    "predicate",
)
def geo_encounters(spark, sf_dir):
    """Who met whom: the composition of join_spatial_grid's 2D cell
    trick with join_range_binned's time binning — the canonical
    distributed spatio-temporal join an AIS engine is built around."""
    EPS_DEG = 0.5
    EPS_US = 3_600_000_000
    fx = _fixes(spark, sf_dir)

    # double-cell probe (same scheme as geo_convoys): 2*eps cells, probe
    # explodes into the <=2 cells per axis its eps-ball touches — up to
    # 8 offsets instead of 27, identical candidate superset
    def _cells(col, width):
        q = col / width
        return F.array_distinct(F.array(F.floor(q - 0.5), F.floor(q + 0.5)))

    home = fx.select(
        F.col("user_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("ts_us").alias("ts_b"),
        F.floor(F.col("lon") / (2 * EPS_DEG)).alias("cx"),
        F.floor(F.col("lat") / (2 * EPS_DEG)).alias("cy"),
        F.floor(F.col("ts_us") / (2 * EPS_US)).alias("ct"),
    )
    probe = (
        fx.select(
            F.col("user_id").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            F.col("ts_us").alias("ts_a"),
            F.explode(_cells(F.col("lon"), 2 * EPS_DEG)).alias("cx"),
            _cells(F.col("lat"), 2 * EPS_DEG).alias("cys"),
            _cells(F.col("ts_us"), 2.0 * EPS_US).alias("cts"),
        )
        .select(
            "id_a", "lat_a", "lon_a", "ts_a", "cx",
            F.explode("cys").alias("cy"), "cts",
        )
        .select(
            "id_a", "lat_a", "lon_a", "ts_a", "cx", "cy",
            F.explode("cts").alias("ct"),
        )
    )
    # shuffle_hash on the un-exploded home side — see geo_convoys: the
    # planner otherwise broadcasts the 8x-exploded PROBE side
    return (
        probe.join(home.hint("shuffle_hash"), ["cx", "cy", "ct"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("lat_a") - F.col("lat_b")) <= EPS_DEG)
            & (F.abs(F.col("lon_a") - F.col("lon_b")) <= EPS_DEG)
            & (F.abs(F.col("ts_a") - F.col("ts_b")) <= EPS_US)
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_meetings"))
    )


@register(
    "geo_convoys",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    meets AS (SELECT DISTINCT a.user_id AS id_a, b.user_id AS id_b,
                     CAST(FLOOR(a.ts_us / 43200000000.0) AS BIGINT) AS tb
              FROM fixes a JOIN fixes b
                ON a.user_id < b.user_id
               AND ABS(a.lat - b.lat) <= 0.5 AND ABS(a.lon - b.lon) <= 0.5
               AND ABS(a.ts_us - b.ts_us) <= 43200000000),
    runs AS (SELECT id_a, id_b, tb,
                    tb - ROW_NUMBER() OVER (PARTITION BY id_a, id_b
                                            ORDER BY tb) AS island
             FROM meets),
    streaks AS (SELECT id_a, id_b, island,
                       CAST(COUNT(*) AS BIGINT) AS run_len
                FROM runs GROUP BY 1, 2, 3)
    SELECT id_a, id_b,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(run_len) AS BIGINT) AS max_run_bins,
           CAST(SUM(run_len) AS BIGINT) AS n_bins
    FROM streaks GROUP BY id_a, id_b
    HAVING SUM(run_len) >= 2
    """,
    notes="repeated-encounter / convoy mining: vessel pairs meeting in "
    ">= 2 distinct 12-hour bins, with the max CONSECUTIVE-bin run — "
    "geo_encounters' spacetime grid join composed with gaps-and-islands "
    "(tb - row_number) per pair. Persistence separates convoys from "
    "crossings; same bucketed equi-join skeleton, one extra keyed "
    "window — corpus-linear. Oracle = DuckDB IEJoin + the same island "
    "trick",
)
def geo_convoys(spark, sf_dir):
    """Pairs meeting in >= 2 consecutive hour bins. The meeting relation
    reuses the 3x3x3 grid-bucket equi-join (never n²); bin streaks are
    the standard gaps-and-islands window, keyed by pair."""
    from pyspark.sql import Window

    EPS_DEG = 0.5
    EPS_US = 43_200_000_000  # 12-hour bins
    fx = _fixes(spark, sf_dir)

    # DOUBLE-CELL scheme: cells of width 2*eps, each probe fix explodes
    # into the <=2 cells per axis its eps-ball can touch (floor(q +/- .5)
    # in 2*eps units) — up to 8 offsets instead of the 27-neighbor
    # single-eps grid. Same candidate superset (any pair within eps per
    # axis shares one of the probe's cells), measured 1.6x faster at
    # sf0.1 (4.3s -> 2.7s warm, result identical).
    def _cells(col, width):
        q = col / width
        return F.array_distinct(F.array(F.floor(q - 0.5), F.floor(q + 0.5)))

    home = fx.select(
        F.col("user_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("ts_us").alias("ts_b"),
        F.floor(F.col("lon") / (2 * EPS_DEG)).alias("cx"),
        F.floor(F.col("lat") / (2 * EPS_DEG)).alias("cy"),
        F.floor(F.col("ts_us") / (2 * EPS_US)).alias("ct"),
    )
    probe = (
        fx.select(
            F.col("user_id").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            F.col("ts_us").alias("ts_a"),
            F.floor(F.col("ts_us") / EPS_US).alias("ptb"),
            F.explode(_cells(F.col("lon"), 2 * EPS_DEG)).alias("cx"),
            _cells(F.col("lat"), 2 * EPS_DEG).alias("cys"),
            _cells(F.col("ts_us"), 2.0 * EPS_US).alias("cts"),
        )
        .select(
            "id_a", "lat_a", "lon_a", "ts_a", "ptb", "cx",
            F.explode("cys").alias("cy"), "cts",
        )
        .select(
            "id_a", "lat_a", "lon_a", "ts_a", "ptb", "cx", "cy",
            F.explode("cts").alias("ct"),
        )
    )
    # SHUFFLE_HASH on the home side (§3.1): the planner's estimate put
    # the 8x-EXPLODED probe side under the broadcast threshold, so it
    # collected ~800k exploded rows to the driver and built one
    # serialized hash relation (measured 2.8-3.7 s for the query). A
    # shuffled hash join builds per-partition tables from the SMALLER
    # un-exploded home side instead — no driver collect, build
    # parallelized (1.9 s measured, same rows). Scale-safe: both sides
    # shuffle by cell key; the build is home's per-partition slice,
    # sized by shuffle partition count, never a whole-relation
    # broadcast.
    meets = (
        probe.join(home.hint("shuffle_hash"), ["cx", "cy", "ct"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("lat_a") - F.col("lat_b")) <= EPS_DEG)
            & (F.abs(F.col("lon_a") - F.col("lon_b")) <= EPS_DEG)
            & (F.abs(F.col("ts_a") - F.col("ts_b")) <= EPS_US)
        )
        .select("id_a", "id_b", F.col("ptb").alias("mtb"))
        .distinct()
    )
    w = Window.partitionBy("id_a", "id_b").orderBy("mtb")
    runs = meets.withColumn("island", F.col("mtb") - F.row_number().over(w))
    streaks = runs.groupBy("id_a", "id_b", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        streaks.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("run_len").cast("long").alias("max_run_bins"),
            F.sum("run_len").cast("long").alias("n_bins"),
        )
        .where(F.col("n_bins") >= 2)
    )


N_ANCHORS = 16


@register(
    "geo_nearest_anchor",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    anchors AS (SELECT UNNEST(range({N_ANCHORS})) AS aid),
    a2 AS (SELECT aid, (aid % 4) * 40 - 60 AS alat,
                  (aid // 4) * 80 - 120 AS alon
           FROM anchors),
    assigned AS (
      SELECT f.user_id, f.event_id,
             (SELECT a.aid FROM a2 a
              ORDER BY (f.lat - a.alat) * (f.lat - a.alat)
                     + (f.lon - a.alon) * (f.lon - a.alon), a.aid
              LIMIT 1) AS aid
      FROM fixes f)
    SELECT aid, CAST(COUNT(*) AS BIGINT) AS n_fixes,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_vessels
    FROM assigned GROUP BY aid
    """,
    notes="nearest-anchor assignment (zone/port attribution): the anchor "
    "table is tiny and FIXED, so the argmin is a per-row fold over a "
    "literal anchor array (higher-order aggregate) — no join, no "
    "shuffle until the final per-anchor count. The shape for "
    "assign-to-nearest-of-k-centroids when k is metadata-sized; "
    "squared-degree distance keeps the argmin exact-integer-free but "
    "deterministic (strict inequality, ties to smallest aid)",
)
def geo_nearest_anchor(spark, sf_dir):
    fx = _fixes(spark, sf_dir)
    anchors = [
        (aid, (aid % 4) * 40 - 60, (aid // 4) * 80 - 120)
        for aid in range(N_ANCHORS)
    ]
    arr = F.array(
        *[
            F.struct(
                F.lit(aid).alias("aid"),
                F.lit(float(alat)).alias("alat"),
                F.lit(float(alon)).alias("alon"),
            )
            for aid, alat, alon in anchors
        ]
    )
    d2 = lambda a: (F.col("lat") - a["alat"]) * (  # noqa: E731
        F.col("lat") - a["alat"]
    ) + (F.col("lon") - a["alon"]) * (F.col("lon") - a["alon"])
    best = F.aggregate(
        arr,
        F.struct(
            F.lit(-1).alias("aid"), F.lit(float("inf")).alias("dist")
        ),
        lambda acc, a: F.when(d2(a) < acc["dist"], F.struct(
            a["aid"].alias("aid"), d2(a).alias("dist")
        )).otherwise(acc),
    )
    return (
        fx.select("user_id", "event_id", best["aid"].alias("aid"))
        .groupBy("aid")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.countDistinct("user_id").alias("n_vessels"),
        )
    )


@register(
    "geo_track_interp",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL},
    v AS (SELECT user_id, ts_us, lat, lon FROM fixes
          WHERE user_id % 97 = 0),
    b AS (SELECT user_id,
                 CAST(FLOOR(MIN(ts_us) / 3600000000.0) AS BIGINT) + 1 AS h_lo,
                 CAST(FLOOR(MAX(ts_us) / 3600000000.0) AS BIGINT) AS h_hi
          FROM v GROUP BY user_id),
    grid AS (SELECT user_id, UNNEST(range(h_lo, h_hi + 1)) * 3600000000
               AS ts_us
             FROM b WHERE h_hi >= h_lo),
    u AS (SELECT user_id, ts_us, lat, lon, 0 AS g FROM v
          UNION ALL
          SELECT user_id, ts_us, NULL, NULL, 1 AS g FROM grid),
    w AS (SELECT user_id, ts_us, g,
                 LAST_VALUE(lat IGNORE NULLS) OVER wb AS plat,
                 LAST_VALUE(lon IGNORE NULLS) OVER wb AS plon,
                 LAST_VALUE(CASE WHEN g = 0 THEN ts_us END IGNORE NULLS)
                   OVER wb AS pts,
                 FIRST_VALUE(lat IGNORE NULLS) OVER wf AS nlat,
                 FIRST_VALUE(lon IGNORE NULLS) OVER wf AS nlon,
                 FIRST_VALUE(CASE WHEN g = 0 THEN ts_us END IGNORE NULLS)
                   OVER wf AS nts
          FROM u
          WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, g
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY user_id ORDER BY ts_us, g
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, ts_us,
           FLOOR((plat + (nlat - plat)
                  * ((CAST(ts_us AS DOUBLE) - pts) / (nts - pts))) * 1e6)
             / 1e6 AS lat_i,
           FLOOR((plon + (nlon - plon)
                  * ((CAST(ts_us AS DOUBLE) - pts) / (nts - pts))) * 1e6)
             / 1e6 AS lon_i
    FROM w
    WHERE g = 1 AND pts IS NOT NULL AND nts IS NOT NULL AND nts > pts
    """,
    notes="vessel track interpolation: positions resampled onto an hourly "
    "grid by linear interpolation between the surrounding fixes — the "
    "union-the-grid trick of evt_resample_interp extended to carry "
    "BOTH neighbors' (lat, lon, ts) through one backward and one "
    "forward IGNORE NULLS window pass per vessel, so the interpolation "
    "is two keyed window scans, never a grid-to-fix interval join. "
    "Grid hours come from each vessel's own [first, last] fix span; "
    "the interpolation weight is exact integer-microsecond arithmetic "
    "and the result floor-disciplined to 1e-6 deg",
)
def geo_track_interp(spark, sf_dir):
    """Hourly track resampling for a deterministic vessel sample
    (user_id % 97 = 0 keeps the output grid-bounded at any SF). At
    100 TB this is two keyed window passes over (fixes + grid) — the
    grid is generated per vessel from its own span, so no global
    calendar materializes and no interval join ever forms."""
    fx = _fixes(spark, sf_dir).where(F.col("user_id") % 97 == 0).select(
        "user_id", "ts_us", "lat", "lon"
    )
    hour_us = 3_600_000_000
    bounds = fx.groupBy("user_id").agg(
        (F.floor(F.min("ts_us") / float(hour_us)).cast("long") + 1).alias("h_lo"),
        F.floor(F.max("ts_us") / float(hour_us)).cast("long").alias("h_hi"),
    )
    grid = (
        bounds.where(F.col("h_hi") >= F.col("h_lo"))
        .select("user_id", F.explode(F.sequence("h_lo", "h_hi")).alias("h"))
        .select("user_id", (F.col("h") * F.lit(hour_us)).alias("ts_us"))
    )
    u = fx.select(
        "user_id", "ts_us", "lat", "lon", F.lit(0).alias("g")
    ).unionByName(
        grid.select(
            "user_id",
            "ts_us",
            F.lit(None).cast("double").alias("lat"),
            F.lit(None).cast("double").alias("lon"),
            F.lit(1).alias("g"),
        )
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "g")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    fix_ts = F.when(F.col("g") == 0, F.col("ts_us"))
    w = u.select(
        "user_id",
        "ts_us",
        "g",
        F.last("lat", ignorenulls=True).over(wb).alias("plat"),
        F.last("lon", ignorenulls=True).over(wb).alias("plon"),
        F.last(fix_ts, ignorenulls=True).over(wb).alias("pts"),
        F.first("lat", ignorenulls=True).over(wf).alias("nlat"),
        F.first("lon", ignorenulls=True).over(wf).alias("nlon"),
        F.first(fix_ts, ignorenulls=True).over(wf).alias("nts"),
    )
    frac = (F.col("ts_us").cast("double") - F.col("pts")) / (
        F.col("nts") - F.col("pts")
    )
    return w.where(
        (F.col("g") == 1)
        & F.col("pts").isNotNull()
        & F.col("nts").isNotNull()
        & (F.col("nts") > F.col("pts"))
    ).select(
        "user_id",
        "ts_us",
        (
            F.floor((F.col("plat") + (F.col("nlat") - F.col("plat")) * frac) * 1e6)
            / 1e6
        ).alias("lat_i"),
        (
            F.floor((F.col("plon") + (F.col("nlon") - F.col("plon")) * frac) * 1e6)
            / 1e6
        ).alias("lon_i"),
    )


_GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 20  # per axis; 40 total = 8 geohash chars


def _gh_z_sql() -> str:
    """The 40-bit geohash integer from the two 20-bit axis integers:
    longitude on odd (higher) bit positions, latitude on even — the
    standard geohash interleave, unrolled to literal mask-multiply
    terms so the SAME arithmetic runs in both engines."""
    terms = []
    for i in range(_GH_BITS):
        terms.append(f"(((lon_b >> {i}) & 1) * {1 << (2 * i + 1)})")
        terms.append(f"(((lat_b >> {i}) & 1) * {1 << (2 * i)})")
    return " + ".join(terms)


def _gh_chars_sql() -> str:
    """base32 chars: 8 substr picks of 5-bit groups, MSB first."""
    parts = [
        f"substr('{_GH_ALPHA}', CAST((z >> {35 - 5 * j}) & 31 AS INTEGER)"
        " + 1, 1)"
        for j in range(8)
    ]
    return " || ".join(parts)


@register(
    "geo_geohash",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip().rstrip(',')},
    ax AS (
      SELECT user_id,
             CAST(FLOOR((lat + 90.0) / 180.0 * 1048576.0) AS BIGINT)
               AS lat_b,
             CAST(FLOOR((lon + 180.0) / 360.0 * 1048576.0) AS BIGINT)
               AS lon_b
      FROM fixes),
    zc AS (SELECT user_id, CAST({_gh_z_sql()} AS BIGINT) AS z FROM ax),
    gh AS (SELECT user_id, {_gh_chars_sql()} AS gh8 FROM zc)
    SELECT substr(gh8, 1, 5) AS cell5,
           CAST(COUNT(*) AS BIGINT) AS n_fixes,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_vessels,
           MIN(gh8) AS sample_gh8
    FROM gh GROUP BY 1
    """,
    notes="geohash encoding as pure integer arithmetic: each axis "
    "quantizes to a 20-bit integer, the interleave is 40 unrolled "
    "mask-multiply terms, and the base32 chars are substr picks of the "
    "5-bit groups — no UDF, no loop, fully inside codegen and "
    "bit-identical across engines (the axis floor divides doubles "
    "produced by the same IEEE ops). Output is per-5-char-cell "
    "occupancy (~4.9 km cells): fix count, distinct vessels, and a "
    "sample full-precision hash. Geohash prefixes are the classic "
    "shuffle-friendly spatial bucketing key: the groupBy shuffles "
    "(cell, user) pairs only, and any prefix length is a coarser "
    "rollup of the same key",
)
def geo_geohash(spark, sf_dir):
    """Encode-then-aggregate: one scan, per-row integer geohash (40
    codegen ops), one hash-groupBy on the cell prefix. At 100 TB the
    encode is free (map-side) and the shuffle is cell-bounded."""
    fx = _fixes(spark, sf_dir)
    ax = fx.select(
        "user_id",
        F.floor((F.col("lat") + 90.0) / 180.0 * 1048576.0)
        .cast("long")
        .alias("lat_b"),
        F.floor((F.col("lon") + 180.0) / 360.0 * 1048576.0)
        .cast("long")
        .alias("lon_b"),
    )
    zc = ax.select("user_id", F.expr(_gh_z_sql()).cast("long").alias("z"))
    gh = zc.select("user_id", F.expr(_gh_chars_sql()).alias("gh8"))
    return gh.groupBy(F.substring("gh8", 1, 5).alias("cell5")).agg(
        F.count("*").cast("long").alias("n_fixes"),
        F.countDistinct("user_id").cast("long").alias("n_vessels"),
        F.min("gh8").alias("sample_gh8"),
    )


@register(
    "geo_heading_rose",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    hops AS (
      SELECT user_id,
             LAG(lat) OVER w AS lat1, LAG(lon) OVER w AS lon1,
             LAG(ts_us) OVER w AS ts1, lat AS lat2, lon AS lon2, ts_us
      FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    hdg AS (
      SELECT CAST(FLOOR(ROUND({_BEARING_SQL}, 4) / 30.0) AS BIGINT)
               AS sector,
             ROUND({_HAV_SQL}, 4) AS km,
             user_id
      FROM hops WHERE lat1 IS NOT NULL AND ts_us > ts1)
    SELECT sector,
           CAST(sector * 30 AS BIGINT) AS from_deg,
           CAST(COUNT(*) AS BIGINT) AS n_hops,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_vessels,
           CAST(SUM(CAST(ROUND(km * 10000) AS BIGINT)) AS BIGINT)
             AS dist_dm4
    FROM hdg GROUP BY sector
    """,
    notes="traffic rose: the 12-sector (30-degree) heading histogram "
    "of every vessel hop, with hop counts, distinct vessels, and "
    "total distance per sector — the classic AIS directional-flow "
    "summary (dominant lane bearings fall straight out of it). "
    "Bearings reuse the geo_speed_course trig and are ROUNDed 4 dp "
    "BEFORE sector binning, so the bin edge is decided on the same "
    "double in both engines; distances integerize to exact "
    "tenth-of-meter units before summing (float-sum-order-free). One "
    "keyed window pass + one 12-group aggregate at any scale",
)
def geo_heading_rose(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    hops = _fixes(spark, sf_dir).select(
        "user_id",
        "ts_us",
        F.lag("lat").over(w).alias("lat1"),
        F.lag("lon").over(w).alias("lon1"),
        F.lag("ts_us").over(w).alias("ts1"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    ).where(F.col("lat1").isNotNull() & (F.col("ts_us") > F.col("ts1")))
    b = F.round(
        bearing_deg(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")),
        4,
    )
    km = F.round(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")),
        4,
    )
    hdg = hops.select(
        F.floor(b / 30.0).cast("long").alias("sector"),
        km.alias("km"),
        "user_id",
    )
    return hdg.groupBy("sector").agg(
        (F.col("sector") * 30).cast("long").alias("from_deg"),
        F.count(F.lit(1)).cast("long").alias("n_hops"),
        F.countDistinct("user_id").cast("long").alias("n_vessels"),
        F.sum(F.round(F.col("km") * 10000).cast("long"))
        .cast("long")
        .alias("dist_dm4"),
    ).select("sector", "from_deg", "n_hops", "n_vessels", "dist_dm4")


@register(
    "geo_route_deviation",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    hops AS (
      SELECT user_id, lat, lon, ts_us, event_id,
             LAG(lat) OVER w AS lat1, LAG(lon) OVER w AS lon1,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS nf
      FROM fixes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    seg AS (
      SELECT user_id, nf,
             CASE WHEN lat1 IS NULL THEN 0
                  ELSE CAST(ROUND(2 * 6371.0 * ASIN(SQRT(
                         SIN(RADIANS(lat - lat1) / 2) ^ 2
                         + COS(RADIANS(lat1)) * COS(RADIANS(lat))
                         * SIN(RADIANS(lon - lon1) / 2) ^ 2)) * 10000)
                       AS BIGINT) END AS hop_dm4,
             CASE WHEN rn = 1 THEN lat END AS flat,
             CASE WHEN rn = 1 THEN lon END AS flon,
             CASE WHEN rn = nf THEN lat END AS llat,
             CASE WHEN rn = nf THEN lon END AS llon
      FROM hops),
    agg AS (
      SELECT user_id,
             CAST(MAX(nf) AS BIGINT) AS n_fixes,
             CAST(SUM(hop_dm4) AS BIGINT) AS path_dm4,
             MAX(flat) AS lat1, MAX(flon) AS lon1,
             MAX(llat) AS lat2, MAX(llon) AS lon2
      FROM seg GROUP BY user_id),
    fin AS (
      SELECT user_id, n_fixes, path_dm4,
             CAST(ROUND({_HAV_SQL} * 10000) AS BIGINT) AS direct_dm4
      FROM agg)
    SELECT user_id, n_fixes, path_dm4, direct_dm4,
           FLOOR(CAST(path_dm4 AS DOUBLE) / direct_dm4 * 1e4) / 1e4
             AS sinuosity
    FROM fin
    WHERE n_fixes >= 3 AND direct_dm4 >= 10000
    ORDER BY user_id
    """,
    notes="route-deviation (sinuosity) index per vessel: traversed track "
    "length over the great-circle distance between first and last fix "
    "— 1.0 is a straight shot, large values flag loitering, weather "
    "routing, or position noise. Each hop is ROUNDed to an exact "
    "0.1-meter integer BEFORE the per-vessel sum (the track-length "
    "quantization discipline), so the corpus-sized accumulation is "
    "BIGINT-exact in both engines; endpoints come from the same keyed "
    "window pass that computes hops (rn=1 / rn=nf pick-offs folded "
    "through MAX — no extra scan, no self-join). Vessels with a "
    "sub-kilometer displacement are excluded (the ratio is unstable "
    "at a near-zero denominator). One keyed window + one keyed "
    "aggregate at any scale",
)
def geo_route_deviation(spark, sf_dir):
    fixes = _fixes(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wall = Window.partitionBy("user_id")
    hops = fixes.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("lat1"),
        F.lag("lon").over(w).alias("lon1"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("nf"),
    )
    hop = haversine_km(
        F.col("lat1"), F.col("lon1"), F.col("lat"), F.col("lon")
    )
    seg = hops.select(
        "user_id",
        "nf",
        F.when(F.col("lat1").isNull(), F.lit(0))
        .otherwise(F.round(hop * 10000).cast("long"))
        .alias("hop_dm4"),
        F.when(F.col("rn") == 1, F.col("lat")).alias("flat"),
        F.when(F.col("rn") == 1, F.col("lon")).alias("flon"),
        F.when(F.col("rn") == F.col("nf"), F.col("lat")).alias("llat"),
        F.when(F.col("rn") == F.col("nf"), F.col("lon")).alias("llon"),
    )
    agg = seg.groupBy("user_id").agg(
        F.max("nf").cast("long").alias("n_fixes"),
        F.sum("hop_dm4").cast("long").alias("path_dm4"),
        F.max("flat").alias("lat1"),
        F.max("flon").alias("lon1"),
        F.max("llat").alias("lat2"),
        F.max("llon").alias("lon2"),
    )
    direct = F.round(
        haversine_km(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        )
        * 10000
    ).cast("long")
    fin = agg.select(
        "user_id", "n_fixes", "path_dm4", direct.alias("direct_dm4")
    )
    return (
        fin.where((F.col("n_fixes") >= 3) & (F.col("direct_dm4") >= 10000))
        .select(
            "user_id",
            "n_fixes",
            "path_dm4",
            "direct_dm4",
            (
                F.floor(
                    F.col("path_dm4").cast("double")
                    / F.col("direct_dm4")
                    * 1e4
                )
                / 1e4
            ).alias("sinuosity"),
        )
        .orderBy("user_id")
    )


# two literal convex geofence quadrilaterals, vertices COUNTERCLOCKWISE
# (zone_id, x1,y1, x2,y2, x3,y3, x4,y4) in (lon, lat)
# NOTE: the synthetic projection makes lon ≡ 2*lat (mod 360) — every fix
# lies on that line, so zones must intersect it to be non-empty. Zone 2
# sits on the line's lat ∈ [-48, -32] stretch (lon = 2*lat ∈ [-96, -64]).
_PIP_ZONES = (
    (1, -40.0, 0.0, 0.0, -30.0, 40.0, 0.0, 0.0, 30.0),
    (2, -100.0, -48.0, -60.0, -48.0, -60.0, -32.0, -100.0, -32.0),
)

_PIP_ZONES_SQL = "zones(zone_id, x1, y1, x2, y2, x3, y3, x4, y4) AS (VALUES " + ", ".join(
    "(" + ", ".join(repr(v) for v in z) + ")" for z in _PIP_ZONES
) + ")"


@register(
    "geo_point_in_polygon",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    {_PIP_ZONES_SQL},
    hit AS (
      SELECT z.zone_id, f.user_id, f.event_id
      FROM fixes f JOIN zones z
        ON f.lon >= LEAST(z.x1, z.x2, z.x3, z.x4)
       AND f.lon <= GREATEST(z.x1, z.x2, z.x3, z.x4)
       AND f.lat >= LEAST(z.y1, z.y2, z.y3, z.y4)
       AND f.lat <= GREATEST(z.y1, z.y2, z.y3, z.y4)
       AND (z.x2 - z.x1) * (f.lat - z.y1)
           - (z.y2 - z.y1) * (f.lon - z.x1) >= 0
       AND (z.x3 - z.x2) * (f.lat - z.y2)
           - (z.y3 - z.y2) * (f.lon - z.x2) >= 0
       AND (z.x4 - z.x3) * (f.lat - z.y3)
           - (z.y4 - z.y3) * (f.lon - z.x3) >= 0
       AND (z.x1 - z.x4) * (f.lat - z.y4)
           - (z.y1 - z.y4) * (f.lon - z.x4) >= 0)
    SELECT zone_id,
           CAST(COUNT(*) AS BIGINT) AS n_fixes,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_vessels
    FROM hit GROUP BY zone_id ORDER BY zone_id
    """,
    notes="point-in-polygon containment join against two literal convex "
    "geofence quadrilaterals: a fix is inside when all four edge "
    "cross-products are non-negative (counterclockwise vertices; "
    "boundary counts as inside). The bounding-box conjuncts run "
    "first, so virtually every outside fix is rejected by four cheap "
    "comparisons before any multiply — with thousands of polygons the "
    "same query keys fixes AND polygon bboxes to grid cells "
    "(join_spatial_grid's machinery) so each fix only meets nearby "
    "polygons; two zones need only the broadcast. Coordinates are "
    "exact modular arithmetic and the cross-products are identical "
    "expression trees, so the inside set is decided on the same "
    "doubles in both engines. Row-local predicate + one keyed "
    "aggregate — no shuffle before the two-row result",
)
def geo_point_in_polygon(spark, sf_dir):
    fixes = _fixes(spark, sf_dir)
    zones = spark.createDataFrame(
        list(_PIP_ZONES),
        "zone_id int, x1 double, y1 double, x2 double, y2 double, "
        "x3 double, y3 double, x4 double, y4 double",
    )

    def edge(xa, ya, xb, yb):
        return (F.col(xb) - F.col(xa)) * (F.col("lat") - F.col(ya)) - (
            F.col(yb) - F.col(ya)
        ) * (F.col("lon") - F.col(xa))

    xs = ["x1", "x2", "x3", "x4"]
    ys = ["y1", "y2", "y3", "y4"]
    bbox = (
        (F.col("lon") >= F.least(*[F.col(c) for c in xs]))
        & (F.col("lon") <= F.greatest(*[F.col(c) for c in xs]))
        & (F.col("lat") >= F.least(*[F.col(c) for c in ys]))
        & (F.col("lat") <= F.greatest(*[F.col(c) for c in ys]))
    )
    inside = (
        (edge("x1", "y1", "x2", "y2") >= 0)
        & (edge("x2", "y2", "x3", "y3") >= 0)
        & (edge("x3", "y3", "x4", "y4") >= 0)
        & (edge("x4", "y4", "x1", "y1") >= 0)
    )
    hit = fixes.join(F.broadcast(zones), bbox & inside)
    return (
        hit.groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fixes"),
            F.countDistinct("user_id").cast("long").alias("n_vessels"),
        )
        .orderBy("zone_id")
    )


# literal transit gate (a "strait" chord across the traffic corridor):
# (lon, lat) endpoints, crossing direction signed by the cross product
_GATE = (-30.0, 15.0, 30.0, -15.0)  # gx1, gy1, gx2, gy2


@register(
    "geo_line_crossings",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL.strip()},
    hops AS (
      SELECT user_id,
             LAG(lon) OVER w AS px1, LAG(lat) OVER w AS py1,
             lon AS px2, lat AS py2
      FROM fixes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    g AS (SELECT {_GATE[0]!r} AS gx1, {_GATE[1]!r} AS gy1,
                 {_GATE[2]!r} AS gx2, {_GATE[3]!r} AS gy2),
    x AS (
      SELECT user_id,
             (gx2 - gx1) * (py2 - py1) - (gy2 - gy1) * (px2 - px1) AS dirx
      FROM hops CROSS JOIN g
      WHERE px1 IS NOT NULL
        AND ((gx2 - gx1) * (py1 - gy1) - (gy2 - gy1) * (px1 - gx1))
          * ((gx2 - gx1) * (py2 - gy1) - (gy2 - gy1) * (px2 - gx1)) < 0
        AND ((px2 - px1) * (gy1 - py1) - (py2 - py1) * (gx1 - px1))
          * ((px2 - px1) * (gy2 - py1) - (py2 - py1) * (gx2 - px1)) < 0)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_crossings,
           CAST(COUNT(*) FILTER (dirx > 0) AS BIGINT) AS n_forward,
           CAST(COUNT(*) FILTER (dirx < 0) AS BIGINT) AS n_reverse
    FROM x GROUP BY user_id ORDER BY user_id
    """,
    notes="transit-gate crossing counts per vessel: a hop crosses the "
    "literal gate segment when the two proper-intersection orientation "
    "tests disagree on both segments (strict < 0 — touch-and-go on "
    "the infinite line does not count), and the crossing direction is "
    "the sign of the gate x hop cross product (forward/reverse "
    "transit tallies — the strait-traffic statistic AIS authorities "
    "publish). All four orientation tests are identical double "
    "expression trees over exact modular coordinates. One keyed "
    "window (the shared per-vessel hop pass) + row-local sign tests "
    "+ one keyed aggregate; gates generalize to a broadcast table "
    "with bbox prefilters (geo_point_in_polygon's machinery)",
)
def geo_line_crossings(spark, sf_dir):
    gx1, gy1, gx2, gy2 = _GATE
    fixes = _fixes(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    hops = fixes.select(
        "user_id",
        F.lag("lon").over(w).alias("px1"),
        F.lag("lat").over(w).alias("py1"),
        F.col("lon").alias("px2"),
        F.col("lat").alias("py2"),
    ).where(F.col("px1").isNotNull())

    def orient(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    side_p1 = orient(
        F.lit(gx1), F.lit(gy1), F.lit(gx2), F.lit(gy2),
        F.col("px1"), F.col("py1"),
    )
    side_p2 = orient(
        F.lit(gx1), F.lit(gy1), F.lit(gx2), F.lit(gy2),
        F.col("px2"), F.col("py2"),
    )
    side_g1 = orient(
        F.col("px1"), F.col("py1"), F.col("px2"), F.col("py2"),
        F.lit(gx1), F.lit(gy1),
    )
    side_g2 = orient(
        F.col("px1"), F.col("py1"), F.col("px2"), F.col("py2"),
        F.lit(gx2), F.lit(gy2),
    )
    dirx = (F.lit(gx2) - gx1) * (F.col("py2") - F.col("py1")) - (
        F.lit(gy2) - gy1
    ) * (F.col("px2") - F.col("px1"))
    x = hops.where(
        (side_p1 * side_p2 < 0) & (side_g1 * side_g2 < 0)
    ).select("user_id", dirx.alias("dirx"))
    return (
        x.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_crossings"),
            F.count(F.when(F.col("dirx") > 0, 1))
            .cast("long")
            .alias("n_forward"),
            F.count(F.when(F.col("dirx") < 0, 1))
            .cast("long")
            .alias("n_reverse"),
        )
        .orderBy("user_id")
    )


_CPA_EPS_DEG = 0.5
_CPA_EPS_US = 3_600_000_000  # meeting definition shared with geo_encounters
_CPA_DEG_KM = 111.195  # mean meridian degree (planar small-patch approx)


@register(
    "geo_cpa",
    section="2.10",
    oracle=f"""
    WITH {_FIXES_SQL},
    seg AS (
      SELECT user_id, ts_us, lat, lon,
             LEAD(ts_us) OVER w AS t1,
             LEAD(lat) OVER w AS lat1,
             LEAD(lon) OVER w AS lon1
      FROM fixes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sv AS (
      SELECT user_id, ts_us, t1, lat, lon,
             (lat1 - lat) / ((t1 - ts_us) / 3.6e9) AS vlat,
             (lon1 - lon) / ((t1 - ts_us) / 3.6e9) AS vlon
      FROM seg WHERE t1 IS NOT NULL AND t1 > ts_us),
    meet AS (
      SELECT a.user_id AS id_a, b.user_id AS id_b,
             a.ts_us AS ta, a.t1 AS ea, a.lat AS la, a.lon AS oa,
             a.vlat AS val, a.vlon AS vao,
             b.ts_us AS tb, b.t1 AS eb, b.lat AS lb, b.lon AS ob,
             b.vlat AS vbl, b.vlon AS vbo
      FROM sv a JOIN sv b
        ON a.user_id < b.user_id
       AND ABS(a.lat - b.lat) <= {_CPA_EPS_DEG}
       AND ABS(a.lon - b.lon) <= {_CPA_EPS_DEG}
       AND ABS(a.ts_us - b.ts_us) <= {_CPA_EPS_US}
       AND LEAST(a.t1, b.t1) > GREATEST(a.ts_us, b.ts_us)),
    rel AS (
      SELECT id_a, id_b,
             GREATEST(ta, tb) AS s,
             (LEAST(ea, eb) - GREATEST(ta, tb)) / 3.6e9 AS span_h,
             (la + val * ((GREATEST(ta, tb) - ta) / 3.6e9))
               - (lb + vbl * ((GREATEST(ta, tb) - tb) / 3.6e9)) AS dplat,
             (oa + vao * ((GREATEST(ta, tb) - ta) / 3.6e9))
               - (ob + vbo * ((GREATEST(ta, tb) - tb) / 3.6e9)) AS dplon,
             val - vbl AS dvlat, vao - vbo AS dvlon
      FROM meet),
    cpa AS (
      SELECT id_a, id_b, s, span_h, dplat, dplon, dvlat, dvlon,
             CASE WHEN dvlat * dvlat + dvlon * dvlon = 0 THEN 0.0
                  ELSE LEAST(span_h, GREATEST(0.0,
                    -(dplat * dvlat + dplon * dvlon)
                     / (dvlat * dvlat + dvlon * dvlon))) END AS tstar
      FROM rel),
    scored AS (
      SELECT id_a, id_b,
             FLOOR(SQRT(POWER(dplat + tstar * dvlat, 2)
                        + POWER(dplon + tstar * dvlon, 2)) * 1e4) / 1e4
               AS cpa_deg,
             CAST(s + CAST(FLOOR(tstar * 3.6e9) AS BIGINT) AS BIGINT) AS t_cpa_us
      FROM cpa),
    best AS (
      SELECT id_a, id_b, cpa_deg, t_cpa_us,
             ROW_NUMBER() OVER (PARTITION BY id_a, id_b
                                ORDER BY cpa_deg, t_cpa_us) AS rn
      FROM scored)
    SELECT id_a, id_b, cpa_deg,
           FLOOR(cpa_deg * {_CPA_DEG_KM} * 1e2) / 1e2 AS cpa_km,
           t_cpa_us
    FROM best WHERE rn = 1
    ORDER BY id_a, id_b LIMIT 200
    """,
    notes="closest point of approach (CPA) — the AIS collision-risk "
    "refinement: for every vessel pair the grid join already flags as "
    "MEETING (fixes within 0.5 deg and 1 h, the geo_encounters "
    "predicate), take the two motion segments starting at the meeting "
    "fixes, model linear motion p(t) = p0 + v t on the overlap window, "
    "and minimize |pa - pb| analytically: t* = clamp(-(dp.dv)/|dv|^2, "
    "0, overlap). Candidates come from the encounter predicate (never "
    "all segment pairs — at scale the same double-cell grid join "
    "bounds them); per-pair the closest meeting wins with a "
    "deterministic (cpa, t) tiebreak. All inputs are exact ints / the "
    "shared synthetic projection doubles, and the CPA expression tree "
    "is written identically in both engines (bit-identical doubles, "
    "the evt_survival_km argument); outputs FLOOR 4dp (deg) / 2dp "
    "(km). Per-pair minimum-CPA table, pair-ordered limit 200",
)
def geo_cpa(spark, sf_dir):
    """The operator a collision-avoidance / near-miss-mining pipeline
    runs after encounter detection. Planar small-patch approximation in
    degree space (the meeting box is 0.5 deg wide, where flat geometry
    is within ~0.3% of great-circle for CPA-scale distances)."""
    fx = _fixes(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seg = fx.select(
        "user_id",
        "ts_us",
        "lat",
        "lon",
        F.lead("ts_us").over(w).alias("t1"),
        F.lead("lat").over(w).alias("lat1"),
        F.lead("lon").over(w).alias("lon1"),
    ).where(F.col("t1").isNotNull() & (F.col("t1") > F.col("ts_us")))
    dt_h = (F.col("t1") - F.col("ts_us")) / F.lit(3.6e9)
    sv = seg.select(
        "user_id",
        "ts_us",
        "t1",
        "lat",
        "lon",
        ((F.col("lat1") - F.col("lat")) / dt_h).alias("vlat"),
        ((F.col("lon1") - F.col("lon")) / dt_h).alias("vlon"),
    )

    # meeting candidates via the double-cell spacetime grid (the
    # geo_encounters skeleton): probes replicate to <=8 cells, homes
    # stay put, exact residual filter reproduces the meeting predicate
    def _cells(col, width):
        q = col / width
        return F.array_distinct(F.array(F.floor(q - 0.5), F.floor(q + 0.5)))

    cols_b = [
        F.col("user_id").alias("id_b"),
        F.col("ts_us").alias("tb"),
        F.col("t1").alias("eb"),
        F.col("lat").alias("lb"),
        F.col("lon").alias("ob"),
        F.col("vlat").alias("vbl"),
        F.col("vlon").alias("vbo"),
    ]
    home = sv.select(
        *cols_b,
        F.floor(F.col("lon") / (2 * _CPA_EPS_DEG)).alias("cx"),
        F.floor(F.col("lat") / (2 * _CPA_EPS_DEG)).alias("cy"),
        F.floor(F.col("ts_us") / (2 * _CPA_EPS_US)).alias("ct"),
    )
    probe = (
        sv.select(
            F.col("user_id").alias("id_a"),
            F.col("ts_us").alias("ta"),
            F.col("t1").alias("ea"),
            F.col("lat").alias("la"),
            F.col("lon").alias("oa"),
            F.col("vlat").alias("val"),
            F.col("vlon").alias("vao"),
            F.explode(_cells(F.col("lon"), 2 * _CPA_EPS_DEG)).alias("cx"),
            _cells(F.col("lat"), 2 * _CPA_EPS_DEG).alias("cys"),
            _cells(F.col("ts_us"), 2.0 * _CPA_EPS_US).alias("cts"),
        )
        .select(
            "id_a", "ta", "ea", "la", "oa", "val", "vao", "cx",
            F.explode("cys").alias("cy"), "cts",
        )
        .select(
            "id_a", "ta", "ea", "la", "oa", "val", "vao", "cx", "cy",
            F.explode("cts").alias("ct"),
        )
    )
    # shuffle_hash on the un-exploded home side — see geo_convoys
    meet = probe.join(home.hint("shuffle_hash"), ["cx", "cy", "ct"]).where(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("la") - F.col("lb")) <= _CPA_EPS_DEG)
        & (F.abs(F.col("oa") - F.col("ob")) <= _CPA_EPS_DEG)
        & (F.abs(F.col("ta") - F.col("tb")) <= _CPA_EPS_US)
        & (F.least("ea", "eb") > F.greatest("ta", "tb"))
    )
    s = F.greatest("ta", "tb")
    span_h = (F.least("ea", "eb") - s) / F.lit(3.6e9)
    dplat = (
        F.col("la") + F.col("val") * ((s - F.col("ta")) / F.lit(3.6e9))
    ) - (F.col("lb") + F.col("vbl") * ((s - F.col("tb")) / F.lit(3.6e9)))
    dplon = (
        F.col("oa") + F.col("vao") * ((s - F.col("ta")) / F.lit(3.6e9))
    ) - (F.col("ob") + F.col("vbo") * ((s - F.col("tb")) / F.lit(3.6e9)))
    dvlat = F.col("val") - F.col("vbl")
    dvlon = F.col("vao") - F.col("vbo")
    rel = meet.select(
        "id_a",
        "id_b",
        s.alias("s"),
        span_h.alias("span_h"),
        dplat.alias("dplat"),
        dplon.alias("dplon"),
        dvlat.alias("dvlat"),
        dvlon.alias("dvlon"),
    )
    dv2 = F.col("dvlat") * F.col("dvlat") + F.col("dvlon") * F.col("dvlon")
    raw_t = -(
        F.col("dplat") * F.col("dvlat") + F.col("dplon") * F.col("dvlon")
    ) / dv2
    tstar = F.when(dv2 == 0, F.lit(0.0)).otherwise(
        F.least(F.col("span_h"), F.greatest(F.lit(0.0), raw_t))
    )
    cpa = rel.select("id_a", "id_b", "s", "span_h", "dplat", "dplon",
                     "dvlat", "dvlon", tstar.alias("tstar"))
    cpa_deg = (
        F.floor(
            F.sqrt(
                F.pow(F.col("dplat") + F.col("tstar") * F.col("dvlat"), 2)
                + F.pow(F.col("dplon") + F.col("tstar") * F.col("dvlon"), 2)
            )
            * 1e4
        )
        / 1e4
    )
    scored = cpa.select(
        "id_a",
        "id_b",
        cpa_deg.alias("cpa_deg"),
        (
            F.col("s")
            + F.floor(F.col("tstar") * F.lit(3.6e9)).cast("long")
        )
        .cast("long")
        .alias("t_cpa_us"),
    )
    rn = F.row_number().over(
        Window.partitionBy("id_a", "id_b").orderBy("cpa_deg", "t_cpa_us")
    )
    return (
        scored.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "id_a",
            "id_b",
            "cpa_deg",
            (F.floor(F.col("cpa_deg") * _CPA_DEG_KM * 1e2) / 1e2).alias(
                "cpa_km"
            ),
            "t_cpa_us",
        )
        # ordered by PAIR, not by cpa: on the synthetic lon = 2*lat
        # line every crossing pair bottoms out at exactly 0.0 deg, so a
        # closest-first top-k would be 50 identical zeros (the round-6
        # degeneracy lesson) — the per-pair table keeps the value
        # distribution visible
        .orderBy("id_a", "id_b")
        .limit(200)
    )
