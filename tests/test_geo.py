"""AIS trajectory pack: invariants beyond the oracle hash-match."""

from __future__ import annotations

from pyspark.sql import functions as F

from shippinglanes_spark.operators.geo import (
    _PORT_RADIUS_KM,
    geo_density_smooth,
    geo_port_visits,
    geo_speed_course,
    geo_track_simplify,
)
from shippinglanes_spark.io import table


def test_speed_course_ranges(spark, sf_dir):
    out = geo_speed_course(spark, sf_dir).toPandas()
    assert (out["hop_km"] >= 0).all()
    assert (out["speed_kmh"] >= 0).all()
    assert ((out["course_deg"] >= 0) & (out["course_deg"] < 360)).all()
    # teleport flag is exactly the >2000 km/h predicate on the rounded speed
    assert (out["is_teleport"] == (out["speed_kmh"] > 2000.0)).all()


def test_port_visits_spans_nest(spark, sf_dir):
    out = geo_port_visits(spark, sf_dir).toPandas()
    assert (out["entry_us"] <= out["exit_us"]).all()
    assert (out["n_fixes"] >= 1).all()
    # visit numbering is dense per (vessel, port): 1..n with no holes
    for (_, _), g in out.groupby(["user_id", "port_id"]):
        ns = sorted(g["visit_n"])
        assert ns == list(range(1, len(ns) + 1))
        # consecutive visits are separated by more than the re-entry gap
        spans = g.sort_values("visit_n")[["entry_us", "exit_us"]].to_numpy()
        for prev, cur in zip(spans, spans[1:]):
            assert cur[0] - prev[1] > 6 * 3600 * 1_000_000


def test_density_smooth_dominates_center(spark, sf_dir):
    out = geo_density_smooth(spark, sf_dir).toPandas()
    # the 3x3 sum always includes the cell's own count
    assert (out["n_smooth"] >= out["n"]).all()
    assert (out["n"] > 0).all()


def test_track_simplify_keeps_endpoints(spark, sf_dir):
    fixes_per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index("user_id")["n"]
    )
    kept = geo_track_simplify(spark, sf_dir).toPandas()
    by_user = kept.groupby("user_id").size()
    # endpoints always survive -> every vessel keeps >= min(2, n) fixes,
    # and simplification must actually drop something on long tracks
    for uid, n in fixes_per_user.items():
        assert by_user.get(uid, 0) >= min(2, n)
        if n >= 50:
            assert by_user[uid] < n
