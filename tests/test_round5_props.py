"""Independent semantic cross-checks for the round-5 statistics queries:
the DuckDB oracles prove cross-engine equality; these tests prove the
STATISTIC is the textbook one, against hand-computed / numpy references
on raw arrays or constructed fixtures."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from shippinglanes_spark.registry import all_queries


def test_welch_t_matches_numpy(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type").isin("click", "view"))
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("v"))
        .toPandas()
    )
    g1 = ev.loc[ev["event_type"] == "click", "v"].to_numpy(dtype=float)
    g2 = ev.loc[ev["event_type"] == "view", "v"].to_numpy(dtype=float)
    v1, v2 = g1.var(ddof=1) / len(g1), g2.var(ddof=1) / len(g2)
    t_ref = (g1.mean() - g2.mean()) / np.sqrt(v1 + v2)
    df_ref = (v1 + v2) ** 2 / (v1**2 / (len(g1) - 1) + v2**2 / (len(g2) - 1))
    row = all_queries()["agg_ttest_welch"].fn(spark, sf_dir).first()
    assert row.n1 == len(g1) and row.n2 == len(g2)
    assert abs(row.t_stat - t_ref) < 1e-5
    assert abs(row.df_welch - df_ref) < 1e-2


def test_cuped_matches_numpy_regression_adjustment(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.floor("value").cast("long").alias("u"),
        )
        .toPandas()
    )
    cut = np.datetime64("2024-01-16")
    pre = ev[ev["ts"].to_numpy() < cut].groupby("user_id")["u"].sum()
    post = ev[ev["ts"].to_numpy() >= cut].groupby("user_id")["u"].sum()
    users = ev["user_id"].unique()
    x = np.array([pre.get(u, 0) for u in users], dtype=float)
    y = np.array([post.get(u, 0) for u in users], dtype=float)
    theta_ref = np.cov(x, y, ddof=0)[0, 1] / x.var(ddof=0)
    adj = y - theta_ref * (x - x.mean())
    rows = {r.grp: r for r in all_queries()["agg_cuped"].fn(spark, sf_dir).collect()}
    for grp in (0, 1):
        mask = users % 2 == grp
        assert rows[grp].n_users == int(mask.sum())
        assert abs(rows[grp].post_mean - y[mask].mean()) < 1e-5
        assert abs(rows[grp].cuped_mean - adj[mask].mean()) < 1e-5
        assert abs(rows[grp].theta - theta_ref) < 1e-5
    # CUPED's point: the adjusted metric has lower variance than the raw
    assert adj.var(ddof=0) < y.var(ddof=0)


def test_kaplan_meier_hand_computed(spark, tmp_path):
    """Constructed cohort with known KM curve. 6 users, first click at
    t=0 for all; purchases at day 1 (2 users), day 3 (1 user); censored
    at day 2 (1 user, corpus ends...) — construct via event times:

    - u1, u2: click d0, purchase d1      -> death at 1
    - u3:     click d0, purchase d3      -> death at 3
    - u4, u5: click d0, no purchase      -> censored at corpus end (d4)
    - u6:     click d2, no purchase      -> censored at d2 (4 - 2)

    durations: deaths {1: 2, 3: 1}, censored {2: 1, 4: 2}; N = 6.
    KM: S(1) = 1 - 2/6 = 2/3; at t=3 risk set = 6 - (2 + 1) = 3,
    S(3) = 2/3 * (1 - 1/3) = 4/9.
    """
    import datetime

    rows = []
    eid = 0

    def add(uid, etype, day_off):
        nonlocal eid
        eid += 1
        rows.append(
            (
                eid,
                uid,
                etype,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day_off),
                1.0,
                "{}",
            )
        )

    for u in (1, 2):
        add(u, "click", 0)
        add(u, "purchase", 1)
    add(3, "click", 0)
    add(3, "purchase", 3)
    for u in (4, 5):
        add(u, "click", 0)
    add(6, "click", 2)
    add(0, "view", 4)  # pins corpus max ts at day 4
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double, props string"
    )
    p = str(tmp_path / "km")
    df.coalesce(1).write.mode("overwrite").parquet(f"{p}/events.parquet")
    out = {
        r.day: r for r in all_queries()["evt_survival_km"].fn(spark, p).collect()
    }
    assert set(out) == {1, 3}
    assert out[1].deaths == 2 and out[1].n_risk == 6
    assert out[3].deaths == 1 and out[3].n_risk == 3
    assert abs(out[1].survival - 2 / 3) < 2e-6
    assert abs(out[3].survival - 4 / 9) < 2e-6


def test_track_interp_exact_midpoints(spark, sf_dir):
    """Every interpolated point must lie between its neighbors and obey
    the linear formula; cross-checked in pandas per vessel."""
    q = all_queries()["geo_track_interp"]
    got = q.fn(spark, sf_dir).toPandas()
    assert len(got) > 0
    fx = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("user_id") % 97 == 0)
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            ((F.col("value") % 180) - 90).alias("lat"),
            (((F.col("value") * 2) % 360) - 180).alias("lon"),
        )
        .toPandas()
    )
    for uid, grp in got.groupby("user_id"):
        f = fx[fx["user_id"] == uid].sort_values("ts_us")
        ts = f["ts_us"].to_numpy()
        for _, r in grp.head(20).iterrows():
            i = np.searchsorted(ts, r.ts_us, side="right")
            assert 0 < i < len(ts)
            t0, t1 = ts[i - 1], ts[i]
            la0, la1 = f["lat"].to_numpy()[i - 1], f["lat"].to_numpy()[i]
            w = (r.ts_us - t0) / (t1 - t0)
            assert abs(r.lat_i - (la0 + (la1 - la0) * w)) < 2e-6


def test_logrank_matches_numpy_reference(spark, sf_dir):
    """O-E, V, chi2 re-derived in numpy from raw per-user durations."""
    import pandas as pd

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .toPandas()
    )
    mx = int(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .first()[0]
    )
    day_us = 86_400_000_000
    rows = []
    for uid, grp_df in ev.groupby("user_id"):
        clicks = grp_df.loc[grp_df["event_type"] == "click", "ts_us"]
        if clicks.empty:
            continue
        t_c = clicks.min()
        purch = grp_df.loc[
            (grp_df["event_type"] == "purchase") & (grp_df["ts_us"] >= t_c),
            "ts_us",
        ]
        if purch.empty:
            rows.append((uid % 2, (mx - t_c) // day_us, 0))
        else:
            rows.append((uid % 2, (purch.min() - t_c) // day_us, 1))
    df = pd.DataFrame(rows, columns=["grp", "day", "ev"])
    oe = v = 0.0
    for day in sorted(df["day"].unique()):
        at1 = int(((df["grp"] == 1) & (df["day"] >= day)).sum())
        at2 = int(((df["grp"] == 0) & (df["day"] >= day)).sum())
        d1 = int(((df["grp"] == 1) & (df["day"] == day) & (df["ev"] == 1)).sum())
        d2 = int(((df["grp"] == 0) & (df["day"] == day) & (df["ev"] == 1)).sum())
        dt, nt = d1 + d2, at1 + at2
        if dt == 0 or nt <= 1:
            continue
        oe += d1 - dt * at1 / nt
        v += dt * (at1 / nt) * (1 - at1 / nt) * (nt - dt) / (nt - 1)
    row = all_queries()["evt_logrank"].fn(spark, sf_dir).first()
    assert abs(row.o_minus_e - oe) < 1e-4
    assert abs(row.variance - v) < 1e-4
    assert abs(row.chi2 - oe * oe / v) < 1e-3
