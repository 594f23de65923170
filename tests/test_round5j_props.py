"""Independent semantic cross-checks for the round-5 session-3 batch 8
(tolerance as-of join, DAU/WAU stickiness)."""

from __future__ import annotations

import pandas as pd

from shippinglanes_spark.registry import all_queries

_TOL = 3_600_000_000


def test_asof_tolerance_matches_python(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        )
        .where("event_type IN ('view', 'click')")
        .toPandas()
    )
    ev["kind"] = (ev["event_type"] == "click").astype(int)
    expect = {}
    n_matched = n_null = 0
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts_us", "kind", "event_id"])
        last_view = None
        for _, r in grp.iterrows():
            if r["kind"] == 0:
                last_view = (int(r["event_id"]), int(r["ts_us"]))
            else:
                if (
                    last_view is not None
                    and int(r["ts_us"]) - last_view[1] <= _TOL
                ):
                    expect[int(r["event_id"])] = (
                        last_view[0],
                        int(r["ts_us"]) - last_view[1],
                    )
                    n_matched += 1
                else:
                    expect[int(r["event_id"])] = (None, None)
                    n_null += 1
    out = all_queries()["join_asof_tolerance"].fn(spark, sf_dir).collect()
    got = {r.click_id: (r.view_id, r.staleness_us) for r in out}
    assert got == expect
    # the tolerance actually bites AND matches exist (both branches live)
    assert n_matched > 0 and n_null > 0
    for vid, st in got.values():
        if st is not None:
            assert 0 <= st <= _TOL


def test_stickiness_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts")
        .toPandas()
    )
    ev["d"] = (
        ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days.astype("int64")
    ud = ev[["user_id", "d"]].drop_duplicates()
    d0 = int(ud["d"].min())
    expect = {}
    for d in sorted(ud["d"].unique()):
        if d < d0 + 6:
            continue
        dau = ud.loc[ud["d"] == d, "user_id"].nunique()
        wau = ud.loc[
            (ud["d"] >= d - 6) & (ud["d"] <= d), "user_id"
        ].nunique()
        expect[int(d)] = (dau, wau, dau / wau)
    out = all_queries()["evt_stickiness"].fn(spark, sf_dir).collect()
    got = {r.day_idx: (r.dau, r.wau, r.stickiness) for r in out}
    assert got == expect
    assert all(0 < s <= 1.0 for _, _, s in got.values())


def test_mann_kendall_matches_python(spark, sf_dir):
    import math

    from shippinglanes_spark.registry import all_queries as _aq

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "ts", "value")
        .toPandas()
    )
    ev = ev[ev["value"].notna()].copy()
    ev["v"] = (ev["value"] * 100).round().astype("int64")
    ev["d"] = (
        ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days.astype("int64")
    expect = {}
    for et, grp in ev.groupby("event_type"):
        daily = grp.groupby("d")["v"].sum().sort_index()
        vals = [int(x) for x in daily.to_numpy()]
        n = len(vals)
        s = sum(
            (1 if vals[j] > vals[i] else (-1 if vals[j] < vals[i] else 0))
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        tie_corr = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(vals).values()
            if t > 1
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie_corr
        sd = math.sqrt(var18 / 18.0)
        z = (s - 1) / sd if s > 0 else ((s + 1) / sd if s < 0 else 0.0)
        expect[et] = (n, s, var18, math.floor(z * 1e6) / 1e6)
    out = _aq()["ts_mann_kendall"].fn(spark, sf_dir).collect()
    got = {r.event_type: (r.n_days, r.s_stat, r.var18, r.z) for r in out}
    assert got == expect
