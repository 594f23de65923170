"""Independent semantic cross-checks for the round-5 session-3 batch 6
(CUSUM drift detection, degree assortativity). The CUSUM test also
proves the prefix-min identity against the literal sequential
recurrence — the point of the rewrite."""

from __future__ import annotations

import pandas as pd

from shippinglanes_spark.registry import all_queries

from tests.test_round5b_props import _above_avg_und_edges


def test_cusum_matches_sequential_recurrence(spark, sf_dir):
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
        nd = len(daily)
        sv = int(daily.sum())
        s = 0
        best = (-1, None)  # (max cusum, earliest day)
        for d, v in daily.items():
            # the LITERAL recurrence the query claims to compute
            s = max(0, s + (int(v) * nd - sv))
            if s > best[0]:
                best = (s, int(d))
        expect[et] = (nd, best[0], best[1])
    out = all_queries()["ts_cusum"].fn(spark, sf_dir).collect()
    got = {
        r.event_type: (r.n_days, r.max_cusum_scaled, r.alarm_day)
        for r in out
    }
    assert got == expect


def test_assortativity_matches_python(spark, sf_dir):
    und = _above_avg_und_edges(spark, sf_dir)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in und] + [
        (deg[b], deg[a]) for a, b in und
    ]
    bm = len(pairs)
    sjk = sum(j * k for j, k in pairs)
    sj = sum(j for j, _ in pairs)
    sjj = sum(j * j for j, _ in pairs)
    num = bm * sjk - sj * sj
    den = bm * sjj - sj * sj
    row = all_queries()["graph_assortativity"].fn(spark, sf_dir).collect()[0]
    assert row.n_edges == len(und)
    assert row.r_num == num
    assert row.r_den == den
    if den == 0:
        assert row.assortativity is None
    else:
        assert row.assortativity == num / den
        assert -1.0 - 1e-12 <= row.assortativity <= 1.0 + 1e-12
