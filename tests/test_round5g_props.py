"""Independent semantic cross-checks for the round-5 session-3 batch 5
(multiset set-ops, Bollinger bands, delta-method ratio CI)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from shippinglanes_spark.registry import all_queries


def test_multiset_ops_match_counters(spark, sf_dir):
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderpriority", "o_totalprice")
        .toPandas()
    )
    a = Counter(o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"])
    b = Counter(o.loc[o["o_totalprice"] > 200000, "o_custkey"])
    inter = {k: min(a[k], b[k]) for k in a if k in b and min(a[k], b[k]) > 0}
    diff = {k: a[k] - b.get(k, 0) for k in a if a[k] - b.get(k, 0) > 0}
    got_i = Counter(
        r.o_custkey
        for r in all_queries()["set_intersect_all"].fn(spark, sf_dir).collect()
    )
    got_e = Counter(
        r.o_custkey
        for r in all_queries()["set_except_all"].fn(spark, sf_dir).collect()
    )
    assert dict(got_i) == inter
    assert dict(got_e) == diff
    # multiset semantics are actually exercised: some key has mult > 1
    assert any(v > 1 for v in got_i.values()) or any(
        v > 1 for v in got_e.values()
    )


def _daily(spark, sf_dir):
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
    return ev.groupby(["event_type", "d"])["v"].sum()


def test_bollinger_matches_pandas(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    expect = {}
    for et in daily.index.get_level_values(0).unique():
        s = daily.loc[et].sort_index()
        vals = s.to_numpy()
        days = s.index.to_numpy()
        for i in range(6, len(vals)):
            win = vals[i - 6 : i].astype(object)  # python ints, no overflow
            v = int(vals[i])
            n, sx = 6, int(sum(win))
            sxx = int(sum(w * w for w in win))
            dev = v * n - sx
            var4 = 4 * (n * sxx - sx * sx)
            breach = (
                1
                if dev * dev > var4 and dev > 0
                else (-1 if dev * dev > var4 and dev < 0 else 0)
            )
            expect[(et, int(days[i]))] = (
                v / 100.0,
                sx / n / 100.0,
                n * sxx - sx * sx,
                breach,
            )
    out = all_queries()["ts_bollinger"].fn(spark, sf_dir).collect()
    got = {
        (r.event_type, r.day_idx): (
            r.revenue,
            r.ma,
            r.var_scaled_n2,
            r.breach,
        )
        for r in out
    }
    assert got == expect
    assert len(got) > 0


def test_ratio_delta_ci_matches_python(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .toPandas()
    )
    per = ev.pivot_table(
        index="user_id",
        columns="event_type",
        aggfunc="size",
        fill_value=0,
    )
    x = per.get("click", pd.Series(0, index=per.index)).astype("int64")
    y = per.get("view", pd.Series(0, index=per.index)).astype("int64")
    n = len(per)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    sxy = int((x * y).sum())
    r = sx / sy
    se = math.sqrt((sxx - 2 * r * sxy + r * r * syy) * n / (n - 1)) / sy
    row = all_queries()["agg_ratio_delta_ci"].fn(spark, sf_dir).collect()[0]
    assert row.n_users == n
    assert row.ratio == math.floor(r * 1e6) / 1e6
    assert abs(row.se - se) < 2e-6
    assert row.ci_lo <= row.ratio <= row.ci_hi
    # the delta-method se is the linearization: residual-based check
    resid = ((x - r * y) ** 2).sum()
    se2 = math.sqrt(resid * n / (n - 1)) / sy
    assert abs(se - se2) < 1e-9 * max(1.0, se)
