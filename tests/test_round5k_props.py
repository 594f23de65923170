"""Independent semantic cross-checks for the round-5 session-3 batch 9
(cohort LTV, sequence-gap audit)."""

from __future__ import annotations

import pandas as pd

from shippinglanes_spark.registry import all_queries


def test_cohort_ltv_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
        .toPandas()
    )
    ev["d"] = (
        ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")
    ).dt.days.astype("int64")
    ev["rev"] = (
        (ev["value"] * 100).round().fillna(0).astype("int64")
    )
    ud = ev.groupby(["user_id", "d"])["rev"].sum().reset_index()
    fu = ud.groupby("user_id")["d"].min().rename("cohort")
    ud = ud.join(fu, on="user_id")
    ud["age"] = ud["d"] - ud["cohort"]
    aged = ud.groupby(["cohort", "age"])["rev"].sum().reset_index()
    aged = aged.sort_values(["cohort", "age"])
    aged["cum"] = aged.groupby("cohort")["rev"].cumsum()
    sizes = fu.value_counts()
    expect = {
        (int(r["cohort"]), int(r["age"])): (
            int(sizes[r["cohort"]]),
            r["cum"] / 100.0,
            r["cum"] / sizes[r["cohort"]] / 100.0,
        )
        for _, r in aged.iterrows()
    }
    out = all_queries()["evt_cohort_ltv"].fn(spark, sf_dir).collect()
    got = {
        (r.cohort_day, r.age): (r.cohort_users, r.cum_revenue, r.ltv_per_user)
        for r in out
    }
    assert got == expect
    # LTV is nondecreasing in age within a cohort (revenue is >= 0)
    for c in {c for c, _ in got}:
        curve = [got[(c, a)][2] for (cc, a) in sorted(got) if cc == c]
        assert all(x <= y + 1e-9 for x, y in zip(curve, curve[1:]))


def test_sequence_gaps_match_python(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type")
        .toPandas()
    )
    ids = sorted(ev.loc[ev["event_type"] == "click", "event_id"])
    present = set(ids)
    expect = []
    for a, b in zip(ids, ids[1:]):
        if b > a + 1:
            expect.append((a + 1, b - 1, b - 1 - a))
    out = all_queries()["profile_sequence_gaps"].fn(spark, sf_dir).collect()
    got = sorted((r.gap_start, r.gap_end, r.gap_len) for r in out)
    assert got == sorted(expect)
    assert len(got) > 0  # the filtered feed genuinely has holes
    for s, e, n in got:
        assert e >= s and n == e - s + 1
        assert s - 1 in present and e + 1 in present
        assert not any(x in present for x in range(s, min(e + 1, s + 5)))


def test_runs_test_matches_python(spark, sf_dir):
    import math

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
        sv = sum(vals)
        ups = [1 if v * n > sv else 0 for v in vals]
        n_up, n_dn = sum(ups), n - sum(ups)
        if n_up == 0 or n_dn == 0:
            continue
        runs = 1 + sum(a != b for a, b in zip(ups, ups[1:]))
        mu = 1.0 + 2.0 * n_up * n_dn / n
        sigma = math.sqrt(
            2.0 * n_up * n_dn * (2.0 * n_up * n_dn - n) / (n * n * (n - 1))
        )
        expect[et] = (
            n,
            runs,
            n_up,
            n_dn,
            math.floor((runs - mu) / sigma * 1e6) / 1e6,
        )
    out = all_queries()["agg_runs_test"].fn(spark, sf_dir).collect()
    got = {
        r.event_type: (r.n_days, r.runs, r.n_up, r.n_dn, r.z) for r in out
    }
    assert got == expect


def test_powerlaw_fit_matches_python(spark, sf_dir):
    import math

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .toPandas()
    )
    counts = ev.groupby("user_id").size()
    n = len(counts)
    xmin = int(counts.min())
    # value-grouped ln fold in value order, 0.0 seed (the query's order)
    from collections import Counter

    acc = 0.0
    for v, n_v in sorted(Counter(counts.to_list()).items()):
        acc += n_v * math.log(v * 2.0 / (2 * xmin - 1))
    alpha = round(1.0 + n / acc, 4)
    row = all_queries()["agg_powerlaw_fit"].fn(spark, sf_dir).collect()[0]
    assert row.n_users == n
    assert row.xmin == xmin
    assert abs(row.alpha_hat - alpha) <= 1e-4
    assert row.alpha_hat > 1.0  # a valid Pareto exponent
