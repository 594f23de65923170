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
