"""Independent semantic cross-checks for the round-5 session-3 batch 4
(modularity, CDC log application, peak detection)."""

from __future__ import annotations

import pandas as pd

from shippinglanes_spark.registry import all_queries


def _trade_weights(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    pdf = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .toPandas()
    )
    pdf = pdf[pdf["src"] != pdf["dst"]]
    und: dict[tuple[int, int], int] = {}
    for (a, b), n in pdf.groupby(["src", "dst"]).size().items():
        key = (min(a, b), max(a, b))
        und[key] = und.get(key, 0) + int(n)
    return und


def test_modularity_matches_python(spark, sf_dir):
    und = _trade_weights(spark, sf_dir)
    nation = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_regionkey")
        .toPandas()
    )
    com = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    m2 = 2 * sum(und.values())
    deg: dict[int, int] = {}
    for (a, b), w in und.items():
        deg[a] = deg.get(a, 0) + w
        deg[b] = deg.get(b, 0) + w
    in2: dict[int, int] = {}
    tot: dict[int, int] = {}
    for v, k in deg.items():
        tot[com[v]] = tot.get(com[v], 0) + k
    for (a, b), w in und.items():
        if com[a] == com[b]:
            in2[com[a]] = in2.get(com[a], 0) + 2 * w
    q_num = sum(
        in2.get(c_, 0) * m2 - tot[c_] * tot[c_] for c_ in tot
    )
    out = all_queries()["graph_modularity"].fn(spark, sf_dir).collect()
    got = {r.region_id: r for r in out}
    assert set(got) == set(tot)
    for c_, r in got.items():
        assert r.internal_2w == in2.get(c_, 0)
        assert r.degree_sum == tot[c_]
        assert r.contrib_num == in2.get(c_, 0) * m2 - tot[c_] * tot[c_]
        assert r.q_total == q_num / (m2 * m2)
    # modularity of a real partition is within its mathematical bounds
    assert -0.5 <= q_num / (m2 * m2) <= 1.0


def test_cdc_apply_matches_pandas(spark, sf_dir):
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .toPandas()
    )
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
        .toPandas()
    )
    o["op"] = (o["o_orderkey"] % 13 == 0).map({True: "D", False: "U"})
    latest = (
        o.sort_values("o_orderkey")
        .groupby("o_custkey")
        .agg(
            seq=("o_orderkey", "max"),
            n=("o_orderkey", "size"),
        )
        .reset_index()
    )
    last = o.set_index("o_orderkey").loc[latest["seq"]]
    latest["op"] = last["op"].to_numpy()
    latest["bal"] = last["o_totalprice"].round(2).to_numpy()
    m = c.merge(
        latest, left_on="c_custkey", right_on="o_custkey", how="left"
    )
    m = m[(m["op"].isna()) | (m["op"] != "D")]
    out = all_queries()["etl_cdc_apply"].fn(spark, sf_dir).collect()
    got = {
        r.c_custkey: (r.acctbal, r.src, r.version_count, r.last_seq)
        for r in out
    }
    assert len(got) == len(m)
    for _, row in m.iterrows():
        k = row["c_custkey"]
        if pd.isna(row["op"]):
            assert got[k] == (round(row["c_acctbal"], 2), "unchanged", 0, -1)
        else:
            assert got[k][1] == "updated"
            assert got[k][0] == round(row["bal"], 2)
            assert got[k][2] == int(row["n"])
            assert got[k][3] == int(row["seq"])


def test_peaks_matches_pandas(spark, sf_dir):
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
        days = daily.index.to_list()
        for i in range(1, len(days) - 1):
            # calendar neighbors in GRID order (the query's lag/lead)
            v, pv, nv = (
                daily.iloc[i],
                daily.iloc[i - 1],
                daily.iloc[i + 1],
            )
            if 10 * v >= 11 * pv and 10 * v >= 11 * nv:
                expect[(et, days[i])] = (
                    v / 100.0,
                    (v - pv) * 1_000_000 // pv,
                    (v - nv) * 1_000_000 // nv,
                )
    out = all_queries()["ts_peaks"].fn(spark, sf_dir).collect()
    got = {
        (r.event_type, r.day_idx): (
            r.revenue,
            r.over_prev_ppm,
            r.over_next_ppm,
        )
        for r in out
    }
    assert got == expect
