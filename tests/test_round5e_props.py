"""Independent semantic cross-checks for the round-5 session-3 batch 3
(chi-square independence, difference-in-differences, Theil-Sen slope,
quantized k-means): DuckDB oracles prove cross-engine equality; these
prove the SEMANTICS against scipy-free brute-force references."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from shippinglanes_spark.registry import all_queries


def test_chisq_matches_numpy(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type", "weekday(ts) AS dow")
        .toPandas()
    )
    tab = pd.crosstab(ev["event_type"], ev["dow"]).to_numpy().astype(float)
    n = tab.sum()
    exp = tab.sum(axis=1, keepdims=True) @ tab.sum(axis=0, keepdims=True) / n
    chi2 = ((tab - exp) ** 2 / exp).sum()
    row = all_queries()["agg_chisq_independence"].fn(spark, sf_dir).collect()[
        0
    ]
    assert row.n == int(n)
    assert row.dof == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert abs(row.chi2 - chi2) < 1e-6 * max(1.0, chi2)


def test_did_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
        .toPandas()
    )
    ev = ev[ev["value"].notna()].copy()
    ev["v"] = (ev["value"] * 100).round().astype("int64")
    ev["treated"] = ev["user_id"] % 2 == 0
    ev["post"] = ev["ts"] >= pd.Timestamp("2024-01-16")
    g = ev.groupby(["treated", "post"])["v"]
    m = {k: s.sum() / len(s) for k, s in g}
    did = (m[(True, True)] - m[(True, False)]) - (
        m[(False, True)] - m[(False, False)]
    )
    row = all_queries()["evt_did"].fn(spark, sf_dir).collect()[0]
    assert row.n_total == len(ev)
    assert row.treat_post == m[(True, True)] / 100.0
    assert row.ctrl_pre == m[(False, False)] / 100.0
    assert abs(row.did - did / 100.0) < 1e-12


def test_theil_sen_matches_python(spark, sf_dir):
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
        daily = grp.groupby("d")["v"].agg(["sum", "count"])
        days = daily.index.to_list()
        slopes = []
        for i, di in enumerate(days):
            mi = daily.loc[di, "sum"] / daily.loc[di, "count"]
            for dj in days[i + 1 :]:
                mj = daily.loc[dj, "sum"] / daily.loc[dj, "count"]
                slopes.append(((mj - mi) / (dj - di), di, dj))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        expect[et] = (len(slopes), med / 100.0)
    out = all_queries()["ts_theil_sen"].fn(spark, sf_dir).collect()
    got = {r.event_type: (r.n_pairs, r.theil_sen_slope) for r in out}
    assert got == expect


def test_kmeans_matches_numpy_lloyd(spark, sf_dir):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    x = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.int64)
    ids = emb["vec_id"].to_numpy()
    cent = x[np.argsort(ids)[:4]].copy()  # vec_id 0..3
    for _ in range(3):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties -> lowest cid (argmin semantics)
        dist = d[np.arange(len(x)), assign]
        cent = np.stack(
            [
                np.floor(
                    x[assign == k].sum(axis=0) / (assign == k).sum()
                ).astype(np.int64)
                for k in range(4)
                if (assign == k).any()
            ]
        )
    out = all_queries()["emb_kmeans_iters"].fn(spark, sf_dir).collect()
    got = {
        r.cluster_id: (r.n_members, r.centroid_l1, r.inertia) for r in out
    }
    live = sorted(set(assign))
    assert sorted(got) == live
    for pos, k in enumerate(live):
        n_k = int((assign == k).sum())
        l1_k = int(np.abs(cent[pos]).sum())
        inert_k = int(dist[assign == k].sum())
        assert got[k] == (n_k, l1_k, inert_k)
