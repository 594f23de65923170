"""Independent semantic cross-checks for the round-5 session-2 queries
(link prediction, hamming retrieval, rolling correlation, RRF fusion,
sketch intersection): the DuckDB oracles prove cross-engine equality;
these prove the SEMANTICS against brute-force python references."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from shippinglanes_spark.registry import all_queries


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_hamming_topk_matches_numpy(spark, sf_dir):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb["vec_id"].to_numpy()
    sigs = {}
    for vid, vec in zip(ids, emb["embedding"]):
        s = 0
        for i in range(62):
            if vec[i] >= 0:
                s |= 1 << i
        sigs[vid] = s
    expect = {}
    for q in range(8):
        cands = sorted(
            (bin(sigs[v] ^ sigs[q]).count("1"), int(v)) for v in ids if v != q
        )[:5]
        expect[q] = cands
    out = all_queries()["emb_hamming_topk"].fn(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, []).append((r.rnk, r.hamming, r.vec_id))
    assert set(got) == set(range(8))
    for q in range(8):
        rows = sorted(got[q])
        assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
        assert [(h, v) for _, h, v in rows] == expect[q]


def _above_avg_und_edges(spark, sf_dir) -> set[tuple[int, int]]:
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
        .select(
            c.c_nationkey.alias("src"), s.s_nationkey.alias("dst")
        )
        .toPandas()
    )
    pdf = pdf[pdf["src"] != pdf["dst"]]
    w = pdf.groupby(["src", "dst"]).size()
    keep = w[w * len(w) >= w.sum()]
    return {
        (min(a, b), max(a, b)) for (a, b) in keep.index
    }


def test_link_prediction_brute_force(spark, sf_dir):
    und = _above_avg_und_edges(spark, sf_dir)
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expect = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in und:
                continue
            cn = len(nbrs[a] & nbrs[b])
            if cn == 0:
                continue
            union = len(nbrs[a]) + len(nbrs[b]) - cn
            expect[(a, b)] = (
                cn,
                cn * 1_000_000 // union,
                len(nbrs[a]) * len(nbrs[b]),
            )
    out = all_queries()["graph_link_prediction"].fn(spark, sf_dir).collect()
    got = {
        (r.node_a, r.node_b): (
            r.common_neighbors,
            r.jaccard_ppm,
            r.pref_attachment,
        )
        for r in out
    }
    assert got == expect
    assert len(got) > 0


def test_rolling_corr_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
        .toPandas()
    )
    uid = ev["user_id"].iloc[0]
    g = ev[ev["user_id"] == uid].sort_values(["us", "event_id"])
    x = (g["us"].diff() // 1_000_000).to_numpy(dtype=float)[1:]
    y = g["y"].to_numpy(dtype=float)[1:]
    ref = (
        pd.Series(x)
        .rolling(20, min_periods=5)
        .corr(pd.Series(y))
        .to_numpy()
    )
    out = (
        all_queries()["win_rolling_corr"]
        .fn(spark, sf_dir)
        .where(F.col("user_id") == int(uid))
        .collect()
    )
    got = {r.event_id: r.corr_ppm for r in out}
    eids = g["event_id"].to_numpy()[1:]
    assert set(got) == set(int(e) for e in eids)
    for e, r in zip(eids, ref):
        v = got[int(e)]
        if np.isnan(r):
            assert v is None
        else:
            assert v is not None and abs(v - np.floor(r * 1e6)) <= 1


def test_rrf_fusion_properties(spark, sf_dir):
    out = all_queries()["sim_rrf_fusion"].fn(spark, sf_dir).collect()
    assert [r.fused_rank for r in sorted(out, key=lambda r: r.fused_rank)] == list(
        range(1, len(out) + 1)
    )
    assert 0 < len(out) <= 20
    prev = None
    for r in sorted(out, key=lambda r: r.fused_rank):
        assert r.lex_rank is not None or r.sem_rank is not None
        score = (
            (1.0 / (60 + r.lex_rank) if r.lex_rank is not None else 0.0)
            + (1.0 / (60 + r.sem_rank) if r.sem_rank is not None else 0.0)
        )
        assert r.rrf_ppb == int(np.floor(score * 1e9))
        if prev is not None:
            assert score <= prev + 1e-18
        prev = score


def test_hll_intersection_identity_and_bound(spark, sf_dir):
    row = all_queries()["agg_hll_intersection"].fn(spark, sf_dir).first()
    assert row.exact_union == row.exact_a + row.exact_b - row.exact_intersection
    assert row.within_5pct_of_union == 1
    assert row.exact_intersection > 0


def test_round5b_plans_shapes(spark, sf_dir):
    q = all_queries()
    for name in ("graph_link_prediction", "emb_hamming_topk", "sim_rrf_fusion"):
        plan = _plan(q[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
    plan = _plan(q["sim_rrf_fusion"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_holt_matches_python_recurrence(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .toPandas()
    )
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    )
    out = {r.event_type: r for r in all_queries()["ts_holt"].fn(spark, sf_dir).collect()}
    for etype, g in daily.groupby("event_type"):
        ys = g.sort_values("day")["cents"].to_numpy(dtype=float)
        l, b = ys[0], 0.0
        for y in ys[1:]:
            l_new = (y + l + b) / 2
            b = (l_new - l + b) / 2
            l = l_new
        r = out[etype]
        assert r.n_days == len(ys)
        assert abs(r.level - round(l, 6)) < 1e-9
        assert abs(r.trend - round(b, 6)) < 1e-9
        assert abs(r.forecast_1 - round(l + b, 6)) < 1e-9


def test_dp_histogram_noise_is_laplace_shaped(spark, sf_dir):
    import hashlib
    import math

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            "user_id",
        )
        .toPandas()
    )
    truth = (
        ev.groupby(["event_type", "day"])["user_id"].nunique().to_dict()
    )
    out = all_queries()["pipeline_dp_histogram"].fn(spark, sf_dir).collect()
    assert len(out) == len(truth)
    noises = []
    for r in out:
        n = truth[(r.event_type, r.day)]
        h = hashlib.md5(f"dp:{r.event_type}|{r.day}".encode()).hexdigest()
        u = (int(h[:13], 16) + 1.0) / 4503599627370496.0
        sign = -1.0 if u < 0.5 else 1.0
        noise = -sign * math.log(max(1e-12, 1.0 - 2.0 * abs(u - 0.5)))
        assert abs(r.dp_count - round(max(0.0, n + noise), 4)) < 2e-4
        noises.append(noise)
        assert r.dp_count >= 0
    # Laplace(1) mean |noise| is 1; loose CLT band for ~dozens of buckets
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    assert 0.4 < mean_abs < 2.5
