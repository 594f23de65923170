"""Independent semantic cross-checks for the round-5 session-3 queries
(k-core peeling, Markov stationary distribution): the DuckDB oracles
prove cross-engine equality; these prove the SEMANTICS against
brute-force python references."""

from __future__ import annotations

import numpy as np
import pandas as pd

from shippinglanes_spark.registry import all_queries

from tests.test_round5b_props import _above_avg_und_edges


def test_kcore_matches_python_peeling(spark, sf_dir):
    und = _above_avg_und_edges(spark, sf_dir)
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    alive = set(nbrs)
    while True:
        drop = {v for v in alive if sum(u in alive for u in nbrs[v]) < 3}
        if not drop:
            break
        alive -= drop
    expect = {
        v: sum(u in alive for u in nbrs[v]) for v in alive
    }
    out = all_queries()["graph_kcore"].fn(spark, sf_dir).collect()
    got = {r.nation_id: r.deg_in_core for r in out}
    assert got == expect
    # a k-core member has in-core degree >= k by definition
    assert all(d >= 3 for d in got.values())


def test_markov_stationary_matches_numpy(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_id", "event_type", "ts")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["to_type"] = ev.groupby("user_id")["event_type"].shift(-1)
    bi = ev.dropna(subset=["to_type"])
    counts = bi.groupby(["event_type", "to_type"]).size()
    states = sorted(
        set(counts.index.get_level_values(0))
    )
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (f, t), n in counts.items():
        P[idx[f], idx[t]] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(8):
        pi = pi @ P
    out = all_queries()["evt_markov_stationary"].fn(spark, sf_dir).collect()
    got = {r.state: r.stationary_prob for r in out}
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - pi[idx[s]]) < 1e-5
    # a distribution: sums to 1 within rounding
    assert abs(sum(got.values()) - 1.0) < 1e-4
