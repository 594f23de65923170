"""Independent semantic cross-checks for the round-5 session-5 stats
batch (Kendall tau-b, Kruskal-Wallis H): the DuckDB oracles prove
cross-engine equality; these prove the SEMANTICS against brute-force
pure-python/pandas references that share no formulation with either
engine (literal pair loops, average-rank method)."""

from __future__ import annotations

import math

import pandas as pd

from shippinglanes_spark.registry import all_queries


def _events_values(spark, sf_dir) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type",
            "CAST(ts AS DATE) AS day",
            "CAST(ROUND(value * 100) AS BIGINT) AS cents",
        )
        .where("value IS NOT NULL")
        .toPandas()
    )


def test_kendall_tau_matches_pair_loop(spark, sf_dir):
    ev = _events_values(spark, sf_dir)
    daily = (
        ev.groupby(["event_type", "day"])
        .agg(x=("cents", "size"), y=("cents", "sum"))
        .reset_index()
    )
    got = {
        r.event_type: r
        for r in all_queries()["agg_kendall_tau"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(daily["event_type"].unique())
    for et, grp in daily.groupby("event_type"):
        xs = list(grp.sort_values("day")["x"])
        ys = list(grp.sort_values("day")["y"])
        n = len(xs)
        s = nx0 = ny0 = n0 = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx, dy = xs[j] - xs[i], ys[j] - ys[i]
                n0 += 1
                if dx == 0:
                    nx0 += 1
                if dy == 0:
                    ny0 += 1
                if dx * dy > 0:
                    s += 1
                elif dx * dy < 0:
                    s -= 1
        r = got[et]
        assert (r.n_pairs, r.s_stat) == (n0, s)
        tau = s / math.sqrt((n0 - nx0) * (n0 - ny0))
        assert abs(r.tau_b - tau) < 2e-6  # engine floors at 6 dp


def test_kruskal_wallis_matches_rank_reference(spark, sf_dir):
    ev = _events_values(spark, sf_dir)
    ranks = ev["cents"].rank(method="average")
    n = len(ev)
    rsum = 0.0
    for _, idx in ev.groupby("event_type").groups.items():
        rg = ranks.loc[idx]
        rsum += rg.sum() ** 2 / len(rg)
    h = 12.0 * rsum / (n * (n + 1)) - 3 * (n + 1)
    counts = ev["cents"].value_counts()
    tc = 1.0 - sum(c**3 - c for c in counts) / (n**3 - n)
    row = all_queries()["agg_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert row.n_rows == n
    assert row.k_groups == ev["event_type"].nunique()
    assert abs(row.h_stat - h) < 1e-5
    assert abs(row.h_corrected - h / tc) < 1e-5


def test_node2vec_pairs_match_walk_recount(spark, sf_dir):
    from collections import Counter, defaultdict

    walks = all_queries()["graph_random_walks"].fn(spark, sf_dir).collect()
    seq = defaultdict(dict)
    for r in walks:
        seq[r.walk_id][r.step] = r.node
    ref = Counter()
    for s in seq.values():
        steps = sorted(s)
        for i in steps:
            for j in steps:
                if i != j and 1 <= abs(i - j) <= 2:
                    ref[(s[i], s[j])] += 1
    got = {
        (r.center, r.context): r.n_pairs
        for r in all_queries()["graph_node2vec_pairs"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == dict(ref)


def test_mcnemar_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type = 'purchase' AND CAST(ts AS DATE) < DATE '2024-01-16' AS p1",
            "event_type = 'purchase' AND CAST(ts AS DATE) >= DATE '2024-01-16' AS p2",
        )
        .toPandas()
    )
    u = ev.groupby("user_id").agg(x=("p1", "max"), y=("p2", "max"))
    b = int((u["x"] & ~u["y"]).sum())
    c = int((~u["x"] & u["y"]).sum())
    row = all_queries()["agg_mcnemar"].fn(spark, sf_dir).collect()[0]
    assert (row.n_users, row.b, row.c) == (len(u), b, c)
    assert row.n11 == int((u["x"] & u["y"]).sum())
    if b + c:
        assert abs(row.chi2 - (b - c) ** 2 / (b + c)) < 2e-6
    else:
        assert row.chi2 is None


def test_levene_matches_brute_force(spark, sf_dir):
    ev = _events_values(spark, sf_dir)
    groups = {}
    for g, grp in ev.groupby("event_type"):
        vs = sorted(grp["cents"])
        med = vs[(len(vs) + 1) // 2 - 1]  # lower median (rank pick)
        groups[g] = [abs(v - med) for v in vs]
    k = len(groups)
    tn = sum(len(z) for z in groups.values())
    gmean = sum(sum(z) for z in groups.values()) / tn
    sb = sum(len(z) * (sum(z) / len(z) - gmean) ** 2 for z in groups.values())
    sw = sum(
        sum((x - sum(z) / len(z)) ** 2 for x in z) for z in groups.values()
    )
    w_ref = ((tn - k) / (k - 1)) * (sb / sw)
    row = all_queries()["agg_levene"].fn(spark, sf_dir).collect()[0]
    assert (row.k_groups, row.n_rows) == (k, tn)
    assert abs(row.w_stat - w_ref) < 1e-5


def test_pacf_matches_durbin_levinson_reference(spark, sf_dir):
    import numpy as np

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("date_trunc('day', ts) AS day")
        .groupBy("day")
        .count()
        .orderBy("day")
        .toPandas()["count"]
        .to_numpy(dtype=float)
    )

    def r(k):
        return np.corrcoef(daily[k:], daily[:-k])[0, 1]

    r1, r2, r3 = r(1), r(2), r(3)
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    row = all_queries()["ts_pacf"].fn(spark, sf_dir).collect()[0]
    assert abs(row.pacf1 - r1) < 2e-6
    assert abs(row.pacf2 - phi22) < 2e-6
    assert abs(row.pacf3 - pacf3) < 2e-6


def test_propensity_matching_matches_brute_force(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "event_type")
        .toPandas()
    )
    u = ev.groupby("user_id").agg(
        n_purch=("event_type", lambda s: (s == "purchase").sum()),
        n_click=("event_type", lambda s: (s == "click").sum()),
        n_cov=("event_type", lambda s: (s != "purchase").sum()),
    )
    u = u[u["n_cov"] > 0]
    u["score"] = u["n_click"] * 1_000_000 // u["n_cov"]
    u["band"] = u["score"] // 100_000
    got = {
        r.treated_uid: r
        for r in all_queries()["evt_propensity_matching"]
        .fn(spark, sf_dir)
        .collect()
    }
    treated = u[u["n_purch"] > 0]
    assert set(got) == set(treated.index)
    controls = u[u["n_purch"] == 0]
    for uid, row in treated.iterrows():
        cb = controls[controls["band"] == row["band"]]
        r = got[uid]
        assert r.treated_score == row["score"] and r.band == row["band"]
        if cb.empty:
            assert r.control_uid is None and r.score_gap is None
            continue
        # prev = last control in (score, uid) order with score <= t;
        # next = first with score > t; nearer wins, ties to prev
        ordered = sorted(zip(cb["score"], cb.index))
        prev = [c for c in ordered if c[0] <= row["score"]]
        nxt = [c for c in ordered if c[0] > row["score"]]
        if not prev:
            exp_uid, exp_gap = nxt[0][1], nxt[0][0] - row["score"]
        elif not nxt:
            exp_uid, exp_gap = prev[-1][1], row["score"] - prev[-1][0]
        else:
            back = row["score"] - prev[-1][0]
            fwd = nxt[0][0] - row["score"]
            if back <= fwd:
                exp_uid, exp_gap = prev[-1][1], back
            else:
                exp_uid, exp_gap = nxt[0][1], fwd
        assert (r.control_uid, r.score_gap) == (exp_uid, exp_gap), uid


def test_betweenness_matches_brandes_reference(spark, sf_dir):
    """Pure-python Brandes (backward dependency accumulation) vs the
    engine's all-triples formulation — genuinely different algorithms
    for the same quantity."""
    from collections import defaultdict, deque

    from shippinglanes_spark.operators.graph import _trade_und

    adj = defaultdict(set)
    for r in _trade_und(spark, sf_dir).collect():
        adj[r.a].add(r.b)
        adj[r.b].add(r.a)
    bt = defaultdict(float)
    for s in adj:
        # single-source shortest paths + sigma
        dist, sigma, preds = {s: 0}, {s: 1.0}, defaultdict(list)
        order, q = [], deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[u]
                    preds[w].append(u)
        delta = defaultdict(float)
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                bt[w] += delta[w]
    got = {
        r.nation_id: r.betweenness
        for r in all_queries()["graph_betweenness"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(adj)
    for v in adj:
        # Brandes counts each unordered pair twice (once per endpoint)
        assert abs(got[v] - bt[v] / 2.0) < 1e-4, v


def test_betweenness_local_path_matches_distributed(spark, sf_dir):
    """The size-gated driver fast path must be BIT-identical to the
    distributed level-synchronous plan it replaces (same float fold
    order, same long->double casts) — the divergence guard for the
    round-11 fast path."""
    from shippinglanes_spark.operators.graph import (
        _betweenness_distributed,
        _trade_und,
    )
    from shippinglanes_spark.registry import all_queries

    got = sorted(
        tuple(r)
        for r in all_queries()["graph_betweenness"].fn(spark, sf_dir).collect()
    )
    dist = sorted(
        tuple(r)
        for r in _betweenness_distributed(
            spark, _trade_und(spark, sf_dir)
        ).collect()
    )
    assert got == dist


def test_closeness_and_eccentricity_local_match_distributed(spark, sf_dir):
    """Same divergence guard for the other two BFS-family fast paths."""
    from shippinglanes_spark.operators.graph import (
        _closeness_distributed,
        _eccentricity_distributed,
        _trade_und,
    )
    from shippinglanes_spark.registry import all_queries

    und = _trade_und(spark, sf_dir)
    for name, dfn in [
        ("graph_closeness", _closeness_distributed),
        ("graph_eccentricity", _eccentricity_distributed),
    ]:
        got = sorted(
            tuple(r) for r in all_queries()[name].fn(spark, sf_dir).collect()
        )
        ref = sorted(tuple(r) for r in dfn(spark, und).collect())
        assert got == ref, name


def test_trade_cc_local_matches_distributed(spark, sf_dir):
    """Divergence guard for graph_connected_components' union-find fast
    path vs the distributed batched min-label loop."""
    from shippinglanes_spark.operators.graph import (
        _trade_cc_distributed,
        _trade_cc_edges,
    )
    from shippinglanes_spark.registry import all_queries

    got = sorted(
        tuple(r)
        for r in all_queries()["graph_connected_components"]
        .fn(spark, sf_dir)
        .collect()
    )
    ref = sorted(
        tuple(r)
        for r in _trade_cc_distributed(
            spark, _trade_cc_edges(spark, sf_dir)
        ).collect()
    )
    assert got == ref


def test_transitivity_local_matches_distributed(spark, sf_dir):
    """Divergence guard for graph_transitivity's all-integer driver
    fast path vs the distributed oriented-edge triangle join (the
    round-12 fast path). Also asserts the gate actually FIRES on the
    fixture so the guard can't degenerate to distributed==distributed."""
    from shippinglanes_spark.operators.graph import (
        _trade_und,
        _transitivity_distributed,
        _und_local_edges,
    )
    from shippinglanes_spark.registry import all_queries

    und = _trade_und(spark, sf_dir)
    assert _und_local_edges(und) is not None  # fixture must take the gate
    got = sorted(
        tuple(r)
        for r in all_queries()["graph_transitivity"].fn(spark, sf_dir).collect()
    )
    ref = sorted(tuple(r) for r in _transitivity_distributed(und).collect())
    assert got == ref
    assert got and got[0][0] > 0  # fixture has triangles: non-vacuous


def test_lpa_and_conductance_local_match_distributed(spark, sf_dir):
    """Divergence guard for the LPA-family fast paths."""
    from pyspark.sql import functions as F

    from shippinglanes_spark.operators.graph import (
        _conductance_distributed,
        _lpa_backbone,
        _lpa_distributed,
    )
    from shippinglanes_spark.registry import all_queries

    u = _lpa_backbone(spark, sf_dir)
    labels_dist = _lpa_distributed(spark, u)
    got_lpa = sorted(
        tuple(r)
        for r in all_queries()["graph_label_propagation"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert got_lpa == sorted(tuple(r) for r in labels_dist.collect())
    got_cond = sorted(
        tuple(r)
        for r in all_queries()["graph_conductance"].fn(spark, sf_dir).collect()
    )
    ref_cond = sorted(
        tuple(r)
        for r in _conductance_distributed(
            spark,
            u,
            labels_dist.select(
                F.col("nation_id").alias("v"), F.col("community").alias("lbl")
            ),
        ).collect()
    )
    assert got_cond == ref_cond


def test_cohen_kappa_matches_confusion_reference(spark, sf_dir):
    from shippinglanes_spark.registry import all_queries as Q

    pred = {
        r.doc_id: r.pred_lang
        for r in Q()["text_langid"].fn(spark, sf_dir).collect()
    }
    truth = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "lang")
        .collect()
    )
    n = len(pred)
    agree = sum(1 for k, v in pred.items() if truth[k] == v)
    from collections import Counter

    sup = Counter(truth[k] for k in pred)
    prd = Counter(pred.values())
    src = sum(sup[c] * prd.get(c, 0) for c in set(sup) | set(prd))
    row = all_queries()["pipeline_cohen_kappa"].fn(spark, sf_dir).collect()[0]
    assert (row.n_docs, row.agree) == (n, agree)
    kappa = (n * agree - src) / (n * n - src)
    assert abs(row.kappa - kappa) < 2e-6


def test_eccentricity_matches_bfs_reference(spark, sf_dir):
    from collections import defaultdict, deque

    from shippinglanes_spark.operators.graph import _trade_und

    adj = defaultdict(set)
    for r in _trade_und(spark, sf_dir).collect():
        adj[r.a].add(r.b)
        adj[r.b].add(r.a)
    ecc = {}
    for s in adj:
        dist, q = {s: 0}, deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        ecc[s] = max(dist.values())
    dia, rad = max(ecc.values()), min(ecc.values())
    got = all_queries()["graph_eccentricity"].fn(spark, sf_dir).collect()
    assert {r.nation_id: r.ecc for r in got} == ecc
    for r in got:
        assert (r.diameter, r.radius) == (dia, rad)
        assert r.is_peripheral == int(ecc[r.nation_id] == dia)
        assert r.is_central == int(ecc[r.nation_id] == rad)


def test_permutation_entropy_matches_reference(spark, sf_dir):
    import math
    from collections import Counter

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type", "date_trunc('day', ts) AS day")
        .groupBy("event_type", "day")
        .count()
        .orderBy("event_type", "day")
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r["count"])
    got = {
        r.event_type: r
        for r in all_queries()["ts_permutation_entropy"]
        .fn(spark, sf_dir)
        .collect()
    }
    for et, xs in series.items():
        codes = Counter(
            4 * (xs[i] > xs[i + 1])
            + 2 * (xs[i] > xs[i + 2])
            + (xs[i + 1] > xs[i + 2])
            for i in range(len(xs) - 2)
        )
        nt = sum(codes.values())
        h = -sum(c / nt * math.log(c / nt) for c in codes.values())
        r = got[et]
        assert (r.n_triples, r.n_patterns) == (nt, len(codes))
        assert abs(r.entropy - h) < 1e-3  # engine rounds 4 dp
        assert abs(r.entropy_norm - h / math.log(6)) < 1e-3


def test_semdedup_matches_numpy_reference(spark, sf_dir):
    """Full numpy re-implementation: quantized Lloyd (2 iters, k=_SD_K,
    first-k init), within-cluster cosine >= 0.3 pair graph, union-find
    components, keep the member farthest from its centroid."""
    import numpy as np

    from shippinglanes_spark.functions.pipeline import _SD_K

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    ids = emb["vec_id"].to_numpy()
    X = np.floor(np.stack(emb["embedding"].to_numpy()) * 1e6).astype(
        np.int64
    )
    cent = X[np.argsort(ids)[:_SD_K]]
    for it in range(2):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)  # ties to lower cid via argmin
        dist = d2[np.arange(len(X)), cid]
        if it < 1:
            # Guard the fixture assumption loudly: the Spark pipeline drops an
            # empty Lloyd cluster from the groupBy while this reference would
            # divide by zero — if the fixture or _SD_K ever makes a cluster
            # empty, fail with a clear message instead of NaN centroids.
            assert all((cid == c).any() for c in range(_SD_K)), (
                "empty Lloyd cluster in numpy semdedup reference; "
                "fixture/_SD_K changed — reference and Spark semantics "
                "diverge here (Spark drops empty clusters)"
            )
            cent = np.stack(
                [
                    np.floor(X[cid == c].sum(axis=0) / (cid == c).sum())
                    for c in range(_SD_K)
                ]
            ).astype(np.int64)
    Xf = X.astype(float)
    nn = (Xf * Xf).sum(axis=1)
    parent = {int(i): int(i) for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cid[i] != cid[j]:
                continue
            cos = round(
                float(Xf[i] @ Xf[j]) / math.sqrt(nn[i] * nn[j]), 4
            )
            if cos >= 0.3:
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    grp = {int(i): find(int(i)) for i in ids}
    by_grp = {}
    order = {int(i): (int(-dist[k]), int(i)) for k, i in enumerate(ids)}
    for i in ids:
        g = grp[int(i)]
        by_grp.setdefault(g, []).append(int(i))
    keep = {
        g: min(members, key=lambda m: order[m])
        for g, members in by_grp.items()
    }
    got = {
        r.vec_id: r
        for r in all_queries()["pipeline_semdedup"].fn(spark, sf_dir).collect()
    }
    assert set(got) == {int(i) for i in ids}
    for k, i in enumerate(ids):
        r = got[int(i)]
        assert r.cluster_id == cid[k], i
        assert r.group_id == grp[int(i)], i
        assert r.keep == int(keep[grp[int(i)]] == int(i)), i


def test_isotropy_matches_numpy_pairwise(spark, sf_dir):
    """The one-pass ||sum u||^2 identity vs the literal O(n^2) pairwise
    mean over the SAME quantized unit vectors."""
    import numpy as np

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.stack(emb["embedding"].to_numpy()).astype(float)
    U = np.floor(X / np.sqrt((X * X).sum(axis=1, keepdims=True)) * 1e6)
    G = U @ U.T
    n = len(U)
    mean_cos = (G.sum() - np.trace(G)) / (n * (n - 1)) / 1e12
    row = all_queries()["emb_isotropy"].fn(spark, sf_dir).collect()[0]
    assert row.n_vecs == n
    assert abs(row.mean_cosine - mean_cos) < 5e-6


def test_hurst_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "datediff(CAST(ts AS DATE), DATE '2024-01-01') AS dd",
            "CAST(ROUND(value * 100) AS BIGINT) AS cents",
        )
        .where("value IS NOT NULL")
        .groupBy("dd")
        .sum("cents")
        .orderBy("dd")
        .toPandas()
    )
    s = dict(zip(daily["dd"], daily["sum(cents)"]))
    ks, ys = [], []
    for k, m in enumerate((1, 2, 4, 8)):
        blocks = {}
        for dd, val in s.items():
            blocks.setdefault(dd // m, []).append(val)
        sums = [sum(v) for v in blocks.values() if len(v) == m]
        if len(sums) < 2:
            continue
        means = np.array(sums, dtype=float) / m
        var = means.var()  # population variance, matches (nb*s2-s1^2)/nb^2
        if var > 0:
            ks.append(k)
            ys.append(np.log(var))
    slope = np.polyfit(ks, ys, 1)[0]
    h = 1 + slope / (2 * np.log(2))
    row = all_queries()["agg_hurst"].fn(spark, sf_dir).collect()[0]
    assert row.n_scales == len(ks)
    assert abs(row.hurst - h) < 1e-3  # engine rounds 4 dp


def test_power_analysis_matches_closed_form(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(ts AS DATE) < DATE '2024-01-16' AS early",
            "event_type = 'purchase' AND CAST(ROUND(value*100) AS BIGINT) >= 5000 AS p",
        )
        .toPandas()
    )
    ev["pe"] = ev["early"] & ev["p"]
    ev["late"] = ~ev["early"]
    ev["pl"] = ev["late"] & ev["p"]
    g = ev.groupby("user_id")[["early", "pe", "late", "pl"]].max()
    n1, x1 = int(g["early"].sum()), int(g["pe"].sum())
    n2, x2 = int(g["late"].sum()), int(g["pl"].sum())
    p1, p2 = x1 / n1, x2 / n2
    rows = all_queries()["agg_power_analysis"].fn(spark, sf_dir).collect()
    if p1 == p2:
        assert rows == []
        return
    za, zb = 1.959963984540054, 0.8416212335729143
    n_req = math.ceil(
        (za + zb) ** 2 * (p1 * (1 - p1) + p2 * (1 - p2)) / (p1 - p2) ** 2
    )
    row = rows[0]
    assert (row.n1, row.x1, row.n2, row.x2) == (n1, x1, n2, x2)
    assert row.n_required_per_arm == n_req


def test_burstiness_matches_pandas(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "text")
        .toPandas()
    )
    from collections import Counter, defaultdict

    n_docs = len(docs)
    per_term = defaultdict(list)
    for _, r in docs.iterrows():
        for tok, c in Counter(t for t in r["text"].split(" ") if t).items():
            per_term[tok].append(c)
    rows = all_queries()["text_burstiness"].fn(spark, sf_dir).collect()
    assert len(rows) == 30
    dfs = sorted(((len(v), t) for t, v in per_term.items()), reverse=False)
    top = sorted(per_term.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:30]
    assert [r.token for r in rows] == [t for t, _ in top]
    for r in rows:
        cs = per_term[r.token]
        s, ss = sum(cs), sum(c * c for c in cs)
        mean = s / n_docs
        vmr = (ss / n_docs - mean * mean) / mean
        assert (r.df, r.total_tf) == (len(cs), s)
        assert abs(r.burstiness - vmr) < 2e-6


def test_rich_club_matches_python_reference(spark, sf_dir):
    from collections import defaultdict

    from shippinglanes_spark.operators.graph import _trade_und

    edges = {(r.a, r.b) for r in _trade_und(spark, sf_dir).collect()}
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {
        r.k: r
        for r in all_queries()["graph_rich_club"].fn(spark, sf_dir).collect()
    }
    for k in set(deg.values()):
        rich = {v for v, d in deg.items() if d > k}
        if len(rich) < 2:
            assert k not in got
            continue
        e = sum(1 for a, b in edges if a in rich and b in rich)
        r = got[k]
        assert (r.n_rich, r.e_rich) == (len(rich), e)
        assert r.phi_ppm == e * 2_000_000 // (len(rich) * (len(rich) - 1))


def test_js_divergence_matches_python_reference(spark, sf_dir):
    from collections import Counter

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("source", "text")
        .where("source IN ('src0', 'src1')")
        .toPandas()
    )
    ca, cb = Counter(), Counter()
    for _, r in docs.iterrows():
        (ca if r["source"] == "src0" else cb).update(
            t for t in r["text"].split(" ") if t
        )
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    kla = klb = 0.0
    for t in vocab:
        pa, pb = ca.get(t, 0) / na, cb.get(t, 0) / nb
        if pa > 0:
            kla += pa * math.log(2 * pa / (pa + pb))
        if pb > 0:
            klb += pb * math.log(2 * pb / (pa + pb))
    jsd = (kla + klb) / (2 * math.log(2))
    row = all_queries()["text_js_divergence"].fn(spark, sf_dir).collect()[0]
    assert row.n_terms == len(vocab)
    assert abs(row.jsd_bits - jsd) < 1e-3
    assert 0.0 <= row.jsd_bits <= 1.0  # JS in bits is bounded by 1


def test_srm_matches_md5_reference(spark, sf_dir):
    import hashlib

    users = {
        r.user_id
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    }
    n0 = sum(
        1
        for u in users
        if int(hashlib.md5(f"srm:{u}".encode()).hexdigest()[:13], 16) % 2
        == 0
    )
    n1 = len(users) - n0
    row = all_queries()["evt_ab_srm"].fn(spark, sf_dir).collect()[0]
    assert (row.n0, row.n1) == (n0, n1)
    chi = (n0 - n1) ** 2 / (n0 + n1)
    assert abs(row.chi2 - chi) < 2e-6
    assert row.srm_detected == int(chi > 3.841458820694124)


def test_bridges_match_python_reference(spark, sf_dir):
    from collections import defaultdict, deque

    from shippinglanes_spark.operators.graph import _trade_und

    edges = {(r.a, r.b) for r in _trade_und(spark, sf_dir).collect()}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def connected_without(a, b):
        seen, q = {a}, deque([a])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if (u, w) in ((a, b), (b, a)):
                    continue
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        return b in seen

    got = {
        (r.a, r.b): r.is_bridge
        for r in all_queries()["graph_bridges"].fn(spark, sf_dir).collect()
    }
    assert set(got) == edges
    for a, b in edges:
        assert got[(a, b)] == int(not connected_without(a, b)), (a, b)


def test_seasonal_strength_matches_pandas(spark, sf_dir):
    import numpy as np

    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderpriority AS series",
            "datediff(o_orderdate, DATE '1995-01-01') AS d",
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("series", "d")
        .sum("cents")
        .orderBy("series", "d")
        .toPandas()
        .rename(columns={"sum(cents)": "v"})
    )
    got = {
        r.series: r
        for r in all_queries()["ts_seasonal_strength"]
        .fn(spark, sf_dir)
        .collect()
    }
    for series, g in daily.groupby("series"):
        v = g["v"].to_numpy(dtype=float)
        d = g["d"].to_numpy()
        trend = np.floor(
            np.convolve(v, np.ones(7), "valid") / 7.0
        )  # full 7-windows only
        detr = v[3:-3] - trend
        dows = d[3:-3] % 7
        seas = {k: detr[dows == k].mean() for k in set(dows)}
        resid = detr - np.array([seas[k] for k in dows])
        var_r = resid.var()
        var_d = detr.var()
        if var_d <= 0:
            assert series not in got
            continue
        fs = max(0.0, 1 - var_r / var_d)
        r = got[series]
        assert r.n_days == len(detr)
        assert abs(r.seasonal_strength - fs) < 2e-4


def test_transitivity_matches_python_reference(spark, sf_dir):
    from collections import defaultdict
    from itertools import combinations

    from shippinglanes_spark.operators.graph import _trade_und

    edges = {(r.a, r.b) for r in _trade_und(spark, sf_dir).collect()}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if a < b < c
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    row = all_queries()["graph_transitivity"].fn(spark, sf_dir).collect()[0]
    assert (row.n_tri, row.n_wedges) == (tri, wedges)
    assert row.transitivity_ppm == 3 * tri * 1_000_000 // wedges


def test_heading_rose_matches_pandas(spark, sf_dir):
    import numpy as np

    fx = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
            "(value % 180) - 90 AS lat",
            "((value * 2) % 360) - 180 AS lon",
        )
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )
    from collections import defaultdict

    agg = defaultdict(lambda: [0, set(), 0])
    for _, g in fx.groupby("user_id"):
        rows = g.to_numpy()
        for i in range(1, len(rows)):
            _, _, t1, la1, lo1 = rows[i - 1]
            uid, _, t2, la2, lo2 = rows[i]
            if t2 <= t1:
                continue
            rla1, rla2 = np.radians(la1), np.radians(la2)
            dlon = np.radians(lo2 - lo1)
            y = np.sin(dlon) * np.cos(rla2)
            x = np.cos(rla1) * np.sin(rla2) - np.sin(rla1) * np.cos(
                rla2
            ) * np.cos(dlon)
            brg = (np.degrees(np.arctan2(y, x)) % 360 + 360) % 360
            km = (
                2
                * 6371.0
                * np.arcsin(
                    np.sqrt(
                        np.sin(np.radians(la2 - la1) / 2) ** 2
                        + np.cos(rla1)
                        * np.cos(rla2)
                        * np.sin(dlon / 2) ** 2
                    )
                )
            )
            sec = int(np.floor(round(brg, 4) / 30.0))
            a = agg[sec]
            a[0] += 1
            a[1].add(uid)
            a[2] += int(np.floor(round(km, 4) * 10000 + 0.5))
    got = {
        r.sector: r
        for r in all_queries()["geo_heading_rose"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for sec, (n, users, dist) in agg.items():
        r = got[sec]
        assert (r.n_hops, r.n_vessels, r.from_deg) == (n, len(users), sec * 30)
        assert r.dist_dm4 == dist


def test_burstiness_coefficient_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type",
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
            "event_id",
        )
        .toPandas()
        .sort_values(["event_type", "user_id", "ts_us", "event_id"])
    )
    got = {
        r.event_type: r
        for r in all_queries()["evt_burstiness"].fn(spark, sf_dir).collect()
    }
    for et, g in ev.groupby("event_type"):
        gaps = []
        for _, u in g.groupby("user_id"):
            ts = list(u["ts_us"])
            gaps += [(b - a) // 60_000_000 for a, b in zip(ts, ts[1:])]
        if not gaps:
            continue
        n = len(gaps)
        mu = sum(gaps) / n
        var = (n * sum(x * x for x in gaps) - sum(gaps) ** 2) / n**2
        sigma = math.sqrt(var)
        if sigma + mu <= 0:
            assert et not in got
            continue
        r = got[et]
        assert r.n_gaps == n
        assert abs(r.mean_gap_min - mu) < 2e-4
        assert abs(r.burstiness - (sigma - mu) / (sigma + mu)) < 2e-6


def test_pagerank_and_hits_local_match_distributed(spark, sf_dir):
    """Divergence guard for the score-iteration fast paths (pagerank,
    HITS): the size-gated driver replica must produce the same ROUND-6dp
    relation as the distributed iterative plan it replaces."""
    from pyspark.sql import functions as F

    from shippinglanes_spark.operators.graph import (
        _hits_distributed,
        _pagerank_distributed,
    )
    from shippinglanes_spark.io import table
    from shippinglanes_spark.registry import all_queries

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint()
    )
    nodes = n.select(F.col("n_nationkey").alias("id"))

    got_pr = sorted(
        tuple(r)
        for r in all_queries()["graph_pagerank"].fn(spark, sf_dir).collect()
    )
    ref_pr = sorted(
        tuple(r) for r in _pagerank_distributed(spark, edges, nodes).collect()
    )
    assert got_pr == ref_pr

    got_h = sorted(
        tuple(r)
        for r in all_queries()["graph_hits"].fn(spark, sf_dir).collect()
    )
    ref_h = sorted(
        tuple(r) for r in _hits_distributed(spark, edges, nodes).collect()
    )
    assert got_h == ref_h


def test_bridges_local_matches_distributed(spark, sf_dir):
    """Divergence guard for the graph_bridges size-gated fast path: the
    driver-side per-edge BFS (edge excluded both directions, depth
    capped at _CL_ITERS) must reproduce the distributed keyed
    multi-source BFS relation exactly."""
    from shippinglanes_spark.operators.graph import (
        _bridges_distributed,
        _trade_und,
    )
    from shippinglanes_spark.registry import all_queries

    got = sorted(
        tuple(r)
        for r in all_queries()["graph_bridges"].fn(spark, sf_dir).collect()
    )
    ref = sorted(
        tuple(r)
        for r in _bridges_distributed(spark, _trade_und(spark, sf_dir)).collect()
    )
    assert got == ref


def test_markov_local_matches_distributed(spark, sf_dir):
    """Divergence guard for the evt_markov_stationary size-gated fast
    path: the driver-side power iteration (sorted (from, to) fold,
    support tracking the reachable to-set per iteration) must reproduce
    the distributed broadcast-join loop's ROUND-6dp relation."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from shippinglanes_spark.io import table
    from shippinglanes_spark.core import epoch_us
    from shippinglanes_spark.operators.events import _markov_distributed
    from shippinglanes_spark.registry import all_queries

    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    tc = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    rt = tc.groupBy("from_type").agg(F.sum("n").cast("long").alias("tot"))
    p = tc.join(rt, "from_type").select(
        "from_type", "to_type", (F.col("n") / F.col("tot")).alias("frac")
    ).localCheckpoint()

    got = sorted(
        tuple(r)
        for r in all_queries()["evt_markov_stationary"]
        .fn(spark, sf_dir)
        .collect()
    )
    ref = sorted(tuple(r) for r in _markov_distributed(spark, p).collect())
    assert got == ref


def test_ipf_local_matches_distributed(spark, sf_dir):
    """Divergence guard for the agg_ipf_raking size-gated fast path:
    the driver-side recurrence (exact integer margin sums, Spark's
    double expression tree replicated op for op, inner-join drop
    semantics) must reproduce the distributed loop's relation."""
    from pyspark.sql import functions as F

    from shippinglanes_spark.io import table
    from shippinglanes_spark.operators.stats6 import _ipf_distributed
    from shippinglanes_spark.registry import all_queries

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cells = (
        c.groupBy(
            F.col("c_nationkey").alias("n"),
            F.col("c_mktsegment").alias("s"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("seed"))
        .localCheckpoint()
    )
    oc = o.join(c, o.o_custkey == c.c_custkey)
    trow = (
        oc.groupBy(F.col("c_nationkey").alias("n"))
        .agg(F.count(F.lit(1)).cast("long").alias("tr"))
        .localCheckpoint()
    )
    tcol = (
        oc.groupBy(F.col("c_mktsegment").alias("s"))
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .localCheckpoint()
    )
    got = sorted(
        tuple(r)
        for r in all_queries()["agg_ipf_raking"].fn(spark, sf_dir).collect()
    )
    ref = sorted(
        tuple(r)
        for r in _ipf_distributed(spark, cells, trow, tcol).collect()
    )
    assert got == ref


def test_walks_local_match_distributed(spark, sf_dir):
    """Divergence guard for the graph_random_walks /
    graph_node2vec_pairs size-gated fast paths: the driver-side
    derandomized walk recurrence (md5 pick into the sorted adjacency)
    and the pair count built on it must reproduce the distributed
    4-step broadcast-join loop exactly — all-integer, so equality is
    exact, no tolerance."""
    from pyspark.sql import functions as F

    from shippinglanes_spark.operators.graph import (
        _trade_und,
        _und_local_edges,
        _walks_distributed,
    )
    from shippinglanes_spark.registry import all_queries

    und = _trade_und(spark, sf_dir)
    # the guard is vacuous (distributed==distributed) unless the fixture
    # actually takes the local gate — fail loudly if it ever stops
    assert _und_local_edges(und) is not None
    got_w = sorted(
        tuple(r)
        for r in all_queries()["graph_random_walks"]
        .fn(spark, sf_dir)
        .collect()
    )
    ref_w = sorted(tuple(r) for r in _walks_distributed(spark, und).collect())
    assert got_w == ref_w

    walks = _walks_distributed(spark, und).localCheckpoint()
    wa = walks.alias("wa")
    wb = walks.alias("wb")
    gap = F.abs(F.col("wa.step") - F.col("wb.step"))
    ref_p = sorted(
        tuple(r)
        for r in wa.join(
            wb,
            (F.col("wa.walk_id") == F.col("wb.walk_id")) & gap.between(1, 2),
        )
        .groupBy(
            F.col("wa.node").alias("center"),
            F.col("wb.node").alias("context"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .collect()
    )
    got_p = sorted(
        tuple(r)
        for r in all_queries()["graph_node2vec_pairs"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert got_p == ref_p
