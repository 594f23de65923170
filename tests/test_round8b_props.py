"""Brute-force references for the round-8 pack 2 additions
(agg_wilcoxon_signed_rank, rank_map, agg_effect_size, ts_kalman_level,
sim_maxsim): each query's values recomputed with plain Python / numpy
from the raw parquet, independent of both engines' SQL."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from shippinglanes_spark.functions.similarity import (
    _MS_CHUNKS,
    _MS_DIM,
    _MS_QMAX,
    _MS_QMOD,
    _MS_TOPK,
)
from shippinglanes_spark.operators.stats9 import (
    _ES_EXPEDITED,
    _KF_Q,
    _KF_R,
    _MAP_K,
    _MAP_PRICE,
    _MAP_PRIORITY,
    _WSR_CUT,
)
from shippinglanes_spark.registry import all_queries

Q = all_queries()


@pytest.fixture(scope="module")
def raw(sf_dir):
    con = duckdb.connect()
    cust = con.sql(
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    ).fetchall()
    orders = con.sql(
        f"SELECT o_custkey, o_totalprice, o_orderpriority, o_orderdate "
        f"FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    ev = con.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    emb = con.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return {"cust": cust, "orders": orders, "ev": ev, "emb": emb}


def test_wilcoxon_matches_python(spark, sf_dir, raw):
    from datetime import datetime

    cut = datetime.fromisoformat(_WSR_CUT)
    pre: dict[int, int] = {}
    post: dict[int, int] = {}
    seen_pre: set[int] = set()
    seen_post: set[int] = set()
    for ck, price, _pri, od in raw["orders"]:
        cents = int(round(price * 100))
        if od < cut:
            pre[ck] = pre.get(ck, 0) + cents
            seen_pre.add(ck)
        else:
            post[ck] = post.get(ck, 0) + cents
            seen_post.add(ck)
    nation = {ck: nk for ck, nk, _b in raw["cust"]}
    by_nation: dict[int, list[int]] = {}
    for ck in seen_pre & seen_post:
        d = post[ck] - pre[ck]
        if d != 0:
            by_nation.setdefault(nation[ck], []).append(d)
    expected = {}
    for nk, ds in by_nation.items():
        ads = sorted(abs(d) for d in ds)
        # doubled average rank per |d| value (handles ties exactly)
        r2 = {}
        for v in set(ads):
            lo = ads.index(v) + 1  # min rank (1-based)
            t = ads.count(v)
            r2[v] = 2 * lo + t - 1
        n = len(ds)
        w2p = sum(r2[abs(d)] for d in ds if d > 0)
        tie3 = sum(ads.count(v) ** 3 - ads.count(v) for v in set(ads))
        num = w2p - n * (n + 1) / 2
        var48 = 2 * n * (n + 1) * (2 * n + 1) - tie3
        z = math.floor(num / (2 * math.sqrt(var48 / 48)) * 1e6) / 1e6
        expected[nk] = (n, w2p, z)
    got = {
        r.nation_id: (r.n_pairs, r.w2_plus, r.z)
        for r in Q["agg_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    zs = [v[2] for v in expected.values()]
    assert len(set(zs)) >= 3, "z should vary across nations"


def test_rank_map_matches_python(spark, sf_dir, raw):
    rel_cust = {
        ck
        for ck, price, pri, _od in raw["orders"]
        if price > _MAP_PRICE and pri == _MAP_PRIORITY
    }
    by_nation: dict[int, list[tuple[int, float]]] = {}
    for ck, nk, bal in raw["cust"]:
        by_nation.setdefault(nk, []).append((ck, bal))
    expected = {}
    for nk, rows in by_nation.items():
        ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
        n_rel = sum(1 for ck, _b in ranked if ck in rel_cust)
        cum = 0
        term = 0
        topk_hits = 0
        for k, (ck, _b) in enumerate(ranked, start=1):
            if ck in rel_cust:
                cum += 1
                if k <= _MAP_K:
                    topk_hits += 1
                    term += cum * 1000000 // k
        ap = 0 if n_rel == 0 else term // min(n_rel, _MAP_K)
        expected[nk] = (n_rel, topk_hits, ap)
    got = {
        r.nation_id: (r.n_rel, r.n_rel_topk, r.ap_micro)
        for r in Q["rank_map"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert any(0 < v[2] < 1000000 for v in expected.values())


def _dollars(price: float) -> int:
    # both engines ROUND half-up on .50; python round() is half-even
    # (the np.round hard-won fact) — floor(x + 0.5) matches the engines
    return int(math.floor(price + 0.5))


def test_effect_size_matches_python(spark, sf_dir, raw):
    con = duckdb.connect()
    region = dict(
        con.sql(
            f"SELECT c.c_custkey, n.n_regionkey FROM "
            f"read_parquet('{sf_dir}/customer.parquet') c JOIN "
            f"read_parquet('{sf_dir}/nation.parquet') n "
            f"ON c.c_nationkey = n.n_nationkey"
        ).fetchall()
    )
    con.close()
    mom: dict[int, list[int]] = {}
    for ck, price, pri, _od in raw["orders"]:
        rid = region[ck]
        v = _dollars(price)
        m = mom.setdefault(rid, [0, 0, 0, 0, 0, 0])
        if pri in _ES_EXPEDITED:
            m[0] += 1
            m[1] += v
            m[2] += v * v
        else:
            m[3] += 1
            m[4] += v
            m[5] += v * v
    expected = {}
    for rid, (n1, s1, ss1, n2, s2, ss2) in mom.items():
        md = s1 / n1 - s2 / n2
        sp2 = ((ss1 - (s1 / n1) * s1) + (ss2 - (s2 / n2) * s2)) / (
            n1 + n2 - 2
        )
        d = md / math.sqrt(sp2)
        g = d * (1 - 3 / (4 * (n1 + n2) - 9))
        expected[rid] = (
            n1,
            n2,
            math.floor(d * 1e6) / 1e6,
            math.floor(g * 1e6) / 1e6,
        )
    got = {
        r.region_id: (r.n1, r.n2, r.cohens_d, r.hedges_g)
        for r in Q["agg_effect_size"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # |g| < |d| always (the small-sample correction shrinks)
    for _n1, _n2, d, g in expected.values():
        assert abs(g) <= abs(d)


def test_kalman_matches_python(spark, sf_dir, raw):
    q, rr = float(_KF_Q), float(_KF_R)
    series: dict[str, list[tuple]] = {}
    for et, day, cnt in raw["ev"]:
        series.setdefault(et, []).append((day, cnt))
    expected = {}
    for et, rows in series.items():
        ys = [float(c) for _d, c in sorted(rows)]
        x, p = ys[0], 0.0
        for y in ys[1:]:
            k = (p + q) / ((p + q) + rr)
            x = x + k * (y - x)
            p = (1.0 - k) * (p + q)
        expected[et] = (
            len(ys),
            round(x, 6),
            round(p, 6),
            round((p + q) / ((p + q) + rr), 6),
        )
    got = {
        r.event_type: (r.n_days, r.level, r.p_var, r.next_gain)
        for r in Q["ts_kalman_level"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the Riccati recursion converges: steady-state gain in (0, 1),
    # and P must sit at its fixed point P* = (1-K*)(P*+Q) after 30 days
    for _n, _lvl, p, gain in expected.values():
        assert 0.0 < gain < 1.0
        assert abs((1 - gain) * (p + q) - p) < 1e-3


def _ms_tensor(vec):
    arr = np.asarray(vec, dtype=np.float64)
    return (
        np.floor(arr * 1e6).astype(np.int64).reshape(_MS_CHUNKS, _MS_DIM)
    )


def test_maxsim_matches_numpy(spark, sf_dir, raw):
    emb = [(int(v), int(lab), _ms_tensor(e)) for v, lab, e in raw["emb"]]
    queries = [
        r for r in emb if r[0] % _MS_QMOD == 0 and r[0] < _MS_QMAX
    ]
    cands = [r for r in emb if r[0] % _MS_QMOD != 0 or r[0] >= _MS_QMAX]
    expected = []
    for qid, qlab, qt in sorted(queries):
        scored = []
        for cid, clab, ct in cands:
            if clab != qlab:
                continue
            dots = qt @ ct.T  # (chunks, chunks) int64
            scored.append((int(dots.max(axis=1).sum()), cid))
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rank, (sc, cid) in enumerate(scored[:_MS_TOPK], start=1):
            expected.append((qid, rank, cid, sc))
    got = [
        (r.query_id, r.rank, r.cand_id, r.maxsim)
        for r in Q["sim_maxsim"].fn(spark, sf_dir).collect()
    ]
    assert got == expected
    # late interaction upper-bounds any single-token score: MaxSim of a
    # vector against itself is the sum of its per-chunk self-dots
    by_q = {}
    for qid, rank, cid, sc in expected:
        by_q.setdefault(qid, []).append(sc)
    for qid, scores in by_q.items():
        assert scores == sorted(scores, reverse=True)


# ---- batch 2: friedman / TOST / RBO / top-p sources ----------------

from shippinglanes_spark.functions.pipeline7 import (  # noqa: E402
    _TOPP_DEN,
    _TOPP_NUM,
)
from shippinglanes_spark.operators.stats9 import (  # noqa: E402
    _FR_K,
    _RBO_C,
    _RBO_K,
    _RBO_S,
    _TOST_BASE,
    _TOST_CRIT,
    _TOST_MARGIN,
)


def test_friedman_matches_python(spark, sf_dir, raw):
    by_day: dict = {}
    for et, day, cnt in raw["ev"]:
        by_day.setdefault(day, []).append((et, cnt))
    r2_sum: dict[str, int] = {}
    ties = 0
    for day, rows in by_day.items():
        assert len(rows) == _FR_K
        cs = sorted(c for _et, c in rows)
        for et, c in rows:
            lo = cs.index(c) + 1
            t = cs.count(c)
            r2_sum[et] = r2_sum.get(et, 0) + 2 * lo + t - 1
        for v in set(cs):
            t = cs.count(v)
            ties += t**3 - t
    n = len(by_day)
    sr2 = sum(v * v for v in r2_sum.values())
    q_raw = (3 * sr2) / (n * _FR_K * (_FR_K + 1)) - 3 * n * (_FR_K + 1)
    denom = 1 - ties / (n * _FR_K * (_FR_K * _FR_K - 1))
    expected = {
        et: (
            v,
            v * 1000 // (2 * n),
            math.floor(q_raw * 1e6) / 1e6,
            math.floor(q_raw / denom * 1e6) / 1e6,
        )
        for et, v in r2_sum.items()
    }
    got = {
        r.event_type: (r.r2_sum, r.mean_rank_milli, r.q_stat, r.q_tie_corrected)
        for r in Q["agg_friedman"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # doubled mean ranks must average to (k+1) across treatments
    assert abs(sum(v[1] for v in expected.values()) / 1000 - _FR_K * (_FR_K + 1) / 2) < 0.01


def test_tost_matches_python(spark, sf_dir, raw):
    mom: dict[str, list[int]] = {}
    for _ck, price, pri, _od in raw["orders"]:
        v = _dollars(price)
        m = mom.setdefault(pri, [0, 0, 0])
        m[0] += 1
        m[1] += v
        m[2] += v * v
    n2, s2, ss2 = mom[_TOST_BASE]
    crit = float(_TOST_CRIT)
    expected = {}
    for pri, (n1, s1, ss1) in mom.items():
        if pri == _TOST_BASE:
            continue
        md = s1 / n1 - s2 / n2
        se = math.sqrt(
            (ss1 - (s1 / n1) * s1) / (n1 - 1) / n1
            + (ss2 - (s2 / n2) * s2) / (n2 - 1) / n2
        )
        t_lo = (md + _TOST_MARGIN) / se
        t_hi = (md - _TOST_MARGIN) / se
        expected[pri] = (
            n1,
            n2,
            math.floor(t_lo * 1e6) / 1e6,
            math.floor(t_hi * 1e6) / 1e6,
            t_lo > crit and t_hi < -crit,
        )
    got = {
        r.pri: (r.n1, r.n2, r.t_lower, r.t_upper, r.equivalent)
        for r in Q["agg_tost_equivalence"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_rbo_matches_python(spark, sf_dir, raw):
    cnt: dict[int, int] = {}
    for ck, _p, _pri, _od in raw["orders"]:
        cnt[ck] = cnt.get(ck, 0) + 1
    by_nation: dict = {}
    for ck, nk, bal in raw["cust"]:
        by_nation.setdefault(nk, []).append((ck, bal, cnt.get(ck, 0)))
    expected = {}
    for nk, rows in by_nation.items():
        a = [ck for ck, _b, _c in sorted(rows, key=lambda r: (-r[1], r[0]))][
            :_RBO_K
        ]
        b = [ck for ck, _b, _c in sorted(rows, key=lambda r: (-r[2], r[0]))][
            :_RBO_K
        ]
        # independent overlap-per-depth formulation (no suffix table)
        rbo = sum(
            len(set(a[:d]) & set(b[:d])) * _RBO_C[d - 1]
            for d in range(1, _RBO_K + 1)
        )
        common = len(set(a) & set(b))
        # every nation with a ranking appears — zero-common nations
        # report (0, 0) rather than vanishing (left-join discipline)
        expected[nk] = (common, rbo)
    got = {
        r.nation_id: (r.n_common, r.rbo_nano)
        for r in Q["rank_rbo"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # suffix table is consistent with the coefficient table
    assert _RBO_S[0] == sum(_RBO_C)
    # identical-ranking ceiling: no nation can exceed sum(d * C[d])
    ceiling = sum(d * _RBO_C[d - 1] for d in range(1, _RBO_K + 1))
    assert all(v[1] <= ceiling for v in expected.values())


def test_topp_sources_matches_python(spark, sf_dir):
    con = duckdb.connect()
    m = con.sql(
        f"SELECT lang, source, COUNT(*) FROM "
        f"read_parquet('{sf_dir}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    by_lang: dict = {}
    for lang, src, c in m:
        by_lang.setdefault(lang, []).append((src, c))
    expected = {}
    for lang, rows in by_lang.items():
        tot = sum(c for _s, c in rows)
        cum = 0
        for src, c in sorted(rows, key=lambda r: (-r[1], r[0])):
            kept = cum * _TOPP_DEN < _TOPP_NUM * tot
            cum += c
            expected[(lang, src)] = (c, cum * 1000000 // tot, kept)
    got = {
        (r.lang, r.source): (r.n_docs, r.cum_ppm, r.kept)
        for r in Q["pipeline_topp_sources"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the rule must actually drop a tail somewhere and keep a head
    kept = [v[2] for v in expected.values()]
    assert any(kept) and not all(kept)


def test_holt_winters_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS day, "
        f"SUM(CAST(ROUND(value * 100) AS BIGINT)) FROM "
        f"read_parquet('{sf_dir}/events.parquet') WHERE value IS NOT NULL "
        f"GROUP BY 1, 2"
    ).fetchall()
    con.close()
    series: dict[str, list[tuple]] = {}
    for et, day, y in rows:
        series.setdefault(et, []).append((day, int(y)))
    expected = {}
    for et, drows in series.items():
        ys = [float(y) for _d, y in sorted(drows)]
        l, b = ys[0], 0.0
        s = [0.0] * 7
        for y in ys[1:]:
            s1 = s[0]
            lnew = ((y - s1) + (l + b)) / 2
            bnew = ((lnew - l) + b) / 2
            snew = ((y - lnew) + s1) / 2
            s = s[1:] + [snew]
            l, b = lnew, bnew
        expected[et] = (
            len(ys),
            round(l, 6),
            round(b, 6),
            round(s[0], 6),
            round(l + b + s[0], 6),
        )
    got = {
        r.event_type: (r.n_days, r.level, r.trend, r.season_next, r.forecast_1)
        for r in Q["ts_holt_winters"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the seasonal ring must carry signal: with 30 days of data the
    # next-step seasonal cannot still be the zero init for every type
    assert any(v[3] != 0.0 for v in expected.values())


def test_sql_pipe_matches_classic_sql(spark, sf_dir):
    """The pipe chain must be pure sugar: same rows as the equivalent
    classic nested statement run through the SAME Spark engine."""
    from shippinglanes_spark.io import register_views

    register_views(spark, sf_dir)
    classic = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
        GROUP BY n_name HAVING COUNT(*) >= 5
        ORDER BY n_name
        """
    ).collect()
    piped = Q["sql_pipe_surface"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in piped] == [tuple(r) for r in classic]
    assert len(piped) >= 5


def test_brier_decomposition_matches_python(spark, sf_dir):
    from shippinglanes_spark.operators.stats7 import (
        _BR_SPAN,
        _BR_Z0,
        _CAL_BIAS,
        _CAL_BINS,
        _CAL_W_CLICK,
        _CAL_W_SIGNUP,
        _CAL_W_VIEW,
    )

    con = duckdb.connect()
    users = con.sql(
        f"""
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'view') AS nv,
               COUNT(*) FILTER (event_type = 'click') AS nc,
               COUNT(*) FILTER (event_type = 'signup') AS ns,
               MAX(CASE WHEN event_type = 'purchase'
                         AND CAST(ROUND(value * 100) AS BIGINT) >= 20000
                        THEN 1 ELSE 0 END) AS y
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY user_id
        """
    ).fetchall()
    # independent binning: DuckDB percentile_disc lower-edge semantics
    # replicated as the element at rank ceil(q * n) of the sorted list
    zs = sorted(
        _CAL_W_VIEW * nv + _CAL_W_CLICK * nc + _CAL_W_SIGNUP * ns + _CAL_BIAS
        for _u, nv, nc, ns, _y in users
    )
    n = len(zs)
    edges = [
        zs[max(0, math.ceil(i / _CAL_BINS * n) - 1)]
        for i in range(1, _CAL_BINS)
    ]
    bins: dict[int, list[int]] = {}
    for _u, nv, nc, ns, yy in users:
        z = (
            _CAL_W_VIEW * nv
            + _CAL_W_CLICK * nc
            + _CAL_W_SIGNUP * ns
            + _CAL_BIAS
        )
        p = min(max(z - _BR_Z0, 0), _BR_SPAN) * 1000000 // _BR_SPAN
        b = sum(1 for e in edges if e < z)
        bins.setdefault(b, []).append((p, yy))
    sy = sum(yy for rows in bins.values() for _p, yy in rows)
    ybar = sy / n
    brier = rel = res = 0.0
    for b in sorted(bins):
        rows = bins[b]
        nk = len(rows)
        syk = sum(yy for _p, yy in rows)
        spk = sum(p for p, _yy in rows)
        pbar = spk / nk / 1000000
        ybk = syk / nk
        brier += nk * pbar * pbar - 2 * pbar * syk + syk
        rel += nk * (pbar - ybk) * (pbar - ybk)
        res += nk * (ybk - ybar) * (ybk - ybar)
    brier /= n
    rel /= n
    res /= n
    unc = ybar * (1 - ybar)
    row = Q["agg_brier_decomposition"].fn(spark, sf_dir).collect()[0]
    assert row.n_users == n
    assert row.base_rate == math.floor(ybar * 1e6) / 1e6
    assert row.brier == math.floor(brier * 1e6) / 1e6
    assert row.reliability == math.floor(rel * 1e6) / 1e6
    assert row.resolution == math.floor(res * 1e6) / 1e6
    assert row.uncertainty == math.floor(unc * 1e6) / 1e6
    # Murphy's identity holds EXACTLY for a bin-constant forecast
    assert abs(brier - (rel - res + unc)) < 1e-9
    # a forecaster with any skill: resolution > 0
    assert res > 0


def test_croston_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, "
        f"CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT), "
        f"COUNT(*) FROM read_parquet('{sf_dir}/events.parquet') "
        f"GROUP BY 1, 2"
    ).fetchall()
    con.close()
    series: dict[str, list[tuple[int, int]]] = {}
    for et, hi, c in rows:
        series.setdefault(et, []).append((hi, int(c)))
    expected = {}
    for et, hrows in series.items():
        hrows.sort()
        z, x = float(hrows[0][1]), 1.0
        for (h_prev, _), (h, size) in zip(hrows, hrows[1:]):
            z = (z + size) / 2
            x = (x + (h - h_prev)) / 2
        expected[et] = (
            len(hrows),
            round(z, 6),
            round(x, 6),
            round(z / x, 6),
        )
    got = {
        r.event_type: (r.n_demand, r.size_level, r.interval_level, r.demand_rate)
        for r in Q["ts_croston"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # intermittency must register at the test SF: some type's smoothed
    # interval must exceed 1 hour (gaps exist at sf0.001)
    assert any(v[2] > 1.0 for v in expected.values())


def test_heaps_law_matches_python(spark, sf_dir):
    from shippinglanes_spark.functions.pipeline7 import _HEAPS_POINTS

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    ids = sorted(did for did, _t in docs)
    n = len(ids)
    edges = [
        ids[max(0, math.ceil(k / _HEAPS_POINTS * n) - 1)]
        for k in range(1, _HEAPS_POINTS + 1)
    ]
    pts = []
    for k, t in enumerate(edges, start=1):
        seen: set[str] = set()
        n_tok = 0
        n_docs = 0
        for did, text in docs:
            if did <= t:
                n_docs += 1
                toks = text.split(" ")
                grams = [
                    " ".join(toks[i : i + 3])
                    for i in range(len(toks) - 2)
                ]
                n_tok += len(grams)
                seen.update(grams)
        pts.append((k, n_docs, n_tok, len(seen)))
    xs = [round(math.log(p[2]), 4) for p in pts]
    ys = [round(math.log(p[3]), 4) for p in pts]
    np_ = len(pts)
    sx = sy = sxy = sxx = 0.0
    for x, yv in zip(xs, ys):
        sx += x
        sy += yv
        sxy += x * yv
        sxx += x * x
    beta = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    lnk = (sy - beta * sx) / np_
    expected = {
        p[0]: (
            p[1],
            p[2],
            p[3],
            xs[i],
            ys[i],
            math.floor(beta * 1e6) / 1e6,
            math.floor(lnk * 1e6) / 1e6,
        )
        for i, p in enumerate(pts)
    }
    got = {
        r.k: (
            r.n_docs,
            r.n_tokens,
            r.vocab,
            r.ln_tokens,
            r.ln_vocab,
            r.heaps_beta,
            r.heaps_ln_k,
        )
        for r in Q["text_heaps_law"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # Heaps exponent of a real-ish corpus lies strictly inside (0, 1):
    # vocabulary grows, but sub-linearly
    assert 0.0 < math.floor(beta * 1e6) / 1e6 < 1.0
    # vocabulary and tokens must be monotone along the curve
    vs = [p[3] for p in pts]
    assert vs == sorted(vs)
