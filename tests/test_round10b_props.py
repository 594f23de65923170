"""Brute-force references for round-10 pack 2 (ts_variance_ratio,
ts_turning_points, agg_partial_correlation, text_entropy_rate,
evt_cumulative_incidence, sql_variables_exec): each query's values
recomputed with plain Python from the raw parquet, independent of both
engines' SQL."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

import duckdb
import pytest

from shippinglanes_spark.operators.stats12 import _VR_Q
from shippinglanes_spark.registry import all_queries

Q = all_queries()


def _floor6(x: float) -> float:
    return math.floor(x * 1e6) / 1e6


@pytest.fixture(scope="module")
def daily(sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    types = sorted({r[0] for r in rows})
    days = sorted({r[1] for r in rows})
    c = {(t, d): 0 for t in types for d in days}
    for t, d, n in rows:
        c[(t, d)] = int(n)
    return types, days, c


def test_variance_ratio_matches_python(spark, sf_dir, daily):
    types, days, c = daily
    q = _VR_Q
    got = {
        r.event_type: r
        for r in Q["ts_variance_ratio"].fn(spark, sf_dir).collect()
    }
    vrs = []
    for t in types:
        xs = [c[(t, d)] for d in days]
        n = len(xs)
        s = sum(xs)
        ss = sum(x * x for x in xs)
        m = n - q + 1
        s2 = sum(
            (n * sum(xs[i : i + q]) - q * s) ** 2 for i in range(m)
        )
        raw = s2 / (m * q * (n * ss - s * s))
        # sanity: the cleared-denominator form IS the plain VR
        mu = s / n
        v1 = sum((x - mu) ** 2 for x in xs) / n
        vq = sum(
            (sum(xs[i : i + q]) - q * mu) ** 2 for i in range(m)
        ) / m
        assert math.isclose(raw, vq / (q * v1), rel_tol=1e-12)
        r = got[t]
        assert r.n_days == n and r.q == q
        assert r.vr == _floor6(raw)
        assert r.regime == (
            "mean_reverting" if raw < 1 else "trending"
        )
        vrs.append(raw)
    assert max(vrs) - min(vrs) > 0.1  # regime signal is real


def test_turning_points_matches_python(spark, sf_dir, daily):
    types, days, c = daily
    got = {
        r.event_type: r
        for r in Q["ts_turning_points"].fn(spark, sf_dir).collect()
    }
    tps = []
    for t in types:
        xs = [c[(t, d)] for d in days]
        n = len(xs)
        tp = sum(
            1
            for i in range(1, n - 1)
            if (xs[i] > xs[i - 1] and xs[i] > xs[i + 1])
            or (xs[i] < xs[i - 1] and xs[i] < xs[i + 1])
        )
        z = (tp - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
        r = got[t]
        assert r.n_days == n
        assert r.turning_points == tp
        assert r.z_tp == _floor6(z)
        assert r.nonrandom == (abs(z) > 1.96)
        tps.append(tp)
    assert len(set(tps)) >= 3  # series shapes genuinely differ


def test_partial_correlation_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH f AS (
          SELECT l_orderkey, COUNT(*) AS x,
                 CAST(SUM(l_quantity) AS BIGINT) AS y,
                 SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) // 100
                   AS z
          FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1)
        SELECT r.r_name, f.x, f.y, f.z
        FROM f
        JOIN read_parquet('{sf_dir}/orders.parquet') o
          ON f.l_orderkey = o.o_orderkey
        JOIN read_parquet('{sf_dir}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{sf_dir}/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        JOIN read_parquet('{sf_dir}/region.parquet') r
          ON n.n_regionkey = r.r_regionkey
        """
    ).fetchall()
    con.close()
    feats = defaultdict(list)
    for region, x, y, z in rows:
        feats[region].append((int(x), int(y), int(z)))
    got = {
        r.region: r
        for r in Q["agg_partial_correlation"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(feats)
    for region, pts in feats.items():
        n = float(len(pts))

        def corr(a, b):
            sa = sum(p[a] for p in pts)
            sb = sum(p[b] for p in pts)
            sab = sum(p[a] * p[b] for p in pts)
            saa = sum(p[a] * p[a] for p in pts)
            sbb = sum(p[b] * p[b] for p in pts)
            return (n * sab - float(sa) * sb) / math.sqrt(
                (n * saa - float(sa) * sa) * (n * sbb - float(sb) * sb)
            )

        rxy, rxz, ryz = corr(0, 1), corr(0, 2), corr(1, 2)

        def partial(rab, rac, rbc):
            return (rab - rac * rbc) / math.sqrt(
                (1 - rac * rac) * (1 - rbc * rbc)
            )

        r = got[region]
        assert r.n_orders == len(pts)
        assert r.r_qty_price == _floor6(ryz)
        assert r.p_qty_price_items == _floor6(partial(ryz, rxy, rxz))
        assert r.p_items_qty_price == _floor6(partial(rxy, rxz, ryz))
        assert r.p_items_price_qty == _floor6(partial(rxz, rxy, ryz))
        # the confounder story: partialling out item count kills the
        # qty-price association while the raw correlation is strong
        assert ryz > 0.5
        assert abs(partial(ryz, rxy, rxz)) < 0.1


def test_entropy_rate_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    bi = defaultdict(lambda: defaultdict(int))
    for lang, text in rows:
        ws = text.split(" ")
        if len(ws) < 2:
            continue
        for a, b in zip(ws, ws[1:]):
            bi[lang][(a, b)] += 1
    got = {
        r.lang: r
        for r in Q["text_entropy_rate"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(bi)
    for lang, d in bi.items():
        ctx = defaultdict(int)
        for (a, _b), cnt in d.items():
            ctx[a] += cnt
        nb = sum(d.values())
        h_rate = (
            sum(cnt * (math.log(ctx[a]) - math.log(cnt))
                for (a, _b), cnt in d.items())
            / nb
        )
        h_ctx = math.log(nb) - sum(
            cc * math.log(cc) for cc in ctx.values()
        ) / nb
        r = got[lang]
        assert r.n_bigrams == nb
        assert abs(r.h_rate - h_rate) < 1e-3
        assert abs(r.h_context - h_ctx) < 1e-3
        assert abs(r.info_gain - (h_ctx - h_rate)) < 1e-3
        # conditional structure is real: knowing the context helps
        assert r.info_gain > 0


def test_cumulative_incidence_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_type, epoch_us(ts) FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    con.close()
    t0 = {}
    tp = {}
    te = {}
    mx = 0
    for u, et, t in rows:
        t = int(t)
        mx = max(mx, t)
        t0[u] = min(t0.get(u, t), t)
        if et == "purchase":
            tp[u] = min(tp.get(u, t), t)
        if et == "error":
            te[u] = min(te.get(u, t), t)
    day_us = 86_400_000_000
    per_day = defaultdict(lambda: [0, 0, 0])  # dp, de, cn
    for u, start in t0.items():
        p, e = tp.get(u), te.get(u)
        if p is None and e is None:
            per_day[(mx - start) // day_us][2] += 1
        elif e is None or (p is not None and p <= e):
            per_day[(p - start) // day_us][0] += 1
        else:
            per_day[(e - start) // day_us][1] += 1
    days = sorted(per_day)
    total = len(t0)
    seen = 0
    surv = 1.0
    cifp = cife = 0.0
    expected = {}
    for day in days:
        dp, de, cn = per_day[day]
        n_risk = total - seen
        if dp + de > 0:
            cifp = cifp + surv * dp / n_risk
            cife = cife + surv * de / n_risk
            surv = surv * (1 - (dp + de) / n_risk)
            expected[day] = (
                n_risk,
                dp,
                de,
                _floor6(cifp),
                _floor6(cife),
            )
        seen += dp + de + cn
    got = {
        r.day: (
            r.n_risk,
            r.d_purchase,
            r.d_error,
            r.cif_purchase,
            r.cif_error,
        )
        for r in Q["evt_cumulative_incidence"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # AJ additivity: the two incidences + survivor mass == 1 whenever
    # no one is censored before the last event day (holds here)
    last = max(expected)
    cp, ce = expected[last][3], expected[last][4]
    assert cp + ce <= 1.0 + 1e-9
    # curves actually rise (competing events exist on multiple days)
    assert len(expected) >= 2


def test_sql_variables_exec_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_returnflag, l_quantity FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') "
        f"WHERE l_quantity >= 40"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for flag, qty in rows:
        agg[flag][0] += 1
        agg[flag][1] += int(qty)
    got = {
        r.flag: (r.n, r.qty)
        for r in Q["sql_variables_exec"].fn(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert len(got) == 3
