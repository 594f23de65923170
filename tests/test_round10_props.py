"""Brute-force references for the round-10 pack (agg_anderson_darling,
agg_vif, agg_deming, ts_sample_entropy, text_mattr, rank_exposure,
fn_variant_nested, agg_listagg): each query's values recomputed with
plain Python from the raw parquet, independent of both engines' SQL.
Floors use math.floor (positive and negative values alike — python
round() is half-even and has bitten before, STATE.md round-8)."""

from __future__ import annotations

import json
import math

import duckdb
import pytest

from shippinglanes_spark.operators.stats11 import (
    _AD_SCALE,
    _EXP_K,
    _EXP_TOTAL,
    _EXP_W,
    _MATTR_W,
    _SE_RNUM,
)
from shippinglanes_spark.registry import all_queries

Q = all_queries()


def _floor6(x: float) -> float:
    return math.floor(x * 1e6) / 1e6


@pytest.fixture(scope="module")
def daily(sf_dir):
    """(event_type, day) -> count over the zero-filled calendar grid."""
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


@pytest.fixture(scope="module")
def order_features(sf_dir):
    """l_orderkey -> (region, items, qty, whole-dollar price)."""
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH f AS (
          SELECT l_orderkey, COUNT(*) AS x,
                 CAST(SUM(l_quantity) AS BIGINT) AS y,
                 SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS zc
          FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1)
        SELECT r.r_name, f.x, f.y, f.zc
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
    feats: dict[str, list[tuple[int, int, int]]] = {}
    for region, x, y, zc in rows:
        feats.setdefault(region, []).append((int(x), int(y), int(zc) // 100))
    return feats


def test_anderson_darling_matches_python(spark, sf_dir, daily):
    types, days, c = daily
    expected = {}
    for ai in range(len(types)):
        for bi in range(ai + 1, len(types)):
            ta, tb = types[ai], types[bi]
            pooled = sorted(
                [(c[(ta, d)], 0, d) for d in days]
                + [(c[(tb, d)], 1, d) for d in days]
            )
            nn = len(pooled)
            na = len(days)
            s = 0
            m = 0
            for i in range(1, nn):  # positions 1..N-1
                if pooled[i - 1][1] == 0:
                    m += 1
                d = m * nn - na * i
                s += (d * d * _AD_SCALE) // (i * (nn - i))
            raw = s / (na * (nn - na) * _AD_SCALE)
            expected[(ta, tb)] = (na, _floor6(raw), raw > 2.492)
    got = {
        (r.type_a, r.type_b): (r.n_days, r.a2, r.signif)
        for r in Q["agg_anderson_darling"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the quantized statistic tracks the exact one to ~1e-6
    for (ta, tb), (na, a2, _) in expected.items():
        pooled = sorted(
            [(c[(ta, d)], 0, d) for d in days]
            + [(c[(tb, d)], 1, d) for d in days]
        )
        nn = len(pooled)
        s_exact = 0.0
        m = 0
        for i in range(1, nn):
            if pooled[i - 1][1] == 0:
                m += 1
            s_exact += (m * nn - na * i) ** 2 / (i * (nn - i))
        assert abs(a2 - s_exact / (na * (nn - na))) < 5e-6
    # distributions genuinely differ pair to pair
    vals = [v[1] for v in expected.values()]
    assert max(vals) - min(vals) > 0.2


def _moments(pts):
    n = len(pts)
    out = {"n": n}
    for k, i in (("x", 0), ("y", 1), ("z", 2)):
        out["s" + k] = sum(p[i] for p in pts)
    for (a, i), (b, j) in [
        (("x", 0), ("x", 0)),
        (("y", 1), ("y", 1)),
        (("z", 2), ("z", 2)),
        (("x", 0), ("y", 1)),
        (("x", 0), ("z", 2)),
        (("y", 1), ("z", 2)),
    ]:
        out["s" + a + b] = sum(p[i] * p[j] for p in pts)
    return out


def _corr(m, a, b):
    n = float(m["n"])
    key = "s" + a + b if "s" + a + b in m else "s" + b + a
    cov = n * m[key] - float(m["s" + a]) * m["s" + b]
    va = n * m["s" + a + a] - float(m["s" + a]) * m["s" + a]
    vb = n * m["s" + b + b] - float(m["s" + b]) * m["s" + b]
    return cov / math.sqrt(va * vb)


def test_vif_matches_python(spark, sf_dir, order_features):
    got = {
        r.region: r for r in Q["agg_vif"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(order_features)
    for region, pts in order_features.items():
        m = _moments(pts)
        rxy = _corr(m, "x", "y")
        rxz = _corr(m, "x", "z")
        ryz = _corr(m, "y", "z")
        det = 1 + 2 * rxy * rxz * ryz - rxy * rxy - rxz * rxz - ryz * ryz
        r = got[region]
        assert r.n_orders == m["n"]
        assert r.r_items_qty == _floor6(rxy)
        assert r.r_items_price == _floor6(rxz)
        assert r.r_qty_price == _floor6(ryz)
        assert r.vif_items == _floor6((1 - ryz * ryz) / det)
        assert r.vif_qty == _floor6((1 - rxz * rxz) / det)
        assert r.vif_price == _floor6((1 - rxy * rxy) / det)
        # multicollinearity is real on this fixture: items drive totals
        assert r.vif_items > 2 and r.vif_qty > 2 and r.vif_price > 2


def test_deming_matches_python_and_dominates_ols(
    spark, sf_dir, order_features
):
    got = {
        r.region: r for r in Q["agg_deming"].fn(spark, sf_dir).collect()
    }
    for region, pts in order_features.items():
        n = float(len(pts))
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        syy = sum(p[1] * p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        vxx = n * sxx - float(sx) * sx
        vyy = n * syy - float(sy) * sy
        vxy = n * sxy - float(sx) * sy
        slope = ((vyy - vxx) + math.sqrt(
            (vyy - vxx) * (vyy - vxx) + 4 * vxy * vxy
        )) / (2 * vxy)
        r = got[region]
        assert r.n_orders == len(pts)
        assert r.slope_ols == _floor6(vxy / vxx)
        assert r.slope_deming == _floor6(slope)
        assert r.intercept == _floor6((sy - slope * sx) / n)
        # positive covariance -> TLS recovers what OLS attenuates
        assert vxy > 0
        assert r.slope_deming > r.slope_ols


def test_sample_entropy_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, date_trunc('hour', ts), COUNT(*) FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    hc = {}
    for t, h, n in rows:
        hc.setdefault(t, {})[h] = int(n)
    all_h = [h for d in hc.values() for h in d]
    h0, h1 = min(all_h), max(all_h)
    spine = []
    cur = h0
    import datetime

    while cur <= h1:
        spine.append(cur)
        cur += datetime.timedelta(hours=1)
    got = {
        r.event_type: r
        for r in Q["ts_sample_entropy"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(hc)
    for t, d in hc.items():
        xs = [d.get(h, 0) for h in spine]
        n = len(xs)
        s = sum(xs)
        ss = sum(x * x for x in xs)
        r_tol = math.floor(_SE_RNUM * math.sqrt(n * ss - s * s) / n)

        def cnt(m):
            c = 0
            for i in range(n - m):
                for j in range(i + 1, n - m):
                    if (
                        max(abs(xs[i + k] - xs[j + k]) for k in range(m + 1))
                        <= r_tol
                    ):
                        c += 1
            return c

        b, a = cnt(1), cnt(2)
        row = got[t]
        assert row.r == r_tol
        assert row.b_pairs == b
        assert row.a_pairs == a
        assert a > 100  # the fixture keeps the A-count far from ln(0)
        assert row.sampen == _floor6(math.log(b / a))


def test_mattr_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    buckets: dict[tuple[str, str], list[int]] = {}
    for _doc, lang, source, text in rows:
        toks = text.split(" ")
        n = len(toks)
        length = min(_MATTR_W, n)
        wins = n - length + 1
        sd = sum(
            len(set(toks[s : s + length])) for s in range(wins)
        )
        buckets.setdefault((lang, source), []).append(
            (sd * 1_000_000) // (length * wins)
        )
    got = {
        (r.lang, r.source): r
        for r in Q["text_mattr"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(buckets)
    for key, ms in buckets.items():
        r = got[key]
        assert r.n_docs == len(ms)
        assert r.avg_mattr_ppm == sum(ms) // len(ms)
        assert r.min_mattr_ppm == min(ms)
        assert r.max_mattr_ppm == max(ms)
    # lexical diversity genuinely spreads across docs
    allm = [m for ms in buckets.values() for m in ms]
    assert max(allm) - min(allm) > 50_000


def test_rank_exposure_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    scored = []
    for doc_id, lang, text in rows:
        toks = text.split(" ")
        scored.append(
            (len(set(toks)) * 1000 // len(toks), int(doc_id), lang)
        )
    scored.sort(key=lambda t: (-t[0], t[1]))
    top = scored[:_EXP_K]
    assert len(top) == _EXP_K
    per_lang: dict[str, list[int]] = {}
    for rk, (_score, _doc, lang) in enumerate(top, start=1):
        per_lang.setdefault(lang, []).append(_EXP_W[rk - 1])
    got = {
        r.lang: r for r in Q["rank_exposure"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(per_lang)
    for lang, ws in per_lang.items():
        r = got[lang]
        assert r.docs_top == len(ws)
        assert r.docs_ppm == len(ws) * 1_000_000 // _EXP_K
        assert r.exposure_ppm == sum(ws) * 1_000_000 // _EXP_TOTAL
        assert r.fairness_milli == (
            (sum(ws) * 1_000_000 // _EXP_TOTAL)
            * 1000
            // (len(ws) * 1_000_000 // _EXP_K)
        )
    # position bias is real: some group's exposure != its slot share
    assert any(r.fairness_milli != 1000 for r in got.values())


def test_variant_nested_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderkey, o_custkey, o_orderpriority FROM "
        f"read_parquet('{sf_dir}/orders.parquet') "
        f"WHERE o_orderkey % 7 = 0"
    ).fetchall()
    con.close()
    expected = {}
    for ok, ck, pri in rows:
        js = (
            f'{{"ok":{ok},"st":"{pri}","c":{{"key":{ck},'
            f'"mod":[{ck % 3},{ck % 7}]}}}}'
        )
        parsed = json.loads(js)  # sanity: the built string IS json
        assert parsed["c"]["mod"][1] == ck % 7
        expected[int(ok)] = (
            pri,
            int(ck),
            int(ck % 7),
            str(ck % 3),
            None,
            None,
        )
    got = {
        r.o_orderkey: (
            r.pri,
            r.ckey,
            r.mod7,
            r.mod3_str,
            r.missing,
            r.strict,
        )
        for r in Q["fn_variant_nested"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) > 100


def test_listagg_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT r.r_name, n.n_name, n.n_nationkey "
        f"FROM read_parquet('{sf_dir}/nation.parquet') n "
        f"JOIN read_parquet('{sf_dir}/region.parquet') r "
        f"ON n.n_regionkey = r.r_regionkey"
    ).fetchall()
    con.close()
    per_region: dict[str, list[tuple[str, int]]] = {}
    for region, name, key in rows:
        per_region.setdefault(region, []).append((name, int(key)))
    got = {
        r.region: r for r in Q["agg_listagg"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(per_region)
    for region, pairs in per_region.items():
        r = got[region]
        assert r.n_nations == len(pairs)
        assert r.nations_alpha == ",".join(
            sorted(name for name, _ in pairs)
        )
        assert r.nations_bykey_desc == "|".join(
            name for name, _ in sorted(pairs, key=lambda p: -p[1])
        )
