"""Brute-force references for the round-9 pack (rank_bradley_terry,
rank_err, ts_ljung_box, agg_cronbach_alpha, agg_cochran_armitage,
text_self_bleu): each query's values recomputed with plain Python from
the raw parquet, independent of both engines' SQL. Floors use
math.floor (positive values) — python round() is half-even and has
bitten before (STATE.md round-8)."""

from __future__ import annotations

import math

import duckdb
import pytest

from shippinglanes_spark.operators.stats10 import (
    _BT_ITERS,
    _BT_K,
    _CA_HI,
    _ERR_K,
    _ERR_RELCAP,
    _LB_M,
)
from shippinglanes_spark.registry import all_queries

Q = all_queries()


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


def test_bradley_terry_matches_python(spark, sf_dir, daily):
    types, days, c = daily
    k = len(types)
    assert k == _BT_K
    w = [[0] * k for _ in range(k)]
    for di in days:
        for i, a in enumerate(types):
            for j, b in enumerate(types):
                if i != j and c[(a, di)] > c[(b, di)]:
                    w[i][j] += 1
    wins = [sum(w[i]) for i in range(k)]
    comps = [sum(w[i][j] + w[j][i] for j in range(k)) for i in range(k)]
    p = [1.0] * k
    for _ in range(_BT_ITERS):
        p = [
            wins[i]
            / sum((w[i][j] + w[j][i]) / (p[i] + p[j]) for j in range(k))
            for i in range(k)
        ]
    z = sum(p)
    rating = [math.floor(p[i] / z * 1e6) / 1e6 for i in range(k)]
    order = sorted(range(k), key=lambda i: (-p[i] / z, types[i]))
    rk = {types[i]: r + 1 for r, i in enumerate(order)}
    got = {
        r.event_type: (r.wins, r.comparisons, r.rating, r.rk)
        for r in Q["rank_bradley_terry"].fn(spark, sf_dir).collect()
    }
    expected = {
        types[i]: (wins[i], comps[i], rating[i], rk[types[i]])
        for i in range(k)
    }
    assert got == expected
    # ratings must actually differ (the MM fit found real signal)
    assert len({v[2] for v in expected.values()}) >= 3


def test_err_matches_python(spark, sf_dir):
    con = duckdb.connect()
    cust = con.sql(
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    ).fetchall()
    cnt = dict(
        con.sql(
            f"SELECT o_custkey, COUNT(*) FROM "
            f"read_parquet('{sf_dir}/orders.parquet') GROUP BY 1"
        ).fetchall()
    )
    con.close()
    by_nation: dict = {}
    for ck, nk, bal in cust:
        by_nation.setdefault(nk, []).append((ck, bal))
    expected = {}
    for nk, rows in by_nation.items():
        ranked = sorted(rows, key=lambda r: (-r[1], r[0]))[:_ERR_K]
        err, pmass = 0.0, 1.0
        for rk, (ck, _bal) in enumerate(ranked, start=1):
            rel = min(int(cnt.get(ck, 0)), _ERR_RELCAP)
            r_stop = (2.0**rel - 1) / 8.0
            err += pmass * r_stop / rk
            pmass *= 1 - r_stop
        expected[nk] = (len(ranked), math.floor(err * 1e6) / 1e6)
    got = {
        r.nation_id: (r.n_ranked, r.err)
        for r in Q["rank_err"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len({v[1] for v in expected.values()}) >= 5


def test_ljung_box_matches_python(spark, sf_dir, daily):
    types, days, c = daily
    n = len(days)
    expected = {}
    for t in types:
        xs = [c[(t, d)] for d in days]
        s = sum(xs)
        av = [n * x - s for x in xs]
        c0 = sum(a * a for a in av)
        q = 0.0
        for lag in range(1, _LB_M + 1):
            ck = sum(av[i] * av[i + lag] for i in range(n - lag))
            r = ck / c0
            q += r * r / (n - lag)
        q_raw = n * (n + 2) * q
        expected[t] = (n, math.floor(q_raw * 1e6) / 1e6, q_raw > 14.067140)
    got = {
        r.event_type: (r.n, r.q_stat, r.autocorrelated)
        for r in Q["ts_ljung_box"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # Q must be positive and differ across types
    assert all(v[1] > 0 for v in expected.values())
    assert len({v[1] for v in expected.values()}) == len(types)


def test_cronbach_alpha_matches_python(spark, sf_dir, daily):
    types, days, c = daily
    n = len(days)
    k = len(types)
    b_item = {}
    for t in types:
        xs = [c[(t, d)] for d in days]
        b_item[t] = n * sum(x * x for x in xs) - sum(xs) ** 2
    tot = [sum(c[(t, d)] for t in types) for d in days]
    b_total = n * sum(x * x for x in tot) - sum(tot) ** 2
    alpha = math.floor(
        k / (k - 1) * (1 - sum(b_item.values()) / b_total) * 1e6
    ) / 1e6
    got = {
        r.event_type: (r.b_item, r.b_total, r.alpha)
        for r in Q["agg_cronbach_alpha"].fn(spark, sf_dir).collect()
    }
    assert got == {t: (b_item[t], b_total, alpha) for t in types}
    # a defined reliability coefficient, not a degenerate 0 or 1
    assert -1.0 < alpha < 1.0 and alpha != 0.0


def test_cochran_armitage_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT r.r_name, CAST(SUBSTR(o.o_orderpriority, 1, 1) AS BIGINT),
               CASE WHEN o.o_totalprice > {_CA_HI} THEN 1 ELSE 0 END
        FROM read_parquet('{sf_dir}/orders.parquet') o
        JOIN read_parquet('{sf_dir}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{sf_dir}/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        JOIN read_parquet('{sf_dir}/region.parquet') r
          ON n.n_regionkey = r.r_regionkey
        """
    ).fetchall()
    con.close()
    agg: dict = {}
    for reg, w, hi in rows:
        m = agg.setdefault(reg, [0, 0, 0, 0, 0])  # n, r, w1, w2, t
        m[0] += 1
        m[1] += hi
        m[2] += w
        m[3] += w * w
        m[4] += w * hi
    expected = {}
    for reg, (n, r, w1, w2, t) in agg.items():
        p = r / n
        z = (t - p * w1) / math.sqrt(p * (1 - p) * (w2 - w1 * w1 / n))
        fl = math.floor(z * 1e6) / 1e6
        expected[reg] = (n, r, t, fl, abs(z) > 1.96)
    got = {
        row.region: (row.n, row.n_hi, row.dose_hits, row.z_trend,
                     row.trend_sig)
        for row in Q["agg_cochran_armitage"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(expected) == 5  # all five regions present


def test_self_bleu_matches_python(spark, sf_dir):
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT lang, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    cnt: dict = {}
    for lang, src, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - 2):
            g = " ".join(toks[i : i + 3])
            key = (lang, src, g)
            cnt[key] = cnt.get(key, 0) + 1
    tot: dict = {}
    for (lang, _src, g), c in cnt.items():
        tot[(lang, g)] = tot.get((lang, g), 0) + c
    agg: dict = {}
    for (lang, src, g), c in cnt.items():
        a = agg.setdefault((lang, src), [0, 0])
        a[0] += c
        a[1] += min(c, tot[(lang, g)] - c)
    expected = {
        k: (v[0], v[1], v[1] * 1000000 // v[0]) for k, v in agg.items()
    }
    got = {
        (r.lang, r.source): (r.tri_total, r.tri_clipped, r.self_bleu_ppm)
        for r in Q["text_self_bleu"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    ppms = [v[2] for v in expected.values()]
    # real spread, and nobody saturates to a fully-redundant 1e6
    assert min(ppms) >= 0 and max(ppms) < 1_000_000
    assert len(set(ppms)) >= 10


def test_isotonic_calibration_matches_python(spark, sf_dir):
    """Independent PAV (true while-loop stack merge, no unrolling) over
    the same decile bins must reproduce the query's blocks exactly, and
    the fitted block rates must be non-decreasing (the isotonic
    contract)."""
    con = duckdb.connect()
    bins = con.sql(
        f"""
        WITH uc AS (SELECT user_id,
                          COUNT(*) FILTER (event_type = 'view') AS nv,
                          COUNT(*) FILTER (event_type = 'click') AS nc,
                          COUNT(*) FILTER (event_type = 'signup') AS ns,
                          MAX(CASE WHEN event_type = 'purchase'
                                    AND CAST(ROUND(value * 100) AS BIGINT)
                                        >= 20000
                                   THEN 1 ELSE 0 END) AS y
                   FROM read_parquet('{sf_dir}/events.parquet')
                   GROUP BY user_id),
        s AS (SELECT y, 100 * nv + 300 * nc + 500 * ns - 2000 AS z FROM uc),
        e AS (SELECT [{", ".join(
            f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY z)"
            for i in range(1, 10)
        )}] AS edges FROM s),
        b AS (SELECT s.y, len(list_filter(e.edges, q -> q < s.z)) AS bin
              FROM s CROSS JOIN e)
        SELECT bin, COUNT(*) AS n, SUM(y) AS pos FROM b GROUP BY bin
        ORDER BY bin
        """
    ).fetchall()
    con.close()
    stack: list[list[int]] = []
    for _bin, n, pos in bins:
        stack.append([int(n), int(pos), 1])
        while (
            len(stack) >= 2
            and stack[-1][1] * stack[-2][0] < stack[-2][1] * stack[-1][0]
        ):
            b2 = stack.pop()
            b1 = stack.pop()
            stack.append([b1[0] + b2[0], b1[1] + b2[1], b1[2] + b2[2]])
    expected = {
        i + 1: (b[2], b[0], b[1], b[1] * 1000000 // b[0])
        for i, b in enumerate(stack)
    }
    got = {
        r.block: (r.n_bins, r.n_users, r.n_pos, r.rate_ppm)
        for r in Q["agg_isotonic_calibration"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the isotonic contract: block rates non-decreasing, and PAV
    # actually merged something on this fixture (n_blocks < n_bins)
    rates = [expected[k][3] for k in sorted(expected)]
    assert rates == sorted(rates)
    assert len(expected) < len(bins)


def test_preference_pairs_matches_python(spark, sf_dir):
    from shippinglanes_spark.functions.pipeline7 import _PP_MARGIN

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, lang, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    buckets: dict = {}
    for doc_id, lang, src, text in docs:
        toks = text.split(" ")
        score = len(set(toks)) * 1000 // len(toks)
        buckets.setdefault((lang, src), []).append((int(doc_id), score))
    expected = {}
    for key, rows in buckets.items():
        chosen = min(rows, key=lambda r: (-r[1], r[0]))
        rejected = min(rows, key=lambda r: (r[1], r[0]))
        if (
            chosen[0] != rejected[0]
            and chosen[1] - rejected[1] >= _PP_MARGIN
        ):
            expected[key] = (
                len(rows), chosen[0], rejected[0], chosen[1], rejected[1],
                chosen[1] - rejected[1],
            )
    got = {
        (r.lang, r.source): (
            r.n_docs, r.chosen_doc, r.rejected_doc,
            r.chosen_score, r.rejected_score, r.margin_milli,
        )
        for r in Q["pipeline_preference_pairs"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the margin gate must actually drop some buckets (1-doc or flat)
    assert 0 < len(expected) < len(buckets)
