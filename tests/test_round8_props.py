"""Brute-force references for the round-8 additions (rank_ndcg,
rank_mrr, agg_hhi, agg_lorenz, agg_trimmed_mean, ts_page_hinkley):
each query's values recomputed with plain Python exact ints from the
raw parquet, independent of both engines' SQL."""

from __future__ import annotations

import duckdb
import pytest

from shippinglanes_spark.operators.stats8 import (
    _MRR_PRICE,
    _MRR_PRIORITY,
    _NDCG_DISC,
    _NDCG_K,
    _NDCG_REL_CAP,
    _PH_LAMBDA,
    _TRIM_DEN,
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
        f"SELECT o_custkey, o_totalprice, o_orderpriority, o_orderkey "
        f"FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    li = con.sql(
        f"SELECT l.l_suppkey, n.n_regionkey FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') l "
        f"JOIN read_parquet('{sf_dir}/supplier.parquet') s "
        f"  ON l.l_suppkey = s.s_suppkey "
        f"JOIN read_parquet('{sf_dir}/nation.parquet') n "
        f"  ON s.s_nationkey = n.n_nationkey"
    ).fetchall()
    ev = con.sql(
        f"SELECT event_type, ts FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    con.close()
    return {"cust": cust, "orders": orders, "li": li, "ev": ev}


def _cents(v: float) -> int:
    # 2-dp doubles: v*100 is within 1e-9 of an integer, so any
    # round-to-nearest mode agrees (the engines use ROUND)
    return int(round(v * 100))


def _rel_by_cust(raw):
    cnt = {}
    for ck, _p, _pri, _ok in raw["orders"]:
        cnt[ck] = cnt.get(ck, 0) + 1
    return {
        ck: min(cnt.get(ck, 0), _NDCG_REL_CAP)
        for ck, _n, _b in raw["cust"]
    }


def test_ndcg_matches_python(spark, sf_dir, raw):
    rel = _rel_by_cust(raw)
    by_nation = {}
    for ck, nk, bal in raw["cust"]:
        by_nation.setdefault(nk, []).append((ck, bal, rel[ck]))
    expected = {}
    for nk, rows in by_nation.items():
        sys_order = sorted(rows, key=lambda r: (-r[1], r[0]))[:_NDCG_K]
        ideal_order = sorted(rows, key=lambda r: (-r[2], r[0]))[:_NDCG_K]
        dcg = sum(
            r[2] * _NDCG_DISC[i] for i, r in enumerate(sys_order)
        )
        idcg = sum(
            r[2] * _NDCG_DISC[i] for i, r in enumerate(ideal_order)
        )
        if idcg > 0:
            expected[nk] = (dcg, idcg, dcg * 1000000 // idcg)
    got = {
        r.nation_id: (r.dcg_micro, r.idcg_micro, r.ndcg_ppm)
        for r in Q["rank_ndcg"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # metric sanity: nDCG <= 1 always, and not all nations perfect
    assert all(v[2] <= 1000000 for v in got.values())


def test_mrr_matches_python(spark, sf_dir, raw):
    hit = {
        ck
        for ck, p, pri, _ok in raw["orders"]
        if p > _MRR_PRICE and pri == _MRR_PRIORITY
    }
    by_nation = {}
    for ck, nk, bal in raw["cust"]:
        by_nation.setdefault(nk, []).append((ck, bal))
    expected = {}
    for nk, rows in by_nation.items():
        ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
        first = next(
            (i + 1 for i, (ck, _b) in enumerate(ranked) if ck in hit), 0
        )
        expected[nk] = (first, 1000000 // first if first else 0)
    got = {
        r.nation_id: (r.first_hit_rank, r.rr_micro)
        for r in Q["rank_mrr"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_hhi_matches_python(spark, sf_dir, raw):
    cnt = {}
    for sk, rk in raw["li"]:
        cnt[(rk, sk)] = cnt.get((rk, sk), 0) + 1
    tot, nsup = {}, {}
    for (rk, _sk), c in cnt.items():
        tot[rk] = tot.get(rk, 0) + c
        nsup[rk] = nsup.get(rk, 0) + 1
    expected = {}
    for (rk, _sk), c in cnt.items():
        share = c * 1000000 // tot[rk]
        expected[rk] = expected.get(rk, 0) + share * share
    got = {
        r.region_id: (r.n_suppliers, r.hhi_e12)
        for r in Q["agg_hhi"].fn(spark, sf_dir).collect()
    }
    assert got == {rk: (nsup[rk], h) for rk, h in expected.items()}
    # a share-sum-squared lives in (1e12/n, 1e12]
    for rk, (n, h) in got.items():
        assert h <= 10**12 and h * n >= 10**12 * 0.9


def _ntile(rows: list, k: int) -> list[list]:
    """NTILE semantics (both engines): first n%k buckets get one extra."""
    n = len(rows)
    base, extra = divmod(n, k)
    out, i = [], 0
    for b in range(k):
        size = base + (1 if b < extra else 0)
        out.append(rows[i : i + size])
        i += size
    return out


def test_lorenz_matches_python(spark, sf_dir, raw):
    pos = sorted(
        (_cents(b), ck) for ck, _n, b in raw["cust"] if b > 0
    )
    buckets = _ntile(pos, 10)
    tn, tb = len(pos), sum(c for c, _ in pos)
    cum_c = cum_b = 0
    expected = []
    for d, bucket in enumerate(buckets, start=1):
        cum_c += len(bucket)
        cum_b += sum(c for c, _ in bucket)
        expected.append(
            (d, len(bucket), cum_c * 1000000 // tn, cum_b * 1000000 // tb)
        )
    got = [
        (r.decile, r.n_cust, r.cum_cust_ppm, r.cum_bal_ppm)
        for r in Q["agg_lorenz"].fn(spark, sf_dir).collect()
    ]
    assert got == expected
    # Lorenz shape: cumulative balance share must lag population share
    # strictly below the top decile (inequality exists in the fixture)
    assert all(b < c for _d, _n, c, b in got[:-1])
    assert got[-1][2] == got[-1][3] == 1000000


def test_trimmed_mean_matches_python(spark, sf_dir, raw):
    by_pri = {}
    for _ck, p, pri, ok in raw["orders"]:
        by_pri.setdefault(pri, []).append((p, ok))
    expected = {}
    for pri, rows in by_pri.items():
        rows.sort()
        k = len(rows) // _TRIM_DEN
        kept = rows[k : len(rows) - k]
        s = sum(_cents(p) for p, _ok in kept)
        expected[pri] = (len(kept), s, s * 10000 // len(kept))
    got = {
        r.o_orderpriority: (r.n_kept, r.sum_cents, r.mean_micro)
        for r in Q["agg_trimmed_mean"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # trimming must actually trim (10% tails exist at every SF)
    assert all(
        got[p][0] < len(by_pri[p]) for p in got
    )


def test_page_hinkley_matches_python(spark, sf_dir, raw):
    cut = 19738  # 2024-01-16 as epoch day (shared literal's day index)
    days = {}
    for et, ts in raw["ev"]:
        if et == "purchase":
            di = ts.date().toordinal() - 719163
            days[di] = days.get(di, 0) + 1
    pre = {d: x for d, x in days.items() if d < cut}
    ps, pd = sum(pre.values()), len(pre)
    m = 0
    mn = None  # running min over OBSERVED walk values only (no 0 seed)
    expected = []
    for di in sorted(d for d in days if d >= cut):
        m += pd * days[di] - ps
        mn = m if mn is None else min(mn, m)
        ph = m - mn
        expected.append((di, days[di], m, ph, ph > _PH_LAMBDA * pd))
    got = [
        (r.day_index, r.purchases, r.m_scaled, r.ph_scaled, r.alarm)
        for r in Q["ts_page_hinkley"].fn(spark, sf_dir).collect()
    ]
    assert got == expected
    # the walk must move (not a constant series)
    assert len({m for _d, _x, m, _p, _a in got}) >= 2


def test_seq_support_matches_python(spark, sf_dir):
    # raw["ev"] lacks user_id, so this test reads its own slice
    first, last, users = {}, {}, set()
    con = duckdb.connect()
    ev = con.sql(
        f"SELECT user_id, event_type, epoch_us(ts) FROM "
        f"read_parquet('{sf_dir}/events.parquet') "
        f"WHERE ts >= TIMESTAMP '2024-01-08' "
        f"AND ts < TIMESTAMP '2024-01-09'"
    ).fetchall()
    con.close()
    for uid, et, us in ev:
        users.add(uid)
        k = (uid, et)
        first[k] = min(first.get(k, us), us)
        last[k] = max(last.get(k, us), us)
    types = sorted({et for _u, et, _t in ev})
    expected = {}
    for a in types:
        for b in types:
            n = sum(
                1
                for uid in users
                if (uid, a) in first
                and (uid, b) in last
                and first[(uid, a)] < last[(uid, b)]
            )
            if n:
                expected[(a, b)] = (n, n * 1000000 // len(users))
    got = {
        (r.type_a, r.type_b): (r.n_users, r.support_ppm)
        for r in Q["evt_seq_support"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the day slice keeps support informative: never uniformly 1e6
    assert any(v[1] < 1000000 for v in got.values())


def _unionfind_components(edges, nodes):
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label convention: component id = smallest member
    lbl = {v: find(v) for v in nodes}
    # path-compress to the true min via a second sweep
    changed = True
    while changed:
        changed = False
        for v in nodes:
            if lbl[lbl[v]] < lbl[v]:
                lbl[v] = lbl[lbl[v]]
                changed = True
    return lbl


def test_connected_components_matches_unionfind(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.sql("""
        WITH ls AS (SELECT l.l_orderkey okey, s.s_nationkey dst,
                           CAST(COUNT(*) AS BIGINT) w
                    FROM lineitem l JOIN supplier s
                      ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2),
        oc AS (SELECT o.o_orderkey okey, c.c_nationkey src
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT oc.src, ls.dst, CAST(SUM(ls.w) AS BIGINT) w
        FROM ls JOIN oc USING (okey) WHERE oc.src <> ls.dst GROUP BY 1, 2
    """).fetchall()
    con.close()
    und = {}
    nodes = set()
    for s, d, w in rows:
        nodes.update((s, d))
        k = (min(s, d), max(s, d))
        und[k] = und.get(k, 0) + w
    top30 = [
        k
        for k, _w in sorted(und.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    ]
    lbl = _unionfind_components(top30, nodes)
    sizes = {}
    for v in nodes:
        sizes[lbl[v]] = sizes.get(lbl[v], 0) + 1
    got = {
        r.nation_id: (r.component, r.comp_size)
        for r in Q["graph_connected_components"].fn(spark, sf_dir).collect()
    }
    assert got == {v: (lbl[v], sizes[lbl[v]]) for v in nodes}
    # non-degenerate at every fixture: >1 component, one of size > 1
    assert len(sizes) > 1 and max(sizes.values()) > 1


def test_tokenizer_fertility_matches_python(spark, sf_dir):
    import re

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT lang, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    agg = {}
    for lang, source, text in docs:
        words = [w for w in text.split(" ") if w]
        toks = [t for t in re.split(r"[^a-z0-9]+", text) if t]
        k = (lang, source)
        n, ch, wd, tk = agg.get(k, (0, 0, 0, 0))
        agg[k] = (n + 1, ch + len(text), wd + len(words), tk + len(toks))
    expected = {
        k: (n, ch, wd, tk, ch * 1000 // tk, tk * 1000 // wd)
        for k, (n, ch, wd, tk) in agg.items()
    }
    got = {
        (r.lang, r.source): (
            r.n_docs,
            r.sum_chars,
            r.sum_words,
            r.sum_tokens,
            r.chars_per_token_milli,
            r.tokens_per_word_milli,
        )
        for r in Q["pipeline_tokenizer_fertility"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # fertility sanity: >=1 token per word is impossible to exceed by
    # much under an alnum-run tokenizer on space-separated text
    assert all(1000 <= v[5] <= 2000 for v in got.values())


def test_marker_dominance_matches_python(spark, sf_dir):
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    markers = ["the", "data", "table", "join", "window"]
    expected = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        cs = [sum(1 for w in ws if w == m) for m in markers]
        tot = sum(cs)
        if tot:
            expected[doc_id] = (
                sum(1 for c in cs if c > 0),
                tot,
                max(cs) * 1000000 // tot,
            )
    got = {
        r.doc_id: (r.n_langs_present, r.total_markers, r.dominant_share_ppm)
        for r in Q["text_marker_dominance"].fn(spark, sf_dir).collect()
    }
    assert got == expected
