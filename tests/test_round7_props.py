"""Brute-force references for the round-7 additions: each query's
values recomputed with plain Python (exact ints / Fractions) from the
raw parquet, independent of both engines' SQL."""

from __future__ import annotations

import math

import duckdb
import pytest

from shippinglanes_spark.registry import all_queries

Q = all_queries()


@pytest.fixture(scope="module")
def raw(sf_dir):
    con = duckdb.connect()
    ev = con.sql(
        f"SELECT user_id, event_type, ts, value FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    con.close()
    return ev


def test_capture_recapture_matches_python(spark, sf_dir, raw):
    import datetime

    a0 = datetime.datetime(2024, 1, 8, 0, 0, 0)
    a1 = datetime.datetime(2024, 1, 8, 3, 0, 0)
    b0 = datetime.datetime(2024, 1, 22, 0, 0, 0)
    b1 = datetime.datetime(2024, 1, 22, 3, 0, 0)
    in_a, in_b, users = set(), set(), set()
    for uid, _et, ts, _v in raw:
        users.add(uid)
        t = ts.replace(tzinfo=None)
        if a0 <= t < a1:
            in_a.add(uid)
        if b0 <= t < b1:
            in_b.add(uid)
    n1, n2, m = len(in_a), len(in_b), len(in_a & in_b)
    chapman = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    row = Q["agg_capture_recapture"].fn(spark, sf_dir).collect()[0]
    assert (row.n1, row.n2, row.m, row.n_true) == (n1, n2, m, len(users))
    assert row.chapman_estimate == chapman
    # the estimator must extrapolate, not parrot (degeneracy guard)
    assert m < min(n1, n2)


def _daily_purchases(raw):
    days = {}
    for _uid, et, ts, _v in raw:
        di = ts.date().toordinal() - 719163  # epoch day
        days.setdefault(di, 0)
        if et == "purchase":
            days[di] += 1
    return dict(sorted(days.items()))


def test_sprt_matches_python_walk(spark, sf_dir, raw):
    days = _daily_purchases(raw)
    nd, tot = len(days), sum(days.values())
    llr, expected = 0, None
    for step, (di, cnt) in enumerate(sorted(days.items()), start=1):
        llr += 470004 if cnt * nd > tot else -916291
        if llr >= 2944439:
            expected = (step, di, llr, "accept_h1")
            break
        if llr <= -2944439:
            expected = (step, di, llr, "accept_h0")
            break
    rows = Q["agg_sprt"].fn(spark, sf_dir).collect()
    assert expected is not None, "fixture walk must reach a decision"
    assert len(rows) == 1
    r = rows[0]
    assert (
        r.n_observations,
        r.decision_day,
        r.llr_micro,
        r.decision,
    ) == expected


def test_wma_crossover_matches_python(spark, sf_dir, raw):
    from collections import Counter

    vols = Counter()
    for _uid, _et, ts, _v in raw:
        vols[ts.date().toordinal() - 719163] += 1
    days = sorted(vols)
    series = [vols[d] for d in days]
    FAST, SLOW = 4, 8
    FD, SD = (1 << FAST) - 1, (1 << SLOW) - 1
    expected = []
    prev_sgn = None
    for i in range(SLOW - 1, len(series)):
        fnum = sum(
            series[i - k] * (1 << (FAST - 1 - k)) for k in range(FAST)
        )
        snum = sum(
            series[i - k] * (1 << (SLOW - 1 - k)) for k in range(SLOW)
        )
        lhs, rhs = fnum * SD, snum * FD
        sgn = 1 if lhs > rhs else (-1 if lhs < rhs else 0)
        if (
            prev_sgn is not None
            and prev_sgn != 0
            and sgn != 0
            and sgn != prev_sgn
        ):
            expected.append(
                (
                    days[i],
                    "golden" if sgn > 0 else "death",
                    fnum * 1000 // FD,
                    snum * 1000 // SD,
                )
            )
        prev_sgn = sgn
    got = [
        (r.day_index, r.crossover, r.fast_milli, r.slow_milli)
        for r in Q["ts_wma_crossover"].fn(spark, sf_dir).collect()
    ]
    assert got == expected
    assert len(expected) >= 2  # a flat series would emit nothing
    assert {e[1] for e in expected} == {"golden", "death"}


def test_calibration_bins_matches_python(spark, sf_dir, raw):
    users = {}
    for uid, et, _ts, v in raw:
        u = users.setdefault(uid, {"nv": 0, "nc": 0, "ns": 0, "y": 0})
        if et == "view":
            u["nv"] += 1
        elif et == "click":
            u["nc"] += 1
        elif et == "signup":
            u["ns"] += 1
        elif et == "purchase" and v is not None and round(v * 100) >= 20000:
            u["y"] = 1
    scored = sorted(
        (
            100 * u["nv"] + 300 * u["nc"] + 500 * u["ns"] - 2000,
            u["y"],
        )
        for u in users.values()
    )
    zs = [z for z, _ in scored]
    n = len(zs)
    # percentile_disc(q): the value at 1-based rank ceil(q * n)
    edges = sorted(zs[max(0, math.ceil(q / 10 * n) - 1)] for q in range(1, 10))
    bins = {}
    for z, y in scored:
        b = sum(1 for e in edges if e < z)
        agg = bins.setdefault(b, [0, 0, 0])
        agg[0] += 1
        agg[1] += y
        agg[2] += z
    got = {
        r.bin: (r.n_users, r.n_pos, r.event_rate)
        for r in Q["agg_calibration_bins"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(bins)
    for b, (cnt, pos, sz) in bins.items():
        gu, gp, rate = got[b]
        assert (gu, gp) == (cnt, pos), b
        assert rate == math.floor(pos / cnt * 1e6) / 1e6, b
    # calibration says nothing if every user lands in one bin
    assert len(bins) >= 5


def test_geo_cpa_matches_python(spark, sf_dir, raw):
    """Pure-python CPA over brute-force meeting segment pairs."""
    fixes = {}
    for r in duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts), (value % 180) - 90,"
        f" ((value * 2) % 360) - 180 FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    ).fetchall():
        fixes.setdefault(r[0], []).append((r[2], r[1], r[3], r[4]))
    segs = []
    for uid, fs in fixes.items():
        fs.sort(key=lambda x: (x[0], x[1]))
        for (t0, _e0, la0, lo0), (t1, _e1, la1, lo1) in zip(fs, fs[1:]):
            if t1 > t0:
                dt = (t1 - t0) / 3.6e9
                segs.append(
                    (uid, t0, t1, la0, lo0, (la1 - la0) / dt, (lo1 - lo0) / dt)
                )
    best = {}
    for i, a in enumerate(segs):
        for b in segs[i + 1 :]:
            if a[0] == b[0]:
                continue
            x, y = (a, b) if a[0] < b[0] else (b, a)
            if (
                abs(x[3] - y[3]) > 0.5
                or abs(x[4] - y[4]) > 0.5
                or abs(x[1] - y[1]) > 3_600_000_000
                or min(x[2], y[2]) <= max(x[1], y[1])
            ):
                continue
            s = max(x[1], y[1])
            span = (min(x[2], y[2]) - s) / 3.6e9
            dplat = (x[3] + x[5] * (s - x[1]) / 3.6e9) - (
                y[3] + y[5] * (s - y[1]) / 3.6e9
            )
            dplon = (x[4] + x[6] * (s - x[1]) / 3.6e9) - (
                y[4] + y[6] * (s - y[1]) / 3.6e9
            )
            dvlat, dvlon = x[5] - y[5], x[6] - y[6]
            dv2 = dvlat * dvlat + dvlon * dvlon
            t = 0.0 if dv2 == 0 else min(
                span, max(0.0, -(dplat * dvlat + dplon * dvlon) / dv2)
            )
            d = math.floor(
                math.hypot(dplat + t * dvlat, dplon + t * dvlon) * 1e4
            ) / 1e4
            key = (x[0], y[0])
            cand = (d, int(s + math.floor(t * 3.6e9)))
            if key not in best or cand < best[key]:
                best[key] = cand
    expected = sorted(best.items())[:200]
    got = [
        ((r.id_a, r.id_b), (r.cpa_deg, r.t_cpa_us))
        for r in Q["geo_cpa"].fn(spark, sf_dir).collect()
    ]
    assert got == expected


def test_dtw_matches_python_dp(spark, sf_dir, raw):
    """Classic O(nm) python DP reproduces every pair's warped cost."""
    from collections import Counter

    series = {}
    for _uid, et, ts, _v in raw:
        series.setdefault(et, Counter())[
            ts.date().toordinal() - 719163
        ] += 1
    seqs = {et: [c[d] for d in sorted(c)] for et, c in series.items()}

    def dtw(a, b):
        INF = 10**15
        prev = [0] + [INF] * len(b)
        for ai in a:
            cur = [INF]
            for j, bj in enumerate(b, start=1):
                cur.append(abs(ai - bj) + min(prev[j - 1], prev[j], cur[j - 1]))
            prev = cur
        return prev[len(b)]

    expected = {
        (ta, tb): dtw(seqs[ta], seqs[tb])
        for ta in seqs
        for tb in seqs
        if ta < tb
    }
    got = {
        (r.type_a, r.type_b): r.dtw_cost
        for r in Q["ts_dtw"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(set(got.values())) >= 2  # distinct pairs, distinct costs


def test_matrix_profile_matches_python(spark, sf_dir, raw):
    days = _daily_purchases(raw)
    ks = sorted(days)
    y = [days[d] for d in ks]
    W_, EX = 7, 3
    subs = [y[i : i + W_] for i in range(len(y) - W_ + 1)]
    expected = []
    for i, a in enumerate(subs):
        best = None
        for j, b in enumerate(subs):
            if abs(i - j) <= EX:
                continue
            d2 = sum((x - z) * (x - z) for x, z in zip(a, b))
            cand = (d2, j + 1)
            if best is None or cand < best:
                best = cand
        expected.append((i + 1, ks[i], best[0], best[1]))
    got = [
        (r.pos, r.day_index, r.mp_sq, r.nn_pos)
        for r in Q["ts_matrix_profile"].fn(spark, sf_dir).collect()
    ]
    assert got == expected


def test_t_closeness_matches_python(spark, sf_dir):
    import collections

    # banding itself is cross-engine-verified by the oracle hash; the
    # python reference checks the EMD arithmetic, so it takes the band
    # from SQL (python // floors negatives where SQL div truncates)
    rows = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment,"
        f" CAST(ROUND(c_acctbal) AS BIGINT) // 1000"
        f" FROM read_parquet('{sf_dir}/customer.parquet')"
    ).fetchall()
    gband = collections.Counter()
    cband = collections.defaultdict(collections.Counter)
    for n, s, b in rows:
        gband[b] += 1
        cband[(n, s)][b] += 1
    bands = sorted(gband)
    ng, m = sum(gband.values()), len(bands)
    expected = {}
    for cls, cnts in cband.items():
        nc = sum(cnts.values())
        gcum = ccum = num = 0
        for b in bands:
            gcum += gband[b]
            ccum += cnts.get(b, 0)
            num += abs(ccum * ng - gcum * nc)
        expected[cls] = (nc, num * 1000000 // ((m - 1) * nc * ng))
    got = {
        (r.nation_id, r.segment): (r.n_rows, r.t_ppm)
        for r in Q["profile_t_closeness"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    # the audit must separate classes, not report one constant
    assert len({v[1] for v in got.values()}) >= 2


def test_mde_matches_python(spark, sf_dir, raw):
    import hashlib

    users = {}
    for uid, et, _ts, v in raw:
        u = users.setdefault(uid, [None, 0])
        if u[0] is None:
            h = hashlib.md5(f"srm:{uid}".encode()).hexdigest()[:13]
            u[0] = int(h, 16) % 2
        if et == "purchase" and v is not None and round(v * 100) >= 20000:
            u[1] = 1
    n0 = sum(1 for a, _c in users.values() if a == 0)
    x0 = sum(c for a, c in users.values() if a == 0)
    n1 = sum(1 for a, _c in users.values() if a == 1)
    p0 = x0 / n0
    za, zb = 1.959963984540054, 0.8416212335729143
    mde = (za + zb) * math.sqrt(2.0 * p0 * (1 - p0) / min(n0, n1))
    r = Q["agg_mde"].fn(spark, sf_dir).collect()[0]
    assert (r.n_control, r.x_control, r.n_treat) == (n0, x0, n1)
    assert r.mde_abs == math.floor(mde * 1e6) / 1e6
    assert r.mde_rel == math.floor(mde / p0 * 1e6) / 1e6
    assert 0 < r.baseline_rate < 1  # degenerate arms would break MDE


def test_burrows_delta_matches_python(spark, sf_dir):
    import collections

    rows = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    per_src = collections.defaultdict(collections.Counter)
    glob = collections.Counter()
    for src, text in rows:
        for t in text.split(" "):
            if t:
                per_src[src][t] += 1
                glob[t] += 1
    top = [t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:50]]
    tots = {s: sum(c.values()) for s, c in per_src.items()}
    q = {
        (s, t): per_src[s].get(t, 0) * 1_000_000 // tots[s]
        for s in per_src
        for t in top
    }
    srcs = sorted(per_src)
    ns = len(srcs)
    zq = {}
    kept_terms = []
    for t in top:
        vals = [q[(s, t)] for s in srcs]
        sq, sqq = sum(vals), sum(v * v for v in vals)
        if sqq * ns <= sq * sq:
            continue  # zero variance
        kept_terms.append(t)
        mu = sq / ns
        sd = math.sqrt(sqq / ns - mu * mu)
        for s, v in zip(srcs, vals):
            # round-half-away like both engines' ROUND
            x = (v - mu) / sd * 1e4
            zq[(s, t)] = int(math.copysign(math.floor(abs(x) + 0.5), x))
    expected = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sd = sum(abs(zq[(a, t)] - zq[(b, t)]) for t in kept_terms)
            expected[(a, b)] = (
                len(kept_terms),
                math.floor(sd / len(kept_terms) / 1e4 * 1e4) / 1e4,
            )
    got = {
        (r.source_a, r.source_b): (r.n_terms, r.delta)
        for r in Q["text_burrows_delta"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len({v[1] for v in got.values()}) >= 2


def test_causal_impact_matches_python(spark, sf_dir, raw):
    from collections import Counter

    xs, ys = Counter(), Counter()
    for _uid, et, ts, _v in raw:
        di = ts.date().toordinal() - 719163
        if et == "view":
            xs[di] += 1
        elif et == "purchase":
            ys[di] += 1
    days = sorted(set(xs) | set(ys))
    import datetime

    cut = datetime.date(2024, 1, 16).toordinal() - 719163
    pre = [(xs[d], ys[d]) for d in days if d < cut]
    post = [(xs[d], ys[d]) for d in days if d >= cut]
    n = len(pre)
    sx = sum(x for x, _ in pre)
    sy = sum(y for _, y in pre)
    sxx = sum(x * x for x, _ in pre)
    sxy = sum(x * y for x, y in pre)
    b = (n * float(sxy) - float(sx) * sy) / (n * float(sxx) - float(sx) * sx)
    a = (float(sy) - b * sx) / n
    n_post = len(post)
    actual = sum(y for _, y in post)
    predicted = a * n_post + b * sum(x for x, _ in post)
    r = Q["evt_causal_impact"].fn(spark, sf_dir).collect()[0]
    assert (r.n_pre, r.n_post, r.actual_post) == (n, n_post, actual)
    assert r.predicted_post == math.floor(predicted * 1e4) / 1e4
    assert r.cumulative_effect == math.floor((actual - predicted) * 1e4) / 1e4
    assert r.relative_lift == math.floor((actual / predicted - 1) * 1e6) / 1e6


def test_atkinson_matches_python(spark, sf_dir, raw):
    import collections

    spend = collections.defaultdict(lambda: collections.defaultdict(int))
    for uid, et, _ts, v in raw:
        if v is not None:
            spend[et][uid] += round(v * 100)
    expected = {}
    for et, users in spend.items():
        xs = [x for x in users.values() if x > 0]
        n = len(xs)
        sr = sum(math.floor(math.sqrt(x) * 1e6) for x in xs)
        msq = sr / n / 1e6
        a = 1 - msq * msq / (sum(xs) / n)
        expected[et] = (n, math.floor(a * 1e6) / 1e6)
    got = {
        r.event_type: (r.n_users, r.atkinson_half)
        for r in Q["agg_atkinson"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert all(0 <= v[1] < 1 for v in got.values())


def test_hapax_matches_python(spark, sf_dir):
    import collections

    rows = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    per = collections.defaultdict(collections.Counter)
    for src, text in rows:
        for t in text.split(" "):
            if t:
                per[src][t] += 1
    expected = {}
    for src, c in per.items():
        vocab, ntok = len(c), sum(c.values())
        h1 = sum(1 for v in c.values() if v == 1)
        h2 = sum(1 for v in c.values() if v == 2)
        expected[src] = (vocab, ntok, h1, h2, h1 * 1000000 // vocab,
                         vocab * 1000000 // ntok)
    got = {
        r.source: (r.vocab, r.n_tokens, r.hapax, r.dis, r.hapax_ppm, r.ttr_ppm)
        for r in Q["text_hapax_ratio"].fn(spark, sf_dir).collect()
    }
    assert got == expected
