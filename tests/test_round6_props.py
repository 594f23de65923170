"""Independent semantic cross-checks for the round-6 stats pack: the
DuckDB oracles prove cross-engine equality; these prove the SEMANTICS
against brute-force pandas/pure-python references sharing no
formulation with either engine."""

from __future__ import annotations

import math

import pandas as pd

from shippinglanes_spark.registry import all_queries


def _cents(spark, sf_dir) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type",
            "user_id",
            "CAST(ts AS DATE) AS day",
            "CAST(ROUND(value * 100) AS BIGINT) AS cents",
        )
        .where("value IS NOT NULL")
        .toPandas()
    )


def test_jarque_bera_matches_population_moments(spark, sf_dir):
    ev = _cents(spark, sf_dir)
    got = {
        r.event_type: r
        for r in all_queries()["agg_jarque_bera"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        x = g["cents"].astype(float)
        n = len(x)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        skew = m3 / m2**1.5
        exk = m4 / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
        r = got[et]
        assert r.n == n
        assert abs(r.skewness - skew) < 1e-4
        assert abs(r.excess_kurtosis - exk) < 1e-4
        assert abs(r.jb_stat - jb) < jb * 1e-4 + 1e-3


def test_theil_matches_literal_loop(spark, sf_dir):
    ev = _cents(spark, sf_dir)
    got = {
        r.event_type: r
        for r in all_queries()["agg_theil"].fn(spark, sf_dir).collect()
    }
    for et, g in ev.groupby("event_type"):
        per_user = g.groupby("user_id")["cents"].sum()
        xs = [float(v) for v in per_user if v > 0]
        n = len(per_user)
        mu = per_user.sum() / n
        t = sum((x / mu) * math.log(x / mu) for x in xs) / n
        r = got[et]
        assert r.n_users == n
        # engine quantizes each term at 1e-6 before the exact sum
        assert abs(r.theil_t - t) < 5e-5


def _bh_stepup(pvals: list[float], alpha: float) -> list[bool]:
    """Literal BH step-up: reject all ranks <= max(k: p_k <= k*a/m)."""
    order = sorted(range(len(pvals)), key=lambda i: pvals[i])
    m = len(pvals)
    kmax = 0
    for rank, i in enumerate(order, start=1):
        if pvals[i] <= rank * alpha / m:
            kmax = rank
    out = [False] * m
    for rank, i in enumerate(order, start=1):
        if rank <= kmax:
            out[i] = True
    return out


def test_bh_stepup_reference_semantics():
    # planted p-values where the step-up differs from naive per-rank
    # thresholding: p(2)=0.021 > 2*0.05/4 but p(3)=0.03 <= 3*0.05/4,
    # so ranks 1..3 are ALL discoveries (step-up rescues rank 2)
    p = [0.01, 0.021, 0.03, 0.9]
    assert _bh_stepup(p, 0.05) == [True, True, True, False]
    assert _bh_stepup([0.9, 0.8, 0.7, 0.6], 0.05) == [False] * 4
    assert _bh_stepup([0.001] * 4, 0.05) == [True] * 4


def test_bh_fdr_matches_reference(spark, sf_dir):
    ev = _cents(spark, sf_dir)
    ev["early"] = ev["day"] < pd.Timestamp("2024-01-16").date()
    ev["hi"] = ev["cents"] >= 5000
    rows = []
    for et, g in ev.groupby("event_type"):
        n1 = int(g["early"].sum())
        x1 = int((g["early"] & g["hi"]).sum())
        n2 = int((~g["early"]).sum())
        x2 = int(((~g["early"]) & g["hi"]).sum())
        pool = (x1 + x2) / (n1 + n2)
        z = (x1 / n1 - x2 / n2) / math.sqrt(
            pool * (1 - pool) * (1 / n1 + 1 / n2)
        )
        az = abs(z)
        phi = 1 / (1 + math.exp(-(0.07056 * az**3 + 1.5976 * az)))
        rows.append((et, n1, x1, n2, x2, z, 2 * (1 - phi)))
    ref = pd.DataFrame(
        rows, columns=["et", "n1", "x1", "n2", "x2", "z", "p"]
    )
    disc = _bh_stepup(list(ref["p"]), 0.05)
    ref["discovery"] = disc
    got = all_queries()["agg_bh_fdr"].fn(spark, sf_dir).toPandas()
    assert len(got) == len(ref)
    merged = got.merge(ref, left_on="event_type", right_on="et")
    for r in merged.itertuples():
        assert (r.n1_x, r.x1_x, r.n2_x, r.x2_x) == (r.n1_y, r.x1_y, r.n2_y, r.x2_y)
        assert abs(r.z_x - r.z_y) < 2e-6
        assert abs(r.p_value - r.p) < 2e-6
        assert bool(r.discovery_x) == bool(r.discovery_y)


def test_eb_shrinkage_matches_pandas_mom(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_partkey", "CAST(l_returnflag = 'R' AS INT) AS ret"
        )
        .toPandas()
    )
    per = li.groupby("l_partkey").agg(n=("ret", "size"), x=("ret", "sum"))
    ppm = (per["x"] * 1_000_000 // per["n"]).astype("int64")
    m = ppm.mean() / 1e6
    v = (ppm.astype(float) ** 2).mean() / 1e12 - m * m
    common = m * (1 - m) / v - 1
    alpha, beta = m * common, (1 - m) * common
    per["shrunk"] = (per["x"] + alpha) / (per["n"] + alpha + beta)
    top = per.sort_values(
        ["shrunk"], ascending=False, kind="mergesort"
    ).reset_index()
    # tiebreak on partkey like the engine
    top = top.sort_values(
        ["shrunk", "l_partkey"], ascending=[False, True], kind="mergesort"
    ).head(20)
    got = all_queries()["agg_eb_shrinkage"].fn(spark, sf_dir).toPandas()
    assert list(got["l_partkey"]) == list(top["l_partkey"])
    assert abs(got["prior_alpha"].iloc[0] - alpha) < 1e-3
    assert abs(got["prior_beta"].iloc[0] - beta) < 1e-3
    for a, b in zip(got["shrunk_rate"], top["shrunk"]):
        assert abs(a - b) < 2e-6
    # shrinkage property: every small-n extreme rate pulls toward m
    grand = per["x"].sum() / per["n"].sum()
    for r in per.itertuples():
        raw = r.x / r.n
        assert (
            min(raw, grand) - 1e-9 <= r.shrunk <= max(raw, grand) + 1e-9
            or abs(raw - grand) < 0.2
        )


def _daily_xy(spark, sf_dir) -> pd.DataFrame:
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(ts AS DATE) AS day", "event_type")
        .toPandas()
    )
    g = ev.groupby("day")
    return pd.DataFrame(
        {
            "x": g.apply(
                lambda d: int((d["event_type"] == "click").sum()),
                include_groups=False,
            ),
            "y": g.apply(
                lambda d: int((d["event_type"] == "purchase").sum()),
                include_groups=False,
            ),
        }
    ).sort_index()


def test_xcorr_lags_matches_pandas_shift(spark, sf_dir):
    d = _daily_xy(spark, sf_dir)
    got = {
        int(r.k): r
        for r in all_queries()["ts_xcorr_lags"].fn(spark, sf_dir).collect()
    }
    for k in range(-7, 8):
        # engine pairs (x at t, y at t+k)
        pair = pd.DataFrame({"x": d["x"], "y": d["y"].shift(-k)}).dropna()
        if len(pair) < 8 or pair["x"].std() == 0 or pair["y"].std() == 0:
            assert k not in got
            continue
        r = pair["x"].corr(pair["y"])
        assert got[k].n == len(pair)
        assert abs(got[k].xcorr - r) < 1e-3


def test_granger_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np

    d = _daily_xy(spark, sf_dir)
    y = d["y"].to_numpy(dtype=float)
    x = d["x"].to_numpy(dtype=float)
    yt, y1, x1 = y[1:], y[:-1], x[:-1]
    n = len(yt)
    Xr = np.column_stack([np.ones(n), y1])
    Xu = np.column_stack([np.ones(n), y1, x1])
    br, *_ = np.linalg.lstsq(Xr, yt, rcond=None)
    bu, *_ = np.linalg.lstsq(Xu, yt, rcond=None)
    rss_r = float(((yt - Xr @ br) ** 2).sum())
    rss_u = float(((yt - Xu @ bu) ** 2).sum())
    fref = (rss_r - rss_u) * (n - 3) / rss_u
    row = all_queries()["ts_granger"].fn(spark, sf_dir).collect()[0]
    assert row.n == n
    assert abs(row.coef_ylag - bu[1]) < 1e-4
    assert abs(row.coef_xlag - bu[2]) < 1e-4
    assert abs(row.f_stat - fref) < fref * 1e-4 + 1e-4


def test_sax_matches_literal_reference(spark, sf_dir):
    ev = _cents(spark, sf_dir)
    got = {
        r.event_type: r.sax_word
        for r in all_queries()["ts_sax"].fn(spark, sf_dir).collect()
    }
    q1, q3 = -0.6744897501960817, 0.6744897501960817
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["cents"].sum().sort_index()
        n = len(daily)
        vals = daily.to_numpy(dtype=float)
        mu = vals.mean()
        sd = (vals.var()) ** 0.5  # population
        segs = []
        for s in range(8):
            seg_vals = [
                v for i, v in enumerate(vals) if (i * 8) // n == s
            ]
            if not seg_vals:
                continue
            z = (sum(seg_vals) / len(seg_vals) - mu) / sd
            segs.append(
                "a" if z < q1 else "b" if z < 0 else "c" if z < q3 else "d"
            )
        assert got[et] == "".join(segs)
        assert len(got[et]) == min(8, n)


def test_hits_matches_numpy_power_iteration(spark, sf_dir):
    import numpy as np

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .count()
        .toPandas()
    )
    n = 25
    W = np.zeros((n, n))
    for r in e.itertuples():
        W[r.src, r.dst] = r.count
    h = np.ones(n)
    for _ in range(4):
        a = W.T @ h
        a = a / a.max()
        h = W @ a
        h = h / h.max()
    got = (
        all_queries()["graph_hits"].fn(spark, sf_dir).toPandas()
        .set_index("nation_id")
        .sort_index()
    )
    assert len(got) == n
    assert np.allclose(got["hub"].to_numpy(), h, atol=1e-5)
    assert np.allclose(got["authority"].to_numpy(), a, atol=1e-5)


def test_dsir_matches_hashlib_reference_and_separates_target(spark, sf_dir):
    import hashlib
    import math
    from collections import Counter

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .toPandas()
    )
    B = 1024

    def buckets(text):
        toks = text.split(" ")
        out = []
        for i in range(len(toks) - 1):
            bg = toks[i] + " " + toks[i + 1]
            hx = hashlib.md5(("dsir:" + bg).encode()).hexdigest()[:4]
            out.append(int(hx, 16) % B)
        return out

    cr, ct = Counter(), Counter()
    per_doc = {}
    for r in docs.itertuples():
        bs = buckets(r.text)
        per_doc[r.doc_id] = bs
        cr.update(bs)
        if r.lang == "en":
            ct.update(bs)
    R, T = sum(cr.values()), sum(ct.values())
    lm = {
        b: math.floor(
            (
                math.log((ct.get(b, 0) + 1.0) / (T + B))
                - math.log((cr[b] + 1.0) / (R + B))
            )
            * 1e6
        )
        for b in cr
    }
    got = all_queries()["pipeline_dsir"].fn(spark, sf_dir).toPandas()
    got = got.set_index("doc_id")
    for did, bs in per_doc.items():
        assert got.loc[did, "n_bigrams"] == len(bs)
        assert got.loc[did, "score_micro"] == sum(lm[b] for b in bs)
    # the point of DSIR: target-language docs score higher on average
    en = got[got["lang"] == "en"]["score_micro"].mean()
    other = got[got["lang"] != "en"]["score_micro"].mean()
    assert en > other


def test_cka_matches_numpy_and_self_is_one(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    mx = np.abs(X).max(axis=0)
    Y = np.round(X / mx * 127) * mx / 127
    Xq = np.floor(X * 1e6)
    Yq = np.floor(Y * 1e6)
    Xc = Xq - Xq.mean(axis=0)
    Yc = Yq - Yq.mean(axis=0)
    fxy = np.linalg.norm(Yc.T @ Xc) ** 2  # == ||Xc'Yc||_F^2
    fxx = np.linalg.norm(Xc.T @ Xc, "fro") ** 2
    fyy = np.linalg.norm(Yc.T @ Yc, "fro") ** 2
    ref = fxy / (fxx**0.5 * fyy**0.5)
    row = all_queries()["emb_cka"].fn(spark, sf_dir).collect()[0]
    assert row.n_vecs == len(X)
    assert abs(row.cka - ref) < 1e-4
    # self-CKA of the raw space is exactly 1 by construction
    self_ref = (fxx) / (fxx**0.5 * fxx**0.5)
    assert abs(self_ref - 1.0) < 1e-12
    # int8 reconstruction preserves nearly all geometry here
    assert 0.99 < row.cka <= 1.0


def test_fisher_exact_matches_fraction_reference(spark, sf_dir):
    from fractions import Fraction
    from math import comb

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT) AS di",
            "event_type",
        )
        .toPandas()
    )
    daily = (
        ev.groupby("di")
        .apply(
            lambda g: int((g["event_type"] == "purchase").sum()),
            include_groups=False,
        )
        .sort_index()
    )
    cnts = sorted(zip(daily.values, daily.index))
    med = cnts[(len(cnts) + 1) // 2 - 1][0]
    wk = {di: ((di + 3) % 7) >= 5 for di in daily.index}
    a = sum(1 for di, c in daily.items() if wk[di] and c > med)
    b = sum(1 for di, c in daily.items() if wk[di] and c <= med)
    c = sum(1 for di, c_ in daily.items() if not wk[di] and c_ > med)
    d = sum(1 for di, c_ in daily.items() if not wk[di] and c_ <= med)
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d

    def hyp(k):
        return Fraction(comb(r1, k) * comb(r2, c1 - k), comb(n, c1))

    p_obs = hyp(a)
    tol = Fraction(10000001, 10000000)
    p = sum(
        hyp(k)
        for k in range(max(0, c1 - r2), min(r1, c1) + 1)
        if hyp(k) <= p_obs * tol
    )
    row = all_queries()["agg_fisher_exact"].fn(spark, sf_dir).collect()[0]
    assert (row.n_days, row.weekend_days, row.high_days, row.a) == (
        n,
        r1,
        c1,
        a,
    )
    assert abs(row.p_two_sided - float(p)) < 1e-5
    if b * c > 0:
        assert abs(row.odds_ratio - (a * d) / (b * c)) < 1e-5


def test_label_propagation_matches_literal_loop(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey != s.s_nationkey)
        .groupBy(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .count()
        .toPandas()
    )
    und = {}
    for r in e.itertuples():
        key = (min(r.src, r.dst), max(r.src, r.dst))
        und[key] = und.get(key, 0) + r.count
    # top-3-strongest-edge backbone (mutual union), like the engine
    dense = {}
    for (x, y), w in und.items():
        dense.setdefault(x, []).append((y, w))
        dense.setdefault(y, []).append((x, w))
    kept = set()
    for v, nbs in dense.items():
        for nb, _w in sorted(nbs, key=lambda t: (-t[1], t[0]))[:3]:
            kept.add((min(v, nb), max(v, nb)))
    und = {k: und[k] for k in kept}
    adj = {}
    for (x, y), w in und.items():
        adj.setdefault(x, {})[y] = w
        adj.setdefault(y, {})[x] = w
    lbl = {v: v for v in adj}
    for _ in range(3):
        new = {}
        for v, nbs in adj.items():
            ws = {}
            for nb, w in nbs.items():
                L = lbl[nb]
                ws[L] = ws.get(L, 0) + w
            best = sorted(ws.items(), key=lambda t: (-t[1], t[0]))[0][0]
            new[v] = best
        lbl = new
    got = {
        r.nation_id: r.community
        for r in all_queries()["graph_label_propagation"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == lbl
    # communities exist: fewer labels than nodes after propagation
    assert len(set(lbl.values())) < len(lbl)


def _fixes_pdf(spark, sf_dir) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
            "(value % 180) - 90 AS lat",
            "((value * 2) % 360) - 180 AS lon",
        )
        .toPandas()
    )


def test_route_deviation_matches_literal_loop(spark, sf_dir):
    import math

    def hav(a1, o1, a2, o2):
        dlat = math.radians(a2 - a1)
        dlon = math.radians(o2 - o1)
        x = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(a1))
            * math.cos(math.radians(a2))
            * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(x))

    fx = _fixes_pdf(spark, sf_dir)
    got = {
        r.user_id: r
        for r in all_queries()["geo_route_deviation"]
        .fn(spark, sf_dir)
        .collect()
    }
    for uid, g in fx.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        pts = list(zip(g["lat"], g["lon"]))
        path = sum(
            round(hav(*pts[i], *pts[i + 1]) * 10000)
            for i in range(len(pts) - 1)
        )
        direct = round(hav(*pts[0], *pts[-1]) * 10000)
        if len(pts) < 3 or direct < 10000:
            assert uid not in got
            continue
        r = got[uid]
        assert (r.n_fixes, r.path_dm4, r.direct_dm4) == (
            len(pts),
            path,
            direct,
        )
        assert abs(r.sinuosity - path / direct) < 2e-4
        assert r.sinuosity >= 1.0  # path is never shorter than the chord


def test_point_in_polygon_matches_matplotlib_free_reference(spark, sf_dir):
    # literal ray-casting reference, entirely unlike the cross-product
    # formulation (boundary handled by the engine's >= 0 convention, so
    # compare on strictly-interior/exterior points and count parity)
    zones = {
        1: [(-40.0, 0.0), (0.0, -30.0), (40.0, 0.0), (0.0, 30.0)],
        2: [(-100.0, -48.0), (-60.0, -48.0), (-60.0, -32.0), (-100.0, -32.0)],
    }

    def inside(px, py, poly):
        n = len(poly)
        for k in range(n):
            x1, y1 = poly[k]
            x2, y2 = poly[(k + 1) % n]
            if (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) < 0:
                return False
        return True

    fx = _fixes_pdf(spark, sf_dir)
    got = {
        r.zone_id: r
        for r in all_queries()["geo_point_in_polygon"]
        .fn(spark, sf_dir)
        .collect()
    }
    for zid, poly in zones.items():
        hits = fx[[inside(r.lon, r.lat, poly) for r in fx.itertuples()]]
        if len(hits) == 0:
            assert zid not in got
            continue
        assert got[zid].n_fixes == len(hits)
        assert got[zid].n_vessels == hits["user_id"].nunique()
    assert len(got) == 2  # both zones exercised by the fixtures


def test_interrupted_matches_numpy_polyfit(spark, sf_dir):
    import numpy as np

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT) AS di",
            "CAST(event_type = 'purchase' AS INT) AS p",
        )
        .groupBy("di")
        .sum("p")
        .toPandas()
        .sort_values("di")
    )
    cut = 19738  # 2024-01-16
    t = daily["di"].to_numpy() - cut
    y = daily["sum(p)"].to_numpy(dtype=float)
    pre, post = t < 0, t >= 0
    b1, a1 = np.polyfit(t[pre].astype(float), y[pre], 1)
    b2, a2 = np.polyfit(t[post].astype(float), y[post], 1)
    row = all_queries()["ts_interrupted"].fn(spark, sf_dir).collect()[0]
    assert (row.n_pre, row.n_post) == (int(pre.sum()), int(post.sum()))
    assert abs(row.intercept_pre - a1) < 1e-4
    assert abs(row.slope_pre - b1) < 1e-4
    assert abs(row.intercept_post - a2) < 1e-4
    assert abs(row.slope_post - b2) < 1e-4
    assert abs(row.level_change - (a2 - a1)) < 2e-4
    assert abs(row.slope_change - (b2 - b1)) < 2e-4


def test_mmd_matches_numpy_means(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    X = np.floor(
        np.asarray(
            [np.asarray(v, dtype=np.float64) for v in emb["embedding"]]
        )
        * 1e6
    )
    labels = emb["label"].to_numpy()
    got = {
        (r.label_a, r.label_b): r
        for r in all_queries()["emb_mmd"].fn(spark, sf_dir).collect()
    }
    uniq = sorted(set(labels))
    assert len(got) == len(uniq) * (len(uniq) - 1) // 2
    for i, la in enumerate(uniq):
        for lb in uniq[i + 1 :]:
            ma = X[labels == la].mean(axis=0) / 1e6
            mb = X[labels == lb].mean(axis=0) / 1e6
            ref = float(((ma - mb) ** 2).sum())
            r = got[(la, lb)]
            assert (r.n_a, r.n_b) == (
                int((labels == la).sum()),
                int((labels == lb).sum()),
            )
            assert abs(r.mmd2_linear - ref) < 1e-6
            assert r.mmd2_linear >= 0


def test_adf_matches_numpy_ols(spark, sf_dir):
    import numpy as np

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT) AS di"
        )
        .groupBy("di")
        .count()
        .toPandas()
        .sort_values("di")["count"]
        .to_numpy(dtype=float)
    )
    dy = np.diff(daily)
    y1 = daily[:-1]
    n = len(dy)
    X = np.column_stack([np.ones(n), y1])
    beta, res, *_ = np.linalg.lstsq(X, dy, rcond=None)
    g = beta[1]
    resid = dy - X @ beta
    rss = float((resid**2).sum())
    se = (rss / (n - 2) / ((y1 - y1.mean()) ** 2).sum()) ** 0.5
    row = all_queries()["ts_adf"].fn(spark, sf_dir).collect()[0]
    assert row.n == n
    assert abs(row.gamma - g) < 1e-4
    assert abs(row.df_stat - g / se) < 1e-3
    assert row.is_stationary == int(g / se < -2.86)


def test_line_crossings_matches_segment_intersection(spark, sf_dir):
    gx1, gy1, gx2, gy2 = -30.0, 15.0, 30.0, -15.0

    def orient(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    fx = _fixes_pdf(spark, sf_dir)
    ref = {}
    for uid, g in fx.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        pts = list(zip(g["lon"], g["lat"]))
        nc = nf = nr = 0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            s1 = orient(gx1, gy1, gx2, gy2, x1, y1)
            s2 = orient(gx1, gy1, gx2, gy2, x2, y2)
            t1 = orient(x1, y1, x2, y2, gx1, gy1)
            t2 = orient(x1, y1, x2, y2, gx2, gy2)
            if s1 * s2 < 0 and t1 * t2 < 0:
                nc += 1
                d = (gx2 - gx1) * (y2 - y1) - (gy2 - gy1) * (x2 - x1)
                if d > 0:
                    nf += 1
                elif d < 0:
                    nr += 1
        if nc:
            ref[uid] = (nc, nf, nr)
    got = {
        r.user_id: (r.n_crossings, r.n_forward, r.n_reverse)
        for r in all_queries()["geo_line_crossings"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == ref
    assert len(got) > 0


def test_shapley_matches_itertools_reference(spark, sf_dir):
    from itertools import permutations

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type",
            "CAST(event_type = 'purchase' AND"
            " CAST(ROUND(value * 100) AS BIGINT) >= 20000 AS INT) AS conv",
        )
        .toPandas()
    )
    per = ev.pivot_table(
        index="user_id", columns="event_type", aggfunc="size", fill_value=0
    )
    conv = ev.groupby("user_id")["conv"].max()
    nu = len(per)
    chans = ["view", "click", "signup"]
    flags = {
        c: (per[c] * nu > per[c].sum()).astype(int) for c in chans
    }
    import pandas as pd_

    sets = pd_.DataFrame({c: flags[c] for c in chans})
    sets["conv"] = conv

    def v(subset):
        mask = True
        for ci, c in enumerate(chans):
            want = 1 if c in subset else 0
            mask = mask & (sets[c] == want)
        grp = sets[mask]
        return grp["conv"].mean() if len(grp) else 0.0

    # Shapley via the permutation definition — an entirely different
    # formulation from the engine's coalition-weight sum
    phi = {c: 0.0 for c in chans}
    perms = list(permutations(chans))
    for order in perms:
        acc = set()
        for c in order:
            before = v(frozenset(acc))
            acc.add(c)
            after = v(frozenset(acc))
            phi[c] += (after - before) / len(perms)
    got = {
        r.channel: r
        for r in all_queries()["evt_attribution_shapley"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert all(got[c].n_users == nu for c in chans)
    for c in chans:
        assert abs(got[c].shapley_value - phi[c]) < 2e-6
    # efficiency axiom: shapley values sum to v(N) - v(empty)
    total = sum(phi.values())
    assert abs(total - (v(frozenset(chans)) - v(frozenset()))) < 1e-9


def test_extreme_value_matches_numpy_mom(spark, sf_dir):
    import numpy as np

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(ts AS DATE) AS day",
            "CAST(ROUND(value * 100) AS BIGINT) AS cents",
        )
        .where("event_type = 'purchase' AND value IS NOT NULL")
        .toPandas()
    )
    mx = ev.groupby("day")["cents"].max().to_numpy(dtype=float)
    m, v = mx.mean(), mx.var()
    beta = (6 * v) ** 0.5 / np.pi
    mu = m - 0.5772156649015329 * beta
    rl = mu - beta * np.log(-np.log(1 - 1 / 100))
    row = all_queries()["agg_extreme_value"].fn(spark, sf_dir).collect()[0]
    assert row.n_blocks == len(mx)
    assert abs(row.gumbel_mu - mu) < mu * 1e-6 + 1e-3
    assert abs(row.gumbel_beta - beta) < beta * 1e-6 + 1e-3
    assert abs(row.return_level_100 - rl) < rl * 1e-6 + 1e-3
    # the 100-day return level must exceed the location parameter
    assert row.return_level_100 > row.gumbel_mu


def test_k_anonymity_matches_pandas(spark, sf_dir):
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .selectExpr(
            "c_nationkey",
            "c_mktsegment",
            "CAST(ROUND(c_acctbal) AS BIGINT) div 1000 AS band",
        )
        .toPandas()
    )
    g = c.groupby(["c_nationkey", "c_mktsegment"]).agg(
        sz=("band", "size"), l_div=("band", "nunique")
    )
    row = all_queries()["profile_k_anonymity"].fn(spark, sf_dir).collect()[0]
    assert row.n_classes == len(g)
    assert row.n_rows == len(c)
    assert row.min_class == int(g["sz"].min())
    below = g[g["sz"] < 5]
    assert row.rows_below_k == int(below["sz"].sum())
    assert row.classes_below_k == len(below)
    assert row.rows_below_k_ppm == int(below["sz"].sum()) * 1_000_000 // len(c)
    assert row.min_l_diversity == int(g["l_div"].min())


def test_ipf_raking_matches_literal_loop_and_margins(spark, sf_dir):
    import math

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey", "c_mktsegment")
        .toPandas()
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .toPandas()
    )
    oc = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    seed = cust.groupby(["c_nationkey", "c_mktsegment"]).size()
    trow = oc.groupby("c_nationkey").size()
    tcol = oc.groupby("c_mktsegment").size()
    w = {k: v * 1_000_000 for k, v in seed.items()}
    for _ in range(3):
        rs = {}
        for (n, s), v in w.items():
            rs[n] = rs.get(n, 0) + v
        w = {
            (n, s): math.floor(float(v) * (float(trow[n]) * 1e6) / float(rs[n]))
            for (n, s), v in w.items()
        }
        cs = {}
        for (n, s), v in w.items():
            cs[s] = cs.get(s, 0) + v
        w = {
            (n, s): math.floor(float(v) * (float(tcol[s]) * 1e6) / float(cs[s]))
            for (n, s), v in w.items()
        }
    got = {
        (r.nationkey, r.mktsegment): r
        for r in all_queries()["agg_ipf_raking"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(w)
    for key, v in w.items():
        assert got[key].seed == seed[key]
        assert abs(got[key].raked_weight - math.floor(v / 1e6 * 1e4) / 1e4) < 1e-9
    # IPF's point: after the final column step, column margins match the
    # order-volume targets almost exactly
    cs = {}
    for (n, s), v in w.items():
        cs[s] = cs.get(s, 0) + v / 1e6
    for s, t in tcol.items():
        assert abs(cs[s] - t) / t < 1e-4


def test_tail_dependence_matches_pandas(spark, sf_dir):
    d = _daily_xy(spark, sf_dir).reset_index()
    d = d.sort_values("day").reset_index(drop=True)
    nd = len(d)
    rank_pos = (nd * 3 + 3) // 4  # discrete 75th percentile rank
    qx = sorted(zip(d["x"], d["day"]))[rank_pos - 1][0]
    qy = sorted(zip(d["y"], d["day"]))[rank_pos - 1][0]
    nx = int((d["x"] > qx).sum())
    ny = int((d["y"] > qy).sum())
    nxy = int(((d["x"] > qx) & (d["y"] > qy)).sum())
    row = all_queries()["agg_tail_dependence"].fn(spark, sf_dir).collect()[0]
    assert (row.n_days, row.nx, row.ny, row.nxy) == (nd, nx, ny, nxy)
    if ny > 0:
        assert row.lambda_u_ppm == nxy * 1_000_000 // ny
    if nx * ny > 0:
        assert row.lift_ppm == nxy * nd * 1_000_000 // (nx * ny)


def test_cointegration_matches_numpy_two_stage(spark, sf_dir):
    import numpy as np

    d = _daily_xy(spark, sf_dir)
    x = d["x"].to_numpy(dtype=float)
    y = d["y"].to_numpy(dtype=float)
    b, a = np.polyfit(x, y, 1)
    e = np.floor((y - (a + b * x)) * 1e6)
    de, e1 = np.diff(e), e[:-1]
    n = len(de)
    X = np.column_stack([np.ones(n), e1])
    beta, *_ = np.linalg.lstsq(X, de, rcond=None)
    resid = de - X @ beta
    rss = float((resid**2).sum())
    se = (rss / (n - 2) / ((e1 - e1.mean()) ** 2).sum()) ** 0.5
    eg = beta[1] / se
    row = all_queries()["ts_cointegration"].fn(spark, sf_dir).collect()[0]
    assert row.n_days == len(x)
    assert abs(row.hedge_ratio - b) < 1e-4
    assert abs(row.resid_gamma - beta[1]) < 1e-4
    assert abs(row.eg_stat - eg) < 1e-3
    assert row.is_cointegrated == int(eg < -3.37)


def test_fourier_profile_matches_numpy_projection(spark, sf_dir):
    import numpy as np

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT) AS di"
        )
        .groupBy("di")
        .count()
        .toPandas()
        .sort_values("di")["count"]
        .to_numpy(dtype=float)
    )
    n = (len(daily) // 7) * 7
    y = daily[:n]
    t = np.arange(n)
    got = {
        r.harmonic: r
        for r in all_queries()["ts_fourier_profile"].fn(spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 3}
    for k in (1, 2, 3):
        a = 2 / n * (y * np.cos(2 * np.pi * k * t / 7)).sum()
        b = 2 / n * (y * np.sin(2 * np.pi * k * t / 7)).sum()
        r = got[k]
        assert r.n_days_used == n
        # engine quantizes each term at 1e-6; amplitudes are O(1..10)
        assert abs(r.a_k - a) < 2e-4
        assert abs(r.b_k - b) < 2e-4
        assert abs(r.amplitude - (a * a + b * b) ** 0.5) < 3e-4
        assert abs(r.phase_rad - np.arctan2(b, a)) < 1e-3
    # orthogonality sanity: reconstructing day-of-week means from the
    # three harmonics + mean reproduces the actual weekly profile
    mean = y.mean()
    recon = np.array(
        [
            mean
            + sum(
                got[k].a_k * np.cos(2 * np.pi * k * dow / 7)
                + got[k].b_k * np.sin(2 * np.pi * k * dow / 7)
                for k in (1, 2, 3)
            )
            for dow in range(7)
        ]
    )
    actual = np.array([y[dow::7].mean() for dow in range(7)])
    assert np.allclose(recon, actual, atol=0.05 * max(1.0, abs(actual).max()))


def test_conductance_matches_literal_reference(spark, sf_dir):
    lp = {
        r.nation_id: r.community
        for r in all_queries()["graph_label_propagation"]
        .fn(spark, sf_dir)
        .collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey != s.s_nationkey)
        .groupBy(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .count()
        .toPandas()
    )
    und = {}
    for r in e.itertuples():
        key = (min(r.src, r.dst), max(r.src, r.dst))
        und[key] = und.get(key, 0) + r.count
    dense = {}
    for (x, y), w in und.items():
        dense.setdefault(x, []).append((y, w))
        dense.setdefault(y, []).append((x, w))
    kept = set()
    for v, nbs in dense.items():
        for nb, _w in sorted(nbs, key=lambda t: (-t[1], t[0]))[:3]:
            kept.add((min(v, nb), max(v, nb)))
    und = {k: und[k] for k in kept}
    total = 2 * sum(und.values())
    vol, cut, members = {}, {}, {}
    for (a, b), w in und.items():
        for v in (a, b):
            cm = lp[v]
            vol[cm] = vol.get(cm, 0) + w
            members.setdefault(cm, set()).add(v)
        if lp[a] != lp[b]:
            cut[lp[a]] = cut.get(lp[a], 0) + w
            cut[lp[b]] = cut.get(lp[b], 0) + w
    got = {
        r.community: r
        for r in all_queries()["graph_conductance"].fn(spark, sf_dir).collect()
    }
    for cm, vw in vol.items():
        den = min(vw, total - vw)
        if den <= 0:
            assert cm not in got
            continue
        r = got[cm]
        assert r.n_members == len(members[cm])
        assert r.vol_w == vw
        assert r.cut_w == cut.get(cm, 0)
        assert r.conductance_ppm == cut.get(cm, 0) * 1_000_000 // den
    assert len(got) >= 2  # the backbone split is non-degenerate


def test_control_chart_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(unix_micros(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " div 86400000000 AS BIGINT) AS di",
            "CAST(ROUND(value * 100) AS BIGINT) AS cents",
        )
        .where("event_type = 'purchase' AND value IS NOT NULL")
        .toPandas()
    )
    daily = ev.groupby("di")["cents"].sum().sort_index()
    mr = daily.diff().abs().dropna()
    center = daily.mean()
    sigma = mr.mean() / 1.128
    got = {
        r.day_index: r
        for r in all_queries()["ts_control_chart"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(daily.index)
    for di, y in daily.items():
        r = got[di]
        assert r.y == y
        assert abs(r.center - center) < 0.02
        assert abs(r.lcl - (center - 3 * sigma)) < 0.02
        assert abs(r.ucl - (center + 3 * sigma)) < 0.02
        assert r.out_of_control == int(
            y < center - 3 * sigma or y > center + 3 * sigma
        )


def test_markov_entropy_matches_literal_loop(spark, sf_dir):
    import math

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        )
        .toPandas()
    )
    counts = {}
    for _, g in ev.groupby("user_id"):
        seq = list(g.sort_values(["ts_us", "event_id"])["event_type"])
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    tot = {}
    for (a, _b), n in counts.items():
        tot[a] = tot.get(a, 0) + n
    gt = sum(counts.values())
    h = {
        a: -sum(
            (n / tot[a]) * math.log2(n / tot[a])
            for (x, _b), n in counts.items()
            if x == a
        )
        for a in tot
    }
    rate = sum(tot[a] / gt * h[a] for a in tot)
    got = {
        r.state: r
        for r in all_queries()["evt_markov_entropy"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(tot)
    for a in tot:
        assert abs(got[a].pi - tot[a] / gt) < 2e-6
        assert abs(got[a].h_state_bits - h[a]) < 1e-5
        assert abs(got[a].entropy_rate_bits - rate) < 1e-5
    # ceiling: entropy rate cannot exceed log2(#states)
    assert rate <= math.log2(len(tot)) + 1e-9
