"""Independent semantic cross-checks for the round-5 session-4 batch
(URL canonicalization dedup, STL-lite decomposition, windowed 3-step
funnel, freshness audit): DuckDB oracles prove cross-engine equality;
these prove the SEMANTICS against urllib / pandas / pure-python
references that share no code with either engine's formulation."""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit

import pandas as pd

from shippinglanes_spark.registry import all_queries

_W = 24 * 3600 * 1_000_000


def _ref_canonical(url: str) -> str:
    """RFC-style reference canonicalizer built on urllib.parse — a
    genuinely independent formulation vs the engine's regexp chain."""
    s = urlsplit(url)
    host = s.hostname or ""
    port = f":{s.port}" if s.port and s.port != 443 else ""
    path = s.path.rstrip("/")
    q = [
        (k, v)
        for k, v in parse_qsl(s.query)
        if not k.startswith("utm_") and k != "fbclid"
    ]
    query = f"?{urlencode(q)}" if q else ""
    return f"{s.scheme.lower()}://{host}{port}{path}{query}".lower()


def test_url_canonicalize_matches_urllib(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .toPandas()
    )

    def variant(row):
        k, m = row.doc_id % 100, row.doc_id % 4
        base = f"https://{row.source}.example.com/page/{k}"
        if m == 0:
            return base
        if m == 1:
            return (
                f"HTTPS://{row.source.upper()}.EXAMPLE.COM:443/page/{k}/"
            )
        if m == 2:
            return base + "?utm_source=feed"
        return base + f"?id={k}&utm_medium=mail#frag"

    docs["canon"] = [
        _ref_canonical(variant(r)) for r in docs.itertuples()
    ]
    ref = (
        docs.groupby("canon")
        .agg(
            n_variants=("doc_id", "size"),
            keep_doc_id=("doc_id", "min"),
            total_chars=("n_chars", "sum"),
        )
        .reset_index()
        .rename(columns={"canon": "canonical_url"})
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    got = (
        all_queries()["pipeline_url_canonicalize"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_variants": "int64", "total_chars": "int64"}),
        ref.astype({"n_variants": "int64", "total_chars": "int64"}),
    )
    # and every canonical form is actually canonical
    for u in got["canonical_url"]:
        assert u == u.lower()
        assert "utm_" not in u and "#" not in u and ":443" not in u
        assert not u.endswith("/")


def test_stl_decompose_properties(spark, sf_dir):
    got = all_queries()["ts_stl_decompose"].fn(spark, sf_dir).toPandas()
    daily = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderpriority AS series",
            "datediff(o_orderdate, DATE '1995-01-01') AS d",
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c",
        )
        .groupBy("series", "d")
        .sum("c")
        .toPandas()
        .rename(columns={"sum(c)": "v"})
    )
    # 1. trend is the pandas centered 7-row rolling mean (floored),
    #    defined exactly on full windows
    for series, grp in daily.groupby("series"):
        g = grp.sort_values("d").reset_index(drop=True)
        roll = g["v"].rolling(7, center=True).sum()
        ref = (
            pd.DataFrame(
                {"d": g["d"], "trend_c": (roll // 7).astype("Int64")}
            )
            .dropna()
            .astype({"trend_c": "int64"})
        )
        sub = got[got["series"] == series][["d", "trend_c"]]
        m = sub.merge(ref, on="d", suffixes=("", "_ref"))
        assert len(m) == len(sub) == len(ref)
        assert (m["trend_c"] == m["trend_c_ref"]).all()
    # 2. the seasonal component is mean-centered: residuals sum to ~0
    #    within every (series, dow) cell
    got["dow"] = got["d"] % 7
    got["resid_mid"] = got["resid_4"] + 0.00005  # undo floor, +-0.5ulp
    cell = got.groupby(["series", "dow"])["resid_mid"].agg(["sum", "size"])
    assert (cell["sum"].abs() <= 0.0002 * cell["size"]).all()
    # 3. anomalies are rare (MAD gate) but the flag column is live
    frac = got["is_anomaly"].mean()
    assert frac < 0.35


def test_funnel_steps_matches_python(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        )
        .toPandas()
    )
    ref = {}
    for uid, grp in ev.groupby("user_id"):
        views = grp[grp.event_type == "view"]["ts_us"]
        if views.empty:
            continue
        t1 = int(views.min())
        t2 = t3 = None
        clicks = grp[
            (grp.event_type == "click")
            & (grp.ts_us >= t1)
            & (grp.ts_us - t1 <= _W)
        ]["ts_us"]
        if not clicks.empty:
            t2 = int(clicks.min())
            buys = grp[
                (grp.event_type == "purchase")
                & (grp.ts_us >= t2)
                & (grp.ts_us - t2 <= _W)
            ]["ts_us"]
            if not buys.empty:
                t3 = int(buys.min())
        ref[uid] = (t1, t2, t3, 1 + (t2 is not None) + (t3 is not None))
    got = all_queries()["evt_funnel_steps"].fn(spark, sf_dir).collect()
    assert len(got) == len(ref)
    for row in got:
        t1, t2, t3, step = ref[row.user_id]
        assert (row.t1, row.t2, row.t3, row.furthest_step) == (
            t1,
            t2,
            t3,
            step,
        )
    # funnel is monotone: each step's cohort shrinks
    n2 = sum(1 for v in ref.values() if v[1] is not None)
    n3 = sum(1 for v in ref.values() if v[2] is not None)
    assert len(ref) >= n2 >= n3


def test_freshness_matches_pandas(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        )
        .toPandas()
    )
    corpus_max = ev["ts_us"].max()
    got = {
        r.event_type: r
        for r in all_queries()["profile_freshness"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(ev["event_type"].unique())
    for et, grp in ev.groupby("event_type"):
        ts = grp["ts_us"].sort_values().to_numpy()
        gaps = (ts[1:] - ts[:-1]).tolist()
        row = got[et]
        assert row.n == len(ts)
        assert row.last_ts_us == int(ts[-1])
        # discrete p95: smallest observed gap with cume_dist >= 0.95
        gaps.sort()
        import math

        idx = math.ceil(0.95 * len(gaps)) - 1
        assert row.p95_gap_us == gaps[idx]
        stale = (corpus_max - ts[-1]) // 60_000_000
        assert row.staleness_min == stale
        assert row.is_stale == (stale > 30)


def _py_geohash(lat: float, lon: float, length: int = 8) -> str:
    """Classic bisection geohash encoder — independent of the engine's
    integer-interleave formulation."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, even, ch, out = 0, True, 0, []
    while len(out) < length:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alpha[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_matches_bisection_reference(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "(value % 180) - 90 AS lat",
            "((value * 2) % 360) - 180 AS lon",
        )
        .toPandas()
    )
    ev["gh8"] = [
        _py_geohash(la, lo) for la, lo in zip(ev["lat"], ev["lon"])
    ]
    ev["cell5"] = ev["gh8"].str[:5]
    ref = (
        ev.groupby("cell5")
        .agg(
            n_fixes=("gh8", "size"),
            n_vessels=("user_id", "nunique"),
            sample_gh8=("gh8", "min"),
        )
        .reset_index()
        .sort_values("cell5")
        .reset_index(drop=True)
    )
    got = (
        all_queries()["geo_geohash"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("cell5")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_fixes": "int64", "n_vessels": "int64"}),
        ref.astype({"n_fixes": "int64", "n_vessels": "int64"}),
    )


def test_random_walks_follow_edges_and_hash_picks(spark, sf_dir):
    import hashlib
    from collections import defaultdict

    rows = all_queries()["graph_random_walks"].fn(spark, sf_dir).collect()
    walks = defaultdict(dict)
    for r in rows:
        walks[r.walk_id][r.step] = r.node
    # rebuild the above-average trade graph independently
    from shippinglanes_spark.operators.graph import _trade_und

    und = {(r.a, r.b) for r in _trade_und(spark, sf_dir).collect()}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    assert set(walks) == set(adj)
    for wid, seq in walks.items():
        assert sorted(seq) == [0, 1, 2, 3, 4]
        assert seq[0] == wid
        for t in range(1, 5):
            cur = seq[t - 1]
            nbrs = sorted(adj[cur])
            h = hashlib.md5(f"walk:{wid}:{t}".encode()).hexdigest()
            pick = int(h[:13], 16) % len(nbrs)
            assert seq[t] == nbrs[pick]  # the exact derandomized pick
            assert seq[t] in adj[cur]  # and a real edge
