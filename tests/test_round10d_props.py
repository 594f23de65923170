"""Brute-force references for round-10 pack 4 (ts_ses_select,
profile_key_candidates): values recomputed with plain Python from the
raw parquet, independent of both engines' SQL."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from shippinglanes_spark.operators.stats13 import _SES_ALPHAS
from shippinglanes_spark.registry import all_queries

Q = all_queries()


def _floor(x: float, dp: int) -> float:
    return math.floor(x * 10**dp) / 10**dp


def test_ses_select_matches_python(spark, sf_dir):
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
    got = {
        r.event_type: r
        for r in Q["ts_ses_select"].fn(spark, sf_dir).collect()
    }
    for t in types:
        xs = [float(c[(t, d)]) for d in days]
        fits = {}
        for k, alpha in _SES_ALPHAS:
            level = xs[0]
            sse = 0.0
            for x in xs[1:]:
                err = x - level
                sse = sse + err * err
                level = level + alpha * err
            fits[k] = (level, sse)
        best_k = min(fits, key=lambda k: (fits[k][1], k))
        r = got[t]
        assert r.best_alpha_eighths == best_k
        assert r.sse == _floor(fits[best_k][1], 3)
        assert r.forecast == _floor(fits[best_k][0], 6)
        # the backtest must genuinely discriminate: the worst alpha's
        # SSE exceeds the winner's by a real margin
        worst = max(fits.values(), key=lambda v: v[1])[1]
        assert worst > 1.05 * fits[best_k][1]


def test_key_candidates_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,"
        f" o_totalprice, o_orderdate FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    con.close()
    n = len(rows)
    cols = {
        "o_orderkey": {r[0] for r in rows},
        "o_custkey": {r[1] for r in rows},
        "o_orderstatus": {r[2] for r in rows},
        "o_orderpriority": {r[3] for r in rows},
        "o_totalprice": {r[4] for r in rows},
        "o_orderdate": {r[5] for r in rows},
        "o_custkey+o_orderdate": {(r[1], r[5]) for r in rows},
    }
    got = {
        r.col: r
        for r in Q["profile_key_candidates"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(cols)
    for col, vals in cols.items():
        r = got[col]
        assert r.n_rows == n
        assert r.n_distinct == len(vals)
        assert r.uniqueness_ppm == len(vals) * 1_000_000 // n
        assert r.is_key == (len(vals) == n)
    # the fixture's ground truth: the surrogate key IS a key, enum
    # columns are nowhere near, the composite is high but imperfect
    assert got["o_orderkey"].is_key
    assert not got["o_orderstatus"].is_key
    assert got["o_orderstatus"].n_distinct < 10
    assert (
        900_000 < got["o_custkey+o_orderdate"].uniqueness_ppm < 1_000_000
        or got["o_custkey+o_orderdate"].is_key
    )
