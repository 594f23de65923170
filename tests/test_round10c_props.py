"""Brute-force references for round-10 pack 3 (agg_hodges_lehmann,
text_chao1, emb_jl_projection, pipeline_pair_rouge): each query's
values recomputed with plain Python from the raw parquet, independent
of both engines' SQL."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from shippinglanes_spark.operators.stats13 import (
    _JL_D,
    _JL_IDS,
    _JL_K,
    _JL_SIGNS,
)
from shippinglanes_spark.functions.pipeline7 import _PP_MARGIN
from shippinglanes_spark.registry import all_queries

Q = all_queries()


def _floor(x: float, dp: int) -> float:
    return math.floor(x * 10**dp) / 10**dp


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


def test_hodges_lehmann_matches_python(spark, sf_dir, daily):
    types, days, c = daily
    got = {
        r.event_type: r
        for r in Q["agg_hodges_lehmann"].fn(spark, sf_dir).collect()
    }
    for t in types:
        xs = [c[(t, d)] for d in days]
        n = len(xs)
        walsh2 = sorted(
            xs[i] + xs[j] for i in range(n) for j in range(i, n)
        )
        assert len(walsh2) == n * (n + 1) // 2
        hl = walsh2[(len(walsh2) + 1) // 2 - 1] / 2
        r = got[t]
        assert r.n_days == n
        assert r.n_walsh == len(walsh2)
        assert r.hl == hl
        assert r.mean_daily == _floor(sum(xs) / n, 6)
    # robustness contrast visible somewhere (not necessarily every
    # type — at sf0.001 a symmetric series can land HL == mean)
    assert any(got[t].hl != got[t].mean_daily for t in types)
    # the estimator must be the median of Walsh averages, not the
    # median of the series: verify on a skewed synthetic case
    ys = [0, 0, 0, 1, 100]
    w2 = sorted(
        ys[i] + ys[j] for i in range(5) for j in range(i, 5)
    )
    assert w2[(15 + 1) // 2 - 1] / 2 == 0.5  # pairwise, pulls off 0


def test_chao1_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    grams = defaultdict(Counter)
    for lang, text in rows:
        ws = text.split(" ")
        for i in range(len(ws) - 2):
            grams[lang][" ".join(ws[i : i + 3])] += 1
    got = {
        r.lang: r for r in Q["text_chao1"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(grams)
    for lang, cnt in grams.items():
        v = len(cnt)
        n = sum(cnt.values())
        f1 = sum(1 for x in cnt.values() if x == 1)
        f2 = sum(1 for x in cnt.values() if x == 2)
        r = got[lang]
        assert (r.v_obs, r.f1, r.f2) == (v, f1, f2)
        assert r.chao1 == _floor(v + f1 * (f1 - 1) / (2 * (f2 + 1)), 3)
        assert r.coverage == _floor(1 - f1 / n, 6)
        # unseen mass is real on trigrams (the word-level axis
        # saturates; this one must not)
        assert r.chao1 > 1.5 * v
        assert 0 < r.coverage < 1


def test_jl_projection_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id < {_JL_IDS} ORDER BY vec_id"
    ).fetchall()
    con.close()
    got = {
        r.vec_id: r
        for r in Q["emb_jl_projection"].fn(spark, sf_dir).collect()
    }
    assert len(got) == len(rows)
    ratios = []
    for vec_id, label, emb in rows:
        x = [float(v) for v in emb]
        assert len(x) == _JL_D
        p = []
        for d in range(_JL_K):
            acc = 0.0
            for j in range(_JL_D):
                acc = acc + _JL_SIGNS[d][j] * x[j]
            p.append(acc)
        nx2 = 0.0
        for j in range(_JL_D):
            nx2 = nx2 + x[j] * x[j]
        ratio = sum(q * q for q in p) / (_JL_K * nx2)
        r = got[vec_id]
        assert r.label == label
        assert r.proj0 == _floor(p[0], 6)
        assert r.proj1 == _floor(p[1], 6)
        assert r.proj2 == _floor(p[2], 6)
        ratios.append(r.norm_ratio)
    # JL concentration: for Gaussian data ratio ~ chi2_k/k; the
    # synthetic embeddings are heavier-tailed (fixture max ~ 7 at
    # sf0.01), so assert the distribution's center and bulk, not the
    # extremes (probed at all three SFs: mean 0.95-1.03, bulk 73-78%)
    assert min(ratios) > 0 and max(ratios) < 20.0
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.85 < mean_ratio < 1.15
    inside = sum(1 for r_ in ratios if 0.3 < r_ < 2.0)
    assert inside / len(ratios) > 0.65
    # the sign matrix is balanced-ish (a degenerate all-+1 row would
    # make proj ~ sum(x) and ruin isotropy)
    for d in range(_JL_K):
        s = sum(_JL_SIGNS[d])
        assert abs(s) < _JL_D // 2


def test_pair_rouge_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, source, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    by_bucket = defaultdict(list)
    text_of = {}
    for doc_id, lang, source, text in rows:
        ws = text.split(" ")
        score = len(set(ws)) * 1000 // len(ws)
        by_bucket[(lang, source)].append((score, int(doc_id)))
        text_of[int(doc_id)] = ws
    expected = {}
    for key, docs in by_bucket.items():
        # ORDER BY score DESC, doc_id -> max score, SMALLEST doc_id;
        # ORDER BY score ASC, doc_id -> min score, SMALLEST doc_id
        best = max(docs, key=lambda t: (t[0], -t[1]))
        worst = min(docs, key=lambda t: (t[0], t[1]))
        if best[1] == worst[1] or best[0] - worst[0] < _PP_MARGIN:
            continue
        cc = Counter(text_of[best[1]])
        cr = Counter(text_of[worst[1]])
        ov = sum(min(cc[t], cr[t]) for t in cc)
        n_c, n_r = sum(cc.values()), sum(cr.values())
        expected[key] = (
            best[1],
            worst[1],
            ov,
            ov * 1_000_000 // n_c,
            ov * 1_000_000 // n_r,
            2 * ov * 1_000_000 // (n_c + n_r),
        )
    got = {
        (r.lang, r.source): (
            r.chosen_doc,
            r.rejected_doc,
            r.overlap,
            r.p_ppm,
            r.r_ppm,
            r.f1_ppm,
        )
        for r in Q["pipeline_pair_rouge"].fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) >= 10
    # F1 is the harmonic mean: between min(P, R) and max(P, R)
    for cho, rej, ov, p, r_, f1 in expected.values():
        assert min(p, r_) <= f1 <= max(p, r_)
