"""Sakoe-Chiba banded DTW (ts_dtw_banded) contracts.

The banded variant is ts_dtw's scale dial implemented as code: per-pair
work days*w instead of days^2. These tests pin its semantics against
(a) a plain-python banded DP on synthetic series, (b) the exact ts_dtw
on the fixture (band >= warping => equal; any band => upper bound).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from shippinglanes_spark.operators.timeseries import (
    _DTW_BAND,
    _DTW_INF,
    _dtw_banded_cost,
    _dtw_pairs,
    ts_dtw,
    ts_dtw_banded,
)


def _py_banded_dtw(va: list[int], vb: list[int], w: int) -> int:
    """Reference banded DP: full matrix, out-of-band cells = INF,
    in-band cells capped at INF — the exact recurrence both engines
    implement."""
    na, nb = len(va), len(vb)
    dp = [[_DTW_INF] * (nb + 1) for _ in range(na + 1)]
    dp[0][0] = 0
    for i in range(1, na + 1):
        for j in range(1, nb + 1):
            if abs(i - j) > w:
                continue
            dp[i][j] = min(
                _DTW_INF,
                abs(va[i - 1] - vb[j - 1])
                + min(dp[i - 1][j - 1], dp[i - 1][j], dp[i][j - 1]),
            )
    return dp[na][nb]


def _banded_on(spark, rows, w):
    """Run the engine's banded fold over literal (va, vb) pairs."""
    df = spark.createDataFrame(
        [(list(map(int, a)), list(map(int, b)), len(b)) for a, b in rows],
        "va array<long>, vb array<long>, nb long",
    )
    return [
        r["cost"]
        for r in df.select(
            _dtw_banded_cost(w).cast("long").alias("cost")
        ).collect()
    ]


SYNTH = [
    ([3], [3]),  # 1x1, on-diagonal
    ([1, 3], [2, 2, 5]),  # the hand-checked 2x3 from the oracle prototype
    ([5, 1, 1, 9], [5, 9]),  # warping compresses the middle
    ([1, 2, 3, 4, 5, 6, 7, 8], [8, 7, 6, 5, 4, 3, 2, 1]),  # reversed
    ([4, 4, 4, 4, 4, 4, 4, 4, 4, 4], [4]),  # extreme length skew
    ([0, 100, 0, 100, 0], [100, 0, 100]),  # alternation
]


@pytest.mark.parametrize("w", [0, 1, 2, 7, 64])
def test_banded_fold_matches_python_reference(spark, w):
    got = _banded_on(spark, SYNTH, w)
    want = [_py_banded_dtw(a, b, w) for a, b in SYNTH]
    assert got == want, (w, got, want)


def test_band_zero_is_diagonal_or_unreachable(spark):
    # w=0 allows only i==j: unequal lengths must hit the INF sentinel
    got = _banded_on(spark, [([1, 2, 3], [1, 2])], 0)
    assert got == [_DTW_INF]
    # equal lengths: the pure diagonal sum
    got = _banded_on(spark, [([1, 5, 9], [2, 5, 7])], 0)
    assert got == [1 + 0 + 2]


def test_fixture_banded_is_upper_bound_and_wide_band_is_exact(spark, sf_dir):
    exact = {
        (r["type_a"], r["type_b"]): r["dtw_cost"]
        for r in ts_dtw(spark, sf_dir).collect()
    }
    banded = {
        (r["type_a"], r["type_b"]): r["dtw_cost"]
        for r in ts_dtw_banded(spark, sf_dir).collect()
    }
    assert set(banded) == set(exact) and len(exact) > 0
    for k in exact:
        assert banded[k] >= exact[k], (k, banded[k], exact[k])

    # a band covering the whole calendar IS the exact DP
    pairs = _dtw_pairs(spark, sf_dir)
    max_n = pairs.agg(
        F.max(F.greatest("na", "nb")).alias("m")
    ).collect()[0]["m"]
    wide = {
        (r["type_a"], r["type_b"]): r["cost"]
        for r in pairs.select(
            "type_a",
            "type_b",
            _dtw_banded_cost(int(max_n)).cast("long").alias("cost"),
        ).collect()
    }
    assert wide == exact


def test_band_monotone_in_w(spark):
    # widening the band can only lower (or keep) the cost
    rows = [([1, 9, 1, 9, 1, 9], [9, 1, 9, 1, 9, 1])]
    costs = [_banded_on(spark, rows, w)[0] for w in (0, 1, 2, 3, 6)]
    assert costs == sorted(costs, reverse=True)
    assert costs[-1] == _py_banded_dtw(rows[0][0], rows[0][1], 6)


def test_registered_band_literal_is_the_documented_one():
    assert _DTW_BAND == 7  # oracle SQL and notes embed this literal


from hypothesis import given, settings
from hypothesis import strategies as st

_series = st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=8)


@settings(max_examples=12, deadline=None)
@given(va=_series, vb=_series, w=st.integers(min_value=0, max_value=9))
def test_banded_fold_hypothesis(spark, va, vb, w):
    """Random series and band widths: the Spark fold IS the banded DP.
    Also pins the two structural invariants: banded >= exact (band can
    only remove paths) and full-width band == exact."""
    got = _banded_on(spark, [(va, vb)], w)[0]
    assert got == _py_banded_dtw(va, vb, w)
    exact = _py_banded_dtw(va, vb, max(len(va), len(vb)))
    assert got >= exact
    wide = _banded_on(spark, [(va, vb)], max(len(va), len(vb)))[0]
    assert wide == exact
