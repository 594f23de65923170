"""Hypothesis invariants for the round-9 pack algebra — pure-python
properties of the identities the queries rely on, independent of Spark
and DuckDB entirely:

- the Bradley-Terry MM fixed point reproduces every player's observed
  win total (W_i == sum_j n_ij * p_i/(p_i+p_j)) and is equivariant
  under player relabeling;
- ERR's cascade fold is maximized by the relevance-sorted ranking and
  is bounded by the all-relevant geometric ceiling;
- PAV's unrolled merge fold equals the true while-loop PAV, conserves
  mass, and matches the minimax (lower-set maxima) characterization of
  isotonic regression;
- the Ljung-Box integer-algebra autocorrelations (A_t = n*c_t - S)
  equal the textbook mean-centered r_k.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _bt_fit(w: list[list[int]], iters: int = 200) -> list[float]:
    k = len(w)
    p = [1.0] * k
    for _ in range(iters):
        p = [
            sum(w[i])
            / sum((w[i][j] + w[j][i]) / (p[i] + p[j]) for j in range(k))
            for i in range(k)
        ]
    return p


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=9), min_size=4,
                 max_size=4),
        min_size=4,
        max_size=4,
    )
)
def test_bt_fixed_point_reproduces_win_totals(rows):
    # build a strongly-connected win matrix (all pair counts >= 1, so
    # the MLE exists); zero the diagonal
    k = 4
    w = [[rows[i][j] if i != j else 0 for j in range(k)] for i in range(k)]
    p = _bt_fit(w)
    for i in range(k):
        expected_wins = sum(
            (w[i][j] + w[j][i]) * p[i] / (p[i] + p[j])
            for j in range(k)
            if j != i
        )
        assert math.isclose(expected_wins, sum(w[i]), rel_tol=1e-9)
    # relabeling equivariance: permute players, ratings permute
    perm = [2, 0, 3, 1]
    wp = [[w[perm[i]][perm[j]] for j in range(k)] for i in range(k)]
    pp = _bt_fit(wp)
    z, zp = sum(p), sum(pp)
    for i in range(k):
        assert math.isclose(pp[i] / zp, p[perm[i]] / z, rel_tol=1e-7)


def _err(rels: list[int]) -> float:
    err, pmass = 0.0, 1.0
    for rk, rel in enumerate(rels, start=1):
        r_stop = (2.0**rel - 1) / 8.0
        err += pmass * r_stop / rk
        pmass *= 1 - r_stop
    return err


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=3), min_size=1,
                max_size=10))
def test_err_maximized_by_relevance_sorted_ranking(rels):
    ideal = _err(sorted(rels, reverse=True))
    assert _err(rels) <= ideal + 1e-12
    # geometric ceiling: every position fully relevant (rel = 3)
    ceiling = _err([3] * len(rels))
    assert ideal <= ceiling + 1e-12
    assert 0.0 <= _err(rels) <= 1.0


def _pav_while(bins: list[tuple[int, int]]) -> list[list[int]]:
    stack: list[list[int]] = []
    for n, pos in bins:
        stack.append([n, pos, 1])
        while (
            len(stack) >= 2
            and stack[-1][1] * stack[-2][0] < stack[-2][1] * stack[-1][0]
        ):
            b2 = stack.pop()
            b1 = stack.pop()
            stack.append([b1[0] + b2[0], b1[1] + b2[1], b1[2] + b2[2]])
    return stack


def _pav_unrolled(bins: list[tuple[int, int]], merges: int) -> list[list[int]]:
    """The query's shape: a FIXED number of conditional merge steps
    after each push (no while loop)."""
    stack: list[list[int]] = []
    for n, pos in bins:
        stack.append([n, pos, 1])
        for _ in range(merges):
            if (
                len(stack) >= 2
                and stack[-1][1] * stack[-2][0] < stack[-2][1] * stack[-1][0]
            ):
                b2 = stack.pop()
                b1 = stack.pop()
                stack.append([b1[0] + b2[0], b1[1] + b2[1], b1[2] + b2[2]])
    return stack


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=50),
                  st.integers(min_value=0, max_value=50)),
        min_size=1,
        max_size=10,
    )
)
def test_pav_unrolled_equals_while_loop_and_minimax(raw):
    bins = [(n, min(pos, n)) for n, pos in raw]
    while_blocks = _pav_while(bins)
    # the unrolled fold with merges >= len(bins) - 1 is exact
    assert _pav_unrolled(bins, len(bins) - 1 if len(bins) > 1 else 1) \
        == while_blocks
    # mass conservation
    assert sum(b[0] for b in while_blocks) == sum(n for n, _ in bins)
    assert sum(b[1] for b in while_blocks) == sum(p for _, p in bins)
    assert sum(b[2] for b in while_blocks) == len(bins)
    # block rates strictly increasing (equal-rate neighbors never merge,
    # but the fit must still be non-decreasing)
    rates = [b[1] / b[0] for b in while_blocks]
    assert all(rates[i] <= rates[i + 1] + 1e-12 for i in range(len(rates) - 1))
    # minimax characterization: the fitted value at bin i equals
    # max over lower sets ending at i of min over upper continuations —
    # equivalently isotonic fit g(i) = min_{j>=i} max_{k<=j} avg(k..j)
    fitted = []
    for b in while_blocks:
        fitted.extend([b[1] / b[0]] * b[2])
    m = len(bins)
    for i in range(m):
        best = min(
            max(
                sum(p for _, p in bins[k : j + 1])
                / sum(n for n, _ in bins[k : j + 1])
                for k in range(j + 1)
            )
            for j in range(i, m)
        )
        assert math.isclose(fitted[i], best, rel_tol=1e-9, abs_tol=1e-12)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=20), min_size=9,
                max_size=40))
def test_ljung_box_integer_algebra_equals_textbook(xs):
    n = len(xs)
    s = sum(xs)
    av = [n * x - s for x in xs]
    c0 = sum(a * a for a in av)
    if c0 == 0:  # constant series: r_k undefined, the query never
        return   # meets it (types always vary day to day)
    mu = s / n
    e = [x - mu for x in xs]
    d0 = sum(v * v for v in e)
    for lag in range(1, 8):
        ck = sum(av[i] * av[i + lag] for i in range(n - lag))
        dk = sum(e[i] * e[i + lag] for i in range(n - lag))
        assert math.isclose(ck / c0, dk / d0, rel_tol=1e-9, abs_tol=1e-12)
