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
  equal the textbook mean-centered r_k;
- the Cochran-Armitage z is exactly antisymmetric under response flip;
- Cronbach's cancelled-denominator alpha equals the textbook
  variance-ratio form and is invariant to shifting one item;
- self-BLEU clipping bounds (clipped <= total; exclusive trigrams
  contribute zero).
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


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=5),
                  st.booleans()),
        min_size=10,
        max_size=60,
    )
)
def test_cochran_armitage_antisymmetric_under_response_flip(rows):
    # need both responses present and dose variance > 0 for z to exist
    if len({r for _, r in rows}) < 2 or len({w for w, _ in rows}) < 2:
        return
    def z_stat(rs):
        n = len(rs)
        r = sum(1 for _, hi in rs if hi)
        w1 = sum(w for w, _ in rs)
        w2 = sum(w * w for w, _ in rs)
        t = sum(w for w, hi in rs if hi)
        p = r / n
        var = p * (1 - p) * (w2 - w1 * w1 / n)
        return (t - p * w1) / math.sqrt(var)
    z = z_stat(rows)
    z_flip = z_stat([(w, not hi) for w, hi in rows])
    # flipping the response exactly negates the trend statistic
    assert math.isclose(z, -z_flip, rel_tol=1e-9, abs_tol=1e-12)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=9), min_size=6,
                 max_size=6),
        min_size=3,
        max_size=5,
    ),
    st.integers(min_value=-5, max_value=5),
)
def test_cronbach_alpha_shift_invariant(items, shift):
    # alpha from the B = n*sum(x^2) - S^2 formulation must equal the
    # textbook variance-ratio form, and be invariant when one item's
    # scores all shift by a constant (variances unchanged)
    def alpha(its):
        k = len(its)
        n = len(its[0])
        b_items = [n * sum(x * x for x in xs) - sum(xs) ** 2 for xs in its]
        tot = [sum(xs[i] for xs in its) for i in range(n)]
        b_tot = n * sum(x * x for x in tot) - sum(tot) ** 2
        if b_tot == 0:
            return None
        return k / (k - 1) * (1 - sum(b_items) / b_tot)
    a0 = alpha(items)
    if a0 is None:
        return
    shifted = [list(items[0])] + [list(xs) for xs in items[1:]]
    shifted[0] = [x + shift for x in shifted[0]]
    a1 = alpha(shifted)
    # shifting one item changes covariances with the TOTAL only through
    # the item's own constant — variances are shift-invariant, so alpha
    # is too
    assert a1 is not None and math.isclose(a0, a1, rel_tol=1e-9,
                                           abs_tol=1e-12)
    # textbook cross-check on the original data
    n = len(items[0])
    k = len(items)
    def var(xs):
        m = sum(xs) / n
        return sum((x - m) ** 2 for x in xs) / (n - 1)
    tot = [sum(xs[i] for xs in items) for i in range(n)]
    vt = var(tot)
    if vt > 0:
        textbook = k / (k - 1) * (1 - sum(var(xs) for xs in items) / vt)
        assert math.isclose(a0, textbook, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),
                  st.integers(min_value=1, max_value=6)),
        min_size=2,
        max_size=30,
    )
)
def test_self_bleu_clipping_bounds(pairs):
    """Modified-precision clipping: per source, clipped <= total, and a
    trigram occurring ONLY in one source contributes zero."""
    # pairs = (source_id, trigram_id); counts per (source, trigram)
    cnt: dict = {}
    for s, g in pairs:
        cnt[(s, g)] = cnt.get((s, g), 0) + 1
    tot: dict = {}
    for (s, g), c in cnt.items():
        tot[g] = tot.get(g, 0) + c
    per_src: dict = {}
    for (s, g), c in cnt.items():
        a = per_src.setdefault(s, [0, 0])
        a[0] += c
        a[1] += min(c, tot[g] - c)
    for s, (total, clipped) in per_src.items():
        assert 0 <= clipped <= total
        # exclusive trigrams contribute nothing
        excl = sum(
            c for (s2, g), c in cnt.items() if s2 == s and tot[g] == c
        )
        assert clipped <= total - excl
