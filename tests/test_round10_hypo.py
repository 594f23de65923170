"""Hypothesis invariants for the round-10 pack algebra — pure-python
properties of the identities the queries rely on, independent of Spark
and DuckDB entirely:

- the Anderson-Darling positional form is rank-based: invariant under
  any strictly increasing value transform, symmetric under sample swap
  when values are tie-free, nonnegative, and the 1e-9-quantized sum
  tracks the exact statistic to ~1e-6;
- the closed-form 3x3 VIFs equal the regression definition
  1/(1 - R^2_j) with R^2_j from the two-predictor normal equations,
  and collapse to exactly 1 when the cross-correlations vanish;
- the Deming/TLS slope is a root of the TLS quadratic
  sxy*m^2 + (sxx - syy)*m - sxy = 0, is reciprocal under axis swap
  (slope_yx * slope_xy_swapped == 1), and dominates OLS in magnitude;
- sample entropy's template counts are invariant under additive shift
  and negation of the series, and A-matches imply B-matches (so
  SampEn >= 0);
- MATTR is exactly 1e6 for an all-distinct doc, invariant under token
  renaming, and bounded by the extreme window TTRs;
- the exposure discount table is strictly decreasing and per-group
  floored ppm shares sum to within #groups of 1e6.

Pack 2: the variance ratio is shift- and scale-invariant; turning
points are reversal- and negation-invariant and bounded by n-2; the
partial-correlation formula is symmetric in the partialled pair and
reduces to the raw correlation under an uncorrelated control; plug-in
conditional entropy never exceeds the second-token marginal (the
chain-rule direction); the Aalen-Johansen fold satisfies CIF_p +
CIF_e + S == 1 exactly and collapses to 1 - KM when causes merge.

Pack 3: Hodges-Lehmann is translation-equivariant, permutation-
invariant, and bounded by the extremes; Chao1 never estimates fewer
species than observed and saturates exactly at V when singletons
vanish; the JL projection is linear and its norm ratio scale-
invariant; ROUGE-1 multiset overlap is symmetric, bounded by the
shorter side, and self-ROUGE is exactly 1e6 in integer ppm.
"""

from __future__ import annotations

import math

from hypothesis import example, given, settings
from hypothesis import strategies as st

from shippinglanes_spark.operators.stats11 import (
    _AD_SCALE,
    _EXP_K,
    _EXP_TOTAL,
    _EXP_W,
    _MATTR_W,
)
from shippinglanes_spark.operators.stats13 import _JL_D


def _ad_quantized(xs: list[int], ys: list[int]) -> tuple[int, float]:
    """The query's exact positional form: (integer S, raw A^2)."""
    pooled = sorted(
        [(v, 0, i) for i, v in enumerate(xs)]
        + [(v, 1, i) for i, v in enumerate(ys)]
    )
    nn, na = len(pooled), len(xs)
    s = 0
    m = 0
    for i in range(1, nn):
        if pooled[i - 1][1] == 0:
            m += 1
        d = m * nn - na * i
        s += (d * d * _AD_SCALE) // (i * (nn - i))
    return s, s / (na * (nn - na) * _AD_SCALE)


def _ad_exact(xs: list[int], ys: list[int]) -> float:
    pooled = sorted(
        [(v, 0, i) for i, v in enumerate(xs)]
        + [(v, 1, i) for i, v in enumerate(ys)]
    )
    nn, na = len(pooled), len(xs)
    s = 0.0
    m = 0
    for i in range(1, nn):
        if pooled[i - 1][1] == 0:
            m += 1
        s += (m * nn - na * i) ** 2 / (i * (nn - i))
    return s / (na * (nn - na))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=5, max_size=40),
    st.lists(st.integers(0, 500), min_size=5, max_size=40),
)
def test_ad_rank_based_nonneg_and_quantization(xs, ys):
    s, raw = _ad_quantized(xs, ys)
    assert s >= 0
    # quantization error: one unit of 1e-9 per positional term
    assert abs(raw - _ad_exact(xs, ys)) < (len(xs) + len(ys)) * 1e-9 * 2
    # strictly increasing transform preserves the pooled order exactly
    f = lambda v: 3 * v * v + 7 * v + 1  # strictly increasing on v >= 0
    s2, _ = _ad_quantized([f(v) for v in xs], [f(v) for v in ys])
    assert s2 == s


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(0, 10_000), min_size=10, max_size=40))
def test_ad_symmetric_when_tie_free(vals):
    vals = sorted(vals)
    half = len(vals) // 2
    # deal alternately so both samples are tie-free and equal-ish sized
    xs, ys = vals[0::2], vals[1::2]
    _, ab = _ad_quantized(xs, ys)
    _, ba = _ad_quantized(ys, xs)
    assert math.isclose(ab, ba, rel_tol=0, abs_tol=5e-9 * len(vals))
    assert half >= 5  # the strategy actually exercised the property


def _corrs(pts):
    n = float(len(pts))
    mom = {}
    for a in range(3):
        mom[("s", a)] = sum(p[a] for p in pts)
        for b in range(a, 3):
            mom[(a, b)] = sum(p[a] * p[b] for p in pts)

    def corr(a, b):
        key = (a, b) if (a, b) in mom else (b, a)
        cov = n * mom[key] - float(mom[("s", a)]) * mom[("s", b)]
        va = n * mom[(a, a)] - float(mom[("s", a)]) * mom[("s", a)]
        vb = n * mom[(b, b)] - float(mom[("s", b)]) * mom[("s", b)]
        return cov / math.sqrt(va * vb)

    return corr(0, 1), corr(0, 2), corr(1, 2)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 20), st.integers(0, 50), st.integers(0, 100)
        ),
        min_size=8,
        max_size=60,
    )
)
def test_vif_closed_form_equals_regression_definition(pts):
    # need non-degenerate variance in every coordinate
    for a in range(3):
        vals = {p[a] for p in pts}
        if len(vals) < 3:
            return
    rxy, rxz, ryz = _corrs(pts)
    det = 1 + 2 * rxy * rxz * ryz - rxy**2 - rxz**2 - ryz**2
    if abs(det) < 1e-9:
        return
    vif = {
        0: (1 - ryz * ryz) / det,
        1: (1 - rxz * rxz) / det,
        2: (1 - rxy * rxy) / det,
    }
    # regression definition: R^2 of coordinate j on the other two, via
    # the standardized normal equations b = R_other^-1 r_j
    pair = {0: (rxy, rxz, ryz), 1: (rxy, ryz, rxz), 2: (rxz, ryz, rxy)}
    for j in range(3):
        r1, r2, r12 = pair[j]
        denom = 1 - r12 * r12
        r2_j = (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12) / denom
        assert math.isclose(vif[j], 1 / (1 - r2_j), rel_tol=1e-7)
        assert vif[j] >= 1 - 1e-9


def test_vif_is_one_under_independence():
    rxy = rxz = ryz = 0.0
    det = 1 + 2 * rxy * rxz * ryz - rxy**2 - rxz**2 - ryz**2
    assert (1 - ryz * ryz) / det == 1.0


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 30), st.integers(0, 300)),
        min_size=6,
        max_size=60,
    )
)
@example(
    pts=[(1, 0),
     (1, 183),
     (5, 0),
     (6, 56),
     (1, 162),
     (10, 263),
     (10, 293),
     (12, 263),
     (14, 19),
     (1, 97),
     (16, 0),
     (17, 187),
     (17, 154),
     (19, 189),
     (22, 27),
     (21, 168),
     (20, 142),
     (16, 18),
     (27, 5),
     (2, 129),
     (28, 28),
     (21, 65),
     (16, 1),
     (30, 236),
     (30, 189)],
).via('discovered failure')
def test_deming_root_swap_and_dominance(pts):
    n = float(len(pts))
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    vxx = n * sxx - float(sx) * sx
    vyy = n * syy - float(sy) * sy
    vxy = n * sxy - float(sx) * sy
    if vxx <= 0 or vyy <= 0 or abs(vxy) < 1e-9:
        return

    def tls_slope(d, c):
        # stable branch of ((d) + sqrt(d^2 + 4c^2)) / (2c): when d < 0
        # the numerator cancels catastrophically (hypothesis found a
        # near-uncorrelated cloud where the naive form broke the
        # reciprocal identity at 1e-9), so rationalize via
        # (d + h)(h - d) = 4c^2  ->  2c / (h - d)
        h = math.hypot(d, 2 * c)
        return (d + h) / (2 * c) if d >= 0 else 2 * c / (h - d)

    slope = tls_slope(vyy - vxx, vxy)
    # root of the TLS quadratic sxy*m^2 + (sxx - syy)*m - sxy = 0
    resid = vxy * slope * slope + (vxx - vyy) * slope - vxy
    assert abs(resid) <= 1e-6 * max(abs(vxx), abs(vyy), abs(vxy))
    # axis swap: orthogonal regression is symmetric, slopes reciprocal
    slope_sw = tls_slope(vxx - vyy, vxy)
    assert math.isclose(slope * slope_sw, 1.0, rel_tol=1e-9)
    # TLS dominates OLS in magnitude (x-noise attenuates OLS)
    assert abs(slope) >= abs(vxy / vxx) - 1e-12


def _se_counts(xs: list[int], r: int) -> tuple[int, int]:
    n = len(xs)

    def cnt(m):
        c = 0
        for i in range(n - m):
            for j in range(i + 1, n - m):
                if max(abs(xs[i + k] - xs[j + k]) for k in range(m + 1)) <= r:
                    c += 1
        return c

    return cnt(1), cnt(2)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=8, max_size=40),
    st.integers(0, 5),
    st.integers(-100, 100),
)
def test_sampen_shift_negation_invariance_and_order(xs, r, shift):
    b, a = _se_counts(xs, r)
    assert b >= a  # an A-match is a fortiori a B-match -> SampEn >= 0
    assert _se_counts([x + shift for x in xs], r) == (b, a)
    assert _se_counts([-x for x in xs], r) == (b, a)


def _mattr_ppm(toks: list[str]) -> int:
    n = len(toks)
    length = min(_MATTR_W, n)
    wins = n - length + 1
    sd = sum(len(set(toks[s : s + length])) for s in range(wins))
    return (sd * 1_000_000) // (length * wins)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 9), min_size=3, max_size=80))
def test_mattr_bounds_and_renaming_invariance(ids):
    toks = [f"w{i}" for i in ids]
    m = _mattr_ppm(toks)
    n = len(toks)
    length = min(_MATTR_W, n)
    wins = n - length + 1
    ttrs = [
        len(set(toks[s : s + length])) * 1_000_000 // length
        for s in range(wins)
    ]
    assert min(ttrs) - 1 <= m <= max(ttrs) + 1
    # bijective token renaming changes nothing
    renamed = [f"z{i * 7 + 3}" for i in ids]
    assert _mattr_ppm(renamed) == m


def test_mattr_all_distinct_is_exactly_one_million():
    assert _mattr_ppm([f"u{i}" for i in range(50)]) == 1_000_000


def test_exposure_table_monotone_and_shares_telescope():
    assert all(a > b for a, b in zip(_EXP_W, _EXP_W[1:]))
    assert _EXP_W[0] == 10**9  # rank 1: log2(2) == 1
    assert sum(_EXP_W) == _EXP_TOTAL
    # floored ppm shares: any partition of the K ranks into groups sums
    # to within #groups of 1e6
    for split in ([10, 30, 60], [1, 99], [50, 50], [100]):
        assert sum(split) == _EXP_K
        start, shares = 0, []
        for width in split:
            ws = sum(_EXP_W[start : start + width])
            shares.append(ws * 1_000_000 // _EXP_TOTAL)
            start += width
        assert 1_000_000 - len(split) <= sum(shares) <= 1_000_000


# ---- pack 2 ----


def _vr(xs: list[int], q: int) -> float:
    n = len(xs)
    s = sum(xs)
    ss = sum(x * x for x in xs)
    m = n - q + 1
    s2 = sum((n * sum(xs[i : i + q]) - q * s) ** 2 for i in range(m))
    return s2 / (m * q * (n * ss - s * s))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 100), min_size=12, max_size=40),
    st.integers(-50, 50),
    st.integers(1, 9),
)
def test_variance_ratio_shift_and_scale_invariant(xs, shift, scale):
    if len(set(xs)) < 2:
        return  # zero one-day variance
    q = 5
    base = _vr(xs, q)
    assert base > 0
    assert math.isclose(_vr([x + shift for x in xs], q), base,
                        rel_tol=1e-9)
    assert math.isclose(_vr([x * scale for x in xs], q), base,
                        rel_tol=1e-9)


def _tp(xs: list[int]) -> int:
    return sum(
        1
        for i in range(1, len(xs) - 1)
        if (xs[i] > xs[i - 1] and xs[i] > xs[i + 1])
        or (xs[i] < xs[i - 1] and xs[i] < xs[i + 1])
    )


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 20), min_size=4, max_size=50))
def test_turning_points_reversal_negation_invariant(xs):
    t = _tp(xs)
    assert 0 <= t <= len(xs) - 2
    assert _tp(list(reversed(xs))) == t
    assert _tp([-x for x in xs]) == t


@settings(max_examples=40, deadline=None)
@given(
    st.floats(-0.9, 0.9),
    st.floats(-0.9, 0.9),
    st.floats(-0.9, 0.9),
)
def test_partial_correlation_symmetry_and_independence_reduction(
    rab, rac, rbc
):
    def partial(x, y, z):
        return (x - y * z) / math.sqrt((1 - y * y) * (1 - z * z))

    # symmetric in the two partialled variables
    assert math.isclose(
        partial(rab, rac, rbc), partial(rab, rbc, rac), rel_tol=1e-12
    )
    # an uncorrelated control changes nothing
    assert math.isclose(partial(rab, 0.0, 0.0), rab, rel_tol=1e-12)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=5, max_size=200))
def test_entropy_rate_conditioning_never_hurts(ids):
    # plug-in conditional entropy <= plug-in marginal entropy of the
    # SECOND token (the chain-rule direction the query exploits)
    pairs = list(zip(ids, ids[1:]))
    if not pairs:
        return
    from collections import Counter

    c2 = Counter(pairs)
    ctx = Counter(a for a, _ in pairs)
    nxt = Counter(b for _, b in pairs)
    n = len(pairs)
    h_cond = sum(
        c * (math.log(ctx[a]) - math.log(c))
        for (a, _b), c in c2.items()
    ) / n
    h_next = math.log(n) - sum(
        c * math.log(c) for c in nxt.values()
    ) / n
    assert h_cond <= h_next + 1e-9
    assert h_cond >= -1e-12


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.sampled_from(["p", "e"])),
        min_size=3,
        max_size=60,
    )
)
def test_aalen_johansen_additivity_and_km_reduction(events):
    # fold the AJ update over the day-grouped events (no censoring):
    # CIF_p + CIF_e + S == 1 exactly, curves are nondecreasing, and
    # collapsing both causes into one reproduces 1 - KM
    from collections import Counter

    by_day = sorted(
        Counter((d, r) for d, r in events).items()
    )
    days = sorted({d for (d, _r), _ in by_day})
    total = len(events)
    at_risk = total
    surv, cp, ce = 1.0, 0.0, 0.0
    km = 1.0
    prev_cp, prev_ce = 0.0, 0.0
    for day in days:
        dp = dict(by_day).get((day, "p"), 0)
        de = dict(by_day).get((day, "e"), 0)
        cp += surv * dp / at_risk
        ce += surv * de / at_risk
        surv *= 1 - (dp + de) / at_risk
        km *= 1 - (dp + de) / at_risk
        assert cp >= prev_cp - 1e-12 and ce >= prev_ce - 1e-12
        prev_cp, prev_ce = cp, ce
        at_risk -= dp + de
    assert math.isclose(cp + ce + surv, 1.0, rel_tol=0, abs_tol=1e-9)
    assert math.isclose(cp + ce, 1.0 - km, rel_tol=0, abs_tol=1e-9)


# ---- pack 3 ----


def _hl(xs: list[int]) -> float:
    n = len(xs)
    w2 = sorted(xs[i] + xs[j] for i in range(n) for j in range(i, n))
    return w2[(len(w2) + 1) // 2 - 1] / 2


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 100), min_size=3, max_size=25),
    st.integers(-50, 50),
)
def test_hodges_lehmann_translation_equivariant_and_bounded(xs, c):
    h = _hl(xs)
    assert min(xs) <= h <= max(xs)
    assert _hl([x + c for x in xs]) == h + c
    # permutation invariance (the query's join order cannot matter)
    assert _hl(list(reversed(xs))) == h


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(1, 30), min_size=1, max_size=300))
def test_chao1_bounds_and_saturation(counts):
    v = len(counts)
    f1 = sum(1 for c in counts if c == 1)
    f2 = sum(1 for c in counts if c == 2)
    chao1 = v + f1 * (f1 - 1) / (2 * (f2 + 1))
    assert chao1 >= v  # never estimates FEWER species than observed
    if f1 == 0:
        # no singletons -> the corpus has seen everything it can see
        assert chao1 == v
    n = sum(counts)
    coverage = 1 - f1 / n
    assert 0 <= coverage <= 1


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(-10, 10, allow_nan=False, width=32),
        min_size=_JL_D // 8,
        max_size=_JL_D // 8,
    ),
    st.integers(2, 5),
)
def test_jl_projection_linear_and_ratio_scale_invariant(xs8, a):
    from shippinglanes_spark.operators.stats13 import _JL_SIGNS

    x = (xs8 * 8)[: _JL_D]
    if sum(v * v for v in x) < 1e-6:
        return

    def proj(v):
        return [
            sum(_JL_SIGNS[d][j] * v[j] for j in range(_JL_D))
            for d in range(8)
        ]

    p = proj(x)
    pa = proj([a * v for v in x])
    for d in range(8):
        assert math.isclose(pa[d], a * p[d], rel_tol=1e-9, abs_tol=1e-9)
    # norm_ratio is scale-invariant
    nx2 = sum(v * v for v in x)
    r1 = sum(q * q for q in p) / (8 * nx2)
    r2 = sum(q * q for q in pa) / (8 * (a * a * nx2))
    assert math.isclose(r1, r2, rel_tol=1e-9)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 5), min_size=1, max_size=40),
    st.lists(st.integers(0, 5), min_size=1, max_size=40),
)
def test_rouge_overlap_symmetric_self_is_one(ids_a, ids_b):
    from collections import Counter

    ca, cb = Counter(ids_a), Counter(ids_b)
    ov_ab = sum(min(ca[t], cb[t]) for t in ca)
    ov_ba = sum(min(cb[t], ca[t]) for t in cb)
    assert ov_ab == ov_ba  # multiset intersection is symmetric
    assert ov_ab <= min(len(ids_a), len(ids_b))
    # self-ROUGE is exactly 1e6 in the query's integer ppm form
    ov_aa = sum(min(ca[t], ca[t]) for t in ca)
    assert 2 * ov_aa * 1_000_000 // (2 * len(ids_a)) == 1_000_000
