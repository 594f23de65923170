"""Hypothesis invariants for the round-8 pack-2 algebra — pure-python
properties of the identities the queries rely on, independent of Spark
and DuckDB entirely:

- the DOUBLED-average-rank identity (2*min_rank + ties - 1 == 2x the
  textbook tie-averaged rank) that keeps Wilcoxon/Friedman rank sums
  in exact BIGINTs;
- the Wilcoxon symmetry W+ + W- == n(n+1)/2 in doubled units;
- the RBO suffix-table collapse (sum over common members of
  S[max(ra, rb)] == the per-depth overlap sum) the rank_rbo query
  builds on;
- MaxSim upper/lower bounds vs the plain full-vector dot product.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from shippinglanes_spark.operators.stats9 import _RBO_C, _RBO_K, _RBO_S


def _doubled_ranks(values: list[int]) -> list[int]:
    """The query-side formula: 2*RANK() + COUNT(ties) - 1 per row."""
    s = sorted(values)
    out = []
    for v in values:
        min_rank = s.index(v) + 1
        t = s.count(v)
        out.append(2 * min_rank + t - 1)
    return out


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=40))
def test_doubled_rank_is_twice_average_rank(values):
    # textbook average (midrank) via Fractions — no float in the proof
    s = sorted(values)
    expected = []
    for v in values:
        positions = [i + 1 for i, x in enumerate(s) if x == v]
        expected.append(2 * Fraction(sum(positions), len(positions)))
    got = _doubled_ranks(values)
    assert [Fraction(g) for g in got] == expected
    # rank sum identity: sum of doubled ranks == n(n+1) exactly
    n = len(values)
    assert sum(got) == n * (n + 1)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-9, max_value=9).filter(lambda d: d != 0),
        min_size=1,
        max_size=40,
    )
)
def test_wilcoxon_w_plus_w_minus_partition(diffs):
    r2 = _doubled_ranks([abs(d) for d in diffs])
    w2p = sum(r for r, d in zip(r2, diffs) if d > 0)
    w2m = sum(r for r, d in zip(r2, diffs) if d < 0)
    n = len(diffs)
    assert w2p + w2m == n * (n + 1)  # doubled n(n+1)/2


@settings(max_examples=50, deadline=None)
@given(
    a=st.permutations(list(range(20))),
    b=st.permutations(list(range(20))),
    na=st.integers(min_value=1, max_value=20),
    nb=st.integers(min_value=1, max_value=20),
)
def test_rbo_suffix_table_equals_depth_sum(a, b, na, nb):
    """The rank_rbo collapse: each common member of the two top-K
    prefixes contributes S[max(ra, rb)], which must equal the direct
    sum over depths of overlap_d * C[d] — for ANY pair of (possibly
    different-length) rankings."""
    ra = {x: i + 1 for i, x in enumerate(a[: min(na, _RBO_K)])}
    rb = {x: i + 1 for i, x in enumerate(b[: min(nb, _RBO_K)])}
    direct = sum(
        len(
            {x for x in ra if ra[x] <= d} & {x for x in rb if rb[x] <= d}
        )
        * _RBO_C[d - 1]
        for d in range(1, _RBO_K + 1)
    )
    collapsed = sum(
        _RBO_S[max(ra[x], rb[x]) - 1] for x in set(ra) & set(rb)
    )
    assert collapsed == direct
    # bounds: 0 <= rbo <= the identical-ranking ceiling
    ceiling = sum(d * _RBO_C[d - 1] for d in range(1, _RBO_K + 1))
    assert 0 <= collapsed <= ceiling


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-1000, max_value=1000),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_maxsim_bounds_vs_full_dot(vecs):
    """MaxSim with 4x16 chunks >= the full 64-dot (sum of per-chunk
    dots, since max >= the aligned diagonal term) for any pair —
    the late-interaction lower-bound property."""
    mats = [np.asarray(v, dtype=np.int64).reshape(4, 16) for v in vecs]
    for i in range(len(mats)):
        for j in range(len(mats)):
            dots = mats[i] @ mats[j].T
            maxsim = dots.max(axis=1).sum()
            full_dot = np.trace(dots)
            assert maxsim >= full_dot


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-9, max_value=9).filter(lambda d: d != 0),
        min_size=1,
        max_size=30,
    )
)
def test_wilcoxon_variance_positive_with_ties(diffs):
    """var48 = 2n(n+1)(2n+1) - sum(t^3 - t) stays strictly positive for
    ANY tie pattern (the all-ties worst case collapses to 3n(n+1)^2),
    so the z denominator can never divide by zero."""
    ads = [abs(d) for d in diffs]
    n = len(ads)
    tie3 = sum(ads.count(v) ** 3 - ads.count(v) for v in set(ads))
    var48 = 2 * n * (n + 1) * (2 * n + 1) - tie3
    assert var48 > 0
    if len(set(ads)) == 1:  # all tied: the closed form
        assert var48 == 3 * n * (n + 1) ** 2


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # cand id
            st.integers(min_value=-(10**6), max_value=10**6),  # score
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=8),  # number of partitions
)
def test_partial_topk_merge_is_lossless(cands, nparts):
    """The sim_maxsim reduction shape: per-partition top-k by
    (score desc, id asc) then global top-k over the survivors must
    equal the global top-k over everything — for ANY partitioning."""
    k = 3
    order = sorted(cands, key=lambda t: (-t[1], t[0]))
    direct = order[:k]
    parts = [cands[i::nparts] for i in range(nparts)]
    survivors = []
    for p in parts:
        survivors.extend(sorted(p, key=lambda t: (-t[1], t[0]))[:k])
    merged = sorted(survivors, key=lambda t: (-t[1], t[0]))[:k]
    assert merged == direct
