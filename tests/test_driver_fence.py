"""The fenced driver-side inventory, made ENFORCEABLE.

Every `.collect()` / `.toPandas()` in engine source is a driver-side
materialization — the one thing that cannot scale past driver memory.
Each existing site is individually bounded (graph-sized, d x d, capped
sample, or a fail-fast row cap) and documented at the call site; rounds
6-8 verified that by hand-grep. This test IS that grep: adding a new
site (or editing a fenced one) fails until the allowlist is updated,
which forces the "is it bounded? where's the cap?" review the audits
used to do manually.

The allowlist keys on (relative file, normalized line text) rather than
line numbers so unrelated edits don't churn it, while any edit to a
fenced line itself trips a review. Each entry also pins an EXACT
occurrence count, so a new site that happens to normalize to the same
text as a fenced one (e.g. another multi-line `).collect()` in the same
file) still trips the review instead of hiding behind the existing entry.
"""

from __future__ import annotations

import os
import re

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "shippinglanes_spark")

# (file relative to shippinglanes_spark/, normalized source line) — the
# bound for each site, for the reviewer:
#   plans/prepared.py      test-only convenience execute() of a prepared plan
#   operators/windows.py   bucket-count map: rows = bucket count (fixed)
#   testing.py             test harness compare helper, never a query path
#   functions/embeddings.py  d x d Gram partials (d = 64, corpus-free)
#   functions/text.py      union-find fast path, gated to <= 100k edges
#   functions/ranking.py   two-scalar global aggregate
#   functions/similarity.py  broadcast index (MAX_INDEX_ROWS fail-fast),
#     two MAX_FIT_ROWS-capped centroid-fit samples, PQ codebook index
#     (same MAX_INDEX_ROWS table), sim_maxsim query workload
#     (_MS_QCAP fail-fast, id-bounded to <= 800 rows at any scale)
ALLOWED = {
    ("plans/prepared.py", "return self.dataframe(name).collect()"): 1,
    (
        "operators/windows.py",
        'for r in bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()',
    ): 1,
    # agg_spearman fused dual-axis bucket histogram, 2D cell form:
    # rows = N_RANK_BUCKETS^2 (<= 1024), same metadata-scale map as the
    # line above (the per-axis histograms are its marginals)
    (
        "operators/windows.py",
        ".collect()",
    ): 1,
    ("testing.py", "spdf = sdf.toPandas()"): 1,
    # nation-graph driver fast paths (betweenness/closeness/
    # eccentricity): one shared edge probe capped at the complete graph
    # on _BT_LOCAL_MAX_NODES (= 64) nodes; over the cap the distributed
    # level-synchronous paths run instead
    (
        "operators/graph.py",
        "rows = und.limit(_BT_LOCAL_MAX_EDGES + 1).collect()",
    ): 1,
    # graph_connected_components fast path: directed nation-pair probe,
    # same 64-node bound (O(E) union-find, no cubic stage)
    (
        "operators/graph.py",
        "e_rows = e.limit(_CC_LOCAL_MAX_EDGES + 1).collect()",
    ): 1,
    # LPA-family fast paths (label propagation, conductance): capped
    # probe of the sparsified backbone, same 64-node bound
    (
        "operators/graph.py",
        "rows = u.limit(_BT_LOCAL_MAX_EDGES + 1).collect()",
    ): 1,
    # pagerank/HITS fast paths: capped DIRECTED edge probe (self-loops
    # allowed, so the cap is the full 64x64 square) plus the node-domain
    # probe of the fixed nation table, same 64-node bound
    (
        "operators/graph.py",
        "rows = edges.limit(_DIR_LOCAL_MAX_EDGES + 1).collect()",
    ): 1,
    (
        "operators/graph.py",
        "rows = nodes.limit(_BT_LOCAL_MAX_NODES + 1).collect()",
    ): 1,
    # evt_markov_stationary fast path: capped probe of the |states|^2-
    # bounded transition matrix (states = event types, a fixed
    # vocabulary); over the cap the distributed power iteration runs
    (
        "operators/events.py",
        "p_rows = p.limit(_MK_LOCAL_MAX + 1).collect()",
    ): 1,
    # agg_ipf_raking fast path: capped probe of the QI-cardinality
    # (nation x segment) cell table; the margin tables' domains are
    # subsets of the cells', so the one cap bounds all three collects
    (
        "operators/stats6.py",
        "cell_rows = cells.limit(_IPF_LOCAL_MAX + 1).collect()",
    ): 1,
    (
        "operators/stats6.py",
        'tr = {r["n"]: r["tr"] for r in trow.collect()}',
    ): 1,
    (
        "operators/stats6.py",
        'tc = {r["s"]: r["tc"] for r in tcol.collect()}',
    ): 1,
    ("functions/embeddings.py", ").collect()"): 1,
    ("functions/text.py", "for r in pairs.collect():"): 1,
    ("functions/ranking.py", ").collect()[0]"): 1,
    ("functions/similarity.py", 'local = e.toPandas().sort_values("vec_id")'): 1,
    (
        "functions/similarity.py",
        "sample = base.sample(False, frac, seed=42).limit(MAX_FIT_ROWS).toPandas()",
    ): 2,
    (
        "functions/similarity.py",
        'local = encoded.toPandas().sort_values("vec_id")',
    ): 1,
    (
        "functions/similarity.py",
        'idx = emb.select("vec_id", "label", "embedding").toPandas()',
    ): 1,
    ("functions/similarity.py", "qrows = q.toPandas()"): 1,
}


def _scan() -> dict[tuple[str, str], int]:
    found: dict[tuple[str, str], int] = {}
    pat = re.compile(r"\.(toPandas|collect)\(\)")
    for root, _dirs, files in os.walk(SRC):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, SRC)
            with open(path) as f:
                for line in f:
                    s = line.strip()
                    if s.startswith("#"):
                        continue
                    if pat.search(s):
                        found[(rel, s)] = found.get((rel, s), 0) + 1
    return found


def test_driver_side_materializations_are_fenced():
    found = _scan()
    new = {k: v for k, v in found.items() if ALLOWED.get(k) != v}
    stale = {k: v for k, v in ALLOWED.items() if k not in found}
    assert not new, (
        "NEW or duplicated driver-side materialization site(s) — every "
        "collect/toPandas must be bounded (cap assert or structurally "
        "corpus-free) and its (file, line, count) added to the fence "
        f"allowlist after review: {sorted(new.items())}"
    )
    assert not stale, (
        "Fence allowlist entries no longer present in source — prune "
        f"them so the fence stays exact: {sorted(stale)}"
    )
