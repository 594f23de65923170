"""Physical-plan assertions: the 100 TB story is only real if Catalyst
actually produces the plans the operator docstrings claim (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shippinglanes_spark.registry import all_queries

Q = all_queries()


def plan(spark, sf_dir, name, mode="formatted"):
    df = Q[name].fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_scan_pruned_pushes_down(spark, sf_dir):
    p = plan(spark, sf_dir, "scan_pruned")
    assert "PushedFilters" in p and "l_quantity" in p.split("PushedFilters")[1][:200]
    # column pruning: the read schema carries only the needed columns
    read_schema = p.split("ReadSchema")[1][:300]
    assert "l_tax" not in read_schema and "l_orderkey" in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    assert "BroadcastHashJoin" in plan(spark, sf_dir, "join_broadcast")
    p5 = plan(spark, sf_dir, "join_multi5")
    assert "BroadcastHashJoin" in p5
    # no sort-merge for the small dims
    assert p5.count("SortMergeJoin") == 0


def test_topk_avoids_global_sort(spark, sf_dir):
    assert "TakeOrderedAndProject" in plan(spark, sf_dir, "limit_topk")


def test_agg_is_partial_then_final(spark, sf_dir):
    p = plan(spark, sf_dir, "agg_groupby")
    assert p.count("HashAggregate") >= 2  # map-side partial + final


def test_sessionize_single_shuffle(spark, sf_dir):
    p = plan(spark, sf_dir, "evt_sessionize", mode="simple")
    # both windows share the (user_id) partitioning: exactly one exchange,
    # one sort (the lag and running-sum windows reuse them)
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("+- Sort ") == 1


def test_semi_anti_join_types(spark, sf_dir):
    assert "LeftSemi" in plan(spark, sf_dir, "join_semi")
    assert "LeftAnti" in plan(spark, sf_dir, "join_anti")


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    """Reading back a partitionBy layout with a partition-key filter must
    prune at the file index (PartitionFilters), not scan-and-filter."""
    import os

    from shippinglanes_spark.io import table

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".tmp", "prune_check")
    li = table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).where(F.col("l_returnflag") == "A")
    p = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "simple"
    )
    assert "PartitionFilters: [isnotnull(l_returnflag" in p
    n_a = back.count()
    assert n_a == li.where(F.col("l_returnflag") == "A").count()



def test_observation_metrics(spark, sf_dir):
    """The Observation API collects row-level metrics during a real action
    without a second pass — the engine's runtime-monitoring hook."""
    from pyspark.sql import Observation

    from shippinglanes_spark.io import table

    obs = Observation("li_metrics")
    li = table(spark, sf_dir, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum("l_quantity").alias("qty"),
    )
    n = observed.where(F.col("l_quantity") > 25).count()
    assert obs.get["rows"] == li.count()  # metric covers ALL scanned rows
    assert n < obs.get["rows"]
    assert obs.get["qty"] > 0

def test_ntile_pct_distributed_and_matches_global_window(spark, sf_dir):
    """The bucketed two-pass global rank must (a) contain no
    single-partition exchange and (b) agree row-for-row with the naive
    global-window formulation it replaced."""
    from pyspark.sql import Window

    from shippinglanes_spark.io import table

    p = plan(spark, sf_dir, "win_ntile_pct", mode="simple")
    assert "Exchange SinglePartition" not in p
    assert "Exchange hashpartitioning" in p  # bucket-keyed shuffle instead

    got = {r.o_orderkey: (r.quartile, r.pr, r.cd)
           for r in Q["win_ntile_pct"].fn(spark, sf_dir).collect()}
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {r.o_orderkey: (r.quartile, r.pr, r.cd)
            for r in o.select(
                "o_orderkey",
                F.ntile(4).over(w).cast("long").alias("quartile"),
                F.round(F.percent_rank().over(w), 6).alias("pr"),
                F.round(F.cume_dist().over(w), 6).alias("cd"),
            ).collect()}
    assert got == want

def test_declared_partition_pruned_scan(spark, sf_dir):
    """scan_partition_pruned must hit PartitionFilters (directory-level
    pruning), carry no data filter for the year predicate, and scan
    strictly fewer files than the unfiltered layout."""
    p = plan(spark, sf_dir, "scan_partition_pruned", mode="simple")
    assert "PartitionFilters: [" in p
    pf = p.split("PartitionFilters: [")[1][:200]
    assert "o_year" in pf and "IN(1996,1997" in pf.replace(" ", "")

def test_range_join_is_binned_not_nested_loop(spark, sf_dir):
    """The pure (no-equi-key) range join must compile to an equi-join on
    the time bin, never a nested-loop/cartesian plan."""
    p = plan(spark, sf_dir, "join_range_binned", mode="simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p

def test_fuzzy_join_is_blocked_equi_not_nested_loop(spark, sf_dir):
    """The edit-distance pair join must run behind the first-token
    blocking key (equi-join -> hash join), never as a theta-only
    BNLJ whose cost is quadratic in the filtered subset."""
    p = plan(spark, sf_dir, "fn_fuzzy", mode="simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_bucketed_global_rank_is_exact_permutation(spark):
    """On synthetic data with heavy value duplication, the two-pass rank
    must produce exactly 1..n, ordered identically to a global sort on
    (value, tiebreak)."""
    from shippinglanes_spark.operators.windows import bucketed_global_rank

    df = spark.range(5000).select(
        ((F.col("id") * 37) % 101).cast("double").alias("v"), F.col("id")
    )
    ranked, n = bucketed_global_rank(df, "v", "id")
    rows = ranked.select("v", "id", "rn").collect()
    assert n == 5000
    assert sorted(r.rn for r in rows) == list(range(1, 5001))
    by_rank = [(r.v, r.id) for r in sorted(rows, key=lambda r: r.rn)]
    assert by_rank == sorted(by_rank)


def test_spatial_grid_join_is_equi(spark, sf_dir):
    """The 2D pure spatial join must compile to an equi-join on the grid
    cell (plus residual filter), never a nested-loop/cartesian plan."""
    p = plan(spark, sf_dir, "join_spatial_grid", mode="simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_zorder_clusters_both_dims(spark, sf_dir):
    """Range-partitioning by zkey must shrink BOTH dims' per-partition
    spans; range-partitioning by xb alone leaves yb's span at ~global."""
    df = Q["layout_zorder"].fn(spark, sf_dir)

    def mean_spans(part_df):
        spans = (
            part_df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(
                (F.max("xb") - F.min("xb")).alias("xs"),
                (F.max("yb") - F.min("yb")).alias("ys"),
            )
            .agg(F.avg("xs").alias("xs"), F.avg("ys").alias("ys"))
            .first()
        )
        return spans["xs"], spans["ys"]

    # 64 partitions pin ~6 leading Morton bits -> each partition covers
    # a ~32x32 sub-square of the 256x256 key space
    zx, zy = mean_spans(df.repartitionByRange(64, "zkey"))
    sx, sy = mean_spans(df.repartitionByRange(64, "xb"))
    gx = df.agg(F.max("xb") - F.min("xb")).first()[0]
    gy = df.agg(F.max("yb") - F.min("yb")).first()[0]
    # z-order: both dims cluster (each partition covers a sub-square)
    assert zx < 0.5 * gx and zy < 0.5 * gy
    # single-column sort: the other dim does not cluster at all
    assert sy > 0.9 * gy


def test_triangles_oriented_once(spark, sf_dir):
    """A triangle on a 3-clique fixture graph is counted exactly once
    per corner (orientation prevents the 6x overcount)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["a", "b"]
    )
    und = edges.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).distinct()
    ab = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    ac = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = ab.join(bc, "y").join(ac, ["x", "z"])
    rows = tri.collect()
    assert len(rows) == 1
    assert (rows[0]["x"], rows[0]["y"], rows[0]["z"]) == (1, 2, 3)


def test_skyline_matches_bruteforce(spark, sf_dir):
    """The banded two-pass skyline equals the O(n^2) NOT-EXISTS
    dominance definition (checked at fixture scale via anti-join)."""
    from shippinglanes_spark.io import table

    o = table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    )
    a, b = d.alias("a"), d.alias("b")
    dominated = a.join(
        b,
        (F.col("b.price") >= F.col("a.price"))
        & (F.col("b.day") >= F.col("a.day"))
        & (
            (F.col("b.price") > F.col("a.price"))
            | (F.col("b.day") > F.col("a.day"))
        ),
        "left_semi",
    )
    brute = set(r[0] for r in d.exceptAll(dominated).select("o_orderkey").collect())
    fast = set(
        r[0] for r in Q["sort_skyline"].fn(spark, sf_dir).select("o_orderkey").collect()
    )
    assert brute == fast and len(fast) > 0


def test_dpp_injects_dynamic_pruning(spark, sf_dir):
    """scan_dpp's partitioned fact scan must carry a runtime
    dynamicpruningexpression (join-driven partition pruning), not just a
    static filter."""
    p = plan(spark, sf_dir, "scan_dpp", mode="formatted")
    assert "dynamicpruning" in p


def test_correlated_exists_decorrelates_to_semi_join(spark, sf_dir):
    """EXISTS through the SQL front-end must plan as a (broadcast or
    shuffled) left-semi hash join — Catalyst decorrelation, never a
    per-row subquery re-execution or nested loop."""
    p = plan(spark, sf_dir, "subquery_exists", mode="simple")
    assert "LeftSemi" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_runtime_bloom_filter_injected_on_shuffle_join(spark, sf_dir):
    """When the dim side of a shuffle join is selective, Spark's runtime
    row-level filtering injects a bloom filter built from the dim keys as
    a might_contain() predicate on the fact scan — at cluster scale this
    prunes most fact rows BEFORE the shuffle. Broadcast is disabled and
    the application-side size threshold lowered so the rewrite triggers
    at fixture scale; the assertion is that the machinery engages, which
    is what a 100 TB deployment relies on."""
    from shippinglanes_spark.io import table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").where(
            "o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in p, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in p
        # and the filtered side is the fact table's key
        assert "l_orderkey" in p.split("might_contain")[0][-300:] or (
            "l_orderkey" in p.split("might_contain")[1][:300]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_weighted_sample_is_takeordered_and_matches_bruteforce(spark, sf_dir):
    # plan: per-partition k-heaps, never a global sort
    assert "TakeOrderedAndProject" in plan(spark, sf_dir, "sample_weighted")
    # values: independent A-Res recomputation (hashlib + math, no Spark)
    import hashlib
    import math

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .toPandas()
    )
    keys = {}
    for doc_id, n_chars in zip(d["doc_id"], d["n_chars"]):
        h = hashlib.md5(f"wsamp:{doc_id}".encode()).hexdigest()
        u = (int(h[:13], 16) + 1.0) / 4503599627370496.0
        keys[int(doc_id)] = math.log(u) / float(n_chars)
    expect = {i for i, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:64]}
    got = {
        int(r.doc_id)
        for r in Q["sample_weighted"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_shard_manifest_no_global_order(spark, sf_dir):
    df = Q["pipeline_shard_manifest"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in p
    # manifest invariants: offsets strictly increase by n_chars within a
    # writer, file_seq is offset // target
    rows = df.join(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "n_chars"
        ),
        "doc_id",
    ).collect()
    by_writer = {}
    for r in rows:
        by_writer.setdefault(r.writer, []).append(r)
        assert r.file_seq == r.byte_offset // 20_000
    for _, rs in by_writer.items():
        rs.sort(key=lambda r: r.byte_offset)
        cum = 0
        for r in rs:
            assert r.byte_offset == cum
            cum += r.n_chars


def test_assoc_rules_broadcast_not_cartesian(spark, sf_dir):
    df = Q["evt_assoc_rules"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_weighted_path_matches_local_dijkstra(spark, sf_dir):
    # independent check: local Bellman-Ford over the collected edge list
    ev = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/supplier.parquet"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .count()
        .collect()
    )
    edges = [(r.src, r.dst, 1000000 // r["count"]) for r in ev]
    dist = {0: 0}
    for _ in range(4):
        nd = dict(dist)
        for s, t, c in edges:
            if s in dist and dist[s] + c < nd.get(t, 1 << 60):
                nd[t] = dist[s] + c
        dist = nd
    got = {
        int(r.nation_id): int(r.min_cost)
        for r in Q["graph_weighted_path"].fn(spark, sf_dir).collect()
    }
    assert got == dist


def test_moment_queries_single_scan_no_joins(spark, sf_dir):
    """agg_corr_matrix / agg_ols / agg_anova claim one-pass moment
    aggregation: one scan, no join of any kind, partial+final agg."""
    import re

    for name in ("agg_corr_matrix", "agg_ols", "agg_anova"):
        p = plan(spark, sf_dir, name)
        # formatted explain lists each node twice (tree + details):
        # count the numbered detail entries
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, name
        for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
            assert j not in p, (name, j)
        assert "HashAggregate" in p, name


def test_entity_resolution_is_blocked_equi_join(spark, sf_dir):
    """The ER candidate join must be a hash equi-join on the blocking
    key, never a nested-loop over all pairs."""
    p = plan(spark, sf_dir, "join_entity_resolution")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p) or (
        "ShuffledHashJoin" in p
    )


def test_quality_ensemble_zero_shuffle(spark, sf_dir):
    """The ensemble gate claims pure per-row compute: no Exchange at all."""
    p = plan(spark, sf_dir, "pipeline_quality_ensemble")
    assert "Exchange" not in p


def test_geo_grid_joins_are_equi_not_nested_loop(spark, sf_dir):
    """The double-cell spacetime joins must stay plain equi-joins on
    (cx, cy, ct) — no nested loop, no cartesian — with probe fanout
    bounded by the explode chain, not a range predicate."""
    for name in ("geo_encounters", "geo_convoys"):
        p = plan(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoop" not in p, name
        assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
            "BroadcastHashJoin" in p
        ), name


def test_groups_frame_single_shuffle(spark, sf_dir):
    """The GROUPS-frame emulation stacks dense_rank and the RANGE sum on
    the same (custkey) partitioning: one exchange, no join."""
    p = plan(spark, sf_dir, "win_groups_frame", mode="simple")
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in p
    # two Sorts are expected (rank orders by day, the frame by the rank
    # ordinal — same partitioning, different sort key), but no join and
    # no re-shuffle between the stacked windows


def test_containment_join_is_equi_not_nested_loop(spark, sf_dir):
    """The containment candidate join must be a hash/merge equi-join on
    the prefix shingle — never an all-pairs nested loop (the oracle
    pays the quadratic cost; the engine must not)."""
    p = plan(spark, sf_dir, "join_set_containment")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p) or (
        "ShuffledHashJoin" in p
    )


def test_dup_spans_partial_agg_single_scan(spark, sf_dir):
    """Span mining claims one corpus-linear pass: a single scan and a
    map-side-combined aggregate (partial_count before the exchange),
    so the shuffle carries distinct spans per partition, not every
    window occurrence."""
    import re

    p = plan(spark, sf_dir, "text_dup_spans")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in p
    assert "partial_count" in p  # map-side combine of the span counts


def test_url_canonicalize_single_scan_one_shuffle(spark, sf_dir):
    """URL dedup must stay the dedup_exact shape: one scan, per-row
    canonicalization, one hash-groupBy with map-side combine — and the
    shuffle must not carry document text (pruned read schema)."""
    import re

    p = plan(spark, sf_dir, "pipeline_url_canonicalize")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert "partial_count" in p  # map-side combine before the exchange
    assert "text" not in p.split("ReadSchema")[1].split("\n")[0]
    for j in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoop"):
        assert j not in p


def test_funnel_steps_broadcasts_user_tables(spark, sf_dir):
    """Each funnel step joins the event log against a user-cardinality
    table — those must broadcast; no step may sort-merge or cartesian."""
    p = plan(spark, sf_dir, "evt_funnel_steps")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_stl_decompose_grid_windows_no_cartesian(spark, sf_dir):
    """The decomposition reduces the corpus to the daily grid in one
    keyed aggregate; the seasonal/MAD joins are broadcast; nothing
    cartesians."""
    p = plan(spark, sf_dir, "ts_stl_decompose")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_geohash_single_scan_one_shuffle(spark, sf_dir):
    """Geohash encode must be map-side (codegen integer math), leaving
    one scan and one combined hash aggregate — no join, no extra
    exchange."""
    import re

    p = plan(spark, sf_dir, "geo_geohash")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in p


def test_rank_stats_no_cartesian_single_scan(spark, sf_dir):
    """Kendall tau's pair stage must be an equi-join on the key (never
    a cartesian); Kruskal-Wallis and McNemar reduce to keyed aggregates
    over ONE scan each."""
    import re

    p = plan(spark, sf_dir, "agg_kendall_tau")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    for name in ("agg_kruskal_wallis", "agg_mcnemar"):
        p = plan(spark, sf_dir, name)
        assert "CartesianProduct" not in p
        # kruskal's one corpus pass is behind a localCheckpoint, so its
        # post-checkpoint plan shows ZERO parquet scans; mcnemar shows
        # exactly one. Either way: never more than one.
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) <= 1, name


def test_round6_stats_single_pass_no_cartesian(spark, sf_dir):
    # the moment-based tests are one map-side-combined pass over events
    for name in ("agg_jarque_bera", "agg_extreme_value", "ts_granger"):
        p = plan(spark, sf_dir, name, mode="simple")
        assert "CartesianProduct" not in p
        assert p.count("Scan parquet") == 1, name
    jb = plan(spark, sf_dir, "agg_jarque_bera")
    assert jb.count("HashAggregate") >= 2  # partial + final


def test_point_in_polygon_broadcasts_zones(spark, sf_dir):
    p = plan(spark, sf_dir, "geo_point_in_polygon", mode="simple")
    assert "CartesianProduct" not in p
    # the 2-row zone literal joins as a broadcast nested loop (the
    # predicate is a conjunction of inequalities, not an equi-key)
    assert "BroadcastNestedLoopJoin" in p
    assert p.count("Scan parquet") == 1


def test_dsir_broadcasts_feature_table(spark, sf_dir):
    p = plan(spark, sf_dir, "pipeline_dsir", mode="simple")
    assert "CartesianProduct" not in p
    # the 1024-bucket log-ratio table re-joins the corpus as a
    # broadcast hash join — the corpus is never reshuffled by bucket
    assert "BroadcastHashJoin" in p


def test_shapley_single_user_aggregate(spark, sf_dir):
    p = plan(spark, sf_dir, "evt_attribution_shapley", mode="simple")
    assert "CartesianProduct" not in p
    # two scans max: the corpus pass and the broadcast engagement-total
    # lineage (AQE reuses the exchange at runtime when beneficial)
    assert p.count("Scan parquet") <= 2


def test_ppjoin_family_no_forced_df_broadcast(spark, sf_dir):
    """The shingle document-frequency table is vocabulary-sized —
    corpus-scale at 100 TB — so the PPJoin family must NOT pin it with
    a broadcast hint (a forced broadcast OOMs the driver exactly when
    the corpus is big). The logical plan must carry no ResolvedHint on
    the df-table join; AQE remains free to broadcast at runtime when
    the table is actually small. The weighted variant keeps exactly one
    hint: the ONE-ROW doc-count aggregate."""
    for name, allowed_hints in [
        ("join_set_similarity", 0),
        ("join_set_containment", 0),
        ("join_set_similarity_weighted", 1),  # F.broadcast(nd), 1 row
    ]:
        df = Q[name].fn(spark, sf_dir)
        logical = df._jdf.queryExecution().analyzed().toString()
        assert logical.count("ResolvedHint") == allowed_hints, name


def test_round9_pack_plan_shapes(spark, sf_dir):
    """The round-9 pack's scale stories as plan facts: no cartesian
    anywhere; the trend test's three dim joins are broadcast; the
    self-BLEU scan prunes to the three needed columns; the BT /
    Ljung-Box / Cronbach spine joins stay broadcast-NLJ on literal-tiny
    sides (never a shuffled cartesian)."""
    for name in (
        "rank_bradley_terry",
        "rank_err",
        "ts_ljung_box",
        "agg_cronbach_alpha",
        "agg_cochran_armitage",
        "text_self_bleu",
        "agg_isotonic_calibration",
        "pipeline_preference_pairs",
    ):
        p = plan(spark, sf_dir, name, mode="simple")
        assert "CartesianProduct" not in p, name
    p = plan(spark, sf_dir, "agg_cochran_armitage")
    assert "BroadcastHashJoin" in p
    assert p.count("SortMergeJoin") == 0
    rs = plan(spark, sf_dir, "text_self_bleu").split("ReadSchema")[1][:300]
    assert "text" in rs and "n_chars" not in rs and "doc_id" not in rs
    # preference pairs: one corpus scan, windows bucket-local
    pp = plan(spark, sf_dir, "pipeline_preference_pairs", mode="simple")
    assert pp.count("Scan parquet") <= 2  # self-joined rollup lineage


def test_round10_pack_plan_shapes(spark, sf_dir):
    """The round-10 pack's scale stories as plan facts: no cartesian
    anywhere; VIF/Deming's dim joins broadcast (the only sort-merge is
    the orderkey-keyed fact rollup join); exposure's global top-K is a
    TakeOrderedAndProject, never a full sort; the VARIANT query is
    scan-shaped (no exchange at all); MATTR prunes its scan to the
    needed columns."""
    for name in (
        "agg_anderson_darling",
        "agg_vif",
        "agg_deming",
        "ts_sample_entropy",
        "text_mattr",
        "rank_exposure",
        "fn_variant_nested",
        "agg_listagg",
    ):
        p = plan(spark, sf_dir, name, mode="simple")
        assert "CartesianProduct" not in p, name
    for name in ("agg_vif", "agg_deming"):
        p = plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in p, name
        # nation/region broadcast; orders/customer join may sort-merge
        # on the fact key, never more than twice
        assert p.count("SortMergeJoin") <= 2, name
    p = plan(spark, sf_dir, "rank_exposure", mode="simple")
    assert "TakeOrderedAndProject" in p
    # scan-shaped: the only exchange is the presentation sort's range
    # partitioning — no hash shuffle, no aggregation exchange
    p = plan(spark, sf_dir, "fn_variant_nested", mode="simple")
    assert "Exchange hashpartitioning" not in p
    rs = plan(spark, sf_dir, "text_mattr").split("ReadSchema")[1][:300]
    assert "text" in rs and "n_chars" not in rs


def test_round10_pack2_plan_shapes(spark, sf_dir):
    """Pack-2 scale stories as plan facts: no cartesian; the VR /
    turning-point / CIF day tables do calendar-sized window work after
    one keyed rollup; partial correlation inherits agg_vif's broadcast
    dims; the SQL session-state chain compiles to a plain aggregate
    over the pruned lineitem scan."""
    for name in (
        "ts_variance_ratio",
        "ts_turning_points",
        "agg_partial_correlation",
        "text_entropy_rate",
        "evt_cumulative_incidence",
        "sql_variables_exec",
    ):
        p = plan(spark, sf_dir, name, mode="simple")
        assert "CartesianProduct" not in p, name
    p = plan(spark, sf_dir, "agg_partial_correlation")
    assert "BroadcastHashJoin" in p
    assert p.count("SortMergeJoin") <= 2
    # the EXECUTE IMMEDIATE indirection must not defeat column pruning
    rs = plan(spark, sf_dir, "sql_variables_exec").split("ReadSchema")[1][:300]
    assert "l_quantity" in rs and "l_extendedprice" not in rs


def test_round10_pack3_plan_shapes(spark, sf_dir):
    """Pack-3 scale stories as plan facts: no cartesian; the JL
    projection is scan-shaped (literal matrix, no hash shuffle); the
    Walsh pair join runs on the checkpointed calendar grid; Chao1
    prunes its scan to (lang, text)."""
    for name in (
        "agg_hodges_lehmann",
        "text_chao1",
        "emb_jl_projection",
        "pipeline_pair_rouge",
    ):
        p = plan(spark, sf_dir, name, mode="simple")
        assert "CartesianProduct" not in p, name
    p = plan(spark, sf_dir, "emb_jl_projection", mode="simple")
    assert "Exchange hashpartitioning" not in p
    rs = plan(spark, sf_dir, "text_chao1").split("ReadSchema")[1][:300]
    assert "text" in rs and "doc_id" not in rs and "n_chars" not in rs


def test_round10_pack4_plan_shapes(spark, sf_dir):
    """Pack-4 scale stories as plan facts: no cartesian; SES folds run
    on the checkpointed calendar grid; key discovery is one scan with
    partial-aggregable distinct counts (expand + two-level aggregate,
    no window)."""
    for name in ("ts_ses_select", "profile_key_candidates"):
        p = plan(spark, sf_dir, name, mode="simple")
        assert "CartesianProduct" not in p, name
    p = plan(spark, sf_dir, "profile_key_candidates", mode="simple")
    assert "Window" not in p
    assert p.count("Scan parquet") <= 1


def test_plan_shape_gate_semantics():
    """The plan-shape regression gate (scripts/plan_audit.py --check,
    round-9 verdict item 3): unexplained tuple changes fail, additions
    and removals report-but-pass, VOLATILE entries are excused. Pure
    dict logic — the live audit runs in the close ritual."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, "/root/repo/scripts")
    pa = importlib.import_module("plan_audit")
    ref_shapes = {
        "q_same": {"bhj": 1, "smj": 0},
        "q_flip": {"bhj": 1, "smj": 0},
        "q_gone": {"bhj": 0, "smj": 0},
        "q_volatile": {"bhj": 2, "smj": 0},
    }
    live = [
        ("q_same", {"bhj": 1, "smj": 0}),
        ("q_flip", {"bhj": 0, "smj": 1}),       # the 100x killer: BHJ -> SMJ
        ("q_new", {"bhj": 1, "smj": 0}),        # new query: passes
        ("q_volatile", {"bhj": 1, "smj": 0}),   # excused if listed
    ]
    import json as _json
    import os as _os
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        _json.dump({"shapes": ref_shapes}, f)
        path = f.name
    old_ref, old_vol = pa.REF_PATH, dict(pa.VOLATILE)
    try:
        pa.REF_PATH = path
        pa.VOLATILE.clear()
        assert pa.check(live) == 1  # q_flip AND q_volatile unexplained
        pa.VOLATILE["q_volatile"] = "sample-fit codebook"
        assert pa.check(live) == 1  # q_flip still unexplained
        pa.VOLATILE["q_flip"] = "adjudicated"
        assert pa.check(live) == 0
    finally:
        # restore IN PLACE (rebinding the module attr then clearing the
        # same dict object would wipe the saved copy) + drop the temp ref
        pa.REF_PATH = old_ref
        pa.VOLATILE.clear()
        pa.VOLATILE.update(old_vol)
        _os.unlink(path)


def test_plan_ref_snapshot_is_current(spark, sf_dir):
    """plan_ref.json must cover the registry and stay shape-accurate:
    a fixed probe sample re-audits LIVE against the committed ref, so
    a silent plan flip (or a stale ref after a perf rewrite) fails the
    suite — the fast in-suite arm of the --check gate. The sample spans
    the join/agg/window/text/embedding families plus the three queries
    rewritten this round."""
    import json as _json
    import os as _os
    import sys as _sys

    _sys.path.insert(0, "/root/repo/scripts")
    import importlib

    pa = importlib.import_module("plan_audit")
    with open("/root/repo/plan_ref.json") as f:
        ref = _json.load(f)
    shapes = ref["shapes"]
    declared = {
        n
        for n, q in Q.items()
        if q.declare and n != "stream_lift"
    }
    missing = declared - set(shapes) - set(ref.get("errors", {}))
    assert not missing, f"plan_ref.json stale, re-run --write-ref: {sorted(missing)[:5]}"
    assert sum(s["cart"] for s in shapes.values()) == 0
    sample = [
        "join_multi5", "tpch_q9_product_profit", "agg_groupby", "win_ntile_pct",
        "evt_sessionize", "join_asof", "sim_knn", "text_minhash_dedup",
        "agg_spearman", "text_heaps_law", "pipeline_semdedup",
        "profile_key_candidates",
    ]
    # the ref is taken at sf0.001; the test session must audit at the
    # same fixture AND the same shape-relevant confs (shuffle
    # partitions, broadcast threshold, AQE) for tuples to be
    # comparable. cpus is deliberately NOT compared — static-plan
    # operator counts don't depend on local[N] parallelism (see
    # plan_audit.shape_conf), and the ref is captured at cpus=4 while
    # this suite runs cpus=8 (ADVICE r10).
    assert ref["sf"].rstrip("/").endswith("sf0.001")
    assert pa.shape_conf(spark) == ref["conf"], (
        "plan_ref.json captured under different shape-relevant confs — "
        f"ref {ref['conf']} vs live {pa.shape_conf(spark)}; re-run "
        "--write-ref under the suite conf or fix the session"
    )
    for name in sample:
        live = pa.audit(Q[name].fn(spark, "/root/testdata/sf0.001"))
        assert live == shapes[name], (name, live, shapes[name])
