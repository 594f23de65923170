"""Brute-force property tests for round-4 operators: the oracle harness
proves engine agreement; these prove the SEMANTICS against naive
reference implementations on constructed inputs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_weighted_median_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [
        (chr(65 + rng.randrange(3)), rng.randrange(1, 2000), rng.randrange(1, 9))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, cents long, q long")
    from pyspark.sql import Window

    g = df.groupBy("k", "cents").agg(F.sum("q").alias("q"))
    wc = Window.partitionBy("k").orderBy("cents")
    wt = Window.partitionBy("k")
    c = g.select(
        "k", "cents",
        F.sum("q").over(wc).alias("cq"), F.sum("q").over(wt).alias("tq"),
    )
    got = {
        r.k: r.m
        for r in c.where(2 * F.col("cq") >= F.col("tq"))
        .groupBy("k")
        .agg(F.min("cents").alias("m"))
        .collect()
    }

    def brute(k):
        vals = sorted(
            (c, q) for kk, c, q in rows if kk == k
        )
        tot = sum(q for _, q in vals)
        cum = 0
        for c_, q in vals:
            cum += q
            if 2 * cum >= tot:
                return c_

    for k in "ABC":
        assert got[k] == brute(k), k


def test_chunk_overlap_covers_all_tokens(spark, sf_dir):
    """Every token index must be covered by >= 1 chunk; chunk indexes are
    contiguous from 0; every full-size chunk has CHUNK tokens and
    consecutive chunks overlap by CHUNK - STRIDE."""
    from shippinglanes_spark.io import table
    from shippinglanes_spark.registry import all_queries

    CHUNK, STRIDE = 32, 24
    out = all_queries()["pipeline_chunk_overlap"].fn(spark, sf_dir).toPandas()
    n_tok = {
        r.doc_id: r.n
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        idxs = grp["chunk_idx"].tolist()
        assert idxs == list(range(len(idxs)))
        n = n_tok[doc_id]
        # coverage: last chunk starts at STRIDE*(len-1) and reaches n
        last_start = STRIDE * idxs[-1]
        assert last_start < n <= last_start + CHUNK
        sizes = grp["n_tok"].tolist()
        # each chunk is CHUNK tokens clipped at the doc end
        for i, sz in zip(idxs, sizes):
            assert sz == min(CHUNK, n - STRIDE * i)


def test_asof_nearest_matches_bruteforce(spark):
    """join_asof_nearest semantics vs a per-row brute-force scan on
    constructed views/purchases, including no-view-before and
    no-view-after edges and an exact tie."""
    rows = [
        # user 1: views at 10, 30; purchases at 5 (-> 10), 19 (-> 10: back
        # gap 9 < fwd 11), 20 (tie 10 vs 30 -> earlier = 10), 40 (-> 30)
        (1, 101, "view", 10), (1, 102, "view", 30),
        (1, 201, "purchase", 5), (1, 202, "purchase", 19),
        (1, 203, "purchase", 20), (1, 204, "purchase", 40),
        # user 2: no views at all -> nearest is NULL
        (2, 301, "purchase", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_us long"
    )
    from pyspark.sql import Window

    view_ts = F.when(F.col("event_type") == "view", F.col("ts_us"))
    wb = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    both = df.select(
        "user_id", "event_id", "event_type", "ts_us",
        F.max(view_ts).over(wb).alias("p"),
        F.min(view_ts).over(wf).alias("nx"),
    ).where(F.col("event_type") == "purchase")
    bg = F.col("ts_us") - F.col("p")
    fg = F.col("nx") - F.col("ts_us")
    nearest = (
        F.when(F.col("p").isNull(), F.col("nx"))
        .when(F.col("nx").isNull(), F.col("p"))
        .when(bg <= fg, F.col("p"))
        .otherwise(F.col("nx"))
    )
    got = {
        r.event_id: r.n
        for r in both.select("event_id", nearest.alias("n")).collect()
    }
    assert got == {201: 10, 202: 10, 203: 10, 204: 30, 301: None}


def test_m4_downsample_preserves_extremes(spark, sf_dir):
    """Per bucket: v_min <= v_first, v_last <= v_max, and the global
    min/max of the series survive in the downsampled table (the M4
    error-free guarantee for line rendering)."""
    from shippinglanes_spark.io import table
    from shippinglanes_spark.registry import all_queries

    out = all_queries()["ts_m4_downsample"].fn(spark, sf_dir).toPandas()
    assert (out["v_min"] <= out["v_first"] + 1e-9).all()
    assert (out["v_min"] <= out["v_last"] + 1e-9).all()
    assert (out["v_first"] <= out["v_max"] + 1e-9).all()
    assert (out["v_last"] <= out["v_max"] + 1e-9).all()
    ev = table(spark, sf_dir, "events").agg(
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    ).first()
    assert abs(out["v_min"].min() - ev.lo) < 1e-9
    assert abs(out["v_max"].max() - ev.hi) < 1e-9


def test_agg_ols_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer-from-moments solve must equal an independent dense
    lstsq on the same integerized inputs (the oracle shares the formula
    text with the engine, so this is the external reference)."""
    import numpy as np

    from shippinglanes_spark.registry import all_queries

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    got = {
        r.l_returnflag: (float(r.b0), float(r.b1), float(r.b2))
        for r in all_queries()["agg_ols"].fn(spark, sf_dir).collect()
    }
    for flag, grp in li.groupby("l_returnflag"):
        # HALF_UP like both engines' ROUND (np.round is half-even and
        # diverges on the .50-cent prices)
        x1 = np.floor(grp["l_quantity"].to_numpy() + 0.5)
        x2 = np.floor(grp["l_discount"].to_numpy() * 100 + 0.5)
        y = np.floor(grp["l_extendedprice"].to_numpy() + 0.5)
        X = np.column_stack([np.ones_like(x1), x1, x2])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        for got_b, ref_b in zip(got[flag], beta):
            # Cramer-in-doubles vs SVD lstsq: compare at relative
            # precision (the normal equations square the condition number)
            assert abs(got_b - ref_b) <= 1e-5 * max(1.0, abs(ref_b)), (
                flag,
                got[flag],
                beta,
            )


def test_eval_holdout_exact_size_and_proportional(spark, sf_dir):
    """Largest-remainder allocation: total is EXACTLY the target and each
    source's quota is within 1 of its real-valued proportional share."""
    from shippinglanes_spark.registry import all_queries

    out = all_queries()["pipeline_eval_holdout"].fn(spark, sf_dir).toPandas()
    assert len(out) == 100
    per = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
    )
    total = per.sum()
    got = out.groupby("source").size()
    for src, n in per.items():
        share = 100 * n / total
        assert abs(got.get(src, 0) - share) < 1.0, (src, got.get(src, 0), share)


def test_dedup_paragraph_first_occurrence_bruteforce(spark, sf_dir):
    """Independent recomputation of the keep set: a segment survives only
    in the (doc_id, seg_idx)-smallest document that contains it."""
    from shippinglanes_spark.registry import all_queries

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
    )
    seen = set()
    kept = {}
    segs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        n = 0
        k = 0
        for start in range(0, max(len(toks), 1), 20):
            if start >= len(toks):
                break
            seg = " ".join(toks[start : start + 20])
            n += 1
            if seg not in seen:
                seen.add(seg)
                k += 1
        kept[int(doc_id)] = k
        segs[int(doc_id)] = n
    out = all_queries()["text_dedup_paragraph"].fn(spark, sf_dir).collect()
    for r in out:
        assert r.n_segs == segs[r.doc_id], r
        assert r.n_kept == kept[r.doc_id], r


def test_stream_join_outer_emits_null_rows(spark, sf_dir):
    """The left-outer drain must contain BOTH matched and null-view rows
    (the watermark-eviction path actually fired)."""
    from shippinglanes_spark.registry import all_queries

    out = all_queries()["stream_join_outer"].fn(spark, sf_dir)
    n_null = out.where(F.col("view_id").isNull()).count()
    n_match = out.where(F.col("view_id").isNotNull()).count()
    assert n_null > 0 and n_match > 0, (n_null, n_match)


def test_mannwhitney_auc_matches_pairwise_bruteforce(spark, sf_dir):
    """U/(n1*n2) must equal the literal pairwise win-rate
    (wins + half-ties) computed by numpy broadcasting."""
    import numpy as np

    from shippinglanes_spark.registry import all_queries

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type").isin("click", "view"))
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("v"))
        .toPandas()
    )
    g1 = ev.loc[ev["event_type"] == "click", "v"].to_numpy()
    g2 = ev.loc[ev["event_type"] == "view", "v"].to_numpy()
    wins = (g1[:, None] > g2[None, :]).sum()
    ties = (g1[:, None] == g2[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(g1) * len(g2))
    row = all_queries()["agg_mannwhitney_auc"].fn(spark, sf_dir).first()
    assert row.n1 == len(g1) and row.n2 == len(g2)
    assert row.auc_ppm == int(auc * 1_000_000)


def test_ks_statistic_matches_numpy_cdf_gap(spark, sf_dir):
    """D must equal the max |F1 - F2| computed from raw arrays."""
    import numpy as np

    from shippinglanes_spark.registry import all_queries

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type").isin("click", "view"))
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("v"))
        .toPandas()
    )
    g1 = np.sort(ev.loc[ev["event_type"] == "click", "v"].to_numpy())
    g2 = np.sort(ev.loc[ev["event_type"] == "view", "v"].to_numpy())
    vals = np.unique(np.concatenate([g1, g2]))
    f1 = np.searchsorted(g1, vals, side="right") / len(g1)
    f2 = np.searchsorted(g2, vals, side="right") / len(g2)
    d_ref = np.abs(f1 - f2).max()
    row = all_queries()["agg_ks_test"].fn(spark, sf_dir).first()
    assert row.n1 == len(g1) and row.n2 == len(g2)
    assert abs(row.d_num / (row.n1 * row.n2) - d_ref) < 1e-12
