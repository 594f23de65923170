"""Planted-duplicate tests for the sketch-based dedup operators
(FIXTURES.md: the fixtures contain no dups, so recall must be proven on
constructed inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippinglanes_spark.functions.minhash import (
    embedding_neardups,
    minhash_candidates,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "near the quiet river bank under the bright morning sun"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("quick", "swift")),  # near-dup of 0 (1-word edit)
        (3, BASE.replace("morning", "evening").replace("cat", "kitten")),
        (4, "completely different text about database query engines and "
            "distributed shuffle joins over columnar storage formats"),
        (5, "another unrelated document describing vectorized execution "
            "and adaptive partition coalescing in modern analytics systems"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_pairs(docs):
    pairs = {
        (r.id_a, r.id_b) for r in minhash_candidates(docs).collect()
    }
    # exact + near duplicates of doc 0 must be candidates
    assert (0, 1) in pairs
    assert (0, 2) in pairs and (1, 2) in pairs
    # unrelated docs must not pair with the duplicate cluster
    assert not any(4 in p or 5 in p for p in pairs if p != (4, 5))


def test_simhash_hamming_separation(spark, docs):
    sig = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert sig[0] == sig[1]  # identical text -> identical signature

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(sig[0], sig[2]) <= 6  # 1-word edit stays close
    assert hamming(sig[0], sig[4]) > 10  # unrelated text is far


def test_embedding_lsh_finds_planted_neardup(spark):
    base = [float(i % 7 - 3) for i in range(64)]
    near = list(base)
    near[0] += 0.01  # tiny perturbation -> cosine ~1
    far = [float((i * 31) % 11 - 5) for i in range(64)]
    emb = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r.id_a, r.id_b): r.cos for r in embedding_neardups(spark, emb).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.99
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_embedding_lsh_overcap_bucket_not_dropped(spark, monkeypatch):
    """A degenerate LSH bucket larger than MAX_BUCKET must still surface
    its near-dups (pre-round-4 code silently dropped the whole bucket).
    With MAX_BUCKET forced to 3 and 8 near-identical vectors (same
    hyperplane signature AND same refinement bits), the still-over-cap
    sub-bucket emits linear anchor pairs: every member connects to the
    bucket anchor, which is what a downstream CC dedup pass needs."""
    from shippinglanes_spark.functions import minhash as mh

    monkeypatch.setattr(mh, "MAX_BUCKET", 3)
    base = [float(i % 7 - 3) for i in range(64)]
    rows = []
    for v in range(8):
        vec = list(base)
        vec[1] += 0.001 * v  # near-identical: refinement can't split them
        rows.append((v, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in embedding_neardups(spark, emb).collect()}
    assert pairs, "over-cap bucket was silently dropped"
    # anchor-pair shape: the smallest member pairs with every other member
    assert pairs == {(0, v) for v in range(1, 8)}
    # and connectivity holds: every vector appears in some pair
    covered = {i for p in pairs for i in p}
    assert covered == set(range(8))


def test_minhash_giant_cluster_not_dropped(spark):
    """A boilerplate cluster bigger than MAX_BUCKET (2048 exact copies of
    one paragraph — over cap in EVERY band, since identical text gives
    identical signatures) must still be fully recoverable. Pre-round-5
    code dropped every over-cap bucket, so the whole cluster vanished
    from the candidate stream. Now the over-cap bucket sub-buckets on the
    full-signature hash and the (still giant, identical-signature)
    sub-bucket emits linear anchor pairs: every member reaches the
    cluster through the anchor, and connected-components collapses all
    2048 docs into one cluster at O(n) pairs instead of O(n^2)."""
    from shippinglanes_spark.functions.text import connected_components

    n = 2048
    rows = [(i, BASE) for i in range(n)]
    rows.append((n, BASE.replace("quick", "swift")))  # near-dup, small bucket
    rows.append((n + 1, "entirely unrelated text about columnar storage "
                        "engines and vectorized shuffle partition pruning"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = minhash_candidates(docs)
    pairs = [(r.id_a, r.id_b) for r in cand.collect()]
    assert pairs, "giant cluster was silently dropped"
    # anchor-pair shape: O(n) pairs, nowhere near the n^2 expansion
    assert len(pairs) < 4 * n
    # every cluster member is reachable: CC collapses all copies into one
    # cluster labelled by the smallest doc_id
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    labels = {r.id: r.label for r in connected_components(edges).collect()}
    assert all(labels[i] == 0 for i in range(n)), "a copy is unreachable"
    # the near-dup doc still pairs through the normal small-bucket path
    assert labels.get(n) == 0
    # the unrelated doc never joins the cluster
    assert labels.get(n + 1, n + 1) == n + 1


def test_exact_dedup_on_planted(spark, docs):
    fp = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    )
    groups = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
        .where(F.col("n") > 1)
        .collect()
    )
    assert len(groups) == 1
    assert groups[0].n == 2 and groups[0].keeper == 0


def test_shingles_short_docs_empty_not_crash(spark):
    """Docs with fewer than k=3 tokens must yield an empty shingle array
    (DuckDB returns an empty list for the same input; unguarded
    sequence(1, size-2) would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT)."""
    from shippinglanes_spark.functions.text import shingles

    rows = [(0, "one"), (1, "two words"), (2, "exactly three tokens"),
            (3, ""), (4, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.sh for r in
           df.select("doc_id", shingles(F.col("text")).alias("sh")).collect()}
    assert got[0] == [] and got[1] == [] and got[3] == []
    assert got[2] == ["exactly three tokens"]
    assert got[4] == ["a b c", "b c d"]


def test_minhash_tolerates_short_docs(spark):
    """minhash_signatures / candidates must not crash when the corpus
    contains sub-k-token documents; they simply produce no signature."""
    from shippinglanes_spark.functions.minhash import minhash_signatures

    rows = [(0, "hi"), (1, "a b"), (2, BASE), (3, BASE)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df)
    assert {r.doc_id for r in sigs.select("doc_id").collect()} == {2, 3}
    pairs = {(r.id_a, r.id_b) for r in minhash_candidates(df).collect()}
    assert (2, 3) in pairs


def test_connected_components_transitive(spark):
    """Near-dup clustering must be transitive: a chain a-b-c collapses to
    one cluster labelled by its smallest id even though (a, c) was never
    a pair; disjoint pairs stay separate."""
    from shippinglanes_spark.functions.text import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (20, 21), (30, 31), (31, 30)],
        "id_a long, id_b long",
    )
    expect = {1: 1, 2: 1, 3: 1, 9: 1, 20: 20, 21: 20, 30: 30, 31: 30}
    # local union-find fast path (default) AND forced-distributed path
    got = {r.id: r.label for r in connected_components(pairs).collect()}
    assert got == expect
    got_dist = {
        r.id: r.label
        for r in connected_components(pairs, local_max=0).collect()
    }
    assert got_dist == expect


def test_connected_components_long_chain(spark):
    """A 12-node path needs ~diameter rounds — exercises the iteration
    loop beyond one hop."""
    from shippinglanes_spark.functions.text import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "id_a long, id_b long"
    )
    got = {r.id: r.label for r in connected_components(pairs).collect()}
    assert set(got.values()) == {100} and len(got) == 13
    got_dist = {
        r.id: r.label
        for r in connected_components(pairs, local_max=0).collect()
    }
    assert got_dist == got


def test_connected_components_local_distributed_parity(spark):
    """The size-bounded local union-find and the distributed min-label
    propagation must agree label-for-label on a random graph."""
    import random

    from shippinglanes_spark.functions.text import connected_components

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {r.id: r.label for r in connected_components(pairs).collect()}
    dist = {
        r.id: r.label
        for r in connected_components(pairs, local_max=0).collect()
    }
    assert local == dist


def test_dedup_embedding_lsh_collapses_planted_cluster(spark):
    """dedup_embedding_lsh composition: a planted 3-vector near-dup
    cluster keeps exactly its smallest vec_id; singletons keep themselves."""
    from shippinglanes_spark.functions.minhash import embedding_neardups
    from shippinglanes_spark.functions.text import connected_components
    import pyspark.sql.functions as F

    base = [float(i % 7 - 3) for i in range(64)]
    rows = []
    for v in range(3):  # ids 10,11,12: near-identical cluster
        vec = list(base)
        vec[0] += 0.005 * v
        rows.append((10 + v, vec))
    rows.append((20, [float((i * 31) % 11 - 5) for i in range(64)]))
    rows.append((21, [float((i * 17) % 13 - 6) for i in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pairs = embedding_neardups(spark, emb).select("id_a", "id_b")
    labels = connected_components(pairs)
    cluster = F.coalesce(F.col("label"), F.col("vec_id"))
    out = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in emb.select("vec_id")
        .join(labels, emb.vec_id == labels.id, "left")
        .select(
            "vec_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("vec_id")).cast("int").alias("keep"),
        )
        .collect()
    }
    assert out[10] == (10, 1)
    assert out[11] == (10, 0) and out[12] == (10, 0)
    assert out[20] == (20, 1) and out[21] == (21, 1)


def test_weighted_ppjoin_lossless_on_random_corpora(spark, tmp_path):
    """The weighted prefix filter must drop NOTHING: on random small
    corpora (seeded), the declared query's pairs equal a Python
    brute-force over all pairs at the same integer milli-idf weights."""
    import itertools
    import random

    from shippinglanes_spark.registry import all_queries

    vocab = [f"w{i}" for i in range(40)]
    for seed in (7, 42, 1234):
        rng = random.Random(seed)
        rows = []
        base = [rng.choice(vocab) for _ in range(30)]
        for i in range(24):
            doc_id = i * 3  # query filter keeps doc_id % 3 == 0
            if i % 4 == 0:
                toks = list(base)
                for _ in range(rng.randrange(0, 4)):  # near-dups of base
                    toks[rng.randrange(len(toks))] = rng.choice(vocab)
            else:
                toks = [rng.choice(vocab) for _ in range(rng.randrange(3, 40))]
            rows.append((doc_id, " ".join(toks)))
        p = str(tmp_path / f"wppj{seed}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{p}/documents.parquet")

        # brute-force reference at identical integer weights
        shingled = {}
        for doc_id, text in rows:
            toks = text.split(" ")
            if len(toks) >= 3:
                shingled[doc_id] = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
        df_count: dict[str, int] = {}
        for s in shingled.values():
            for t in s:
                df_count[t] = df_count.get(t, 0) + 1
        nd = len(shingled)
        wt = {t: (nd * 1000) // c for t, c in df_count.items()}
        tw = {d: sum(wt[t] for t in s) for d, s in shingled.items()}
        want = {}
        for a, b in itertools.combinations(sorted(shingled), 2):
            iw = sum(wt[t] for t in shingled[a] & shingled[b])
            u = tw[a] + tw[b] - iw
            if u and iw * 2 >= u:
                want[(a, b)] = iw * 1_000_000 // u
        got = {
            (r.doc_a, r.doc_b): r.jw_ppm
            for r in all_queries()["join_set_similarity_weighted"]
            .fn(spark, p)
            .collect()
        }
        assert got == want, f"seed {seed}: {got} != {want}"


def test_containment_lsh_planted_slices(spark):
    """Size-stratified containment LSH must recover small docs planted
    as contiguous slices of hosts 2x/4x/8x their size (containment 1.0
    but Jaccard only 1/2, 1/4, 1/8 — exactly the pairs plain near-dup
    banding loses), and every reported pair must verify exactly."""
    import random

    from shippinglanes_spark.functions.minhash import (
        containment_lsh_candidates,
    )

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(4000)]
    rows = []
    planted = []
    doc_id = 0
    # 30 hosts of ~160 tokens; for each, plant slices at ratios 2/4/8
    for h in range(30):
        host_toks = rng.sample(vocab, 160)
        host_id = doc_id
        rows.append((host_id, " ".join(host_toks)))
        doc_id += 1
        for ratio in (2, 4, 8):
            k = 160 // ratio
            start = rng.randrange(0, 160 - k)
            rows.append((doc_id, " ".join(host_toks[start : start + k])))
            planted.append((doc_id, host_id, ratio))
            doc_id += 1
    # background noise docs (distinct token sets)
    for _ in range(40):
        rows.append((doc_id, " ".join(rng.sample(vocab, 80))))
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_in, r.doc_host)
        for r in containment_lsh_candidates(docs).collect()
    }
    by_ratio = {}
    for small, host, ratio in planted:
        by_ratio.setdefault(ratio, []).append((small, host) in got)
    # per-ratio recall floors: exact containment slices collide with
    # probability >= 1-(1-J)^32 under the stratum's banding
    assert sum(by_ratio[2]) / len(by_ratio[2]) >= 0.95, by_ratio[2]
    assert sum(by_ratio[4]) / len(by_ratio[4]) >= 0.95, by_ratio[4]
    assert sum(by_ratio[8]) / len(by_ratio[8]) >= 0.85, by_ratio[8]


def test_containment_lsh_agrees_with_lossless_join(spark, sf_dir):
    """On the fixture corpus slice both containment paths share, the
    LSH path must be a (high-recall, zero-false-positive) subset of the
    lossless inverted-index join."""
    from shippinglanes_spark.registry import all_queries

    q = all_queries()
    lsh = {
        (r.doc_in, r.doc_host)
        for r in q["join_containment_lsh"].fn(spark, sf_dir).collect()
    }
    exact = {
        (r.doc_in, r.doc_host)
        for r in q["join_set_containment"].fn(spark, sf_dir).collect()
    }
    assert not (lsh - exact), "verified LSH pairs must all be true pairs"
    assert len(lsh & exact) >= 0.9 * len(exact)
