"""External validation: MLlib's MinHashLSH agrees with the hand-rolled
banding on planted near-duplicates (same candidate cluster, similar
Jaccard distances)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shippinglanes_spark.functions.minhash import minhash_candidates
from shippinglanes_spark.functions.text import shingles

mlfeature = pytest.importorskip("pyspark.ml.feature")


def test_mllib_minhash_agrees_on_planted(spark):
    from tests.test_dedup import BASE

    rows = [
        (0, BASE),
        (1, BASE.replace("quick", "swift")),
        (2, "totally different content about columnar execution engines "
            "and shuffle services in distributed query processing"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # hand-rolled banding
    ours = {(r.id_a, r.id_b) for r in minhash_candidates(docs).collect()}
    assert (0, 1) in ours

    # MLlib pipeline: shingles -> HashingTF -> MinHashLSH similarity join
    sh = docs.select("doc_id", shingles(F.col("text")).alias("sh"))
    tf = mlfeature.HashingTF(
        inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True
    ).transform(sh)
    lsh = mlfeature.MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    ).fit(tf)
    joined = lsh.approxSimilarityJoin(tf, tf, threshold=0.6)
    mllib_pairs = {
        (r.datasetA.doc_id, r.datasetB.doc_id)
        for r in joined.collect()
        if r.datasetA.doc_id < r.datasetB.doc_id
    }
    assert (0, 1) in mllib_pairs
    assert not any(2 in p for p in mllib_pairs)
