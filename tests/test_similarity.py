"""IVF ANN quality: recall@1 vs the exact brute-force kNN."""

from __future__ import annotations

from shippinglanes_spark.registry import all_queries


def test_ivf_recall_vs_exact(spark, sf_dir):
    Q = all_queries()
    exact = {r.vec_id: r.nn_id for r in Q["sim_knn"].fn(spark, sf_dir).collect()}
    approx = {r.vec_id: r.nn_id for r in Q["sim_knn_ivf"].fn(spark, sf_dir).collect()}
    assert set(approx) == set(exact)  # every probe answered
    recall = sum(approx[v] == exact[v] for v in exact) / len(exact)
    # 16 lists / probe 4 on 500 random 64-d vectors: recall well above chance;
    # the operator contract is "approximate", the test pins a quality floor
    assert recall >= 0.6, f"recall@1 {recall:.2f}"


def test_pq_recall_vs_exact(spark, sf_dir):
    Q = all_queries()
    exact = {r.vec_id: r.nn_id for r in Q["sim_knn"].fn(spark, sf_dir).collect()}
    approx = {r.vec_id: r.nn_id for r in Q["sim_knn_pq"].fn(spark, sf_dir).collect()}
    assert set(approx) == set(exact)  # every probe answered
    recall = sum(approx[v] == exact[v] for v in exact) / len(exact)
    # random uniform 64-d vectors are PQ's worst case (no subspace
    # structure); the floor pins "far better than chance" (chance ~1/n)
    assert recall >= 0.2, f"recall@1 {recall:.2f}"


def test_pq_reconstruction_beats_centroid_baseline(spark, sf_dir):
    """PQ codes must reconstruct vectors with lower MSE than collapsing
    everything to the global mean (the 0-bit baseline)."""
    import numpy as np

    from shippinglanes_spark.io import table as t

    emb = t(spark, sf_dir, "embeddings").toPandas()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    # refit the same codebooks (deterministic: same seed/sample logic)
    from shippinglanes_spark.functions.similarity import MAX_FIT_ROWS  # noqa: F401

    m, ksub = 8, 256
    dsub = mat.shape[1] // m
    rng = np.random.RandomState(42)
    mse_pq = 0.0
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cb = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)].copy()
        for _ in range(8):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cb)):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        mse_pq += d2.min(axis=1).mean()
    mse_mean = ((mat - mat.mean(axis=0)) ** 2).sum(axis=1).mean()
    assert mse_pq < mse_mean
