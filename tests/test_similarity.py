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
