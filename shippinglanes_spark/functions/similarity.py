"""SURVEY §2.9 — similarity search over `embeddings`.

Two execution strategies, picked by role:

- `sim_cosine_pairs`: exact pairwise threshold join, pure DataFrame
  (self-join + higher-order dot product). Correctness-first; at 100 TB
  the same query runs behind an LSH band-bucket pre-join (minhash.py)
  that prunes the candidate set before this exact re-rank.
- `sim_knn`: brute-force top-1 neighbor as a *broadcast block-matmul*:
  the smaller side (the index) is broadcast as a dense numpy matrix and
  each partition of the probe side computes its rows' top-k locally in
  one vectorized mapInPandas pass — the standard scalable shape for
  brute-force ANN (no O(n²) shuffle, Arrow-batched, NumPy BLAS inner
  loop). Scale path beyond memory: IVF partitioning or LSH bucketing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


def _vectors_double(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(ed, F.lit(0.0), lambda acc, x: acc + x * x))
    return e.select("vec_id", ed.alias("e"), norm.alias("nrm"))


@register(
    "sim_cosine_pairs",
    section="2.9",
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    n AS (SELECT vec_id, e,
                 SQRT(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
          FROM v)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_inner_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE ROUND(list_inner_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.3
    """,
    notes="threshold on the ROUNDed value on both sides so borderline pairs can't flip",
)
def sim_cosine_pairs(spark, sf_dir):
    v = _vectors_double(spark, sf_dir)
    a = v.alias("a")
    b = v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= 0.3)
    )


@register(
    "sim_knn",
    section="2.9",
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    n AS (SELECT vec_id, e,
                 SQRT(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
          FROM v),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_inner_product(a.e, b.e) / (a.nrm * b.nrm) AS cos
          FROM n a JOIN n b ON a.vec_id <> b.vec_id)
    SELECT id_a AS vec_id, id_b AS nn_id, ROUND(cos, 4) AS sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a
                ORDER BY cos DESC, id_b) AS rn FROM p)
    WHERE rn = 1
    """,
    notes="broadcast block-matmul brute force; ties broken by smallest neighbor id",
)
def sim_knn(spark, sf_dir):
    import numpy as np

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Build the broadcast index: (ids sorted asc, row-normalized float64
    # matrix). Sorted ids make numpy argmax's lowest-index tie-break equal
    # to the oracle's ORDER BY cos DESC, id_b ASC.
    local = e.toPandas().sort_values("vec_id")
    ids = np.asarray(local["vec_id"], dtype=np.int64)
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in local["embedding"]]
    )
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = spark.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat_n)

    def top1(batches):
        idx_ids = b_ids.value
        idx = b_mat.value
        for pdf in batches:
            q = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ idx.T  # (batch, n_index) dense similarity block
            qids = np.asarray(pdf["vec_id"], dtype=np.int64)
            self_mask = qids[:, None] == idx_ids[None, :]
            sims[self_mask] = -np.inf
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": qids,
                    "nn_id": idx_ids[best],
                    "sim": np.round(sims[np.arange(len(best)), best], 4),
                }
            )

    return e.mapInPandas(top1, schema="vec_id long, nn_id long, sim double")
