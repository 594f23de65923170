"""Embedding arithmetic pack: numpy-recompute invariants."""

from __future__ import annotations

import numpy as np

from shippinglanes_spark.functions.embeddings import (
    emb_centroid_label,
    emb_quantize_int8,
)
from shippinglanes_spark.io import table


def test_quantize_error_bound(spark, sf_dir):
    out = emb_quantize_int8(spark, sf_dir).toPandas()
    # int8 symmetric quantization error is bounded by half a step:
    # mse <= (1/(2*scale))^2
    assert (out["mse"] >= 0).all()
    assert (out["mse"] <= (1 / (2 * out["scale"])) ** 2 + 1e-12).all()
    assert (out["scale"] > 0).all()


def test_quantize_matches_numpy(spark, sf_dir):
    out = emb_quantize_int8(spark, sf_dir).toPandas().set_index("vec_id")
    emb = table(spark, sf_dir, "embeddings").toPandas().set_index("vec_id")
    rng = np.random.RandomState(3)
    for vid in rng.choice(emb.index.to_numpy(), size=10, replace=False):
        v = np.asarray(emb.loc[vid, "embedding"], dtype=np.float64)
        scale = 127.0 / np.abs(v).max()
        q = np.clip(np.round(v * scale), -127, 127).astype(np.int64)
        assert out.loc[vid, "q_sum"] == q.sum()
        mse = ((v - q / scale) ** 2).mean()
        assert abs(out.loc[vid, "mse"] - mse) < 1e-9


def test_centroid_matches_numpy(spark, sf_dir):
    out = emb_centroid_label(spark, sf_dir).toPandas()
    emb = table(spark, sf_dir, "embeddings").toPandas()
    dim = len(emb["embedding"].iloc[0])
    assert set(out["pos"]) == set(range(1, dim + 1))
    for label in emb["label"].unique()[:3]:
        mat = np.array(
            [np.asarray(v, dtype=np.float64) for v in emb[emb["label"] == label]["embedding"]]
        )
        # the declared query accumulates on a 1e-6 fixed-point grid, so
        # the distributed mean is within half a grid step of the float mean
        want = mat.mean(axis=0)
        got = (
            out[out["label"] == label].sort_values("pos")["mean"].to_numpy()
        )
        assert np.abs(got - want).max() < 2e-6
        assert (out[out["label"] == label]["n"] == len(mat)).all()
