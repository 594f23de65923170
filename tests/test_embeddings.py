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


def test_top_pc_planted_anisotropy(spark):
    """On data with a dominant direction, the distributed Gram pass
    recovers it exactly."""
    import numpy as np

    from shippinglanes_spark.functions.embeddings import top_principal_component

    rng = np.random.RandomState(3)
    direction = rng.randn(16)
    direction /= np.linalg.norm(direction)
    coeffs = rng.randn(400, 1) * 10.0          # strong variance along `direction`
    noise = rng.randn(400, 16) * 0.5
    x = coeffs * direction[None, :] + noise
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    v = top_principal_component(spark, df)
    ref = direction if direction[np.argmax(np.abs(direction))] > 0 else -direction
    cos = float(abs(v @ ref))
    assert cos > 0.999, cos


def test_top_pc_fixture_variance_floor(spark, sf_dir):
    """Fixture embeddings are near-isotropic (eigengap ~1.07), so the
    direction choice is delicate — the exact Gram eigensolve must still
    capture optimal variance."""
    import numpy as np

    from shippinglanes_spark.functions.embeddings import (
        emb_top_pc,
        top_principal_component,
    )
    from shippinglanes_spark.io import table

    emb = table(spark, sf_dir, "embeddings")
    v = np.asarray(top_principal_component(spark, emb), dtype=np.float64)
    v /= np.linalg.norm(v)

    local = emb.select("embedding").toPandas()
    x = np.asarray([np.asarray(r, dtype=np.float64) for r in local["embedding"]])
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc
    lam1 = float(np.linalg.eigvalsh(cov)[-1])
    rayleigh = float(v @ cov @ v)
    assert rayleigh >= 0.9 * lam1, (rayleigh, lam1)

    # the declared query's certificate: q_diag matches an independent
    # local quantized recompute, and every invariant flag is true
    got = emb_top_pc(spark, sf_dir).orderBy("dim").toPandas()
    q = np.floor(x * 1e6).astype(np.int64)
    assert (got["q_diag"].to_numpy() == (q * q).sum(axis=0)).all()
    for flag in ("unit_norm_ok", "eigen_ok", "sign_ok"):
        assert (got[flag] == 1).all(), flag


def test_whiten_residuals_orthogonal_and_shorter(spark, sf_dir):
    """Residuals must satisfy the projection identities:
    resid_norm^2 + coef^2 == orig_norm^2 (Pythagoras against a unit PC)
    and resid_norm <= orig_norm; the mean |coef| must be materially
    nonzero (the top PC actually captures variance)."""
    import numpy as np

    from shippinglanes_spark.functions.embeddings import (
        top_principal_component,
    )
    from shippinglanes_spark.io import table
    from shippinglanes_spark.registry import all_queries

    out = (
        all_queries()["emb_whiten"].fn(spark, sf_dir)
        .orderBy("vec_id")
        .toPandas()
    )
    # every per-row projection invariant must hold (a false flag would
    # also hash-mismatch the oracle's constant-true column)
    for flag in ("pyth_ok", "ortho_ok", "shrink_ok"):
        assert (out[flag] == 1).all(), flag

    # independent local recompute of the projection itself: the coef
    # distribution must be materially nonzero (the PC captures real
    # variance) and residuals strictly shorter on average
    emb = table(spark, sf_dir, "embeddings")
    v = np.asarray(top_principal_component(spark, emb), dtype=np.float64)
    local = emb.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    x = np.asarray([np.asarray(r, dtype=np.float64) for r in local["embedding"]])
    coef = x @ v
    resid = x - coef[:, None] * v[None, :]
    assert np.abs(coef).mean() > 1e-3
    assert np.linalg.norm(resid, axis=1).mean() < np.linalg.norm(x, axis=1).mean()
    # and the declared q_norm2 matches the quantized local recompute
    q = np.floor(x * 1e6).astype(np.int64)
    assert (out["q_norm2"].to_numpy() == (q * q).sum(axis=1)).all()
