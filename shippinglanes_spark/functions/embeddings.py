"""Embedding-column array analytics (SURVEY §2.9).

The similarity family (similarity.py / minhash.py) covers search over
the vector column; this module covers the ARITHMETIC side a training
pipeline needs: per-class centroids and storage quantization.

Determinism notes (the whole difficulty of distributed float columns):

- `emb_centroid_label` needs cross-row component means, and float
  accumulation order varies with partitioning — so components are
  fixed-pointed to an exact 1e-6 integer grid FIRST and summed as
  BIGINTs (exact, order-free), with floats reappearing only in the
  final one-shot division. Same trick as the cents-integerized money
  sums (tpch_q9 / ts_changepoint), applied per vector component.
- `emb_quantize_int8` is per-row only (no cross-row accumulation); its
  in-vector reduction uses a LEFT FOLD on both engines (F.aggregate /
  list_reduce), which fixes the association order and keeps the
  reconstruction error bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

_FP = 1_000_000  # fixed-point grid for exact distributed accumulation


@register(
    "emb_centroid_label",
    section="2.9",
    oracle=f"""
    WITH ex AS (
      SELECT label,
             UNNEST(list_transform(range(1, len(embedding) + 1),
                    i -> struct_pack(pos := i, x := embedding[i]))) AS u
      FROM embeddings)
    SELECT label, CAST(u.pos AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(CAST(SUM(CAST(ROUND(CAST(u.x AS DOUBLE) * {_FP}) AS BIGINT))
                      AS DOUBLE)
                 / COUNT(*) / {_FP} * 1000000) / 1000000.0 AS mean
    FROM ex GROUP BY label, u.pos
    """,
    notes="per-label centroid components via posexplode -> (label, pos) "
    "groupBy. Components fixed-pointed to a 1e-6 integer grid before the "
    "sum so distributed accumulation order cannot change the result "
    "(float sums are association-sensitive); floor-disciplined final "
    "division. Shuffle is keyed by (label, pos) = 10 x 64 groups",
)
def emb_centroid_label(spark, sf_dir):
    """Class centroids — the build step of nearest-centroid classifiers
    and IVF coarse quantizers. posexplode turns the vector column into
    (label, pos, x) rows; one map-side-combinable keyed sum produces
    all centroid components in a single shuffle whose key space is
    labels x dims, independent of row count."""
    e = table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round(F.col("x").cast("double") * _FP).cast("long").alias("xfp"),
    )
    return ex.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.floor(
                F.sum("xfp").cast("double")
                / F.count(F.lit(1))
                / _FP
                * 1000000
            )
            / 1000000.0
        ).alias("mean"),
    )


@register(
    "emb_quantize_int8",
    section="2.9",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             127.0 / list_reduce(list_transform(embedding,
                                 x -> ABS(CAST(x AS DOUBLE))),
                                 (a, b) -> GREATEST(a, b)) AS scale,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    q AS (
      SELECT vec_id, scale,
             list_transform(v, x -> GREATEST(-127, LEAST(127,
                            CAST(ROUND(x * scale) AS BIGINT)))) AS qv,
             v
      FROM scaled)
    SELECT vec_id,
           FLOOR(scale * 10000) / 10000.0 AS scale,
           CAST(list_reduce(qv, (a, b) -> a + b) AS BIGINT) AS q_sum,
           FLOOR(list_reduce(
                   list_transform(range(1, len(v) + 1),
                                  i -> (v[i] - qv[i] / scale)
                                       * (v[i] - qv[i] / scale)),
                   (a, b) -> a + b)
                 / len(v) * 100000000000) / 100000000000.0 AS mse
    FROM q
    """,
    notes="symmetric int8 scalar quantization per vector: scale = "
    "127/max|x|, clamp(round(x*scale)), plus the reconstruction MSE. "
    "Entirely row-local (no shuffle at all — a pure map over the "
    "vector column); in-vector reductions are left folds on both "
    "engines so the float association is pinned; floor-disciplined "
    "outputs",
)
def emb_quantize_int8(spark, sf_dir):
    """Vector compression for serving/storage: 4x smaller than float32
    with an error bound the MSE column quantifies. The plan is a pure
    projection — the ideal 100 TB shape (no exchange, columnar in,
    columnar out); every reduction happens inside one row's array."""
    e = table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    absmax = F.aggregate(
        F.transform(v, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda a, b: F.greatest(a, b),
    )
    # the raw scale is deliberately NOT named "scale": the output column
    # of that name is the floored display value, and a lateral column
    # alias in the final select would silently shadow the raw input for
    # every expression after it (bit-level mse bug, caught by the oracle)
    d = e.select("vec_id", (F.lit(127.0) / absmax).alias("scale_raw"), v.alias("v"))
    qv = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.round(x * F.col("scale_raw")).cast("long"),
            ),
        ),
    )
    d = d.select("vec_id", "scale_raw", qv.alias("qv"), "v")
    sq_err = F.zip_with(
        F.col("v"),
        F.col("qv"),
        # explicit multiply, not pow(x, 2): pow is libm, x*x is IEEE-exact
        lambda x, q: (x - q / F.col("scale_raw")) * (x - q / F.col("scale_raw")),
    )
    return d.select(
        "vec_id",
        (F.floor(F.col("scale_raw") * 10000) / 10000.0).alias("scale"),
        F.aggregate(F.col("qv"), F.lit(0).cast("long"), lambda a, b: a + b)
        .cast("long")
        .alias("q_sum"),
        (
            F.floor(
                F.aggregate(sq_err, F.lit(0.0), lambda a, b: a + b)
                / F.size("v")
                * 100000000000
            )
            / 100000000000.0
        ).alias("mse"),
    )


@register(
    "emb_outliers",
    section="2.9",
    oracle=f"""
    WITH ex AS (
      SELECT label,
             UNNEST(list_transform(range(1, len(embedding) + 1),
                    i -> struct_pack(pos := i, x := embedding[i]))) AS u
      FROM embeddings),
    cent AS (
      SELECT label, u.pos AS pos,
             FLOOR(CAST(SUM(CAST(ROUND(CAST(u.x AS DOUBLE) * {_FP}) AS BIGINT))
                        AS DOUBLE)
                   / COUNT(*) / {_FP} * 1000000) / 1000000.0 AS mean
      FROM ex GROUP BY label, u.pos),
    carr AS (
      SELECT label, list(mean ORDER BY pos) AS c FROM cent GROUP BY label),
    dist AS (
      SELECT e.vec_id, e.label,
             FLOOR(list_reduce(
                     list_transform(range(1, len(e.embedding) + 1),
                       i -> (CAST(e.embedding[i] AS DOUBLE) - ca.c[i])
                            * (CAST(e.embedding[i] AS DOUBLE) - ca.c[i])),
                     (a, b) -> a + b) * 1000000000) / 1000000000.0 AS d2
      FROM embeddings e JOIN carr ca USING (label)),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                   ORDER BY d2 DESC, vec_id) AS rk
      FROM dist)
    SELECT label, vec_id, d2, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
    notes="per-class embedding outliers: squared distance to the class "
    "centroid (the fixed-point-deterministic centroid of "
    "emb_centroid_label, reassembled into an ordered array), top-5 per "
    "label by (floored distance desc, vec_id). In-vector distance is a "
    "pinned left fold; the centroid table broadcasts (labels x dims)",
)
def emb_outliers(spark, sf_dir):
    """Label-noise mining: the vectors farthest from their own class
    centroid are the mislabeled/low-quality candidates a curation
    pipeline reviews first. Composes the deterministic centroid build
    with a broadcast join back onto the vectors — per-row distance
    arithmetic, one keyed top-k window per label."""
    from pyspark.sql import Window

    cent = emb_centroid_label(spark, sf_dir)
    carr = cent.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "mean"))),
            lambda s: s["mean"],
        ).alias("c")
    )
    e = table(spark, sf_dir, "embeddings")
    diff2 = F.zip_with(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.col("c"),
        lambda x, m: (x - m) * (x - m),
    )
    dist = e.join(F.broadcast(carr), "label").select(
        "vec_id",
        "label",
        (
            F.floor(
                F.aggregate(diff2, F.lit(0.0), lambda a, b: a + b) * 1000000000
            )
            / 1000000000.0
        ).alias("d2"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("d2"), "vec_id")
    return (
        dist.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .select("label", "vec_id", "d2", "rk")
    )


def top_principal_component(spark, emb, full=False):
    """Top principal component of the `embedding` column — exact, in ONE
    distributed pass.

    Each partition emits (sum_x, X'X, n): d + d² + 1 numbers, tiny for
    d=64. The driver folds the partials, centers the Gram matrix
    algebraically (sum (x-mu)'(x-mu) = X'X - n mu mu'), and eigensolves
    the d x d matrix locally. Exact (no iteration error), deterministic,
    one scan. This is the right strategy while d² partials stay small
    (d up to a few thousand); past that, switch to the allreduce
    power-iteration shape (k passes shipping only d-dim vectors) — the
    tradeoff is documented in SCALING.md. Sign fixed by the largest-
    |loading| component."""
    import numpy as np
    import pandas as pd

    e = emb.select("embedding")

    def partials(batches):
        for pdf in batches:
            x = np.asarray(
                [np.asarray(r, dtype=np.float64) for r in pdf["embedding"]]
            )
            # qd: per-dim sum of FLOOR(x*1e6)^2 as exact int64 — the
            # order-insensitive data-integrity column the derived-
            # property oracle hash-checks against DuckDB (FLOOR, not
            # round: numpy round is half-even, SQL ROUND half-up)
            q = np.floor(x * 1e6).astype(np.int64)
            yield pd.DataFrame(
                {
                    "sx": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                    "qd": [(q * q).sum(axis=0).tolist()],
                    "n": [len(x)],
                }
            )

    parts = e.mapInPandas(
        partials,
        schema="sx array<double>, g array<double>, qd array<long>, n long",
    ).collect()
    n = sum(r["n"] for r in parts)
    sx = np.sum([np.asarray(r["sx"]) for r in parts], axis=0)
    d = len(sx)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    qd = np.sum([np.asarray(r["qd"], dtype=np.int64) for r in parts], axis=0)
    mu = sx / n
    g_centered = g - n * np.outer(mu, mu)
    _, vecs = np.linalg.eigh(g_centered)
    v = vecs[:, -1]
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    if full:
        return v, g_centered, qd, n
    return v


@register(
    "emb_top_pc",
    section="2.9",
    oracle="""
    WITH ex AS (
      SELECT UNNEST(list_transform(range(1, len(embedding) + 1),
             i -> struct_pack(pos := i, x := embedding[i]))) AS u
      FROM embeddings)
    SELECT CAST(u.pos - 1 AS INT) AS dim,
           CAST(SUM(CAST(FLOOR(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(FLOOR(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS q_diag,
           CAST(1 AS BIGINT) AS unit_norm_ok,
           CAST(1 AS BIGINT) AS eigen_ok,
           CAST(1 AS BIGINT) AS sign_ok
    FROM ex GROUP BY u.pos ORDER BY dim
    """,
    notes="exact top principal component via single-pass distributed Gram "
    "accumulation (d+d²-sized partials, driver eigensolve of the 64x64 "
    "matrix), certified by DERIVED-PROPERTY oracle (the "
    "agg_approx_distinct pattern): the eigenvector itself is "
    "iteration-free but not SQL-expressible, so the declared output "
    "carries (a) the per-dim raw second moment on a 1e-6 integer grid "
    "(FLOOR quantized BEFORE summing so accumulation order is moot; "
    "exact while n < ~9e6 rows at this grid — shrink the grid past "
    "that) — hash-checked against DuckDB, proving the engine read "
    "exactly the data the oracle read — and (b) three eigensolve "
    "invariants asserted as constant-true flags: unit norm, "
    "eigen-residual ||Gv - (v'Gv)v|| <= 1e-6·lambda, and the "
    "largest-|loading| sign fix. The loadings themselves come from "
    "top_principal_component(); planted-anisotropy exactness + "
    "fixture captured-variance tests in tests/test_embeddings.py",
)
def emb_top_pc(spark, sf_dir):
    """Top-PC of the embedding table — the embeddings-preprocessing
    primitive (whitening / dominant-direction removal). Declared
    output = per-dim quantized second moment + eigensolve-invariant
    certificate flags (see notes); loadings via
    top_principal_component()."""
    import numpy as np

    v, g_c, qd, _n = top_principal_component(
        spark, table(spark, sf_dir, "embeddings"), full=True
    )
    lam = float(v @ g_c @ v)
    unit_ok = int(abs(float(v @ v) - 1.0) < 1e-9)
    eigen_ok = int(
        float(np.linalg.norm(g_c @ v - lam * v)) <= 1e-6 * abs(lam)
    )
    sign_ok = int(v[int(np.argmax(np.abs(v)))] > 0)
    rows = [
        (int(i), int(qd[i]), unit_ok, eigen_ok, sign_ok)
        for i in range(len(v))
    ]
    return spark.createDataFrame(
        rows,
        "dim int, q_diag long, unit_norm_ok long, eigen_ok long, sign_ok long",
    )


@register(
    "emb_whiten",
    section="2.9",
    oracle="""
    WITH ex AS (
      SELECT vec_id, UNNEST(embedding) AS x FROM embeddings)
    SELECT vec_id,
           CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS q_norm2,
           CAST(1 AS BIGINT) AS pyth_ok,
           CAST(1 AS BIGINT) AS ortho_ok,
           CAST(1 AS BIGINT) AS shrink_ok
    FROM ex GROUP BY vec_id
    """,
    notes="dominant-direction removal (ABTT/'all-but-the-top' style "
    "whitening): project every embedding onto the corpus top principal "
    "component and subtract — the standard preprocessing that improves "
    "cosine-similarity quality on anisotropic embedding spaces. The PC "
    "comes from emb_top_pc's single-pass distributed Gram + driver "
    "eigensolve; the projection is a broadcast dot product per row "
    "(zero shuffles). Certified by DERIVED-PROPERTY oracle: the "
    "projection itself is not SQL-expressible, so each row carries the "
    "vector's raw squared norm on a 1e-6 integer grid (hash-exact vs "
    "DuckDB — the data-path check) plus three per-row projection "
    "invariants asserted as constant-true flags: Pythagoras "
    "resid² + coef² = orig² against the unit PC (rel 1e-9), residual "
    "orthogonal to the PC, and resid_norm <= orig_norm. "
    "Coef/residual values via the same math in "
    "tests/test_embeddings.py against an independent local recompute",
)
def emb_whiten(spark, sf_dir):
    """residual = x - (x . v) v against the broadcast top PC; declared
    output = per-vector quantized norm + projection-invariant
    certificate flags (a false flag hash-mismatches the oracle's
    constant-true column)."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    v = np.asarray(top_principal_component(spark, emb), dtype=np.float64)
    b_v = spark.sparkContext.broadcast(v)

    def project(batches):
        import pandas as pd

        vv = b_v.value
        for pdf in batches:
            x = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            q = np.floor(x * 1e6).astype(np.int64)
            coef = x @ vv
            resid = x - coef[:, None] * vv[None, :]
            r2 = (resid * resid).sum(axis=1)
            o2 = (x * x).sum(axis=1)
            pyth = np.abs(r2 + coef * coef - o2) <= 1e-9 * (o2 + 1.0)
            ortho = np.abs(resid @ vv) <= 1e-9 * (np.sqrt(o2) + 1.0)
            shrink = r2 <= o2 + 1e-12
            yield pd.DataFrame(
                {
                    "vec_id": np.asarray(pdf["vec_id"], dtype=np.int64),
                    "q_norm2": (q * q).sum(axis=1),
                    "pyth_ok": pyth.astype(np.int64),
                    "ortho_ok": ortho.astype(np.int64),
                    "shrink_ok": shrink.astype(np.int64),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        project,
        schema="vec_id long, q_norm2 long, pyth_ok long, "
        "ortho_ok long, shrink_ok long",
    )


@register(
    "emb_dim_stats",
    section="2.9",
    oracle=f"""
    WITH ex AS (
      SELECT i - 1 AS dim,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_FP}) AS BIGINT) AS v
      FROM embeddings, range(1, 65) r(i)),
    s AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(SUM(v * v) AS BIGINT) AS ss
          FROM ex GROUP BY dim)
    SELECT CAST(dim AS BIGINT) AS dim, n,
           FLOOR((sv / n) / {_FP} * 1000000.0) / 1000000.0 AS mean,
           FLOOR(sqrt(ss / n - (sv / n) * (sv / n)) / {_FP} * 1000000.0)
             / 1000000.0 AS std
    FROM s
    """,
    notes="per-dimension mean/std of the embedding column — the "
    "feature-health profile (dead dims, scale drift) run before any "
    "ANN index build or whitening. Components fixed-point to the exact "
    "1e-6 integer grid first, so the distributed sums are BIGINT-exact "
    "and order-free (the emb_centroid_label discipline); floats appear "
    "only in the final one-shot mean/variance formula, identically "
    "structured on both engines. One posexplode + one map-side-combined "
    "aggregate: shuffle width is 64 dims x 3 numbers, independent of "
    "corpus size",
)
def emb_dim_stats(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(
        "dim",
        F.round(F.col("x").cast("double") * _FP).cast("long").alias("v"),
    )
    s = ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    nd = F.col("n").cast("double")
    sv = F.col("sv").cast("double")
    ss = F.col("ss").cast("double")
    mean = F.floor((sv / nd) / _FP * 1000000.0) / 1000000.0
    std = (
        F.floor(F.sqrt(ss / nd - (sv / nd) * (sv / nd)) / _FP * 1000000.0)
        / 1000000.0
    )
    return s.select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        mean.alias("mean"),
        std.alias("std"),
    )


@register(
    "emb_matryoshka_recall",
    section="2.9",
    oracle="""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    n AS (SELECT vec_id, e,
                 SQRT(list_aggregate(list_transform(e, x -> x * x), 'sum'))
                   AS nrm,
                 e[1:16] AS t,
                 SQRT(list_aggregate(list_transform(e[1:16], x -> x * x),
                                     'sum')) AS tnrm
          FROM v
          WHERE SQRT(list_aggregate(list_transform(e, x -> x * x), 'sum')) > 0
            AND SQRT(list_aggregate(list_transform(e[1:16], x -> x * x),
                                    'sum')) > 0),
    q AS (SELECT * FROM n WHERE vec_id % 101 = 0),
    pf AS (SELECT q.vec_id AS qid, b.vec_id AS nid,
                  ROUND(list_inner_product(q.e, b.e) / (q.nrm * b.nrm), 4)
                    AS s
           FROM q JOIN n b ON b.vec_id <> q.vec_id),
    rf AS (SELECT qid, nid FROM (
             SELECT qid, nid, ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY s DESC, nid) AS rn FROM pf)
           WHERE rn <= 10),
    pt AS (SELECT q.vec_id AS qid, b.vec_id AS nid,
                  ROUND(list_inner_product(q.t, b.t) / (q.tnrm * b.tnrm), 4)
                    AS s
           FROM q JOIN n b ON b.vec_id <> q.vec_id),
    rt AS (SELECT qid, nid FROM (
             SELECT qid, nid, ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY s DESC, nid) AS rn FROM pt)
           WHERE rn <= 10)
    SELECT rf.qid AS vec_id,
           CAST(COUNT(rt.nid) AS BIGINT) AS n_overlap,
           CAST(COUNT(rt.nid) * 10 AS BIGINT) AS recall_pct
    FROM rf LEFT JOIN rt ON rt.qid = rf.qid AND rt.nid = rf.nid
    GROUP BY rf.qid
    """,
    notes="Matryoshka truncation eval: for a deterministic probe sample "
    "(vec_id % 101), the top-10 neighbor overlap between full 64-d "
    "cosine and the FIRST-16-dims truncation (renormalized) — the "
    "measurement that decides whether cheap low-dim prefilters are "
    "safe. Both rankings run as ONE broadcast block-matmul pass "
    "(probes x index, two GEMMs per batch); ranks use ROUND(cos, 4) "
    "with id tie-break on both engines (the sim_knn discipline). "
    "recall_pct is exact integer tens",
)
def emb_matryoshka_recall(spark, sf_dir):
    import numpy as np

    from .similarity import _broadcast_index

    K, TRUNC = 10, 16
    e, b_ids, b_mat = _broadcast_index(spark, sf_dir)
    probes = e.where(F.col("vec_id") % 101 == 0)

    def overlaps(batches):
        # imports INSIDE the closure: workers lack this repo on sys.path,
        # so module-level names must not be captured by reference
        import numpy as np
        import pandas as pd

        ids = b_ids.value
        full = b_mat.value  # row-normalized 64-d
        tr = full[:, :TRUNC]
        tnrm = np.linalg.norm(tr, axis=1, keepdims=True)
        trn = tr / tnrm
        for pdf in batches:
            q = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            qt = q[:, :TRUNC]
            qtn = qt / np.linalg.norm(qt, axis=1, keepdims=True)
            sf = np.round(qn @ full.T, 4)
            st = np.round(qtn @ trn.T, 4)
            qids = np.asarray(pdf["vec_id"], dtype=np.int64)
            out = []
            for i, qid in enumerate(qids):
                mask = ids != qid
                cand_ids = ids[mask]

                def topk(s):
                    order = np.lexsort((cand_ids, -s[mask]))[:K]
                    return set(cand_ids[order])

                n = len(topk(sf[i]) & topk(st[i]))
                out.append((qid, n, n * K))
            yield pd.DataFrame(
                out, columns=["vec_id", "n_overlap", "recall_pct"]
            )

    return probes.select("vec_id", "embedding").mapInPandas(
        overlaps, schema="vec_id long, n_overlap long, recall_pct long"
    )


_HAM_BITS = 62  # sign bits packed into one BIGINT (63 would hit the sign bit)
_HAM_QUERIES = 8
_HAM_K = 5

_SIG_SPARK = (
    "aggregate(sequence(0, {b}), CAST(0 AS BIGINT), (acc, i) -> acc + "
    "IF(element_at(embedding, i + 1) >= 0, "
    "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
).format(b=_HAM_BITS - 1)


@register(
    "emb_hamming_topk",
    section="2.9",
    oracle=f"""
    WITH s AS (
      SELECT vec_id,
             CAST(list_sum([CASE WHEN embedding[i + 1] >= 0
                                 THEN CAST(1 AS BIGINT) << i
                                 ELSE CAST(0 AS BIGINT) END
                            for i in range({_HAM_BITS})]) AS BIGINT) AS sig
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, sig AS qsig
          FROM s WHERE vec_id < {_HAM_QUERIES}),
    d AS (SELECT q.query_id, s.vec_id,
                 CAST(bit_count(xor(s.sig, q.qsig)) AS BIGINT) AS hamming
          FROM s JOIN q ON s.vec_id <> q.query_id),
    r AS (SELECT query_id, vec_id, hamming,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY hamming, vec_id) AS BIGINT) AS rnk
          FROM d)
    SELECT query_id, rnk, vec_id, hamming FROM r WHERE rnk <= {_HAM_K}
    """,
    notes=f"binary-embedding retrieval: each vector compresses to a "
    f"{_HAM_BITS}-bit SIGN SIGNATURE packed into one BIGINT (the "
    "64x-compression trick production vector stores use for the "
    "first-stage filter), then the top-5 neighbors per query are "
    "ranked by Hamming distance = bit_count(xor) — pure integer ops, "
    "engine-exact, no float tolerance. Ties break on vec_id. The "
    "sign-of-float comparison is exact on both engines, so the "
    "signatures (and therefore every distance) hash-match bit for bit",
)
def emb_hamming_topk(spark, sf_dir):
    """Hamming-space top-k over packed sign bits. The signature scan is
    one in-codegen fold per row (no shuffle, 8 bytes out per vector);
    the 8 query signatures broadcast, so distance evaluation is a
    single map-side pass over the corpus. Top-k is the two-phase
    scale shape: a salted per-(query, shard) row_number keeps <= k
    rows per shard, then the global rank runs over <= k * shards
    survivors — never a single-partition sort of the whole corpus.
    At 100 TB this is the standard first-stage ANN filter; the exact
    float re-rank (sim_knn) runs only on these survivors."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    s = e.select("vec_id", F.expr(_SIG_SPARK).alias("sig"))
    q = s.where(F.col("vec_id") < _HAM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("qsig")
    )
    d = s.join(F.broadcast(q), s.vec_id != q.query_id).select(
        "query_id",
        "vec_id",
        F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig")))
        .cast("long")
        .alias("hamming"),
    )
    shard = F.pmod(F.col("vec_id"), F.lit(32)).alias("shard")
    w1 = Window.partitionBy("query_id", "shard").orderBy("hamming", "vec_id")
    local = (
        d.select("query_id", "vec_id", "hamming", shard)
        .withColumn("lr", F.row_number().over(w1))
        .where(F.col("lr") <= _HAM_K)
    )
    w2 = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        local.select(
            "query_id",
            F.row_number().over(w2).cast("long").alias("rnk"),
            "vec_id",
            "hamming",
        )
        .where(F.col("rnk") <= _HAM_K)
    )


_KM_K = 4
_KM_ITERS = 3
_KM_DIMS = 64


def _kmeans_oracle() -> str:
    """Unroll Lloyd's iterations into chained CTEs (the pagerank /
    kcore pattern): distance -> argmin assign -> centroid update,
    three times, all in exact integer arithmetic."""
    ctes = [
        f"""q AS MATERIALIZED (
      SELECT e.vec_id, t.i - 1 AS dim,
             CAST(FLOOR(e.embedding[CAST(t.i AS INT)] * 1e6) AS BIGINT) AS x
      FROM embeddings e CROSS JOIN range(1, {_KM_DIMS + 1}) t(i))""",
        f"c0 AS MATERIALIZED (SELECT vec_id AS cid, dim, x AS c FROM q "
        f"WHERE vec_id < {_KM_K})",
    ]
    for i in range(1, _KM_ITERS + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT q.vec_id, c.cid,
             CAST(SUM((q.x - c.c) * (q.x - c.c)) AS BIGINT) AS dist
      FROM q JOIN c{i - 1} c USING (dim) GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rk
        FROM d{i}) WHERE rk = 1)"""
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (
      SELECT a.cid, q.dim,
             CAST(FLOOR(CAST(SUM(q.x) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS c
      FROM a{i} a JOIN q ON q.vec_id = a.vec_id GROUP BY 1, 2)"""
        )
    last = _KM_ITERS
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT s.cid AS cluster_id, s.n_members, l.centroid_l1, s.inertia
    FROM (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
                 CAST(SUM(dist) AS BIGINT) AS inertia
          FROM a{last} GROUP BY cid) s
    JOIN (SELECT cid, CAST(SUM(ABS(c)) AS BIGINT) AS centroid_l1
          FROM c{last} GROUP BY cid) l ON l.cid = s.cid"""
    )


@register(
    "emb_kmeans_iters",
    section="2.9",
    oracle=_kmeans_oracle(),
    notes=f"{_KM_ITERS} Lloyd iterations of k-means (k={_KM_K}, init = "
    "the first k vectors by id) over embeddings QUANTIZED to exact "
    "1e-6 integers, reporting per-cluster size, centroid L1 mass, and "
    "inertia. Quantization makes the whole iteration float-free: "
    "distances are exact BIGINT sums of squared integer gaps (max "
    "64 * (2e6)^2 ~ 2.6e14, well inside BIGINT), argmin tiebreaks by "
    "centroid id, and the centroid update FLOOR(sum/count) divides "
    "exact < 2^53 integers identically on both engines — so an "
    "ITERATIVE ML algorithm is value-checked exactly, with the "
    "recurrence unrolled into chained CTEs on the oracle side",
)
def emb_kmeans_iters(spark, sf_dir):
    """Lloyd's algorithm as iterated relational algebra: the exploded
    (vec, dim, x) relation is the only data-sized table; centroids are
    k x d = 256 rows, broadcast into the distance join each round, and
    localCheckpoint keeps the looped plan flat. The per-round shuffle
    is the (vec_id, cid) distance aggregation — k x corpus partial
    rows with map-side combine. At real scale you'd fuse the distance
    argmin into a mapInPandas GEMM like sim_knn_ivf's assign step;
    this relational form is the exact-arithmetic reference of the
    same plan shape (sample-fit -> broadcast -> assign -> re-fit)."""
    emb = table(spark, sf_dir, "embeddings")
    q = (
        emb.select("vec_id", F.posexplode("embedding").alias("dim", "xf"))
        .select(
            "vec_id",
            "dim",
            F.floor(F.col("xf") * 1e6).cast("long").alias("x"),
        )
        .localCheckpoint()
    )
    cent = q.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), "dim", F.col("x").alias("c")
    )

    def _assign(cent):
        # centroids pivoted to one row per dim (k = 4 columns): the
        # k distance sums and the argmin then fuse into ONE keyed
        # aggregation — the agg+window form paid a second exchange and
        # a per-partition sort every round for the same exact integers
        cent_w = cent.groupBy("dim").agg(
            *[
                F.sum(F.when(F.col("cid") == i, F.col("c"))).alias(f"c{i}")
                for i in range(_KM_K)
            ]
        )
        dsums = (
            q.join(F.broadcast(cent_w), "dim")
            .groupBy("vec_id")
            .agg(
                *[
                    F.sum(
                        (F.col("x") - F.col(f"c{i}"))
                        * (F.col("x") - F.col(f"c{i}"))
                    )
                    .cast("long")
                    .alias(f"d{i}")
                    for i in range(_KM_K)
                ]
            )
        )
        # min struct = (smallest dist, smallest cid on ties) — the
        # row_number(orderBy dist, cid) tiebreak; a centroid with no
        # members vanishes (all-null sums), matching the join form
        best = F.array_min(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.col(f"d{i}").alias("dist"),
                            F.lit(i).cast("long").alias("cid"),
                        )
                        for i in range(_KM_K)
                    ]
                ),
                lambda s: s["dist"].isNotNull(),
            )
        )
        return dsums.select(
            "vec_id",
            best["cid"].alias("cid"),
            best["dist"].alias("dist"),
        )

    def _update(assign_df):
        return (
            q.join(
                F.broadcast(assign_df.select("vec_id", "cid")), "vec_id"
            )
            .groupBy("cid", "dim")
            .agg(
                F.floor(F.sum("x").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("c")
            )
        )

    # Intermediate rounds run assign + update as ONE job (the
    # assignment is only consumed by the update, so materializing it
    # bought nothing but a scheduling round-trip); only the final
    # assignment is checkpointed — it feeds both the stats aggregate
    # and the last centroid update.
    assign = None
    for it in range(_KM_ITERS):
        if it < _KM_ITERS - 1:
            cent = _update(_assign(cent)).localCheckpoint()
        else:
            assign = _assign(cent).localCheckpoint()
            cent = _update(assign)
    stats = assign.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("dist").cast("long").alias("inertia"),
    )
    l1 = cent.groupBy("cid").agg(
        F.sum(F.abs(F.col("c"))).cast("long").alias("centroid_l1")
    )
    return stats.join(l1, "cid").select(
        F.col("cid").alias("cluster_id"),
        "n_members",
        "centroid_l1",
        "inertia",
    )


@register(
    "emb_isotropy",
    section="2.9",
    oracle="""
    WITH n AS (
      SELECT vec_id,
             sqrt(list_reduce(
               list_prepend(0.0,
                 list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a, b) -> a + b)) AS nrm,
             embedding AS e
      FROM embeddings),
    u AS (SELECT vec_id, t.i - 1 AS dim,
                 CAST(FLOOR(CAST(e[CAST(t.i AS INT)] AS DOUBLE) / nrm
                            * 1e6) AS BIGINT) AS uq
          FROM n CROSS JOIN range(1, 65) t(i)),
    rn AS (SELECT vec_id, CAST(SUM(uq * uq) AS BIGINT) AS sq
           FROM u GROUP BY vec_id),
    sums AS (SELECT dim, CAST(SUM(uq) AS BIGINT) AS s FROM u GROUP BY dim),
    t AS (SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM rn) AS n_vecs,
            (SELECT list_reduce(
                      list_prepend(0.0,
                        list(CAST(s AS DOUBLE) * s ORDER BY dim)),
                      (a, b) -> a + b) FROM sums) AS snorm2,
            (SELECT CAST(SUM(sq) AS BIGINT) FROM rn) AS selfsq)
    SELECT n_vecs,
           FLOOR((snorm2 - selfsq) / (CAST(n_vecs AS DOUBLE)
                  * (n_vecs - 1)) / 1e12 * 1e6) / 1e6 AS mean_cosine
    FROM t
    """,
    notes="embedding-space isotropy: the MEAN PAIRWISE COSINE of the "
    "whole corpus in ONE pass, via the identity sum_{i != j} <u_i, u_j> "
    "= ||sum u||^2 - sum ||u||^2 — no pair join exists at any scale. "
    "Unit vectors are quantized to exact 1e-6 integers AFTER the "
    "per-row normalize (norm from an ordered left-fold of squares, so "
    "both engines produce the identical double), making the per-dim "
    "corpus sums exact BIGINTs (order-free); the squares of those "
    "sums go through DOUBLE (they overflow BIGINT by ~1M rows) folded "
    "in dim order. High mean cosine = anisotropic cone collapse (the "
    "common pathology whitening fixes — emb_whiten is the remedy "
    "registered next door). One corpus scan, one 64-row shuffle",
)
def emb_isotropy(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: x.cast("double") * x.cast("double"),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    u = (
        emb.select(
            "vec_id",
            nrm.alias("nrm"),
            F.posexplode("embedding").alias("dim", "xf"),
        )
        .select(
            "vec_id",
            "dim",
            F.floor(F.col("xf").cast("double") / F.col("nrm") * 1e6)
            .cast("long")
            .alias("uq"),
        )
        .localCheckpoint()
    )
    rn = u.groupBy("vec_id").agg(
        F.sum(F.col("uq") * F.col("uq")).cast("long").alias("sq")
    )
    sums = u.groupBy("dim").agg(F.sum("uq").cast("long").alias("s"))
    t = rn.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("sq").cast("long").alias("selfsq"),
    ).crossJoin(
        F.broadcast(
            sums.agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "dim",
                                (F.col("s").cast("double") * F.col("s")).alias(
                                    "t"
                                ),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, r: acc + r["t"],
                ).alias("snorm2")
            )
        )
    )
    mean_cos = (
        (F.col("snorm2") - F.col("selfsq"))
        / (F.col("n_vecs").cast("double") * (F.col("n_vecs") - 1))
        / 1e12
    )
    return t.select(
        "n_vecs", (F.floor(mean_cos * 1e6) / 1e6).alias("mean_cosine")
    )


@register(
    "emb_cka",
    section="2.9",
    oracle="""
    WITH ex AS (SELECT vec_id, t.i - 1 AS dim,
                       CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS x
                FROM embeddings CROSS JOIN range(1, 65) t(i)),
    am AS (SELECT dim, MAX(ABS(x)) AS mx FROM ex GROUP BY dim),
    q AS (SELECT e.vec_id, e.dim,
                 CAST(FLOOR(e.x * 1e6) AS BIGINT) AS xq,
                 CAST(FLOOR((ROUND(e.x / a.mx * 127) * a.mx / 127) * 1e6)
                      AS BIGINT) AS yq
          FROM ex e JOIN am a USING (dim) WHERE a.mx > 0),
    s1 AS (SELECT dim, CAST(SUM(xq) AS BIGINT) AS sx,
                  CAST(SUM(yq) AS BIGINT) AS sy
           FROM q GROUP BY dim),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS nv FROM q),
    p AS (SELECT a.dim AS i, b.dim AS j,
                 CAST(SUM(CAST(a.xq AS HUGEINT) * b.xq) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(a.yq AS HUGEINT) * b.yq) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(a.xq AS HUGEINT) * b.yq) AS DOUBLE) AS sxy
          FROM q a JOIN q b ON a.vec_id = b.vec_id
          GROUP BY 1, 2),
    c AS (SELECT p.i, p.j,
                 p.sxx - CAST(sa.sx AS DOUBLE) * sb.sx / nn.nv AS cxx,
                 p.syy - CAST(sa.sy AS DOUBLE) * sb.sy / nn.nv AS cyy,
                 p.sxy - CAST(sa.sx AS DOUBLE) * sb.sy / nn.nv AS cxy
          FROM p JOIN s1 sa ON sa.dim = p.i JOIN s1 sb ON sb.dim = p.j
          CROSS JOIN nn),
    f AS (SELECT
            list_reduce(list_prepend(0.0,
              list(cxy * cxy ORDER BY i, j)), (a, b) -> a + b) AS fxy,
            list_reduce(list_prepend(0.0,
              list(cxx * cxx ORDER BY i, j)), (a, b) -> a + b) AS fxx,
            list_reduce(list_prepend(0.0,
              list(cyy * cyy ORDER BY i, j)), (a, b) -> a + b) AS fyy
          FROM c)
    SELECT nn.nv AS n_vecs,
           FLOOR(fxy / (SQRT(fxx) * SQRT(fyy)) * 1e6) / 1e6 AS cka
    FROM f CROSS JOIN nn
    """,
    notes="linear CKA (centered kernel alignment, Kornblith et al.) "
    "between the raw embedding space and its int8 symmetric-absmax "
    "quantized reconstruction — the representation-similarity score "
    "answering 'how much geometry did quantization destroy?' (1.0 = "
    "identical up to rotation/scale). CKA = ||Yc'Xc||_F^2 / "
    "(||Xc'Xc||_F ||Yc'Yc||_F) from three 64x64 cross-moment tables; "
    "values are 1e-6-quantized ints so every moment is an exact "
    "128-bit integer sum (order-free), centering/Frobenius run on "
    "identical doubles with dim-ordered folds (emb_isotropy "
    "discipline). The dim-pair relation is rows x 64^2 here for "
    "oracle parity; at corpus scale the same three Grams come from "
    "emb_top_pc's mapInPandas d+d^2 partials — documented swap, "
    "identical math. Output is one row at any scale",
)
def emb_cka(spark, sf_dir):
    """The 64x64 dim-pair relation in the oracle is rows x 64^2; the
    Spark side computes the SAME exact-integer cross moments as
    mapInPandas int64 matmul partials (one 4096-row partial per Arrow
    batch — exact below ~25M rows/batch at the observed value range,
    far above the 10k-row Arrow default), then sums partials in
    DECIMAL(38,0). Quantization (FLOOR/ROUND) stays in SQL expressions
    shared verbatim with the oracle — numpy's banker's rounding never
    touches a value."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    am = ex.groupBy("dim").agg(F.max(F.abs(F.col("x"))).alias("mx"))
    # per-dim absmax as an ordered array (64 doubles) for the array form
    ama = am.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mx"))),
            lambda r: r["mx"],
        ).alias("mxa")
    )
    qa = (
        emb.crossJoin(F.broadcast(ama))
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, (x, i) -> CASE WHEN mxa[i] > 0 THEN "
                "CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            ).alias("xq"),
            F.expr(
                "transform(embedding, (x, i) -> CASE WHEN mxa[i] > 0 THEN "
                "CAST(FLOOR((ROUND(CAST(x AS DOUBLE) / mxa[i] * 127, 0) "
                "* mxa[i] / 127) * 1e6) AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            ).alias("yq"),
        )
        .localCheckpoint()
    )
    s1 = (
        qa.select(F.posexplode("xq").alias("dim", "xqe"), "yq")
        .select("dim", "xqe", F.expr("yq[dim]").alias("yqe"))
        .groupBy("dim")
        .agg(
            F.sum("xqe").cast("long").alias("sx"),
            F.sum("yqe").cast("long").alias("sy"),
        )
    )
    nn = qa.agg(F.count(F.lit(1)).cast("long").alias("nv"))

    def gram_partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["xq"]]
            )
            Y = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["yq"]]
            )
            d = X.shape[1]
            pxx = X.T @ X  # exact: int64 values bounded ~6e5
            pyy = Y.T @ Y
            pxy = X.T @ Y  # [i, j] = sum_r xq_i * yq_j
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype(np.int32),
                    "j": jj.ravel().astype(np.int32),
                    "pxx": pxx.ravel(),
                    "pyy": pyy.ravel(),
                    "pxy": pxy.ravel(),
                }
            )

    partials = qa.select("xq", "yq").mapInPandas(
        gram_partials, "i int, j int, pxx long, pyy long, pxy long"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    p = partials.groupBy("i", "j").agg(
        F.sum(dec(F.col("pxx"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("pyy"))).cast("double").alias("syy"),
        F.sum(dec(F.col("pxy"))).cast("double").alias("sxy"),
    )
    sa = s1.select(
        F.col("dim").alias("i"),
        F.col("sx").alias("sxi"),
        F.col("sy").alias("syi"),
    )
    sb = s1.select(
        F.col("dim").alias("j"),
        F.col("sx").alias("sxj"),
        F.col("sy").alias("syj"),
    )
    c = (
        p.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .crossJoin(F.broadcast(nn))
        .select(
            "i",
            "j",
            (
                F.col("sxx")
                - F.col("sxi").cast("double") * F.col("sxj") / F.col("nv")
            ).alias("cxx"),
            (
                F.col("syy")
                - F.col("syi").cast("double") * F.col("syj") / F.col("nv")
            ).alias("cyy"),
            (
                F.col("sxy")
                - F.col("sxi").cast("double") * F.col("syj") / F.col("nv")
            ).alias("cxy"),
        )
    )

    def fold(term):
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("i", "j", term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["t"],
        )

    f = c.agg(
        fold(F.col("cxy") * F.col("cxy")).alias("fxy"),
        fold(F.col("cxx") * F.col("cxx")).alias("fxx"),
        fold(F.col("cyy") * F.col("cyy")).alias("fyy"),
    )
    return f.crossJoin(F.broadcast(nn)).select(
        F.col("nv").alias("n_vecs"),
        (
            F.floor(
                F.col("fxy") / (F.sqrt(F.col("fxx")) * F.sqrt(F.col("fyy")))
                * 1e6
            )
            / 1e6
        ).alias("cka"),
    )


@register(
    "emb_mmd",
    section="2.9",
    oracle="""
    WITH u AS (SELECT label, t.i - 1 AS dim,
                      CAST(FLOOR(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE)
                                 * 1e6) AS BIGINT) AS xq
               FROM embeddings CROSS JOIN range(1, 65) t(i)),
    s AS (SELECT label, dim,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xq) AS BIGINT) AS sx
          FROM u GROUP BY label, dim),
    pair AS (SELECT a.label AS label_a, b.label AS label_b, a.dim,
                    a.n AS na, b.n AS nb,
                    (CAST(a.sx AS DOUBLE) / a.n - CAST(b.sx AS DOUBLE) / b.n)
                      AS dmu
             FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label),
    m AS (SELECT label_a, label_b, CAST(MAX(na) AS BIGINT) AS n_a,
                 CAST(MAX(nb) AS BIGINT) AS n_b,
                 list_reduce(list_prepend(0.0,
                   list(dmu * dmu / 1e12 ORDER BY dim)),
                   (x, y) -> x + y) AS mmd2
          FROM pair GROUP BY label_a, label_b)
    SELECT label_a, label_b, n_a, n_b,
           FLOOR(mmd2 * 1e9) / 1e9 AS mmd2_linear
    FROM m ORDER BY label_a, label_b
    """,
    notes="linear-kernel MMD^2 between every pair of label groups: "
    "||mean_a - mean_b||^2 over the 64 dims — the two-sample "
    "distribution-shift statistic for embedding spaces (retraining "
    "drift gates, domain-mix audits). With the linear kernel the "
    "statistic collapses to group mean differences, so the corpus "
    "work is ONE keyed aggregate of 1e-6-quantized exact integer "
    "per-dim sums (emb_isotropy discipline); the label-pair relation "
    "is groups^2 x 64 metadata, folded in dim order. FLOOR 1e-9 "
    "(squared-micro units are tiny). The cheap screen before the "
    "quadratic-kernel MMD a notebook would run on flagged pairs",
)
def emb_mmd(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    u = emb.select(
        "label", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "label",
        "dim",
        F.floor(F.col("xf").cast("double") * 1e6).cast("long").alias("xq"),
    )
    s = u.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
    )
    a = s.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("n").alias("na"),
        F.col("sx").alias("sxa"),
    )
    b = s.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dimb"),
        F.col("n").alias("nb"),
        F.col("sx").alias("sxb"),
    )
    pair = a.join(
        b,
        (F.col("dim") == F.col("dimb"))
        & (F.col("label_a") < F.col("label_b")),
    ).select(
        "label_a",
        "label_b",
        "dim",
        "na",
        "nb",
        (
            F.col("sxa").cast("double") / F.col("na")
            - F.col("sxb").cast("double") / F.col("nb")
        ).alias("dmu"),
    )
    m = pair.groupBy("label_a", "label_b").agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "dim",
                        (F.col("dmu") * F.col("dmu") / 1e12).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["t"],
        ).alias("mmd2"),
    )
    return m.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        (F.floor(F.col("mmd2") * 1e9) / 1e9).alias("mmd2_linear"),
    ).orderBy("label_a", "label_b")
