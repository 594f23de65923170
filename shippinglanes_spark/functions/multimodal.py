"""SURVEY §2.9 — multimodal columns.

Media (image/audio/video) is modeled as opaque `binary` columns with a
typed metadata struct, processed by Arrow-batched `mapInPandas` stages —
the Spark-side plumbing (schema, batch shape, partition-parallel decode)
is real; the actual codec call is stubbed because media libraries are not
in this container (clearly marked below). The fixtures carry no binary
data, so blobs are materialized from `documents.text` via `encode()` —
byte-identical in both engines, which gives the metadata path an oracle.

- `multimodal_cols`: modality join — text ⋈ vector ⋈ scalar per id.
- `multimodal_meta`: blob construction + typed metadata (oracle-checked).
- `multimodal_decode`: partitioned decode/feature-extract over blobs
  (deterministic stub features; shape/determinism tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "multimodal_cols",
    section="2.9",
    oracle="""
    SELECT doc_id, lang, n_chars, label,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(SQRT(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             'sum')), 4) AS l2
    FROM documents JOIN embeddings ON doc_id = vec_id
    """,
    notes="one frame joining text + vector + scalar modalities per id",
)
def multimodal_cols(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "label",
            F.size("embedding").alias("dim"),
            F.round(l2, 4).alias("l2"),
        )
    )


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct — the
    engine's canonical multimodal row layout."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


@register(
    "multimodal_meta",
    section="2.9",
    oracle="""
    SELECT doc_id, 'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes
    FROM documents
    """,
    notes="binary-column construction + metadata projection (blob bytes are "
    "engine-identical UTF-8, so metadata is oracle-checkable)",
)
def multimodal_meta(spark, sf_dir):
    blobs = with_blob(table(spark, sf_dir, "documents"))
    return blobs.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


def decode_features(blobs: DataFrame, n_features: int = 4) -> DataFrame:
    """Partition-parallel decode + feature extraction over binary blobs.

    STUB: a real deployment would call the media codec here (PIL/ffmpeg/
    torchaudio — not available in this container). The stub emits
    deterministic per-blob pseudo-features so the Spark plumbing (Arrow
    batch in, fixed-width feature vector out, one task per partition) is
    exercised end to end; swap `_fake_decode` for the real codec.
    """

    def extract(batches):
        # nested so cloudpickle ships it by value: worker processes don't
        # have this package on their import path
        def fake_decode(blob: bytes) -> list[float]:
            # Deterministic stand-in for codec output: byte-stream moments.
            n = max(len(blob), 1)
            mean = sum(blob) / n
            var = sum((b - mean) ** 2 for b in blob) / n
            return [
                float(len(blob)),
                float(blob[0] if blob else 0),
                round(mean, 6),
                round(var, 6),
            ][:n_features]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "features": [fake_decode(b) for b in pdf["blob"]],
                }
            )

    return blobs.mapInPandas(
        extract, schema="doc_id long, n_bytes int, features array<double>"
    )


@register(
    "multimodal_decode",
    section="2.9",
    oracle=None,
    notes="stubbed codec (media libs absent); plumbing + determinism tested "
    "in tests/test_multimodal.py",
)
def multimodal_decode(spark, sf_dir):
    return decode_features(with_blob(table(spark, sf_dir, "documents")))


N_FRAMES = 4
FRAME_LEN = 16


@register(
    "multimodal_framesample",
    section="2.9",
    oracle=f"""
    WITH f AS (SELECT doc_id, text, n_chars,
                      unnest(range({N_FRAMES})) AS frame_idx
               FROM documents)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * n_chars // {N_FRAMES} AS INT) AS byte_off,
           md5(substring(text, frame_idx * n_chars // {N_FRAMES} + 1, {FRAME_LEN}))
             AS frame_md5
    FROM f
    """,
    notes="frame sampling plumbing: one input row explodes to N evenly-"
    "spaced frame rows (the batch shape of video processing); frame "
    "extraction is a deterministic slice+digest here (codec absent), so "
    "offsets AND content digests are oracle-exact",
)
def multimodal_framesample(spark, sf_dir):
    """Evenly-spaced frame sampling over an opaque payload. The real
    pipeline shape: row -> N frame rows via explode, then a per-frame
    decode. The slice+md5 stands in for the codec; the explode, offset
    arithmetic, and per-frame row layout are the real plumbing."""
    d = table(spark, sf_dir, "documents")
    f = d.select(
        "doc_id", "text", "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(N_FRAMES - 1))).alias("frame_idx"),
    )
    off = (F.col("frame_idx") * F.col("n_chars") / N_FRAMES).cast("int")
    return f.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        off.alias("byte_off"),
        F.md5(F.encode(F.expr(
            f"substring(text, frame_idx * n_chars div {N_FRAMES} + 1, {FRAME_LEN})"
        ), "UTF-8")).alias("frame_md5"),
    )


def resize_blob(blobs: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing over binary payloads (STUB codec: truncate/zero-pad
    to target_bytes stands in for an image resample — media libs absent).
    Real parts: Arrow binary in/out, metadata restamp, per-partition
    batching."""

    def resize(batches):
        for pdf in batches:
            out = []
            for b in pdf["blob"]:
                raw = bytes(b)[:target_bytes]
                out.append(raw + b"\x00" * (target_bytes - len(raw)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "blob": out,
                 "n_bytes": [len(b) for b in out]}
            )

    return blobs.mapInPandas(resize, schema="doc_id long, blob binary, n_bytes int")
