"""SURVEY §2.9 — multimodal columns.

Media (image/audio/video) is modeled as opaque `binary` columns with a
typed metadata struct, processed by Arrow-batched `mapInPandas` stages.
The fixtures carry no binary data, so blobs are materialized from
`documents.text` — byte-identical in both engines, which is what makes
the decode path fully value-oracle-able.

- `multimodal_cols`: modality join — text ⋈ vector ⋈ scalar per id.
- `multimodal_meta`: blob construction + typed metadata (oracle-checked).
- `multimodal_decode`: a REAL image decode — each doc becomes a valid
  binary PPM (P6) raster, genuinely parsed back (header validation +
  pixel-buffer md5) with no media library; dimensions and content digest
  are oracle-exact. Heavier codecs (JPEG/ffmpeg) stay out only because
  the container has no such library; the batch shape is the real one.
- `resize_blob`: resize plumbing (truncate/pad stands in for resample —
  clearly marked; no pure-python resample is defensible for real rasters).
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


PPM_W = 16  # fixed raster width; height derives from the payload length
_PPM_ROW = 3 * PPM_W  # bytes per pixel row (RGB)


def with_ppm_blob(docs: DataFrame) -> DataFrame:
    """Materialize each document as a VALID binary PPM (P6) raster:
    `P6 {w} {h} 255\\n` ASCII header followed by exactly w*h*3 pixel
    bytes (the UTF-8 payload zero-padded to the raster size). PPM is a
    public image format simple enough to parse with no media library —
    which is what makes a REAL decode possible in this container. The
    pixel payload is fixture text (pure ASCII — probed), so every
    decode output is value-oracle-able byte-for-byte in DuckDB."""
    n = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    sized = docs.select(
        "doc_id",
        "text",
        n.alias("nb"),
        # exact integer ceil; clamp keeps a hypothetical empty payload
        # a legal 1-row raster
        F.greatest(
            F.expr(f"(octet_length(encode(text, 'UTF-8')) + {_PPM_ROW - 1})"
                   f" div {_PPM_ROW}"),
            F.lit(1),
        ).cast("int").alias("ph"),
    )
    return sized.select(
        "doc_id",
        F.concat(
            F.encode(
                F.concat(
                    F.lit(f"P6 {PPM_W} "),
                    F.col("ph").cast("string"),
                    F.lit(" 255\n"),
                ),
                "UTF-8",
            ),
            F.encode(F.col("text"), "UTF-8"),
            # U+0000 is a single 0x00 byte in UTF-8, so repeat(chr(0))
            # is exact binary zero-padding on both engines
            F.encode(
                F.expr(f"repeat(chr(0), ph * {_PPM_ROW} - nb)"), "UTF-8"
            ),
        ).alias("blob"),
    )


def decode_ppm(blobs: DataFrame) -> DataFrame:
    """REAL P6 decode over opaque binary blobs, partition-parallel via
    Arrow-batched mapInPandas: parse the magic, the three whitespace-
    separated ASCII header fields, the single post-maxval whitespace
    byte, then validate the pixel buffer length against w*h*3 — raising
    on any malformed input (tested). Emits raster dimensions plus the
    pixel buffer's md5, which certifies the decoded CONTENT, not just
    its shape."""

    def extract(batches):
        # nested so cloudpickle ships everything by value: workers don't
        # have this package on their import path
        import hashlib

        def parse(blob: bytes):
            if bytes(blob[:2]) != b"P6":
                raise ValueError("not a P6 ppm")
            i, fields = 2, []
            while len(fields) < 3:
                while i < len(blob) and blob[i : i + 1].isspace():
                    i += 1
                j = i
                while j < len(blob) and blob[j : j + 1].isdigit():
                    j += 1
                if j == i:
                    raise ValueError("malformed ppm header")
                fields.append(int(blob[i:j]))
                i = j
            # exactly one whitespace byte after maxval — validate it IS
            # whitespace before consuming (a blob like b"P6 2 2 255X"
            # plus 12 pixel bytes must be rejected, not silently
            # accepted with X swallowed as the separator)
            if not blob[i : i + 1].isspace():
                raise ValueError("malformed ppm header")
            i += 1
            w, h, maxval = fields
            pixels = bytes(blob[i:])
            if maxval != 255 or len(pixels) != w * h * 3:
                raise ValueError("malformed ppm payload")
            return w, h, pixels

        for pdf in batches:
            rows = [parse(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_pixel_bytes": [len(r[2]) for r in rows],
                    "pixel_md5": [
                        hashlib.md5(r[2]).hexdigest() for r in rows
                    ],
                }
            )

    return blobs.mapInPandas(
        extract,
        schema="doc_id long, width int, height int, "
        "n_pixel_bytes long, pixel_md5 string",
    )


@register(
    "multimodal_decode",
    section="2.9",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS nb,
             GREATEST((octet_length(encode(text)) + {_PPM_ROW - 1})
                      // {_PPM_ROW}, 1) AS ph
      FROM documents)
    SELECT doc_id,
           CAST({PPM_W} AS INT) AS width,
           CAST(ph AS INT) AS height,
           CAST(ph * {_PPM_ROW} AS BIGINT) AS n_pixel_bytes,
           md5(text || repeat(chr(0), CAST(ph * {_PPM_ROW} - nb AS INT)))
             AS pixel_md5
    FROM b
    """,
    notes=f"REAL image decode with no media library: each doc is "
    f"materialized as a valid {PPM_W}-wide binary PPM (P6) raster and "
    "genuinely parsed back (magic + header fields + pixel-buffer "
    "length validation, malformed input raises — tested), Arrow-"
    "batched mapInPandas, one decode per row. The oracle reproduces "
    "the expected dimensions and the pixel buffer's md5 from the "
    "payload directly (fixture text is pure ASCII, so DuckDB's "
    "chr(0) string padding is byte-exact), certifying decoded "
    "CONTENT, not just plumbing. Swap the P6 parser for PIL/ffmpeg "
    "when a codec library lands — the batch shape is the real one",
)
def multimodal_decode(spark, sf_dir):
    return decode_ppm(with_ppm_blob(table(spark, sf_dir, "documents")))


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
