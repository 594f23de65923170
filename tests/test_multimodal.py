"""Multimodal binary-column plumbing: schema, batch shape, and the REAL
P6 (PPM) codec behind multimodal_decode — header construction, parse
round-trip against a python reference, and malformed-input rejection."""

from __future__ import annotations

import hashlib

import pytest

from shippinglanes_spark.functions.multimodal import (
    PPM_W,
    decode_ppm,
    with_blob,
    with_ppm_blob,
)
from shippinglanes_spark.io import table


def test_blob_schema_and_meta(spark, sf_dir):
    blobs = with_blob(table(spark, sf_dir, "documents"))
    dt = dict(blobs.dtypes)
    assert dt["blob"] == "binary"
    assert dt["meta"] == "struct<mime:string,n_bytes:int>"
    row = blobs.first()
    assert isinstance(bytes(row.blob), bytes)
    assert row.meta.n_bytes == len(bytes(row.blob))


def test_ppm_blob_is_a_valid_p6(spark, sf_dir):
    """The constructed blob must be a legal P6 file a third-party parser
    would accept: magic, 3 ASCII fields, single whitespace, w*h*3 pixel
    bytes with the payload as a prefix and zero padding after."""
    docs = table(spark, sf_dir, "documents").limit(20)
    rows = with_ppm_blob(docs).join(docs.select("doc_id", "text"), "doc_id").collect()
    assert len(rows) == 20
    for r in rows:
        blob = bytes(r.blob)
        header, _, rest = blob.partition(b"\n")
        magic, w, h, maxval = header.split(b" ")
        assert magic == b"P6" and int(w) == PPM_W and int(maxval) == 255
        payload = r.text.encode("utf-8")
        assert len(rest) == int(w) * int(h) * 3
        assert rest[: len(payload)] == payload
        assert rest[len(payload):] == b"\x00" * (len(rest) - len(payload))


def test_ppm_decode_matches_python_reference(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = {
        r.doc_id: (r.width, r.height, r.n_pixel_bytes, r.pixel_md5)
        for r in decode_ppm(with_ppm_blob(docs)).collect()
    }
    assert len(out) == docs.count()
    for r in docs.limit(50).collect():
        payload = r.text.encode("utf-8")
        h = max(-(-len(payload) // (3 * PPM_W)), 1)
        pixels = payload + b"\x00" * (h * 3 * PPM_W - len(payload))
        assert out[r.doc_id] == (
            PPM_W,
            h,
            h * 3 * PPM_W,
            hashlib.md5(pixels).hexdigest(),
        )


def test_ppm_decode_rejects_malformed(spark):
    """A real codec FAILS on garbage — the stub never could. Wrong
    magic, truncated pixel buffer, and non-255 maxval must all raise."""
    import pyspark.sql.functions as F

    bad = [
        b"P5 2 2 255\n" + b"\x00" * 12,   # wrong magic
        b"P6 2 2 255\n" + b"\x00" * 11,   # short pixel buffer
        b"P6 2 2 100\n" + b"\x00" * 12,   # unsupported maxval
        b"P6 2 2 255X" + b"\x00" * 12,    # non-whitespace separator
    ]
    for blob in bad:
        df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
        with pytest.raises(Exception) as ei:
            decode_ppm(df).collect()
        assert "ppm" in str(ei.value)
    ok = b"P6 2 2 255\n" + bytes(range(12))
    df = spark.createDataFrame([(1, ok)], "doc_id long, blob binary")
    row = decode_ppm(df).collect()[0]
    assert (row.width, row.height) == (2, 2)
    assert row.pixel_md5 == hashlib.md5(bytes(range(12))).hexdigest()


def test_resize_blob_shapes(spark, sf_dir):
    """Resize plumbing: binary in/out, exact target width, deterministic."""
    from shippinglanes_spark.functions.multimodal import resize_blob, with_blob
    from shippinglanes_spark.io import table

    blobs = with_blob(table(spark, sf_dir, "documents").limit(20))
    out = resize_blob(blobs, target_bytes=32).collect()
    assert len(out) == 20
    assert all(r.n_bytes == 32 and len(bytes(r.blob)) == 32 for r in out)
    again = resize_blob(blobs, target_bytes=32).collect()
    assert sorted(bytes(r.blob) for r in out) == sorted(bytes(r.blob) for r in again)
