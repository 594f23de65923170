"""Multimodal binary-column plumbing: schema, batch shape, determinism of
the (stubbed) decode stage."""

from __future__ import annotations

from shippinglanes_spark.functions.multimodal import (
    decode_features,
    with_blob,
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


def test_decode_shape_and_determinism(spark, sf_dir):
    blobs = with_blob(table(spark, sf_dir, "documents"))
    out = decode_features(blobs)
    assert dict(out.dtypes)["features"] == "array<double>"
    a = {r.doc_id: (r.n_bytes, tuple(r.features)) for r in out.collect()}
    b = {r.doc_id: (r.n_bytes, tuple(r.features)) for r in decode_features(blobs).collect()}
    assert a == b  # stub decode is deterministic across runs/partitionings
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(a) == n_docs
    assert all(len(f) == 4 for _, f in a.values())
    # feature[0] is the byte length; must agree with the metadata column
    assert all(f[0] == nb for nb, f in a.values())


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
