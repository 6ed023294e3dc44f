"""Resize stage: byte-stride downsampling through Arrow-batched binary
columns, composing with the feature extractor."""

from pyspark.sql import functions as F

from pleiades_spark.catalog import load
from pleiades_spark.operators.multimodal import (
    attach_blob,
    extract_features,
    resize_blobs,
)


def test_resize_blobs_strides_bytes_and_composes(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(50)
    media = attach_blob(docs)
    orig = {r.doc_id: bytes(r.blob) for r in media.collect()}

    out = resize_blobs(media, factor=4)
    got = {r.doc_id: (bytes(r.blob), r.n_bytes) for r in out.collect()}
    assert set(got) == set(orig)
    for doc_id, (blob, n) in got.items():
        assert blob == orig[doc_id][::4]  # deterministic stride
        assert n == len(blob)
        assert n == -(-len(orig[doc_id]) // 4)  # ceil(orig/4)

    # media struct survives the Python stage intact
    row = out.filter(F.col("doc_id") == min(orig)).collect()[0]
    assert row.media.content_type == "text/plain"

    # composes: the resized shape feeds the feature extractor directly
    feats = out.drop("n_bytes").mapInPandas(
        __import__(
            "pleiades_spark.operators.multimodal", fromlist=["_extract"]
        )._extract,
        schema="doc_id long, n_bytes int, header_hex string, n_frames int, "
        "sample_frame_offsets array<int>",
    )
    fr = {r.doc_id: r.n_bytes for r in feats.collect()}
    assert fr == {d: n for d, (_, n) in got.items()}
    # sanity: full-size features over the same docs see larger payloads
    full = {r.doc_id: r.n_bytes for r in extract_features(docs).collect()}
    assert all(full[d] >= fr[d] for d in fr)
