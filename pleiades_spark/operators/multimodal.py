"""Multimodal column plumbing — binary payloads with typed metadata.

Design for a real 100 TB multimodal corpus: media lives in opaque
``binary`` columns (or object-store URIs for >~100 MB payloads) with a
typed metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes cross
the JVM↔Python boundary in columnar batches, never row-at-a-time.

The image/audio codec libraries are NOT in this container (environment
contract), so the decode step is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and the feature
extractor below derives deterministic features from the raw bytes instead.
The Spark-side plumbing — schema, binary Arrow batches, UDF signature,
batch shape — is real and tested.

Scale notes: mapInPandas batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB blobs set
it low (e.g. 32) to bound executor memory; partition counts should target
~128 MB of payload per task.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 256  # stand-in "frame" granularity for the frame-sampler

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, header_hex string, n_frames int, "
    "sample_frame_offsets array<int>"
)


def decode_image(blob: bytes):  # pragma: no cover - env-gated
    """Decode an image payload. Real codecs are absent in this image —
    gated behind an import so deployments with PIL get the real path."""
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "feature extraction uses the deterministic byte-level stub"
        ) from e
    return Image.open(BytesIO(blob))


def attach_blob(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, blob BINARY, media STRUCT) — the multimodal
    column shape. Fixture docs carry no real media, so the text bytes act
    as the payload; a real corpus lands bytes here from its source."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("content_type"),
            F.col("source").alias("origin"),
        ).alias("media"),
    )


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched byte-level feature extraction (runs on executors)."""
    for pdf in batches:
        blobs = pdf["blob"]
        n_bytes = blobs.map(len)
        n_frames = n_bytes.map(lambda n: max(1, math.ceil(n / FRAME_BYTES)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "header_hex": blobs.map(lambda b: bytes(b)[:4].hex().upper()),
                "n_frames": n_frames.astype("int32"),
                # deterministic "frame sample": first/middle/last frame offsets
                "sample_frame_offsets": n_frames.map(
                    lambda nf: [0, (nf // 2) * FRAME_BYTES, (nf - 1) * FRAME_BYTES]
                ),
            }
        )


def extract_features(docs: DataFrame) -> DataFrame:
    """documents → byte-level features via mapInPandas over binary batches.

    The repartition spreads the Python stage across cores — fixture tables
    arrive as one file ⇒ one partition ⇒ one Python worker otherwise. At
    real scale the scan has many splits and the shuffle is harmless
    (payload-bearing rows shuffle once, before the Python stage).
    """
    from pyspark.sql import functions as F

    return attach_blob(docs.repartition(F.col("doc_id"))).mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, blob binary, n_bytes int, media struct<content_type:string,origin:string>"


def resize_blobs(media: DataFrame, factor: int = 4) -> DataFrame:
    """Downsample each binary payload by ``factor`` (every factor-th
    byte) — the resize/downscale stage of a media pipeline with the
    codec swapped for a deterministic byte-stride stand-in (the real
    implementation decodes, resizes via the codec library, re-encodes;
    decode_image gates that path).

    Input is the (doc_id, blob, media) shape attach_blob produces; output
    keeps the schema plus the new size, so resize stages compose with
    extract_features. Arrow-batched mapInPandas, binary in / binary out —
    the plumbing a real resampler needs is all here.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["blob"].map(lambda b: bytes(b)[::factor])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": resized,
                    "n_bytes": resized.map(len).astype("int32"),
                    "media": pdf["media"],
                }
            )

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame binary, n_bytes int"


def sample_frames(
    media: DataFrame, frame_size: int = 64, stride: int = 2
) -> DataFrame:
    """Frame sampling: each blob is cut into ``frame_size``-byte frames and
    every ``stride``-th frame becomes ITS OWN ROW — the 1→N batch-shape
    change of video ingestion (decode → sample frames → per-frame
    features), with the codec swapped for a deterministic byte-chunker
    (decode_image gates the real path, same as the sibling stages).

    This is the capability a scalar pandas_udf cannot express (its output
    must be 1:1 with input rows); mapInPandas lets the Arrow batch grow,
    and the output composes with extract_features / resize_blobs
    downstream. At scale the expansion factor (frames per blob / stride)
    multiplies rows BEFORE any shuffle — sample early, shuffle after, so
    the exchange carries sampled frames, never whole videos.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_frames = math.ceil(len(b) / frame_size)
                for i in range(0, n_frames, stride):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                    "n_bytes": pd.Series(
                        [len(f) for f in frames], dtype="int32"
                    ),
                }
            )

    return media.mapInPandas(_frames, schema=FRAME_SAMPLE_SCHEMA)
