"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked below) — but everything Spark-side is
real and tested: the binary column schema, the struct metadata, the
mapInPandas batch shape, and the output contract. Swapping the fake for
`PIL.Image.open`/`soundfile.read` changes only `_decode_payload`.

Scale notes: payloads ride in the same Parquet row groups as the
metadata; `mapInPandas` streams Arrow batches so executor memory is
bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` × payload
size, and feature extraction is a map-only stage (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, head_hex string, checksum bigint"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload = opaque bytes, meta = typed
    struct. (Here the bytes are the utf-8 text; a real pipeline would
    read image/audio blobs through the same schema.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("content_type"),
            # byte length of the payload itself, not the char count
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes) -> dict:
    """DETERMINISTIC FAKE DECODE — stands in for an image/audio codec.

    Real decode would be e.g. ``img = Image.open(io.BytesIO(payload))``;
    the container ships no codecs, so features are derived from the raw
    bytes instead (byte length, head bytes, additive checksum). The
    signature and batch plumbing are production-shaped.
    """
    head = payload[:8].hex().upper()
    checksum = sum(payload[:64]) % 997
    return {"n_bytes": len(payload), "head_hex": head, "checksum": checksum}


def decode_image_stub(payload: bytes) -> "object":
    """Where a real image decoder would plug in. Kept explicit so the
    seam is visible and testable."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use _decode_payload's deterministic fake for plumbing tests"
    )


def decode_features(multimodal: DataFrame) -> DataFrame:
    """Extract per-payload features via Arrow-batched mapInPandas."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        none_feats = {"n_bytes": None, "head_hex": None, "checksum": None}
        for pdf in batches:
            feats = [
                none_feats if p is None else _decode_payload(bytes(p))
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return multimodal.select("doc_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_head_hex string"


def sample_frames(
    multimodal: DataFrame,
    frame_size: int = 32,
    stride: int = 4,
) -> DataFrame:
    """Video-style frame sampling over opaque payloads: treat each
    payload as a sequence of fixed-size raw frames (the post-codec
    representation — e.g. raw YUV planes), emit every `stride`-th full
    frame's descriptor. The byte slicing is real (no codec needed for
    fixed-size frames); a container-format pipeline would swap the
    slicer for a demuxer with the same 1→N mapInPandas explode shape.
    Map-only: no shuffle, executor memory bounded by the Arrow batch.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_head_hex": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                for i in range(0, len(b) // frame_size, stride):
                    fr = b[i * frame_size : (i + 1) * frame_size]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(len(fr))
                    rows["frame_head_hex"].append(fr[:8].hex().upper())
            yield pd.DataFrame(rows)

    return multimodal.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, content_type string, n_bytes bigint"
)


def resize_stub(
    multimodal: DataFrame, target_bytes: int = 256
) -> DataFrame:
    """Where image resizing plugs in: DETERMINISTIC FAKE — a real
    pipeline decodes, resizes, re-encodes (PIL/libvips); this container
    ships no codecs, so the 'resize' is a byte truncation that keeps
    the payload-in/payload-out contract, schema, and batch plumbing
    production-shaped (swap the lambda body for the codec call)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                None if p is None else bytes(p)[:target_bytes]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "content_type": ["application/x-resized"] * len(payloads),
                    "n_bytes": [None if p is None else len(p) for p in payloads],
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(resize, RESIZED_SCHEMA)
