"""Multimodal plumbing beyond the oracle suite: the resize seam and
frame-sampling edge shapes (the oracle pins llm_frame_sample values)."""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_stub,
    resize_stub,
    sample_frames,
)


def test_resize_stub_contract(spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    mm = attach_binary_payload(docs)
    out = resize_stub(mm, target_bytes=16)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.n_bytes <= 16 for r in rows)
    assert all(r.content_type == "application/x-resized" for r in rows)
    # payload-in/payload-out: the result is itself a multimodal frame
    assert dict(out.dtypes)["payload"] == "binary"


def test_sample_frames_short_payload(spark):
    """A payload shorter than one frame yields no frames (no partial
    tail frames — matches the oracle's integer-division semantics)."""
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "x" * 100)], "doc_id bigint, text string"
    )
    out = sample_frames(attach_binary_payload(docs), frame_size=32, stride=1)
    rows = out.collect()
    assert all(r.doc_id == 2 for r in rows)
    assert len(rows) == 100 // 32
    assert all(r.frame_len == 32 for r in rows)


def test_decode_stub_is_loud():
    with pytest.raises(NotImplementedError, match="codecs"):
        decode_image_stub(b"\x89PNG")
