"""Multimodal plumbing tests: real schema/batching, deterministic fake
decode, stubbed codec (SURVEY.md §2.12)."""

from __future__ import annotations

import pytest

from etl_pipeline_sam_gov_spark.operators.multimodal import (
    _fake_decode_features,
    attach_binary_payload,
    decode_image,
    multimodal_features,
)
from etl_pipeline_sam_gov_spark.tables import load_tables


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_binary_payload_schema(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = attach_binary_payload(docs)
    assert dict(payload.dtypes)["content"] == "binary"
    assert payload.schema["meta"].dataType.simpleString() == (
        "struct<mime:string,n_bytes:int>"
    )


def test_features_match_local_computation(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    feats = {r["doc_id"]: r.asDict() for r in multimodal_features(spark, sf_dir).collect()}
    assert set(feats) == set(texts)
    for doc_id, text in list(texts.items())[:25]:
        content = text.encode("utf-8")
        checksum, w, h = _fake_decode_features(content)
        row = feats[doc_id]
        assert row["n_bytes"] == len(content)
        assert row["checksum"] == checksum
        assert (row["pseudo_width"], row["pseudo_height"]) == (w, h)
        assert row["mime"] == "text/plain"


def test_frame_sample_checksums_match_local_computation(spark, sf_dir):
    """The oracle checks frame counts/sizes; this asserts the
    Python-side frame CONTENT (checksums) against a local recompute —
    together they pin the whole sample_frames kernel."""
    from etl_pipeline_sam_gov_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_SAMPLE_EVERY,
        attach_binary_payload,
        sample_frames,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    frames = attach_binary_payload(docs).mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx int, n_frame_bytes long, frame_checksum long",
    )
    got = {(r["doc_id"], r["frame_idx"]): r for r in frames.collect()}
    texts = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}
    checked = 0
    for doc_id, content in list(texts.items())[:20]:
        n_frames = max(len(content) // FRAME_BYTES, 1)
        for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
            frame = content[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
            row = got[(doc_id, idx)]
            assert row["n_frame_bytes"] == len(frame)
            assert row["frame_checksum"] == sum(frame) % 1_000_000_007
            checked += 1
    assert checked > 20
