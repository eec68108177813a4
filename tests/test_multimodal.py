"""Multimodal plumbing tests: real binary schema/batching, real
pure-Python BMP/WAV header decode (SURVEY.md §2.12)."""

from __future__ import annotations

import pytest

from etl_pipeline_sam_gov_spark.operators.multimodal import (
    _bmp_dims,
    _wav_params,
    attach_binary_payload,
    decode_media,
    make_bmp,
    make_wav,
    multimodal_features,
)
from etl_pipeline_sam_gov_spark.tables import load_tables


def test_decode_media_parses_bmp_header():
    blob = make_bmp(17, 9, seed=3)
    got = decode_media(blob)
    assert got["mime"] == "image/bmp"
    assert (got["width"], got["height"]) == (17, 9)
    # real file: size field and pixel array agree with the spec
    assert int.from_bytes(blob[2:6], "little") == len(blob)
    assert len(blob) == 54 + (17 * 3 + 3) // 4 * 4 * 9


def test_decode_media_walks_riff_chunks():
    blob = make_wav(22050, 2, 100, seed=5)
    got = decode_media(blob)
    assert got["mime"] == "audio/wav"
    assert (got["sample_rate"], got["channels"]) == (22050, 2)
    # decoder must WALK to fmt, not assume offset 12: prepend a LIST chunk
    padded = blob[:12] + b"LIST" + (4).to_bytes(4, "little") + b"INFO" + blob[12:]
    fixed = padded[:4] + (len(padded) - 8).to_bytes(4, "little") + padded[8:]
    assert decode_media(fixed)["sample_rate"] == 22050


def test_decode_media_rejects_unknown_magic():
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n")


def test_binary_payload_schema(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = attach_binary_payload(docs)
    assert dict(payload.dtypes)["content"] == "binary"
    assert payload.schema["meta"].dataType.simpleString() == (
        "struct<mime:string,n_bytes:int>"
    )


def test_features_decode_real_headers_at_scale(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    doc_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    feats = {r["doc_id"]: r.asDict() for r in multimodal_features(spark, sf_dir).collect()}
    assert set(feats) == set(doc_ids)
    for doc_id in doc_ids[:50]:
        row = feats[doc_id]
        if doc_id % 2 == 0:
            w, h = _bmp_dims(doc_id)
            assert row["mime"] == "image/bmp"
            assert (row["width"], row["height"]) == (w, h)
            assert row["sample_rate"] is None and row["channels"] is None
            assert row["n_bytes"] == len(make_bmp(w, h, seed=doc_id))
        else:
            sr, ch, n = _wav_params(doc_id)
            assert row["mime"] == "audio/wav"
            assert (row["sample_rate"], row["channels"]) == (sr, ch)
            assert row["width"] is None and row["height"] is None
            assert row["n_bytes"] == len(make_wav(sr, ch, n, seed=doc_id))


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


def test_decode_media_rejects_truncated_payloads():
    """A payload cut mid-header must raise (quarantine), never return
    fabricated fields from short byte slices."""
    bmp = make_bmp(10, 10, seed=1)
    wav = make_wav(22050, 2, 50, seed=1)
    for cut in (bmp[:2], bmp[:26], bmp[:53], wav[:12], wav[:20], wav[:27]):
        with pytest.raises(ValueError):
            decode_media(cut)
    # the minimal complete headers still parse
    assert decode_media(bmp[:54])["width"] == 10
    assert decode_media(wav[:36])["sample_rate"] == 22050
