"""Multimodal column plumbing (SURVEY.md §2.12): images/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` pipelines.

The decode layer is a STUB by design — the image/audio codecs are not
in this container. What IS real and tested here is everything Spark
cares about at 100 TB:

- the schema contract (binary payload + metadata struct),
- partition-parallel Arrow batching through ``mapInPandas``,
- deterministic feature extraction over raw bytes (length, checksum,
  hash-derived pseudo-dimensions) standing in for decode+featurize,
- the UDF signature/batch shape a real decoder would drop into.

Swapping in a real decoder is a one-function change
(``decode_image``); the plan shape — scan → repartition → mapInPandas
→ downstream relational ops — is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables

#: Output schema of the feature extractor (metadata + fake-decode features).
FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, checksum long, "
    "pseudo_width int, pseudo_height int"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: utf-8 payload bytes standing in for an
    image blob, plus a typed metadata struct. (A real ingest would read
    the blob column straight from parquet — binary is a first-class
    parquet/Spark type; this derivation just gives the fixtures a
    payload.)"""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: real pixel decode requires an image codec (Pillow/ffmpeg),
    not present in this container. The Spark-side contract — bytes in,
    array out, called inside the mapInPandas batch loop — is what the
    pipeline tests exercise via the deterministic fake below."""
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "environment; use extract_features' deterministic fake instead"
    )


def _fake_decode_features(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode+featurize: a bytewise checksum
    and hash-derived pseudo-dimensions (stable across runs/partitions)."""
    checksum = sum(content) % 1_000_000_007
    h = 0
    for b in content[:64]:
        h = (h * 131 + b) % 2_147_483_647
    return checksum, (h % 1024) + 1, ((h // 1024) % 1024) + 1


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches in, feature rows out. This is
    the slot where a real decoder runs; per-batch (not per-row) Python
    cost, pipeline-parallel across partitions."""
    for pdf in batches:
        feats = pdf["content"].map(_fake_decode_features)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": [m["mime"] for m in pdf["meta"]],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "checksum": [f[0] for f in feats],
                "pseudo_width": [f[1] for f in feats],
                "pseudo_height": [f[2] for f in feats],
            }
        )


@query("multimodal_features")  # rows-only: the kernel is Python-side by design
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction end-to-end: payload + metadata
    → mapInPandas(extract_features). Deterministic (fake decode), but
    not ANSI-SQL-expressible → rows-only driver check; exact values are
    asserted in tests/test_multimodal.py."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = attach_binary_payload(docs)
    return payload.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


@query(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       'text/plain' AS mime,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents
""",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JVM-side half of the multimodal pipeline (schema + metadata
    projection) — oracle-checked; byte length via octet_length over the
    binary payload."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = attach_binary_payload(docs)
    return payload.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
    )


FRAME_BYTES = 64  # synthetic "frame" stride within the binary payload
FRAME_SAMPLE_EVERY = 4  # keep every 4th frame


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for frame sampling: slice the binary payload
    into fixed-stride frames and keep every Nth — the plumbing shape of
    video frame extraction (a real decoder replaces the byte slicing;
    partitioning, batch flow, and the one-to-many row expansion are
    identical). Emits (doc_id, frame_idx, frame_bytes, frame_checksum)."""
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "frame_idx": [], "n_frame_bytes": [], "frame_checksum": []
        }
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            n_frames = max(len(content) // FRAME_BYTES, 1)
            for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
                frame = bytes(content[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES])
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["n_frame_bytes"].append(len(frame))
                out["frame_checksum"].append(sum(frame) % 1_000_000_007)
        yield pd.DataFrame(out)


@query(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       (f - 1) * 4 AS frame_idx,
       CAST(least(64, strlen(text) - (f - 1) * 4 * 64) AS BIGINT) AS n_frame_bytes
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1,
             (greatest(strlen(text) // 64, 1) + 3) // 4)) AS f
  FROM documents
) t
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media columns (SURVEY.md §2.12
    multimodal): one-to-many mapInPandas expansion, every-Nth-frame
    policy. The frame COUNTS and sizes are pure arithmetic over the
    payload length, so they ARE oracle-checkable — the checksum column
    (Python-side content hash) is exercised in tests/test_multimodal.py
    instead, keeping this query's contract fully relational."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = attach_binary_payload(docs)
    # frame_idx is long: the oracle's generate_series arithmetic is BIGINT
    # and the driver's value-hash is typed.
    frames = payload.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx long, n_frame_bytes long, frame_checksum long",
    )
    return frames.select("doc_id", "frame_idx", "n_frame_bytes")
