"""Structured Streaming behavior tests (SURVEY.md §5.2.5): windowed
aggs are oracle-checked in test_oracle_parity; here we cover the sink
semantics and runtime behaviors the oracle can't see."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    snapshot_stream,
)
from etl_pipeline_sam_gov_spark.tables import load_tables


def test_stream_is_actually_streaming(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    assert events.isStreaming


def test_foreachbatch_snapshot_sink_overwrites(spark, sf_dir, tmp_path):
    """The reference's overwrite-fixed-key semantics
    (lambda_function.py:120-128): every epoch replaces the snapshot;
    re-running leaves exactly one snapshot's worth of data."""
    out = os.path.join(str(tmp_path), "snapshot")
    for _ in range(2):  # run twice: second run must overwrite, not append
        q = snapshot_stream(read_events_stream(spark, sf_dir), out)
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    snap = spark.read.parquet(out)
    batch = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
    )
    got = {r["event_type"]: (r["n"], r["total_value"]) for r in snap.collect()}
    want = {r["event_type"]: (r["n"], r["total_value"]) for r in batch.collect()}
    assert got == want


def test_memory_sink_roundtrip_counts(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    agg = events.withWatermark("ts", "1 hour").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_memory(agg, mode="complete")
    batch_n = load_tables(spark, sf_dir, ("events",))["events"].count()
    assert sum(r["n"] for r in out.collect()) == batch_n
