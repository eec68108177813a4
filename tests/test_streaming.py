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


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Pin session_window's exact-gap-boundary semantics (ADVICE round 1
    raised the question; this MEASURES the answer): Spark session
    windows merge when they touch, so an event EXACTLY 1800 s after its
    predecessor stays in the SAME session — only a strictly larger gap
    opens a new one. The oracle's strict `>` mirrors this; the fixture
    data never lands on the boundary, so this synthesizes it."""
    import datetime as dt

    from etl_pipeline_sam_gov_spark.streaming.jobs import stream_session_windows

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 10: second event exactly at the 1800 s gap → SAME session
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1800), 10, "click", 1.0, "{}"),
        # user 20: second event 1799 s later → SAME session
        (3, t0, 20, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(seconds=1799), 20, "click", 1.0, "{}"),
        # user 30: second event 1801 s later → NEW session
        (5, t0, 30, "click", 1.0, "{}"),
        (6, t0 + dt.timedelta(seconds=1801), 30, "click", 1.0, "{}"),
    ]
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf_dir = str(tmp_path / "synthetic_sf")
    os.makedirs(sf_dir)
    # single FILE like the fixture layout (a directory would not be
    # listed by the file stream source)
    pq.write_table(
        pa.Table.from_pandas(pdf), os.path.join(sf_dir, "events.parquet")
    )

    out = stream_session_windows(spark, sf_dir)
    per_user = {
        r.user_id: n
        for r in out.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
        for n in [r.n]
    }
    assert per_user == {10: 1, 20: 1, 30: 2}, per_user


def test_rocksdb_state_store_gives_identical_results(spark, monkeypatch):
    """The RocksDB provider is a storage backend swap, not a semantics
    change: the stateful replay must produce byte-identical rows under
    either provider (SPARK_GRAFT_STATE_STORE is the deployment knob —
    heap state for replay scale, spillable RocksDB at 100 TB state)."""
    from etl_pipeline_sam_gov_spark.streaming.jobs import stream_stateful_user_totals

    sf = "/root/testdata/sf0.001"
    baseline = sorted(map(tuple, stream_stateful_user_totals(spark, sf).collect()))
    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
    rocks = sorted(map(tuple, stream_stateful_user_totals(spark, sf).collect()))
    # run_to_memory scopes the provider conf to the query; the session
    # must come back on the default provider afterwards
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None) is None
    )
    assert rocks == baseline and len(rocks) > 0


def test_stateful_totals_accumulate_across_microbatches(spark, tmp_path):
    """The one-shot availableNow replay (driver oracle path) proves one
    batch; this replays the SAME events as multiple micro-batches
    (maxFilesPerTrigger=1 over two files) and checks the final state per
    user still equals the batch GROUP BY — the incremental-accumulation
    contract GroupState exists for."""
    from pyspark.sql import functions as F

    from etl_pipeline_sam_gov_spark.streaming.jobs import (
        run_to_memory,
        stateful_user_totals,
    )
    from etl_pipeline_sam_gov_spark.tables import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    src = str(tmp_path / "batches")
    # two files → two micro-batches under maxFilesPerTrigger=1
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_to_memory(
        stateful_user_totals(stream), mode="update", shuffle_partitions=4
    )
    # some users must have been updated in BOTH batches (else this test
    # degenerates to the single-batch case)
    per_user = out.groupBy("user_id").count()
    assert per_user.filter(F.col("count") >= 2).count() > 0
    # final state per user (largest n_events) == batch GROUP BY
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        ).filter("rk = 1").collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["tv"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    }
    assert final == expect


def test_stream_ewma_resumes_state_across_microbatches(spark, tmp_path):
    """EWMA is ORDER-SENSITIVE state (unlike the commutative totals):
    replay the events as two TIME-SPLIT micro-batches (all early events
    in batch 1, late in batch 2 — the contract any log-ordered source
    provides) and check the final per-user EWMA equals a direct Python
    fold over the full ts-sorted history — i.e. the recurrence really
    resumed from the saved state instead of restarting."""
    from pyspark.sql import functions as F

    from etl_pipeline_sam_gov_spark.functions.udfs import EWMA_ALPHA
    from etl_pipeline_sam_gov_spark.streaming import jobs as J
    from etl_pipeline_sam_gov_spark.tables import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    mid = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    src = str(tmp_path / "batches")
    early = ev.filter(F.unix_micros("ts") <= mid)
    late = ev.filter(F.unix_micros("ts") > mid)
    early.coalesce(1).write.parquet(src, mode="append")
    import time

    time.sleep(1.1)  # file-source ordering is by modification time
    late.coalesce(1).write.parquet(src, mode="append")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    # reuse the production update function via the registered query's
    # module-level pieces: rebuild the same stateful plan on this stream
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_ewma(key, pdfs, state):
        import pandas as pd

        a = EWMA_ALPHA
        n, y = state.get if state.exists else (0, None)
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for x in pdf["value"].tolist():
            y = x if y is None or n == 0 else a * x + (1 - a) * y
            n += 1
        state.update((n, float(y)))
        yield __import__("pandas").DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma_raw": [y]}
        )

    smoothed = (
        stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_ewma,
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("n_events", T.LongType()),
                    T.StructField("ewma_raw", T.DoubleType()),
                ]
            ),
            T.StructType(
                [T.StructField("n", T.LongType()), T.StructField("y", T.DoubleType())]
            ),
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    out = J.run_to_memory(smoothed, mode="update", shuffle_partitions=4)
    per_user = out.groupBy("user_id").count()
    assert per_user.filter(F.col("count") >= 2).count() > 0  # true multi-batch
    from pyspark.sql import Window as W

    final = {
        r["user_id"]: (r["n_events"], r["ewma_raw"])
        for r in out.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        ).filter("rk = 1").collect()
    }
    rows = ev.select("user_id", "ts", "event_id", "value").collect()
    hist: dict[int, list] = {}
    for r in rows:
        hist.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["value"]))
    for uid, h in hist.items():
        h.sort()
        y = None
        for _, _, x in h:
            y = x if y is None else EWMA_ALPHA * x + (1 - EWMA_ALPHA) * y
        n, got = final[uid]
        assert n == len(h)
        assert got == y, (uid, got, y)


def test_outer_join_tail_rows_flush_via_heartbeat(spark, sf_dir):
    """The left-outer stream-stream join's unmatched rows are emitted by
    WATERMARK EVICTION, not by batch luck: without the heartbeat the
    data watermark stops 1h before the last event, so any unmatched
    purchase inside that final window would stay stuck in state.
    Assert the globally LAST purchase (only emittable once the
    heartbeat advances the watermark past the whole timeline) is
    present, and that the output covers every purchase exactly once on
    the unmatched side plus every in-window click match."""
    import etl_pipeline_sam_gov_spark as eng

    out = eng.QUERIES["stream_left_outer_join_purchases"](spark, sf_dir)
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    last_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select("event_id")
        .first()[0]
    )
    assert out.filter(F.col("purchase_id") == last_purchase).count() >= 1
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    # every purchase appears (matched one-or-more times, or once with NULL)
    assert out.select("purchase_id").distinct().count() == n_purchases
    # no heartbeat rows leak
    assert out.filter(F.col("purchase_id") < 0).count() == 0


def test_checkpoint_recovery_is_exactly_once(spark, sf_dir, tmp_path):
    """Crash a checkpointed stream mid-epoch, restart it from the same
    checkpoint, and an EPOCH-KEYED IDEMPOTENT sink ends up with exactly
    the batch answer — no loss, no dupes. This pins the real contract:
    foreachBatch delivers each epoch at-least-once (a crashed epoch is
    REDELIVERED under the same epoch_id on restart — the first version
    of this test proved that by double-counting), and idempotent
    upserts keyed on epoch_id are what turn that into exactly-once."""
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_sam_gov_spark.streaming.jobs import _denaive

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # two flat files → two availableNow micro-batches at 1 file/trigger
    import glob
    import shutil

    for tag, parity in (("a", 0), ("b", 1)):
        d = str(tmp_path / f"half_{tag}")
        ev.filter(F.col("event_id") % 2 == parity).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(landing, f"{tag}.parquet"))
    ckpt = str(tmp_path / "ckpt")
    out: dict[int, int] = {}  # epoch_id → sum: idempotent on redelivery
    epochs_seen: list[int] = []

    def run_until(n_batches: int) -> None:
        got: list[int] = []

        def sink(batch_df, epoch_id):
            got.append(batch_df.count())
            epochs_seen.append(epoch_id)
            out[epoch_id] = batch_df.agg(F.sum("event_id")).collect()[0][0] or 0
            if len(got) >= n_batches:
                raise RuntimeError("deliberate mid-stream crash")

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            _denaive(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception:
            pass  # the deliberate crash surfaces here
        finally:
            q.stop()

    run_until(1)  # crash inside the first epoch (uncommitted)
    run_until(99)  # restart from the checkpoint, drain everything
    total_batch = ev.agg(F.sum("event_id")).collect()[0][0]
    assert sum(out.values()) == total_batch, "restart lost or duplicated rows"
    assert len(out) >= 2  # both files processed, as separate epochs
    # the crashed epoch was REDELIVERED under the same id (at-least-once)
    assert len(epochs_seen) > len(set(epochs_seen))


def test_cdc_upsert_accumulates_out_of_order_microbatches(spark, tmp_path):
    """The one-shot availableNow replay proves one epoch; this replays
    the events as two micro-batches with the LATER batch carrying the
    EARLIER half of each user's timeline (maxFilesPerTrigger=1, files
    ordered new-events-first), then checks the snapshot still equals
    the batch answer — the (ts, event_id)-tuple newest-wins comparison,
    not batch arrival order, decides the merge."""
    from pyspark.sql import functions as F

    from etl_pipeline_sam_gov_spark.streaming.jobs import cdc_upsert_stream
    from etl_pipeline_sam_gov_spark.tables import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    med = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    base = ev.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    )
    src = str(tmp_path / "batches")
    # file modification order drives trigger order for the file source;
    # write the NEW half first so the second micro-batch is the backfill
    base.filter(F.col("ts_us") > med).coalesce(1).write.parquet(
        src, mode="append"
    )
    import time as _t

    _t.sleep(1.1)  # distinct mtimes → deterministic file ordering
    base.filter(F.col("ts_us") <= med).coalesce(1).write.parquet(
        src, mode="append"
    )
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", False)
        .parquet(src)
    )
    snap = str(tmp_path / "snapshot")
    q = cdc_upsert_stream(stream, snap)
    q.processAllAvailable()
    q.stop()
    got = {
        r["user_id"]: (r["n_events"], r["last_ts_us"], r["last_event_id"])
        for r in spark.read.parquet(snap).collect()
    }
    w = __import__(
        "pyspark.sql.window", fromlist=["Window"]
    ).Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    expect = {
        r["user_id"]: (r["n"], r["ts_us"], r["event_id"])
        for r in base.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.partitionBy("user_id")
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert got == expect and len(got) > 0


def test_directory_source_streams_part_files(spark, sf_dir, tmp_path):
    """A directory-shaped source (a real landing zone, or a
    Spark-written table like the stress amplifier's) must stream its
    part-files directly — the single-file symlink indirection buried
    them one level below the glob and the source silently read ZERO
    files (caught by the stress battery's row tracking: both stream
    entries reported rows=0 at every amplification)."""
    d = str(tmp_path / "landing")
    events = load_tables(spark, sf_dir, ("events",))["events"]
    events.write.parquet(os.path.join(d, "events.parquet"))
    agg = (
        read_events_stream(spark, d)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = run_to_memory(agg, mode="complete", shuffle_partitions=4)
    batch = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert {(r["event_type"], r["n"]) for r in got.collect()} == {
        (r["event_type"], r["n"]) for r in batch.collect()
    } and got.count() > 0


def test_heartbeat_replay_reads_directory_sources(spark, sf_dir, tmp_path):
    """_heartbeat_landing symlinked `events.parquet` itself into the
    landing zone — correct for the single-file fixture, but a
    directory-shaped source (any Spark-written events table) got
    buried one level below the stream glob and the replay saw ONLY the
    two heartbeat rows (filtered by construction → zero output; caught
    by the stress battery's row tracking). Directory sources must
    yield the same watermark-flushed outer join as the file fixture."""
    from etl_pipeline_sam_gov_spark.operators import relational  # noqa: F401
    import etl_pipeline_sam_gov_spark as eng

    d = str(tmp_path / "sfdir")
    os.makedirs(d)
    events = load_tables(spark, sf_dir, ("events",))["events"]
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).write.parquet(
        os.path.join(d, "events.parquet")
    )
    got = eng.QUERIES["stream_left_outer_join_purchases"](spark, d).count()
    want = eng.QUERIES["stream_left_outer_join_purchases"](spark, sf_dir).count()
    assert got == want and got > 0
