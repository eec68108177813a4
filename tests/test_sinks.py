"""Source/sink round-trips (SURVEY.md §2.1 S4/S8/S9 + formats)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark import sinks
from etl_pipeline_sam_gov_spark.tables import load_tables


def small(spark, sf_dir):
    return load_tables(spark, sf_dir, ("nation",))["nation"]


def test_parquet_snapshot_overwrite_semantics(spark, sf_dir, tmp_path):
    path = os.path.join(str(tmp_path), "snap")
    df = small(spark, sf_dir)
    sinks.write_parquet_snapshot(df, path)
    sinks.write_parquet_snapshot(df.limit(5), path)  # overwrite, not append
    assert spark.read.parquet(path).count() == 5


def test_partitioned_snapshot_dynamic_overwrite(spark, sf_dir, tmp_path):
    path = os.path.join(str(tmp_path), "part_snap")
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    by_year = orders.withColumn("yr", F.year("o_orderdate"))
    sinks.write_partitioned_snapshot(by_year, path, "yr")
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: reading one year touches one directory
    years = [d for d in os.listdir(path) if d.startswith("yr=")]
    assert len(years) > 1


def test_csv_json_orc_roundtrip(spark, sf_dir, tmp_path):
    df = small(spark, sf_dir).orderBy("n_nationkey")
    want = [tuple(r) for r in df.collect()]
    for fmt, writer, opts in [
        ("csv", sinks.write_csv_results, {"header": True, "schema": df.schema}),
        ("json", sinks.write_json, {"schema": df.schema}),
        ("orc", sinks.write_orc, {}),
    ]:
        path = os.path.join(str(tmp_path), fmt)
        writer(df, path)
        back = sinks.read_any(spark, path, fmt, **opts).orderBy("n_nationkey")
        assert [tuple(r) for r in back.collect()] == want, fmt


def test_console_sink_smoke(spark, sf_dir, capsys):
    sinks.console_sink(small(spark, sf_dir), n=3)
    out = capsys.readouterr().out
    assert "n_nationkey" in out


def test_observation_metrics_without_extra_pass(spark, sf_dir):
    """df.observe: pipeline metrics (row counts, sums) accumulated
    DURING the sink write — at 100 TB this replaces a second
    count()/agg() scan over the output with free accumulators."""
    from pyspark.sql import functions as F
    from pyspark.sql import Observation
    from etl_pipeline_sam_gov_spark.tables import load_tables

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    obs = Observation("sink_metrics")
    observed = li.filter(F.col("l_quantity") > 10).observe(
        obs,
        F.count(F.lit(1)).alias("rows_written"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty_total"),
    )
    observed.write.format("noop").mode("overwrite").save()
    expected = li.filter(F.col("l_quantity") > 10).count()
    assert obs.get["rows_written"] == expected
    assert obs.get["qty_total"] > 0


def test_catalog_ddl_ctas_insert_roundtrip(spark, sf_dir, tmp_path):
    """Catalog surface: CTAS -> INSERT INTO -> spark.table round trip —
    the reference's Glue-crawler + Athena catalog hop (SURVEY.md S6)
    collapsed to synchronous in-engine DDL over self-describing parquet."""
    from etl_pipeline_sam_gov_spark.tables import load_tables

    load_tables(spark, sf_dir, ("nation",))
    loc = str(tmp_path / "nations_tbl")
    spark.sql("DROP TABLE IF EXISTS nations_tbl")
    spark.sql(
        f"CREATE TABLE nations_tbl USING parquet LOCATION '{loc}' "
        "AS SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10"
    )
    try:
        assert spark.table("nations_tbl").count() == 10
        spark.sql("INSERT INTO nations_tbl SELECT 99 AS n_nationkey, 'NATION_X' AS n_name")
        got = spark.table("nations_tbl")
        assert got.count() == 11
        assert got.filter("n_nationkey = 99").first()["n_name"] == "NATION_X"
        # catalog survives a fresh reader: the table IS the parquet dir
        assert spark.read.parquet(loc).count() == 11
    finally:
        spark.sql("DROP TABLE IF EXISTS nations_tbl")


import pytest


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_snapshot_sink_through_qualified_path_scheme(
    spark, sf_dir, tmp_path, scheme
):
    """S5 (object-store upload) is subsumed by the Hadoop FS path
    scheme: the SAME writer config must work through a scheme-qualified
    URI (file:// here standing in for s3a://) — committer, overwrite
    semantics, and read-back all go through the scheme-resolved
    FileSystem, which is exactly the layer an object store plugs into."""
    path = scheme + os.path.join(str(tmp_path), "snap_scheme")
    df = small(spark, sf_dir)
    sinks.write_parquet_snapshot(df, path)
    sinks.write_parquet_snapshot(df.limit(7), path)
    assert spark.read.parquet(path).count() == 7
    sinks.write_csv_results(df.limit(4), scheme + os.path.join(str(tmp_path), "csv_scheme"))
    back = spark.read.option("header", True).csv(
        scheme + os.path.join(str(tmp_path), "csv_scheme")
    )
    assert back.count() == 4


def test_merge_schema_reads_evolving_snapshots(spark, sf_dir, tmp_path):
    """Schema evolution at the storage seam: a later snapshot adds a
    column; mergeSchema=true reads the union schema with NULLs for the
    old files — the ingest contract that lets a 100 TB table evolve
    without rewriting history."""
    from pyspark.sql import functions as F

    from etl_pipeline_sam_gov_spark.tables import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    out = str(tmp_path / "evolving")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.substring("o_orderpriority", 1, 1).alias("priority_band"),
    )
    v1.write.mode("append").parquet(out)
    v2.write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "priority_band"}
    n_total = orders.count()
    assert merged.count() == n_total
    # old-snapshot rows surface the new column as NULL
    n_old = merged.filter(F.col("priority_band").isNull()).count()
    assert n_old == v1.count() > 0


def test_compact_snapshot_reduces_file_count(spark, sf_dir, tmp_path):
    """A many-file write compacts to the size-derived target count with
    identical contents; the swap leaves no temp residue."""
    import os

    from etl_pipeline_sam_gov_spark.sinks import compact_snapshot
    from etl_pipeline_sam_gov_spark.tables import load_tables

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    out = str(tmp_path / "li_fragmented")
    li.repartition(64).write.parquet(out)  # simulate micro-batch litter
    before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert before >= 64
    n_rows = li.count()
    n_after = compact_snapshot(spark, out, target_file_bytes=1 << 20)
    after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert after == n_after < before
    assert spark.read.parquet(out).count() == n_rows
    assert not os.path.exists(out + "__compacting")


def test_compact_snapshot_partitioned_respects_layout(spark, sf_dir, tmp_path):
    """Partitioned compaction keeps the hive layout, compacts per
    partition (no n_files × n_partitions blow-up from round-robin),
    preserves contents, and leaves no __compacting/__old residue."""
    import os

    from etl_pipeline_sam_gov_spark.sinks import compact_snapshot
    from etl_pipeline_sam_gov_spark.tables import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    by_yr = orders.withColumn("yr", F.year("o_orderdate"))
    out = str(tmp_path / "orders_part_frag")
    by_yr.repartition(16).write.partitionBy("yr").parquet(out)
    part_dirs = [d for d in os.listdir(out) if d.startswith("yr=")]
    assert len(part_dirs) > 1
    before = sum(
        len([f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")])
        for d in part_dirs
    )
    assert before >= 16  # fragmented: every task wrote into every partition
    n_rows = by_yr.count()
    n_after = compact_snapshot(
        spark, out, target_file_bytes=64 << 20, partition_cols=("yr",)
    )
    # whole table is far below one target file per partition → exactly
    # one file per partition, not one per (task, partition) pair
    assert n_after == len(part_dirs) < before
    back = spark.read.parquet(out)
    assert back.count() == n_rows
    assert sorted(r["yr"] for r in back.select("yr").distinct().collect()) == sorted(
        int(d.split("=")[1]) for d in part_dirs
    )
    assert "__salt" not in back.columns and "__n_salt" not in back.columns
    assert not os.path.exists(out + "__compacting")
    assert not os.path.exists(out + "__old")


def test_versioned_snapshots_retention_and_schema_evolution(spark, sf_dir, tmp_path):
    """Versioned-snapshot lifecycle: publish N versions, expire to a
    retention window (oldest deleted first, newest suffix intact),
    read the latest with mergeSchema so a column added in a later
    version surfaces as NULL-padded superset schema."""
    from pyspark.sql import functions as F

    from etl_pipeline_sam_gov_spark.sinks import (
        expire_snapshots,
        list_snapshot_versions,
        read_snapshot_version,
        write_versioned_snapshot,
    )

    root = str(tmp_path / "contracts_versions")
    base = spark.range(5).select(F.col("id").alias("k"))
    write_versioned_snapshot(base, root, "2026-08-01")
    write_versioned_snapshot(base, root, "2026-08-02")
    # schema evolves: a new column appears in the newest version
    write_versioned_snapshot(
        base.withColumn("score", F.col("k") * 2), root, "2026-08-03"
    )
    assert list_snapshot_versions(spark, root) == [
        "2026-08-01",
        "2026-08-02",
        "2026-08-03",
    ]

    expired = expire_snapshots(spark, root, keep=2)
    assert expired == ["2026-08-01"]
    assert list_snapshot_versions(spark, root) == ["2026-08-02", "2026-08-03"]

    newest = read_snapshot_version(spark, root)
    assert set(newest.columns) == {"k", "score"}
    assert newest.count() == 5

    older = read_snapshot_version(spark, root, "2026-08-02")
    assert set(older.columns) == {"k"}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        expire_snapshots(spark, root, keep=0)
