"""Fixture-table loading and view registration.

All queries load their inputs through ``load_tables`` so that:

- the session is pinned to UTC + AQE before any plan is built;
- each parquet file becomes both a DataFrame and a temp view (the SQL-first
  operators use ``spark.sql`` over these names — the same names the DuckDB
  oracle harness pre-registers);
- column pruning / predicate pushdown reach the parquet scan (we hand
  Catalyst the raw ``spark.read.parquet`` scan, never a cached or
  collected intermediate).

At 100 TB these would be partitioned/bucketed catalog tables
(``spark.table``); the loader is the single seam where that swap happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_sam_gov_spark.session import configure_runtime
from etl_pipeline_sam_gov_spark.slots import session_slots

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Loaded DataFrames-with-views live under the session's "tables" slot
#: keyed (sf_dir, table) — weak-keyed per session via
#: slots.session_slots, so a dead session's entries vanish with it. A
#: driver sweep runs ~100 queries against ONE session and ONE sf_dir;
#: each parquet read costs a footer/schema round-trip and each
#: createOrReplaceTempView an analyzer call — cache them so that cost
#: is paid once per table, not once per query. DataFrames are immutable
#: logical plans, so reuse across queries is safe. The "views" slot
#: records which sf_dir each temp view currently exposes: SQL-surface
#: queries read the views, so a cache hit must still re-register the
#: view whenever the sweep switches sf_dir.


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Read the fixture parquet tables and register them as temp views."""
    configure_runtime(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        tcache = session_slots(spark).setdefault("tables", {})
        key = (sf_dir, name)
        df = tcache.get(key)
        if df is None:
            path = os.path.join(sf_dir, f"{name}.parquet")
            df = spark.read.parquet(path)
            from pyspark.sql import functions as F, types as T

            if name == "events":
                # TIMESTAMP(NANOS) arrives as long nanos (see session.py);
                # truncate to micros with exact integer division — same
                # truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP.
                # (double division would lose precision: epoch-nanos > 2^53.)
                if isinstance(df.schema["ts"].dataType, T.LongType):
                    df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            # Belt+braces for sessions where inferTimestampNTZ couldn't be
            # flipped before this read (session.py): NTZ → TIMESTAMP is a
            # no-op on the stored micros under the UTC session timezone,
            # and restores watermark/unix_micros compatibility.
            ntz = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, T.TimestampNTZType)
            ]
            for c in ntz:
                df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
            tcache[key] = df
        vowner = session_slots(spark).setdefault("views", {})
        if vowner.get(name) != sf_dir:
            df.createOrReplaceTempView(name)
            vowner[name] = sf_dir
        out[name] = df
    return out
