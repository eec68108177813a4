"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, **column types** (mapped
into one canonical namespace — the round-1 driver hash-fails were all
type-representation divergences like DuckDB window-SUM HUGEINT vs Spark
BIGINT, invisible to stringified-value comparison), and values exactly
(columns sorted by name, rows sorted by stringified value — the same
order-insensitive shape the driver hashes). Exact equality here is the
local gate: if it passes here, the driver's typed hash passes too.
"""

from __future__ import annotations

import math
import os
import re

import duckdb

from etl_pipeline_sam_gov_spark.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


_DUCK_SIMPLE = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",  # no Spark equivalent — always a deliberate mismatch
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "BLOB": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def canon_duck_type(t: str) -> str:
    """DuckDB type string → canonical name shared with canon_spark_type."""
    t = t.strip()
    if t.endswith("[]"):
        return f"list<{canon_duck_type(t[:-2])}>"
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return _DUCK_SIMPLE.get(t, t.lower())


def canon_spark_type(dt) -> str:
    """Spark DataType → the same canonical namespace as canon_duck_type."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark_type(dt.elementType)}>"
    return dt.simpleString()


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; 0.0 == -0.0 normalized
        return repr(v + 0.0)
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, name: str, fn, oracle: str, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    rel = con.sql(oracle)
    d_cols = list(rel.columns)
    d_types = {c: canon_duck_type(str(t)) for c, t in zip(d_cols, rel.types)}
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    s_types = {f.name: canon_spark_type(f.dataType) for f in sdf.schema.fields}
    type_diffs = {
        c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]
    }
    assert not type_diffs, (
        f"{name}: column TYPE mismatch (spark vs duckdb): {type_diffs} — "
        "the driver's value-hash is typed; cast both sides to one type"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duckdb): {diffs}"
        )
