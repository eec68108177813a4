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
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            # The driver's pandas stringification DISTINGUISHES -0.0
            # from 0.0; the local gate must be harsher, not laxer
            # (normalizing here is exactly what hid the r03
            # ml_kmeans_embeddings failure). Engines must emit +0.0:
            # append `+ 0.0` to the final double expression.
            raise AssertionError(
                "negative zero in output column — driver-visible; "
                "normalize the expression with `+ 0.0` on both sides"
            )
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


#: Canonical-type fragments the driver's pandas canonicalizer cannot
#: handle: list/map/struct columns crash its row sorter (`TypeError:
#: unhashable type`), DECIMAL stringifies differently per engine
#: (Spark toPandas keeps `Decimal('1')` → "1"; DuckDB .df() converts
#: to float64 → "1.0"), HUGEINT has no Spark twin. No registered
#: query may emit them (serialize arrays with concat_ws/array_to_string,
#: cast decimals to BIGINT/DOUBLE).
_DRIVER_HOSTILE = ("list<", "map<", "struct<", "decimal(", "int128")


def assert_driver_safe_types(name: str, side: str, types: dict[str, str]) -> None:
    bad = {
        c: t
        for c, t in types.items()
        if any(frag in t for frag in _DRIVER_HOSTILE)
    }
    assert not bad, (
        f"{name}: {side} output schema has driver-hostile column types {bad} "
        "— arrays/maps/structs crash the driver's pandas row sorter and "
        "DECIMAL stringifies differently across engines; serialize or cast"
    )


def _driver_cell(v, decimal_to_float: bool = False):
    """Mirror the driver's pandas-path cell stringification.

    Spark ``toPandas()`` keeps DecimalType as ``decimal.Decimal``
    objects; DuckDB ``.df()`` converts DECIMAL columns to float64 —
    that asymmetry (plus -0.0 vs 0.0 being distinct under ``str``)
    is exactly what failed fn_try_arithmetic and ml_kmeans_embeddings
    in the round-3 driver run while the collect()-path compare stayed
    green. This path is run IN ADDITION to the exact path so local
    green implies driver green.
    """
    import decimal as _dec

    if v is None:
        return "∅"
    if decimal_to_float and isinstance(v, _dec.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # repr distinguishes -0.0 from 0.0, like pandas
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_driver_cell(x, decimal_to_float) for x in v) + "]"
    return str(v)


def driver_canonical_rows(
    cols: list[str],
    rows: list[tuple],
    decimal_cols: frozenset[str] = frozenset(),
) -> list[tuple]:
    """Order-insensitive canonical form under the DRIVER's conversions:
    ``decimal_cols`` (DuckDB side only) are converted decimal→float64
    first, mirroring ``.df()``."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(_driver_cell(r[i], cols[i] in decimal_cols) for i in order)
        for r in rows
    ]
    out.sort()
    return out


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


#: (query, column) pairs where an all-NULL column is the MEANINGFUL
#: answer (e.g. "no outliers found ⇒ no first outlier id"), not a
#: vacuous hash match. Anything else all-NULL fails: two queries were
#: once certified green while a 0/0 made their whole readout NULL on
#: both engines (ab_test_proportions' saturated conversion flag;
#: ts_theil_sen_trend's double-typed median rank never matching).
ALLOWED_ALL_NULL = {
    ("dq_embedding_norm_outliers", "first_outlier_vec"),
}

#: Queries allowed to return ZERO rows at a test scale. Currently none:
#: an empty result matches any oracle that is also empty — six queries
#: (q7's nation pair, q22's and the anti join's "no orders ever",
#: EXCEPT-of-covered-sets, the dense hourly gap report, the too-coarse
#: k-anonymity QI pair) were once certified green on 0 rows; each was
#: re-parameterized to exercise real output at every fixture scale.
ALLOWED_EMPTY: set[str] = set()


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
    assert_driver_safe_types(name, "spark", s_types)
    assert_driver_safe_types(name, "duckdb", d_types)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    assert s_rows or name in ALLOWED_EMPTY, (
        f"{name}: ZERO rows at {sf_dir} — an empty result matches any "
        "empty oracle (vacuous certification); re-parameterize the query "
        "so the fixture exercises it, or declare it in ALLOWED_EMPTY "
        "with a reason"
    )
    if s_rows:
        all_null = [
            c
            for i, c in enumerate(s_cols)
            if all(r[i] is None for r in s_rows)
            and (name, c) not in ALLOWED_ALL_NULL
        ]
        assert not all_null, (
            f"{name}: column(s) {all_null} are NULL in every row — almost "
            "certainly a vacuous match (0/0, a rank that never hits, a "
            "predicate that can't fire); fix the query or declare the "
            "column in ALLOWED_ALL_NULL with a reason"
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
    # Second pass through the DRIVER's pandas-conversion semantics
    # (duckdb decimals→float64, spark decimals kept, -0.0 distinct).
    duck_decimal_cols = frozenset(
        c for c, t in d_types.items() if t.startswith("decimal(")
    )
    s_drv = driver_canonical_rows(s_cols, s_rows)
    d_drv = driver_canonical_rows(d_cols, d_rows, duck_decimal_cols)
    if s_drv != d_drv:
        diffs = [(a, b) for a, b in zip(s_drv, d_drv) if a != b][:5]
        raise AssertionError(
            f"{name}: DRIVER-path value mismatch (pandas canonicalization); "
            f"first diffs (spark vs duckdb): {diffs}"
        )
