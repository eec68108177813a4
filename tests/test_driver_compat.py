"""Gate: no registered query may emit a driver-hostile output schema,
and the local oracle comparison must be strictly HARSHER than the
driver's pandas canonicalization.

Round 3 post-mortem (VERDICT.md): three queries passed the repo's
collect()-path exact compare but failed the driver, purely on output
typing — (a) DECIMAL stringifies as ``Decimal('1')``/"1" on the Spark
side vs float64 "1.0" after DuckDB's ``.df()`` conversion, (b) ``-0.0``
vs ``0.0`` are distinct under pandas stringification, (c) the driver's
row sorter crashes on array-typed columns (``unhashable type: 'list'``).
These tests pin each failure class against the replica in
``oracle_compare.py`` so local green ⇒ driver green; the registry-wide
enforcement rides inside ``compare()`` (run for all queries by
``test_oracle_parity.py``) plus the schema sweep below.
"""

from __future__ import annotations

import pytest

import etl_pipeline_sam_gov_spark as eng
from tests.oracle_compare import (
    _canon_cell,
    assert_driver_safe_types,
    canon_duck_type,
    driver_canonical_rows,
    duckdb_con,
)


# ---------------------------------------------------------------------------
# Failure class (a): DECIMAL output columns
# ---------------------------------------------------------------------------


def test_decimal_output_type_is_banned():
    with pytest.raises(AssertionError, match="driver-hostile"):
        assert_driver_safe_types("q", "spark", {"x": "decimal(9,0)"})


def test_driver_path_distinguishes_decimal_from_float():
    """Spark keeps Decimal('1') → "1"; DuckDB .df() floats it → "1.0".
    The driver-path canonicalizer must see them as DIFFERENT (this is
    the exact fn_try_arithmetic r03 hash failure)."""
    import decimal

    spark_side = driver_canonical_rows(["x"], [(decimal.Decimal("1"),)])
    duck_side = driver_canonical_rows(
        ["x"], [(decimal.Decimal("1"),)], frozenset({"x"})
    )
    assert spark_side == [("1",)]
    assert duck_side == [("1.0",)]
    assert spark_side != duck_side


# ---------------------------------------------------------------------------
# Failure class (b): negative zero
# ---------------------------------------------------------------------------


def test_exact_path_fails_on_negative_zero():
    with pytest.raises(AssertionError, match="negative zero"):
        _canon_cell(-0.0)


def test_driver_path_distinguishes_negative_zero():
    assert driver_canonical_rows(["x"], [(-0.0,)]) != driver_canonical_rows(
        ["x"], [(0.0,)]
    )


# ---------------------------------------------------------------------------
# Failure class (c): array/map/struct output columns
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "t", ["list<int8>", "list<string>", "map<string,int64>", "struct<a:int>"]
)
def test_nested_output_types_are_banned(t):
    with pytest.raises(AssertionError, match="driver-hostile"):
        assert_driver_safe_types("q", "spark", {"x": t})


def test_hugeint_is_banned():
    with pytest.raises(AssertionError, match="driver-hostile"):
        assert_driver_safe_types("q", "duckdb", {"x": "int128"})


# ---------------------------------------------------------------------------
# Registry-wide schema sweep (oracle side — cheap: type inference only,
# no fetch; the Spark side is enforced inside compare() for every query
# by test_oracle_parity, which executes them anyway)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", sorted(eng.ORACLES))
def test_every_oracle_schema_is_driver_safe(duck, name):
    rel = duck.sql(eng.ORACLES[name])
    types = {c: canon_duck_type(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert_driver_safe_types(name, "duckdb", types)


def test_every_query_has_an_oracle_or_declared_rows_only():
    import __spark_entry__ as entry

    undeclared = set(eng.QUERIES) - set(eng.ORACLES) - set(entry.rows_only())
    assert not undeclared, (
        f"queries with neither an oracle nor a rows_only declaration: "
        f"{sorted(undeclared)}"
    )


def test_queries_dict_is_verification_priority_ordered():
    """queries() must lead with whatever the driver most needs to
    (re-)certify: last-round failures first, then never-sampled, then
    oldest certifications — so a prefix sample burns down the tail."""
    import glob
    import json
    import os

    import __spark_entry__ as ent

    names = list(ent.queries())
    assert set(names) == set(eng.QUERIES)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        sampled.update(json.load(open(path)))
    if not sampled:
        return  # round 1: no artifacts yet, any order is fine

    def cls(n):
        if n not in sampled:
            return "never"
        row = sampled[n]
        ok = row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
        return "green" if ok else "failed"

    classes = [cls(n) for n in names]
    # all failed before any never-sampled, all never-sampled before green
    rank = {"failed": 0, "never": 1, "green": 2}
    assert [rank[c] for c in classes] == sorted(rank[c] for c in classes)
