"""Exact-arithmetic helpers for oracle-stable aggregates.

Summing doubles is order-dependent: Spark's partial/final aggregation
tree and DuckDB's scan order associate additions differently, so raw
``sum(double)`` can differ in the last ulp between engines — enough to
break an exact value-hash. The fixture money columns all carry ≤2
decimal places, so we sum them as ``decimal`` (exact, associative, and
identical in both engines) and cast the final result to double. Ratios
and averages divide two already-identical numbers, which is again
bit-deterministic.

This is also the right call at 100 TB: decimal partial aggregation is
JVM-native (no Python), stays inside whole-stage codegen, and makes
results reproducible across cluster sizes and AQE re-plans — a property
plain double sums do not have.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: str | Column) -> Column:
    """A ≤2-decimal money/ratio column as an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum, emitted as double."""
    return F.sum(dec2(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Exact-sum / count average, emitted as double (bit-deterministic)."""
    return (F.sum(dec2(col)).cast("double") / F.count(F.lit(1))).alias(alias)


#: Spark-side revenue term: l_extendedprice * (1 - l_discount), exact.
def revenue_term() -> Column:
    return dec2("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec2("l_discount").cast("decimal(3,2)"))


def revenue_sum(alias: str = "revenue") -> Column:
    return F.sum(revenue_term()).cast("double").alias(alias)


#: DuckDB-side equivalents (keep in lockstep with the Spark expressions).
SQL_DEC = "CAST({c} AS DECIMAL(18,2))"
SQL_REVENUE_TERM = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2)))"
)
SQL_REVENUE_SUM = f"CAST(SUM({SQL_REVENUE_TERM}) AS DOUBLE)"


def sql_dsum(c: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_davg(c: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"
