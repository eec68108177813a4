"""Query/oracle registry backing the driver contract (``__spark_entry__.py``).

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string run
against the same parquet tables. The driver compares the two at sf=0.01
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates go through exact decimal arithmetic or a final
  ``round()`` so both engines produce bit-identical doubles;
- timestamps are emitted as formatted strings or ``unix_micros`` ints
  (DuckDB ``epoch_us``) — never raw timestamps, to stay timezone-proof.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Deliberately non-scalable ground-truth twins: query name → the
#: registered scale-path variant that is the engine's production answer
#: for the same problem. A baseline stays registered (it shares its
#: oracle with the twin, PROVING the twin's blocking/bucketing loses
#: nothing) but must never be mistaken for the serving plan.
BASELINE_OF: dict[str, str] = {}


def query(
    name: str,
    oracle: Optional[str] = None,
    baseline_of: Optional[str] = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as its DuckDB SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator
    (streaming stateful ops, approximate sketches); the driver then runs
    a weaker rows-only check.

    ``baseline_of="x"`` marks this query as the exact-but-O(n²)/(Q×N)
    ground-truth twin of scale-path query ``x`` — kept registered so
    the pair stays oracle-green together, never the production path.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if baseline_of is not None:
            BASELINE_OF[name] = baseline_of
        return fn

    return deco
