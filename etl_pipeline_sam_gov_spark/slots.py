"""Per-session bounded cache slots for persisted relations.

Iterative operators (PageRank, k-core, BPE induction, prefix-sum
packing, shared-scan dedup ...) persist per-invocation relations and
must release the PREVIOUS invocation's entries BEFORE persisting
plan-identical new ones (Spark's CacheManager matches cache entries by
logical-plan equality, so an unpersist after the new persist would
evict the new entry too). Those slots live here, in ONE
WeakKeyDictionary keyed on the SparkSession OBJECT — never id(spark):
CPython reuses ids after GC, so an id key could alias a dead session's
slot onto a new session (the stale unpersist would then raise against
a stopped context) while the strong value reference pinned the dead
session's JVM-side state alive in the meantime (ADVICE r05; the same
weak-keyed pattern registry.py's prepared-plan cache uses).
"""

from __future__ import annotations

import weakref

from pyspark.sql import SparkSession

_SLOTS: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def session_slots(spark: SparkSession) -> dict:
    """The session's mutable slot dict (created on first use).

    Keys are operator-chosen tuples/strings; values are persisted
    DataFrames (or tuples of them) the next invocation releases.
    """
    try:
        return _SLOTS.setdefault(spark, {})
    except TypeError:  # non-weakref-able session stub in unit tests
        return {}
