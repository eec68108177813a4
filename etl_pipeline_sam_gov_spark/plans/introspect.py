"""Physical-plan introspection helpers.

The engine's scale guarantees (pushdown, broadcast, top-k, codegen,
partition pruning) are properties of the *physical plan*, not of small-
scale results — these helpers expose the plan as text so tests (and
operators' own assertions) can gate on them. Used by
``tests/test_plans.py``; usable in notebooks to audit any query:

    from etl_pipeline_sam_gov_spark.plans.introspect import explain_formatted
    print(explain_formatted(df))
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan (post-AQE if already executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text: operator tree + per-scan details
    (PushedFilters / PartitionFilters / ReadSchema)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def scan_detail(df: DataFrame, marker: str) -> str:
    """The first line following ``marker`` (e.g. "PushedFilters",
    "PartitionFilters", "ReadSchema") in the formatted plan."""
    s = explain_formatted(df)
    if marker not in s:
        return ""
    return s.split(marker, 1)[1].splitlines()[0]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_topk(df: DataFrame) -> bool:
    """True when an ORDER BY + LIMIT lowered to TakeOrderedAndProject
    (per-partition heaps + driver merge) instead of a full sort."""
    return "TakeOrderedAndProject" in physical_plan(df)


def python_in_hot_path(df: DataFrame) -> bool:
    """True if row-at-a-time Python evaluation appears in the plan —
    the thing the engine's relational paths must never do."""
    return "BatchEvalPython" in physical_plan(df)


def execution_metrics(df: DataFrame) -> dict[str, dict[str, int]]:
    """Per-operator SQL metrics of an EXECUTED DataFrame: operator name
    → {metric: value} (rows produced, shuffle bytes, spill, scan rows).
    The observability hook a perf investigation starts from — the same
    numbers the Spark UI shows, programmatically, so regression
    harnesses can assert on "bytes shuffled" rather than wall-clock.

    Run an action first (count/noop write); metrics are zero until the
    plan executes. Metric keys are Spark's internal names
    ("numOutputRows", "shuffleBytesWritten", "spillSize", ...)."""
    out: dict[str, dict[str, int]] = {}
    idx = [0]

    def walk(node):
        name = node.nodeName()
        # AQE wrapper and materialized query stages hold the real tree
        # behind accessors, not children()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            walk(node.plan())
            return
        m = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            m[str(kv._1())] = int(kv._2().value())
        if m:
            out[f"{idx[0]:03d}_{name}"] = m
        idx[0] += 1
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def total_metric(df: DataFrame, metric_key: str) -> int:
    """Sum of one metric key across all operators (e.g. "spillSize",
    "shuffleBytesWritten", "numOutputRows")."""
    return sum(
        v
        for per_op in execution_metrics(df).values()
        for k, v in per_op.items()
        if k == metric_key
    )
