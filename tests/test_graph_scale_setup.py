"""The corpus-scale setup swap (SPARK_GRAFT_SCALE_SETUP=1) must be
executable code with hash-identical output, not a prose recipe.

The two deliberate one-time |V|-row setup broadcasts (PageRank's and
the random walk's dst_deg attach, operators/graph.py _attach_dst_deg)
keep the cache's hash(src) layout via a broadcast build at fixture
scale; at 100 TB the env flag swaps in a shuffle join on dst plus an
explicit repartition("src"). These tests pin (a) the swap actually
changes the physical setup plan (no broadcast of the degree table,
an explicit src re-exchange) and (b) the query results are
row-for-row identical under both shapes.
"""

from __future__ import annotations

import pytest

from oracle_compare import canonical_rows

import etl_pipeline_sam_gov_spark as eng
from etl_pipeline_sam_gov_spark.operators.graph import _attach_dst_deg


def _fresh(name):
    fn = eng.QUERIES[name]
    return getattr(fn, "__wrapped__", fn)


def _rows(df):
    return canonical_rows(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize(
    "name", ["graph_pagerank_bipartite", "graph_random_walks"]
)
def test_scale_setup_swap_is_hash_identical(spark, sf_dir, name, monkeypatch):
    base = _rows(_fresh(name)(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_SETUP", "1")
    swapped = _rows(_fresh(name)(spark, sf_dir))
    assert len(base) > 0 and base == swapped, (
        f"{name}: scale-setup swap changed the result"
    )


def test_scale_setup_swap_changes_the_setup_plan(spark, monkeypatch):
    rel = spark.range(0, 200).selectExpr(
        "id % 20 as src", "(id * 7) % 20 as dst", "id % 3 as idx"
    ).repartition("src")
    deg = rel.groupBy("src").count().withColumnRenamed("count", "deg")

    committed = _attach_dst_deg(rel, deg, ("src",))
    plan_b = committed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b, plan_b

    monkeypatch.setenv("SPARK_GRAFT_SCALE_SETUP", "1")
    scaled = _attach_dst_deg(rel, deg, ("src",))
    plan_s = scaled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_s, plan_s
    # the degree table is exchanged on dst (never shipped whole) and
    # the layout is restored by an explicit src re-exchange
    assert "hashpartitioning(src" in plan_s, plan_s

    assert _rows(committed) == _rows(scaled)
    committed.unpersist()
    scaled.unpersist()
