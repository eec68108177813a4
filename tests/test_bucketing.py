"""Bucketed co-located join: the plan property that makes repeated
fact-fact joins shuffle-free at 100 TB.

Differential test: the SAME join is planned once over plain parquet
(two shuffle exchanges — one per side) and once over tables bucketed by
the join key (zero shuffle exchanges); results must be identical.
"""

from __future__ import annotations

import pytest

from etl_pipeline_sam_gov_spark.sinks import write_bucketed_table
from etl_pipeline_sam_gov_spark.tables import load_tables


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffle-based join so exchange elimination is observable
    (the fixture dims are small enough to broadcast otherwise)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_eliminates_exchanges(spark, sf_dir, tmp_path, no_broadcast):
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    write_bucketed_table(
        t["orders"], "orders_b", 8, "o_custkey", path=str(tmp_path / "ob")
    )
    write_bucketed_table(
        t["customer"], "customer_b", 8, "c_custkey", path=str(tmp_path / "cb")
    )
    try:
        joined_b = (
            spark.table("orders_b")
            .join(
                spark.table("customer_b"),
                spark.table("orders_b")["o_custkey"]
                == spark.table("customer_b")["c_custkey"],
            )
            .groupBy("c_mktsegment")
            .count()
        )
        joined_p = (
            t["orders"]
            .join(t["customer"], t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
            .groupBy("c_mktsegment")
            .count()
        )
        plan_b = _executed_plan(joined_b)
        plan_p = _executed_plan(joined_p)
        # The bucketed join itself is exchange-free: hash(key) is the
        # bucket id, so per-key co-location was persisted at write time.
        # (The post-join groupBy on a different key still exchanges —
        # count only the pre-join ones, i.e. hashpartitioning on the
        # JOIN key.)
        assert plan_b.count("Exchange hashpartitioning(o_custkey") == 0
        assert plan_b.count("Exchange hashpartitioning(c_custkey") == 0
        assert plan_p.count("Exchange hashpartitioning(o_custkey") == 1
        assert plan_p.count("Exchange hashpartitioning(c_custkey") == 1
        # identical results
        rows_b = sorted(map(tuple, joined_b.collect()))
        rows_p = sorted(map(tuple, joined_p.collect()))
        assert rows_b == rows_p and len(rows_b) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_agg_prunes_buckets_and_skips_exchange(
    spark, sf_dir, tmp_path, no_broadcast
):
    """A group-by on the bucket key runs exchange-free on the bucketed
    layout, and an equality filter on the key prunes to 1 of 4 buckets
    (the planner only keeps the bucketed scan when some operator
    exploits it — a bare filter scan reports 'disabled by query
    planner', which is correct auto-bucketed-scan behavior)."""
    t = load_tables(spark, sf_dir, ("orders",))
    write_bucketed_table(
        t["orders"], "orders_b2", 4, "o_custkey", path=str(tmp_path / "ob2")
    )
    try:
        agg = (
            spark.table("orders_b2")
            .filter("o_custkey = 7")
            .groupBy("o_custkey")
            .count()
        )
        formatted = agg._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Bucketed: true" in formatted
        assert "SelectedBucketsCount: 1 out of 4" in formatted
        assert "Exchange hashpartitioning(o_custkey" not in formatted
        assert agg.collect()[0]["count"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b2")
