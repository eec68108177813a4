"""Python DataSource source tests (sources.paginated): executor-side
pagination as a real spark.read relation."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.sources.paginated import (
    PAGE_SIZE,
    _fetch_page,
    register,
)


def test_paginated_datasource_reads_all_pages(spark):
    register(spark)
    df = (
        spark.read.format("paginated_opportunities")
        .option("n_pages", "7")
        .option("pages_per_task", "3")
        .load()
    )
    assert df.count() == 7 * PAGE_SIZE
    # schema is declared, not inferred
    assert df.columns == [
        "noticeId", "title", "typeOfSetAsideDescription", "postedDate",
    ]
    # rows match the deterministic fetcher exactly
    first = df.orderBy("noticeId").first()
    assert tuple(first) == _fetch_page(0)[0]


def test_paginated_datasource_composes_with_relational_ops(spark):
    register(spark)
    df = (
        spark.read.format("paginated_opportunities")
        .option("n_pages", "4")
        .load()
    )
    veteran = df.filter(
        F.col("typeOfSetAsideDescription").contains("Veteran-Owned")
    )
    # every 3rd row carries the veteran set-aside (fetcher contract)
    assert veteran.count() == 4 * PAGE_SIZE // 3 + (1 if (4 * PAGE_SIZE) % 3 else 0)
    # limit composes (reference's MAX_RECORDS cap, lambda_function.py:49)
    assert df.limit(150).count() == 150
