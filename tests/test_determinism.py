"""Partition-count invariance: results must be IDENTICAL (not just
close) when the shuffle partitioning changes — that is what the exact
decimal aggregation + md5-derived hashing + explicit tiebreakers buy.
At 100 TB, AQE re-plans partition counts at runtime per stage; a query
whose output drifts with partitioning is silently non-deterministic in
production. Representative queries from each family run under the
session default (32) and again under 7 shuffle partitions."""

from __future__ import annotations

import pytest

import etl_pipeline_sam_gov_spark as eng
from oracle_compare import canonical_rows

REPRESENTATIVE = [
    "q1_pricing_summary",        # decimal aggregation
    "q9_product_type_profit",    # multi-join + year grouping
    "q21_sole_returning_supplier",  # semi/anti self-joins + top-k
    "dedup_minhash_lsh",         # hash pipeline + band join
    "ann_ivf_topk",              # vector math + rank windows
    "merge_incremental_upsert",  # full-outer upsert
    "pipeline_training_corpus",  # running sums over hash-sampled rows
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_under_shuffle_partitioning(spark, sf_dir, name):
    df = eng.QUERIES[name](spark, sf_dir)
    base = canonical_rows(df.columns, [tuple(r) for r in df.collect()])
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        df7 = eng.QUERIES[name](spark, sf_dir)
        alt = canonical_rows(df7.columns, [tuple(r) for r in df7.collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert base == alt, f"{name} output depends on shuffle partitioning"
