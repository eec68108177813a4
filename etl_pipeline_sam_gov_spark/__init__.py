"""etl_pipeline_sam_gov_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL pipeline (``lolearningcode/
etl-pipeline-sam-gov``, ``lambda_function.py``), generalized to a full
analytics engine designed for 100 TB scale:

- ``pipeline``   — the reference-parity contracts pipeline (ingest →
  filter → transform → rank → sink → SQL), expressed as one lazy
  Catalyst-optimizable DataFrame chain (SURVEY.md §2.1-2.11).
- ``operators``  — relational breadth: joins, aggregations, windows,
  set ops, sessionization, as-of joins, dedup, similarity search,
  text analysis, multimodal plumbing (SURVEY.md §2.3-2.7, §2.12).
- ``functions``  — scalar function library (string/date/math/json/array).
- ``streaming``  — Structured Streaming generalization of the
  reference's daily-batch-with-lookback (SURVEY.md §2.9).
- ``registry``   — the query/oracle registry that backs
  ``__spark_entry__.py`` (driver correctness contract).

Import the package to populate the registry::

    import etl_pipeline_sam_gov_spark as eng
    eng.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.01")
"""

from etl_pipeline_sam_gov_spark.registry import BASELINE_OF, ORACLES, QUERIES, query

# Importing these modules registers every query in the registry.
from etl_pipeline_sam_gov_spark.pipeline import contracts as _contracts  # noqa: F401
from etl_pipeline_sam_gov_spark.operators import (  # noqa: F401
    aggregates as _aggregates,
    analytics as _analytics,
    curation as _curation,
    dedup as _dedup,
    relational as _relational,
    setops as _setops,
    similarity as _similarity,
    text as _text,
    tpch as _tpch,
    windows as _windows,
)
from etl_pipeline_sam_gov_spark.functions import collections as _collections  # noqa: F401
from etl_pipeline_sam_gov_spark.functions import scalar as _scalar  # noqa: F401
from etl_pipeline_sam_gov_spark.functions import udfs as _udfs  # noqa: F401
from etl_pipeline_sam_gov_spark.streaming import jobs as _jobs  # noqa: F401
from etl_pipeline_sam_gov_spark.operators import multimodal as _multimodal  # noqa: F401

# ---------------------------------------------------------------------------
# Sweep ordering. The round-1 driver verified only a 50-query prefix of the
# registration order, leaving 64 queries without a hard CORRECTNESS signal
# (VERDICT.md "What's missing" #1). Registration order is therefore a
# verification-priority queue: families with NO driver-green row yet go
# first, so a budget-limited sweep always reaches the least-verified code.
# Already-green round-1 queries re-verify last. Stable within each family
# (module registration order).
# ---------------------------------------------------------------------------

#: Queries with a green driver CORRECTNESS row in round 1 (CORRECTNESS_r01).
_R1_VERIFIED = frozenset({
    "contracts_transform", "contracts_flagship", "agg_customer_stats",
    "agg_distinct_counts", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_pivot_status", "agg_having_large_orders", "agg_percentiles",
    "agg_approx_sketches", "agg_stats_bivariate", "agg_salted_heavy_hitters",
    "agg_unpivot_melt", "agg_time_rollup_events", "agg_collect_sorted_brands",
    "agg_argmax_orders", "agg_regression_mode_bools", "sessionize_events",
    "asof_join_purchase_click", "asof_join_with_tolerance",
    "join_interval_overlap_incidents", "dedup_exact", "dedup_fingerprint",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_simhash_blocked", "dedup_embedding_cosine",
    "dedup_cluster_components", "curate_split_train_holdout",
    "curate_pack_token_shards", "curate_sample_source_mixture",
    "pipeline_training_corpus", "q1_pricing_summary", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier", "q13_customer_distribution",
    "join_anti_inactive_customers", "join_full_outer_nation_activity",
    "join_range_quantity_bands", "join_cross_region_status",
    "join_null_safe_nation_groups", "sort_offset_pagination",
    "join_salted_skewed_orders", "merge_incremental_upsert",
    "set_union_all_parties", "set_intersect_nations", "set_except_nations",
})

_FAMILY_ORDER = (
    "windows", "functions", "tpch", "udfs", "text", "similarity",
    "streaming", "multimodal", "setops", "other",
)


def _family(name: str) -> str:
    import re as _re

    if name.startswith("window_"):
        return "windows"
    if name.startswith("fn_"):
        return "functions"
    if _re.match(r"q\d+_", name):
        return "tpch"
    if name.startswith(("udf_", "udtf_")):
        return "udfs"
    if name.startswith("text_") or name == "pipeline_corpus_curation":
        return "text"
    if name.startswith("ann_") or name == "agg_embedding_centroids":
        return "similarity"
    if name.startswith("stream_"):
        return "streaming"
    if name.startswith("multimodal_"):
        return "multimodal"
    if name.startswith("set_"):
        return "setops"
    return "other"


def _reorder_registry() -> None:
    ranked = sorted(
        QUERIES,
        key=lambda n: (n in _R1_VERIFIED, _FAMILY_ORDER.index(_family(n))),
    )  # sorted() is stable: ties keep module registration order
    for reg in (QUERIES, ORACLES):
        ordered = {n: reg[n] for n in ranked if n in reg}
        reg.clear()
        reg.update(ordered)


_reorder_registry()

__all__ = ["QUERIES", "ORACLES", "BASELINE_OF", "query"]
