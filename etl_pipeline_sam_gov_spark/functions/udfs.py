"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

The reference's two row-wise ``.apply`` escapes (lambda_function.py:90,
102-114) are expressed as pure Catalyst expressions elsewhere
(pipeline.contracts F7/F9) — that is always the first choice. This
module is the sanctioned escape hatch for logic expressions genuinely
can't express, demonstrating each UDF class the engine supports:

- scalar ``pandas_udf``      — Arrow-vectorized, batch-at-a-time
- grouped-agg ``pandas_udf`` — UDAF-like, one value per group
- ``applyInPandas``          — grouped-map (per-group DataFrame in/out)
- ``mapInPandas``            — UDTF-like per-partition batch iterator
  (see operators.multimodal.extract_features for the production use)

All four run as ArrowEvalPython / FlatMapGroupsInPandas plan nodes:
Arrow batch transfer, ~10-100× the throughput of row-at-a-time Python
UDFs, but still off the JVM hot path — at 100 TB use them for the 1%
of logic that needs Python, never for relational work.

The demo kernels are deterministic arithmetic, so they remain
oracle-checkable: the check proves the Python path computes exactly
what the SQL semantics say.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables

# NB: explicit DataType return types — a DDL string ("double") would be
# parsed through the active SparkContext at import time, and this module
# imports before any session exists.


@F.pandas_udf(T.DoubleType())
def taxed_price(price: pd.Series, tax: pd.Series) -> pd.Series:
    """Scalar pandas UDF: vectorized arithmetic over Arrow batches."""
    return price * (1.0 + tax)


@F.pandas_udf(T.DoubleType())
def value_range(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF-like): one scalar per group."""
    return float(v.max() - v.min())


@query(
    "udf_scalar_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1.0 + l_tax), 6) AS taxed
FROM lineitem
WHERE l_quantity >= 48
""",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow UDF in a projection; the surrounding filter still
    pushes down to parquet (Python sees only surviving rows)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(F.col("l_quantity") >= 48)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(taxed_price("l_extendedprice", "l_tax"), 6).alias("taxed"),
        )
    )


@query(
    "udf_grouped_agg_pandas",
    oracle="""
SELECT user_id, event_type,
       round(max(value) - min(value), 6) AS value_spread
FROM events
GROUP BY user_id, event_type
""",
)
def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF alongside Catalyst's groupBy."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("user_id", "event_type").agg(
        F.round(value_range("value"), 6).alias("value_spread")
    )


@query(
    "udf_grouped_map_zscore",
    oracle="""
SELECT event_id, user_id,
       round((value - avg(value) OVER (PARTITION BY user_id))
             / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS zscore
FROM events
""",
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user normalization, whole group
    as a pandas DataFrame. (Expressible as a window — which is exactly
    what the oracle does — so the check pins the Python path to the
    declarative semantics. Rounded to 4: pandas ddof=1 std and the SQL
    stddev_samp agree to fp noise.)"""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu, sd = pdf["value"].mean(), pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": ((pdf["value"] - mu) / sd).round(4),
            }
        )

    return ev.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        zscore, schema="event_id long, user_id long, zscore double"
    )


@query(
    "udtf_quantity_milestones",
    oracle="""
SELECT o_orderkey, milestone,
       floor(o_totalprice * frac * 100) / 100 AS threshold
FROM orders
CROSS JOIN (VALUES ('half', 0.5), ('full', 1.0)) m(milestone, frac)
WHERE o_totalprice > 400000
""",
)
def udtf_quantity_milestones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``): a true table function — each
    input row yields multiple output rows from imperative Python. The
    kernel is deterministic arithmetic so the DuckDB LATERAL oracle
    checks it exactly. Runs as a BatchEvalPythonUDTF node: per-row
    Python, the slowest lane in the engine — reserved for logic that
    is genuinely imperative AND row-expanding; everything else uses
    explode (fn_explode_words) or mapInPandas (multimodal)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="okey bigint, milestone string, threshold double")
    class Milestones:
        def eval(self, orderkey: int, totalprice: float):
            import math

            # floor (not round): IEEE-identical in CPython and DuckDB,
            # whereas Python's half-even round() disagrees with SQL
            # half-away round() on exact .5 products
            for name, frac in (("half", 0.5), ("full", 1.0)):
                yield orderkey, name, math.floor(totalprice * frac * 100) / 100

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    big = orders.filter(F.col("o_totalprice") > 400000)
    return big.lateralJoin(
        Milestones(F.col("o_orderkey").outer(), F.col("o_totalprice").outer())
    ).select(F.col("okey").alias("o_orderkey"), "milestone", "threshold")
