"""Set operations (SURVEY.md §2.7 — the reference's only set-like op is
the driver-side page concatenation at ``lambda_function.py:47`` ≈ UNION
ALL; here is the full surface: union/unionByName, intersect, except,
distinct/dropDuplicates).

Scale notes: UNION ALL is free (plan concatenation, no shuffle);
INTERSECT / EXCEPT / DISTINCT each shuffle on the full row — at 100 TB
prefer keyed semi/anti joins over row-wise INTERSECT/EXCEPT when a key
exists, and ``dropDuplicates(keys)`` over full-row distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables


@query(
    "set_union_all_parties",
    oracle="""
SELECT party, nationkey, COUNT(*) AS n
FROM (
  SELECT 'customer' AS party, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supplier' AS party, s_nationkey AS nationkey FROM supplier
) t
GROUP BY party, nationkey
""",
)
def set_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName (name-resolved, the safe variant)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].select(
        F.lit("customer").alias("party"), F.col("c_nationkey").alias("nationkey")
    )
    s = t["supplier"].select(
        F.lit("supplier").alias("party"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("party", "nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "set_intersect_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations with both customers and
    suppliers."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@query(
    "set_except_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 9900
""",
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — nations with customers but no
    top-capitalized supplier (every nation HAS suppliers in the
    fixture, which made the original nation-minus-supplier form an
    empty — vacuously certified — result; the zero-row-audit lesson)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
        .exceptAll(
            t["supplier"]
            .filter(F.col("s_acctbal") > 9900)
            .select(F.col("s_nationkey").alias("nationkey"))
            .distinct()
        )
        .distinct()
    )


@query(
    "set_distinct_combos",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_quantity AS INT) AS qty
FROM lineitem
""",
)
def set_distinct_combos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates ≡ SELECT DISTINCT (full-row hash aggregate)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.select(
            "l_returnflag", "l_linestatus", F.col("l_quantity").cast("int").alias("qty")
        ).dropDuplicates()
    )


@query(
    "set_intersect_all_quantities",
    oracle="""
SELECT CAST(l_quantity AS INT) AS qty FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT CAST(l_quantity AS INT) FROM lineitem WHERE l_returnflag = 'R'
""",
)
def set_intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics (multiplicity = min of the two)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    qty = F.col("l_quantity").cast("int").alias("qty")
    a = li.filter(F.col("l_returnflag") == "A").select(qty)
    r = li.filter(F.col("l_returnflag") == "R").select(qty)
    return a.intersectAll(r)
