"""Aggregation breadth (SURVEY.md §2.4).

The reference's only aggregate is a scalar row count
(``lambda_function.py:211,230``); this module provides the grouped /
multi-dimensional / approximate aggregation surface. Catalyst plans all
of these as partial (map-side) + final aggregation automatically —
the map-side combine is what keeps shuffle volume proportional to group
cardinality, not row count, at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.functions.exact import davg, dec2, dsum, sql_davg, sql_dsum
from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables


@query(
    "agg_customer_stats",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_dsum('c_acctbal')} AS sum_acctbal,
       {sql_davg('c_acctbal')} AS avg_acctbal,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_acctbal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_acctbal,
       COUNT(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count/sum/avg/min/max/countDistinct in one pass.
    count(distinct) triggers Catalyst's expand+two-phase rewrite."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "sum_acctbal"),
        davg("c_acctbal", "avg_acctbal"),
        F.min(dec).cast("double").alias("min_acctbal"),
        F.max(dec).cast("double").alias("max_acctbal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@query(
    "agg_distinct_counts",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count(distinct) over one group — Catalyst expands to a
    grouping-id union then re-aggregates (the 'expand' operator)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag, status) → (flag) → ()."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        # bigint: Spark grouping() is TINYINT, DuckDB's is BIGINT.
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")


@query(
    "agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k grouping combinations."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_extendedprice')} AS sum_price, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (same Catalyst Expand
    operator as rollup/cube)."""
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_pivot_status",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS "F",
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS "O"
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (explicit values keep the plan
    single-pass; value-discovery pivot needs an extra job)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )


@query(
    "agg_having_large_orders",
    oracle=f"""
SELECT c_name, o_orderkey, {sql_dsum('l_quantity')} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, o_orderkey
HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
""",
)
def agg_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join + group + HAVING (post-aggregation filter)."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(qty.cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


@query(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       round(CAST(stddev_samp(l_quantity) AS DOUBLE), 6) AS sd_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + sample stddev. (Quantities are
    small integers, so round(6) absorbs engine-side fp association
    noise in the stddev merge.)"""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
    )


@query(
    "agg_approx_sketches",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS parts_within_bound,
       TRUE AS orders_within_bound,
       TRUE AS median_within_bound
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB workhorses. HyperLogLog++
    distinct counts and quantile sketches run in O(1) memory per group
    where exact distinct would shuffle every key.

    Sketch *estimates* are engine-specific, so they can't hash-match a
    DuckDB oracle directly. Instead the query emits the exact values
    (oracle-checked the normal way) plus one boolean per sketch
    asserting the estimate landed within its published error bound —
    3·rsd for HLL++ (99.7% band), 2% value tolerance for the quantile
    sketch at accuracy 10000. The oracle pins those booleans to TRUE,
    so a broken sketch fails the hash even though the estimate itself
    is engine-local."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # THREE separate scans joined on the 3-row group key, NOT one agg:
    # mixing multiple DISTINCT aggregates with buffer-based percentile
    # aggregates in a single groupBy forces an Expand (row-multiplying)
    # plan that degrades to object/sort aggregation — measured 60s vs
    # ~3s for the split at sf0.1 (a 20x plan-shape cliff, not data cost).
    exact = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("ap"),  # default rsd 0.05
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("ao"),
        F.percentile_approx("l_extendedprice", 0.5).alias("am"),
    )
    exact_pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("em"),
    )
    agg = exact.join(F.broadcast(sketches), "l_returnflag").join(
        F.broadcast(exact_pct), "l_returnflag"
    )
    within = (
        lambda est, exact, tol: (
            F.abs(F.col(est) - F.col(exact)) <= F.col(exact) * tol
        )
    )
    return agg.select(
        "l_returnflag",
        "n",
        "exact_parts",
        "exact_orders",
        within("ap", "exact_parts", 0.15).alias("parts_within_bound"),
        within("ao", "exact_orders", 0.03).alias("orders_within_bound"),
        within("am", "em", 0.02).alias("median_within_bound"),
    )


@query(
    "agg_stats_bivariate",
    oracle="""
SELECT l_returnflag,
       round(CAST(corr(l_quantity, l_extendedprice) AS DOUBLE), 6) AS corr_qty_price,
       round(CAST(covar_samp(l_quantity, l_extendedprice) AS DOUBLE), 4) AS covar_qty_price,
       round(CAST(var_samp(l_quantity) AS DOUBLE), 6) AS var_qty,
       round(CAST(stddev_pop(l_discount) AS DOUBLE), 8) AS sd_disc
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats_bivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate/statistical aggregates: corr, covar, variance, stddev —
    single-pass Welford-style merges (partial + final), rounded to absorb
    merge-order fp association noise between engines."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_discount"), 8).alias("sd_disc"),
    )


@query(
    "agg_salted_heavy_hitters",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation: l_returnflag has only 3 values, so a
    naive groupBy routes a third of a 100 TB table to one reducer. The
    salted two-phase plan — groupBy(key, salt) partial → groupBy(key)
    merge — spreads each hot key over 16 reducers, then merges 16 rows
    per key. Results are provably identical (count/sum/max are
    associative-decomposable); the oracle is the plain GROUP BY."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    salt = (F.crc32(F.col("l_orderkey").cast("string")) % 16).alias("salt")
    partial = (
        li.select("l_returnflag", "l_quantity", "l_extendedprice", salt)
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("psum"),
            F.max(F.col("l_extendedprice").cast("decimal(18,2)")).alias("pmax"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("sum_qty"),
        F.max("pmax").cast("double").alias("max_price"),
    )


@query(
    "agg_unpivot_melt",
    oracle="""
SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
FROM (
  SELECT c_custkey,
         CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
         CAST(c_nationkey AS DECIMAL(18,2)) AS nation
  FROM customer
) t
UNPIVOT (val FOR metric IN (acctbal, nation))
""",
)
def agg_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — wide→long reshape (the inverse of agg_pivot_status).
    A zero-shuffle row expansion, like explode but column-driven."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    return (
        cust.select(
            "c_custkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("acctbal"),
            F.col("c_nationkey").cast("decimal(18,2)").alias("nation"),
        )
        .unpivot("c_custkey", ["acctbal", "nation"], "metric", "val0")
        .select("c_custkey", "metric", F.col("val0").cast("double").alias("val"))
    )


@query(
    "agg_time_rollup_events",
    oracle="""
SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
       coalesce(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'), 'ALL') AS hour,
       COUNT(*) AS n,
       round(SUM(value), 6) AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
""",
)
def agg_time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: hour→day→grand-total continuous
    aggregate in one ROLLUP pass (Catalyst expands grouping sets into a
    single Expand + hash-agg — one shuffle for all three resolutions).
    The 100 TB serving pattern materializes this to a parquet table
    partitioned by day (sinks.write_partitioned_snapshot)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.select(
            F.date_trunc("day", "ts").alias("d"),
            F.date_trunc("hour", "ts").alias("h"),
            "value",
        )
        .rollup("d", "h")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.coalesce(F.date_format("d", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
            F.coalesce(F.date_format("h", "yyyy-MM-dd HH:mm:ss"), F.lit("ALL")).alias("hour"),
            "n",
            "total_value",
        )
    )


@query(
    "agg_collect_sorted_brands",
    oracle="""
SELECT p_type,
       array_to_string(list_sort(list_distinct(list(p_brand))), ',') AS brands,
       COUNT(DISTINCT p_brand) AS n_brands
FROM part
GROUP BY p_type
""",
)
def agg_collect_sorted_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + array_sort emitted as a joined string: collection
    aggregates are inherently order-nondeterministic across partitions —
    sorting before emission is what makes them comparable (and
    reproducible run-to-run at any cluster size)."""
    part = load_tables(spark, sf_dir, ("part",))["part"]
    return part.groupBy("p_type").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("p_brand"))).alias("brands"),
        F.countDistinct("p_brand").alias("n_brands"),
    )


@query(
    "agg_argmax_orders",
    oracle="""
SELECT o_orderpriority,
       arg_max(o_orderkey, o_totalprice + o_orderkey / 1e9) AS biggest_order,
       arg_min(o_orderkey, o_totalprice - o_orderkey / 1e9) AS smallest_order,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax): the key at the extremum without a
    self-join or window. The epsilon key-fraction makes the ordering
    total, so ties can't produce engine-dependent winners."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    up = F.col("o_totalprice") + F.col("o_orderkey") / F.lit(1e9)
    down = F.col("o_totalprice") - F.col("o_orderkey") / F.lit(1e9)
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", up).alias("biggest_order"),
        F.min_by("o_orderkey", down).alias("smallest_order"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("max_price"),
    )


@query(
    "agg_regression_mode_bools",
    oracle="""
SELECT l_returnflag,
       round(CAST(regr_slope(l_extendedprice, l_quantity) AS DOUBLE), 4) AS price_per_qty,
       round(CAST(regr_intercept(l_extendedprice, l_quantity) AS DOUBLE), 4) AS price_base,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_obs,
       CAST(mode(l_linestatus) AS VARCHAR) AS common_status,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_regression_mode_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope/intercept/count), mode, and
    boolean aggregates (every/any) — single-pass merges like the
    bivariate stats family. mode on this data is unambiguous (one
    clear winner per group), so both engines agree deterministically."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_qty"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("price_base"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_obs"),
        F.mode("l_linestatus").alias("common_status"),
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


@query(
    "agg_key_skew_profile",
    oracle="""
WITH g AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       MAX(n) AS max_group,
       round(quantile_cont(n, 0.5), 6) AS p50_group,
       round(quantile_cont(n, 0.99), 6) AS p99_group,
       round(MAX(n) / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 6) AS skew_ratio
FROM g
""",
)
def agg_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiling — the diagnostic a 100 TB pipeline runs BEFORE
    choosing a join/agg strategy (broadcast vs salt vs AQE skew split):
    per-key group sizes reduced to count/max/quantiles/skew-ratio. Two
    narrow-ish aggregations: the per-key count shuffles once on the key
    with map-side combine; the profile reduces those ~|keys| rows to a
    single row."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    g = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    avg = F.sum("n") / F.count(F.lit(1))
    return g.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_group"),
        F.round(F.expr("percentile(n, 0.5)"), 6).alias("p50_group"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_group"),
        F.round(F.max("n") / avg, 6).alias("skew_ratio"),
    )


@query(
    "agg_sketch_merge_rollup",
    oracle="""
WITH per_flag AS (
  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS d
  FROM lineitem GROUP BY l_returnflag
),
total AS (SELECT COUNT(DISTINCT l_orderkey) AS d FROM lineitem)
SELECT CAST((SELECT COUNT(*) FROM per_flag) AS BIGINT) AS n_groups,
       (SELECT d FROM total) AS exact_total_distinct,
       TRUE AS merged_within_bound
""",
)
def agg_sketch_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Apache DataSketches HLL, Spark 4): build
    one HLL sketch per group, then UNION the binary sketches and
    estimate the combined distinct count — the pre-aggregation pattern
    that makes distinct counts feasible at 100 TB (daily sketch tables
    a few KB each, any date-range distinct answered by unioning
    sketches, never rescanning events). The estimate is validated
    against the exact distinct via an oracle-pinned error-bound
    boolean (HLL lgK=12 → ~2.4% within the 3-sigma band; 5% bound
    used), same technique as agg_approx_sketches."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    sketches = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = sketches.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    exact = li.agg(F.count_distinct("l_orderkey").alias("exact_total_distinct"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_groups",
        "exact_total_distinct",
        (
            F.abs(F.col("merged_est") - F.col("exact_total_distinct"))
            <= F.col("exact_total_distinct") * 0.05
        ).alias("merged_within_bound"),
    )


HIST_BINS = 8
HIST_LO, HIST_HI = 0.0, 80_000.0  # o_totalprice domain at every sf


@query(
    "agg_histogram_prices",
    oracle=f"""
SELECT CAST(CASE WHEN o_totalprice < {HIST_LO} THEN 0
            WHEN o_totalprice >= {HIST_HI} THEN {HIST_BINS} + 1
            ELSE FLOOR((o_totalprice - {HIST_LO})
                       / (({HIST_HI} - {HIST_LO}) / {HIST_BINS})) + 1
       END AS BIGINT) AS bucket,
       COUNT(*) AS n,
       round(MIN(o_totalprice), 2) AS lo,
       round(MAX(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
""",
)
def agg_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via ``width_bucket`` — the dashboarding /
    data-profiling primitive: one scan, one partial-combined aggregate
    on at most bins+2 keys (under/overflow buckets included), so the
    shuffle is constant-size at any corpus scale. The oracle models
    width_bucket with explicit floor arithmetic (DuckDB lacks the
    function); bucket boundaries are exact doubles so both engines
    bin identically."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    bucket = F.expr(
        f"width_bucket(o_totalprice, {HIST_LO}, {HIST_HI}, {HIST_BINS})"
    ).cast("bigint")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "agg_mad_outliers",
    oracle="""
WITH med AS (SELECT user_id, median(value) AS med FROM events GROUP BY user_id),
dev AS (
  SELECT e.user_id, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (user_id)
),
mad AS (SELECT user_id, median(adev) AS mad FROM dev GROUP BY user_id)
SELECT d.user_id,
       COUNT(*) AS n_events,
       round(MIN(d.med), 6) AS med,
       round(MIN(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN round(d.adev - 3 * m.mad, 6) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (user_id)
GROUP BY d.user_id
""",
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier detection via Median Absolute Deviation
    — the data-profiling / anomaly-gate primitive that, unlike
    z-scores, a single corrupted value cannot skew. Three grouped
    passes (median → MAD → flag count), every one keyed on user_id, so
    each reshuffle re-uses the same hash partitioning and the per-group
    state is two scalars — no per-user value materialization beyond
    the scan. Both engines interpolate even-count medians identically
    ((a+b)/2 in IEEE double); the outlier comparison goes through the
    repo's round(6) convention so a last-ulp difference in 3*mad can't
    flip a flag."""
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "user_id", "value"
    )
    med = ev.groupBy("user_id").agg(F.median("value").alias("med"))
    dev = ev.join(med, "user_id").select(
        "user_id", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("user_id").agg(F.median("adev").alias("mad"))
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                (F.round(F.col("adev") - 3 * F.col("mad"), 6) > 0).cast("int")
            ).cast("bigint").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable Apache DataSketches surfaces (Spark 4): theta set algebra,
# KLL quantiles, approx-top-k — the sketch-table patterns that replace
# full rescans at 100 TB. Estimates are engine-local, so each query
# validates the sketch against exact companions the oracle checks
# (same technique as agg_approx_sketches / agg_sketch_merge_rollup).
# ---------------------------------------------------------------------------


@query(
    "agg_theta_sketch_audiences",
    oracle="""
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 120),
     b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 60)
SELECT (SELECT count(*) FROM a)::BIGINT AS n_a,
       (SELECT count(*) FROM b)::BIGINT AS n_b,
       (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))::BIGINT AS exact_union,
       (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))::BIGINT AS exact_intersect,
       (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))::BIGINT AS exact_diff,
       TRUE AS union_within_bound,
       TRUE AS intersect_within_bound,
       TRUE AS diff_within_bound
""",
)
def agg_theta_sketch_audiences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over two user audiences (high-value
    clickers vs purchasers): union / intersection / difference
    cardinalities computed entirely on compact binary sketches — the
    audience-overlap pattern that at 100 TB answers "how many users in
    A but not B" from two KB-sized sketch rows instead of re-shuffling
    user_id sets. Each population aggregates to ONE sketch (map-side
    partial-merged); the set operations are scalar expressions on the
    two binaries. Estimates are validated against exact companions
    within a 5% band (theta lgK=12 is exact below ~4K distinct, so at
    fixture scale the estimates ARE the exact counts)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    a = ev.filter((F.col("event_type") == "click") & (F.col("value") > 120)).agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk_a"),
        F.count_distinct("user_id").alias("n_a"),
    )
    b = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 60)).agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk_b"),
        F.count_distinct("user_id").alias("n_b"),
    )
    both = a.crossJoin(F.broadcast(b))
    est = both.select(
        "n_a",
        "n_b",
        F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").alias("est_u"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").alias(
            "est_i"
        ),
        F.expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))").alias("est_d"),
    )
    exact = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .select(
            "user_id",
            ((F.col("event_type") == "click") & (F.col("value") > 120)).alias("ia"),
            ((F.col("event_type") == "purchase") & (F.col("value") > 60)).alias(
                "ib"
            ),
        )
        .groupBy("user_id")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
        .agg(
            F.sum((F.col("ia") | F.col("ib")).cast("bigint")).alias("exact_union"),
            F.sum((F.col("ia") & F.col("ib")).cast("bigint")).alias(
                "exact_intersect"
            ),
            F.sum((F.col("ia") & ~F.col("ib")).cast("bigint")).alias("exact_diff"),
        )
    )

    def within(est_col: str, exact_col: str):
        return F.abs(F.col(est_col) - F.col(exact_col)) <= F.greatest(
            F.lit(1.0), F.col(exact_col) * 0.05
        )

    return est.crossJoin(F.broadcast(exact)).select(
        "n_a",
        "n_b",
        "exact_union",
        "exact_intersect",
        "exact_diff",
        within("est_u", "exact_union").alias("union_within_bound"),
        within("est_i", "exact_intersect").alias("intersect_within_bound"),
        within("est_d", "exact_diff").alias("diff_within_bound"),
    )


@query(
    "agg_kll_quantile_merge",
    oracle="""
SELECT (SELECT count(DISTINCT event_type) FROM events)::BIGINT AS n_groups,
       (SELECT count(*) FROM events)::BIGINT AS n_events,
       TRUE AS q50_rank_within_bound,
       TRUE AS q95_rank_within_bound
""",
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL quantile sketches: one sketch per event_type, the
    five binaries folded into a single corpus sketch with
    ``kll_sketch_merge_double`` (the daily-sketch-table rollup — any
    date-range quantile from KB-sized sketches, never rescanning), then
    q50/q95 extracted from the merged sketch. KLL compaction is
    randomized, so the estimates themselves are not run-stable; what IS
    guaranteed is rank accuracy (~1.65% at k=200). The query therefore
    computes each estimate's TRUE rank exactly against the corpus and
    asserts it lies within ±5% of the requested rank — booleans the
    oracle pins to TRUE."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    merged = (
        ev.groupBy("event_type")
        .agg(
            F.expr("kll_sketch_agg_double(value)").alias("sk"),
            F.count(F.lit(1)).alias("n"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n").alias("n_events"),
            F.expr(
                "REDUCE(collect_list(sk), CAST(NULL AS BINARY),"
                " (acc, x) -> CASE WHEN acc IS NULL THEN x"
                " ELSE kll_sketch_merge_double(acc, x) END)"
            ).alias("msk"),
        )
        .select(
            "n_groups",
            "n_events",
            F.expr("kll_sketch_get_quantile_double(msk, 0.5)").alias("q50"),
            F.expr("kll_sketch_get_quantile_double(msk, 0.95)").alias("q95"),
        )
    )
    # max(), not first(): the cross-joined columns are constant on
    # every row (1-row broadcast), so both are exact — but first() is
    # nondeterministic by API and max() costs the same, the r8
    # generalization of the ADVICE fix at graph.py's PageRank rounds.
    ranked = ev.crossJoin(F.broadcast(merged)).agg(
        F.max("n_groups").alias("n_groups"),
        F.max("n_events").alias("n_events"),
        (F.sum((F.col("value") <= F.col("q50")).cast("bigint")) / F.max("n_events"))
        .alias("r50"),
        (F.sum((F.col("value") <= F.col("q95")).cast("bigint")) / F.max("n_events"))
        .alias("r95"),
    )
    return ranked.select(
        "n_groups",
        "n_events",
        (F.abs(F.col("r50") - 0.5) <= 0.05).alias("q50_rank_within_bound"),
        (F.abs(F.col("r95") - 0.95) <= 0.05).alias("q95_rank_within_bound"),
    )


@query(
    "agg_approx_topk_merge",
    oracle="""
SELECT event_type AS item, count(*)::BIGINT AS n
FROM events
GROUP BY event_type
""",
)
def agg_approx_topk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-top-k heavy hitters through the mergeable accumulate →
    combine → estimate pipeline: per-shard sketches (modeling per-day /
    per-partition sketch tables) combined into one, then the top items
    extracted. With maxItemsTracked far above the distinct-item count
    the space-saving sketch is in its exact regime, so the estimates
    hash-match the exact GROUP BY oracle; past capacity the counts
    degrade gracefully to ±n/maxItemsTracked — the documented trade at
    real cardinalities. Complements agg_salted_heavy_hitters (exact,
    shuffle-heavy) as the sketch-sized alternative."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    shards = ev.groupBy((F.col("user_id") % 8).alias("shard")).agg(
        F.expr("approx_top_k_accumulate(event_type, 100)").alias("st")
    )
    # coalesce(1) before the combine: the sketch relation is BOUNDED
    # (one row per shard), and Spark 4.1's ApproxTopKCombine crashes
    # serializing the partial buffer of an EMPTY input partition — the
    # buffer's item type is still null and genSketchSerDe MatchErrors.
    # AQE masks it by coalescing the tiny post-accumulate shuffle to
    # one partition; with AQE off (or any plan leaving empty
    # partitions under the combine) the query dies. One partition for
    # a |shards|-row relation is also the natural merge shape at any
    # corpus size. A SENTINEL sketch (a NUL-prefixed item no event_type
    # can be, filtered from the estimate) unions in so the combine's
    # partition is non-empty even on an EMPTY corpus — without it the
    # all-empty case hits the same serialize crash; the sentinel's
    # count-1 entry occupies one of 100 sketch slots and cannot
    # perturb the other estimates in the exact regime.
    sentinel = "\x00sentinel"
    seed = (
        spark.range(1)
        .select(F.lit(sentinel).alias("item"))
        .agg(F.expr("approx_top_k_accumulate(item, 100)").alias("st"))
    )
    return (
        shards.select("st")
        .unionAll(seed)
        .coalesce(1)
        .agg(F.expr("approx_top_k_combine(st)").alias("st"))
        .select(F.expr("inline(approx_top_k_estimate(st, 10))"))
        # Null-safe: a plain != would also drop a NULL item row if the
        # sketch ever tracked nulls. Caveat: at a count-1 tie exactly on
        # the top-10 boundary the sentinel's count-1 entry can displace
        # a genuine count-1 item — outside the exact regime this query
        # operates in (every event_type count ≫ 1), but stated here.
        .filter(~F.col("item").eqNullSafe(sentinel))
        .select(F.col("item"), F.col("count").cast("bigint").alias("n"))
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5
    ``bitmap_*`` family) — the bitmap-index technique warehouses use
    when ``COUNT(DISTINCT)`` must be exact but the naive plan (shuffle
    every raw value, dedup, count) is too wide. Keys bucket by
    ``bitmap_bucket_number`` (32768 positions per bucket) and each
    (group, bucket) partial is a fixed ≤4 KB bitmap with the key's bit
    set; partial aggregation ORs bitmaps map-side, so the shuffle
    carries one bounded bitmap per (group, bucket) instead of one row
    per raw value — with popcounts summed per group at the end. Exact
    by construction (a bit per distinct key), which is why the oracle
    is plain COUNT(DISTINCT): the bitmap plan must reproduce it bit
    for bit. Two shuffles ((type, bucket) then type — the second over
    popcount scalars only); compare count-distinct's expand-or-double-
    shuffle of raw values.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_bucket = (
        ev.groupBy(
            "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
        )
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(
            F.sum(F.bitmap_count("bm")).alias("n_users"),
            F.sum("n").alias("n_events"),
        )
    )


@query(
    "agg_bitmap_rollup_daily",
    oracle="""
WITH ev AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id FROM events
),
daily AS (SELECT day, COUNT(DISTINCT user_id) AS n_daily FROM ev GROUP BY day),
fs AS (SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY user_id),
cum AS (
  SELECT d.day, COUNT(*) AS n_cum
  FROM fs JOIN (SELECT DISTINCT day FROM ev) d ON fs.first_day <= d.day
  GROUP BY d.day
)
SELECT daily.day, daily.n_daily, cum.n_cum
FROM daily JOIN cum ON daily.day = cum.day
""",
)
def agg_bitmap_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style distinct rollup over time from MERGEABLE
    partials: per-day exact distinct users AND the running cumulative
    distinct through each day, both answered from per-(day, bucket)
    bitmaps — raw events are read ONCE to build the partials; every
    rollup after that merges bitmaps (bitmap_or_agg) without touching
    a raw row again. This is the continuous-aggregate pattern: a
    100 TB event store keeps ~KB of bitmap per (day, bucket), and any
    time-range distinct (day, week, arbitrary span) is a popcount
    over OR-merged partials — compare the naive plan, which re-scans
    and re-shuffles every raw event per window. The prefix fan-out
    joins the |days|×|buckets| partial relation, never the corpus;
    exactness (vs HLL's ±2%) is the bitmap family's selling point,
    which is why the oracle is plain COUNT(DISTINCT) + a first-seen
    prefix count."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    base = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    partials = base.groupBy(
        "day", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    daily = partials.groupBy("day").agg(
        F.sum(F.bitmap_count("bm")).alias("n_daily")
    )
    days = partials.select("day").distinct()
    cum = (
        partials.alias("p")
        .join(F.broadcast(days).alias("d"), F.col("p.day") <= F.col("d.day"))
        .groupBy(F.col("d.day").alias("day"), F.col("p.bucket"))
        .agg(F.bitmap_or_agg(F.col("p.bm")).alias("bm"))
        .groupBy("day")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_cum"))
    )
    return daily.join(cum, "day")


# ---------------------------------------------------------------------------
# Hierarchical time-bucket rollup from mergeable partials
# ---------------------------------------------------------------------------

M5_US = 300_000_000  #: 5-minute bucket in epoch-micros
HOUR_BUCKETS = 12  #: 5-min buckets per hour


@query(
    "agg_hypertable_rollup",
    oracle=f"""
SELECT ((epoch_us(ts) // {M5_US}) // {HOUR_BUCKETS}) * 3600000000 AS hour_us,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum("value")} AS total_value,
       round({sql_dsum("value")} / COUNT(*), 6) AS avg_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY hour_us, event_type
""",
)
def agg_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate hierarchy (the TimescaleDB "hypertable
    rollup" pattern): raw events aggregate into 5-minute partials
    (count / exact-decimal sum / min / max — all MERGEABLE), and the
    hourly level is computed by merging those partials, never by
    re-reading raw rows. The oracle aggregates straight from raw
    events, PROVING the partial-merge is lossless — the property that
    lets a 100 TB pipeline maintain day/month rollups incrementally
    from the 5-minute tier at a fraction of the re-scan cost.

    Scale shape: level 1 is one partial-combined groupBy on (bucket,
    type); level 2 re-aggregates the rollup-sized relation (orders of
    magnitude smaller than raw). Exact decimal sums make the merged
    result bit-identical to the direct aggregation regardless of merge
    order — the same associativity argument that makes the partial
    tier valid at all."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    b5 = F.expr(f"unix_micros(ts) div {M5_US}")
    m5 = ev.groupBy(b5.alias("b5"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2("value")).alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    total = F.sum("sv")
    return (
        m5.groupBy(
            F.expr(f"(b5 div {HOUR_BUCKETS}) * 3600000000").alias("hour_us"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            total.cast("double").alias("total_value"),
            F.round(total.cast("double") / F.sum("n"), 6).alias("avg_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# ANALYZE-style table profile (CBO statistics collection)
# ---------------------------------------------------------------------------

#: (column, render kind) — render picks a cross-engine-stable string
#: form for min/max (doubles via DECIMAL(18,2), timestamps formatted).
_PROFILE_COLS = (
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def _sql_render(expr: str, kind: str) -> str:
    """Render an ALREADY-AGGREGATED value to an engine-stable string.

    Aggregation happens on the NATIVE column and the render wraps the
    result — rendering first would make int/num min/max lexicographic
    (e.g. max l_orderkey '999' beating 1499), silently wrong for the
    CBO/data-skipping stats this profile exists to produce."""
    if kind == "num":
        return f"CAST(CAST({expr} AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "ts":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({expr} AS VARCHAR)"


def _spark_render(expr, kind: str):
    """Spark twin of _sql_render; ``expr`` is an aggregated Column."""
    if kind == "num":
        return expr.cast("decimal(18,2)").cast("string")
    if kind == "ts":
        return F.date_format(expr, "yyyy-MM-dd HH:mm:ss")
    return expr.cast("string")


@query(
    "agg_table_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {_sql_render(f"MIN({c})", k)} AS min_value,
       {_sql_render(f"MAX({c})", k)} AS max_value
FROM lineitem"""
        for c, k in _PROFILE_COLS
    ),
)
def agg_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style statistics collection: per-column null
    count, exact NDV, and min/max — the stats a cost-based optimizer
    (join reordering, broadcast decisions) and a data-skipping index
    both feed on. The reference's remote engine got these from the
    Glue crawler (SURVEY.md S6); here they are one in-engine scan.

    Scale shape: one column-pruned scan PER COLUMN, each collapsing to
    its distinct-value relation first (groupBy(col) — partial hash
    aggregation makes the exchange value-sized, not row-sized), from
    which all four stats derive: NDV = non-null row count, null count
    = the NULL group's multiplicity, min/max over the values. The 11
    single-row profiles union together. The previous single-pass form
    (11 count_distincts in one agg) planned a 12-way Expand — every
    fact row replicated 12x through one shuffle — and went 4.9x
    super-linear at the 4x stress step (18.7 s → 91.4 s); the
    per-column form's scans prune to one parquet column each and its
    exchanges carry only distinct values. Spark's own ANALYZE swaps
    exact NDV for HLL partials at warehouse scale, which
    agg_sketch_merge_rollup already demonstrates. Min/max aggregate on
    the NATIVE column (numeric/timestamp ordering) and only the
    aggregated result renders to an engine-stable string (exact
    decimals / formatted timestamps) — rendering before aggregating
    would give lexicographic extrema."""
    from functools import reduce

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    parts = []
    for c, k in _PROFILE_COLS:
        dist = li.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        parts.append(
            dist.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("v").isNull(), F.col("cnt")).otherwise(
                            F.lit(0)
                        )
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_nulls"),
                F.count("v").cast("bigint").alias("n_distinct"),
                _spark_render(F.min("v"), k).alias("min_value"),
                _spark_render(F.max("v"), k).alias("max_value"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


# ---------------------------------------------------------------------------
# Percentile winsorization (robust feature clipping)
# ---------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


@query(
    "fn_winsorize_values",
    oracle=f"""
WITH bounds AS (
  SELECT event_type,
         round(quantile_cont(value, {WINSOR_LO}), 6) AS lo,
         round(quantile_cont(value, {WINSOR_HI}), 6) AS hi
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_type, b.lo, b.hi,
         CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS clip_hi,
         least(greatest(e.value, b.lo), b.hi) AS v
  FROM events e JOIN bounds b USING (event_type)
)
SELECT event_type, lo, hi,
       CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_low,
       CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_high,
       round(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS winsorized_mean
FROM clipped GROUP BY event_type, lo, hi
""",
)
def fn_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each event's value to its type's [p5, p95]
    band — the robust-statistics feature-prep step that tames heavy
    tails before model fitting (vs dropping outliers, which biases
    counts). Percentiles are Spark's exact linear-interpolated
    ``percentile`` (== DuckDB ``quantile_cont``), rounded to 6 decimals
    BEFORE clipping so the comparison boundary is engine-stable; the
    clipped mean sums exact decimals (clipped values are 2-decimal data
    or the 6-decimal bound — both exactly representable).

    Scale shape: one aggregation for the per-type bounds (exact
    percentile sorts within the aggregation buffer — at 100 TB swap in
    approx_percentile or the KLL lane), broadcast back onto the scan,
    one final partial-combined aggregation."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    bounds = ev.groupBy("event_type").agg(
        F.round(F.expr(f"percentile(value, {WINSOR_LO})"), 6).alias("lo"),
        F.round(F.expr(f"percentile(value, {WINSOR_HI})"), 6).alias("hi"),
    )
    v = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.sum((F.col("value") < F.col("lo")).cast("bigint")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("value") > F.col("hi")).cast("bigint")).alias(
                "n_clipped_high"
            ),
            F.round(
                F.sum(v.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
    )


_GBA_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ALL
"""


@query("agg_group_by_all", oracle=_GBA_SQL)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 3.4+/4.x, DuckDB-compatible): the
    analyst-ergonomics form that infers the grouping set as every
    non-aggregate select item — here (returnflag, linestatus,
    ship_year). The analyzer resolves ALL before optimization, so the
    plan is byte-identical to the explicit GROUP BY: partial-combined
    hash aggregation on three low-cardinality keys, quantity summed as
    exact decimals. The same SQL text runs verbatim on both engines —
    the capability under test is the resolution rule itself (grouping
    by the aliased ``ship_year`` expression, not the raw column)."""
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_GBA_SQL)


_FILTERED_AGG_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_qty,
       CAST(count_if(l_quantity >= 30) AS BIGINT) AS n_bulk,
       CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (WHERE l_shipdate >= TIMESTAMP '1996-01-01'), 0.0)
            AS DOUBLE) AS recent_revenue
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_filtered_aggregates", oracle=_FILTERED_AGG_SQL)
def agg_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FILTER (WHERE …)`` aggregate clauses + ``count_if`` — the
    SQL:2003 conditional-aggregation surface that replaces the
    CASE-WHEN-inside-SUM idiom: several differently-filtered measures
    share ONE scan and ONE hash-aggregate (each filter gates its own
    accumulator update), instead of one pass per condition. The same
    SQL text runs verbatim on both engines; money sums go through
    exact decimals, and the possibly-empty filtered sum is COALESCEd
    so an all-filtered group yields 0.0, not NULL, identically."""
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_FILTERED_AGG_SQL)


# ---------------------------------------------------------------------------
# Approximate query processing: hash-sample estimator with a pinned
# error bound
# ---------------------------------------------------------------------------

from etl_pipeline_sam_gov_spark.operators.dedup import _sql_hash60

AQP_BUCKETS = 10  # 1-in-10 deterministic hash sample
AQP_REL_TOL = 0.05


@query(
    "agg_aqp_sample_estimate",
    oracle=f"""
WITH keyed AS (
  SELECT l_extendedprice,
         {_sql_hash60("l_orderkey || '-' || l_linenumber")} % {AQP_BUCKETS} AS b
  FROM lineitem
),
s AS (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * {AQP_BUCKETS} AS DOUBLE)
           AS est_revenue,
         CAST(COUNT(*) AS BIGINT) AS n_sample
  FROM keyed WHERE b = 0
),
x AS (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS exact_revenue,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM lineitem
)
SELECT n_total, n_sample, est_revenue, exact_revenue,
       abs(est_revenue - exact_revenue) <= {AQP_REL_TOL} * exact_revenue
         AS within_tol
FROM s CROSS JOIN x
""",
)
def agg_aqp_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing (AQP): estimate total revenue from
    a deterministic 1-in-{AQP_BUCKETS} hash sample, Horvitz-Thompson
    scaled — the interactive-dashboard / query-planning shortcut that
    reads 10% of a 100 TB fact table instead of all of it. The md5
    bucket on the row key makes BOTH engines draw the IDENTICAL sample
    (the curation-family reproducible-sampling contract), so the
    estimate itself hash-matches exactly; the estimator's QUALITY is
    pinned by an oracle-checked relative-error bound against the exact
    scan (the agg_approx_sketches technique: the driver certifies the
    error claim, not just the arithmetic).

    Scale shape: the sample aggregation's scan prunes 90% of rows at
    the map side (hash-filter before any exchange); both sums are
    exact-decimal, scaled by an integer, rendered once as double. In
    production the exact leg is dropped and only the sample leg runs —
    here it exists to make the error bound checkable."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    from etl_pipeline_sam_gov_spark.operators.dedup import _spark_hash60

    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    keyed = li.select(
        "l_extendedprice", (_spark_hash60(key) % AQP_BUCKETS).alias("b")
    )
    s = keyed.filter(F.col("b") == 0).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            * AQP_BUCKETS
        )
        .cast("double")
        .alias("est_revenue"),
        F.count(F.lit(1)).alias("n_sample"),
    )
    x = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("exact_revenue"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return s.crossJoin(F.broadcast(x)).select(
        "n_total",
        "n_sample",
        "est_revenue",
        "exact_revenue",
        (
            F.abs(F.col("est_revenue") - F.col("exact_revenue"))
            <= AQP_REL_TOL * F.col("exact_revenue")
        ).alias("within_tol"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation with md5-derived
# hash rows (engine-neutral, like the MinHash/LSH determinism contract)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # independent hash rows; P(overestimate) decays per row
CMS_WIDTH = 256  # buckets per row; expected collision load = n_items/width


@query(
    "agg_count_min_sketch",
    oracle=f"""
WITH hrows AS (SELECT unnest(range({CMS_DEPTH})) AS i),
cells AS (
  SELECT h.i,
         ('0x' || substr(md5(h.i || ':' || e.user_id), 1, 15))::BIGINT
           % {CMS_WIDTH} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events e CROSS JOIN hrows h
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM events GROUP BY user_id
),
probes AS (
  SELECT x.user_id, x.exact_count, h.i,
         ('0x' || substr(md5(h.i || ':' || x.user_id), 1, 15))::BIGINT
           % {CMS_WIDTH} AS bucket
  FROM exact x CROSS JOIN hrows h
)
SELECT p.user_id, p.exact_count,
       MIN(c.c) AS cms_estimate,
       MIN(c.c) - p.exact_count AS overestimate
FROM probes p JOIN cells c ON p.i = c.i AND p.bucket = c.bucket
GROUP BY p.user_id, p.exact_count
""",
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) frequency
    estimation over the event stream, certified against exact counts:
    CMS_DEPTH md5-derived hash rows × CMS_WIDTH buckets, estimate =
    min over rows of the hit bucket's counter — overestimate-only by
    construction (the query emits each item's slack, never negative).

    The sketch build IS the distributed merge: groupBy(i, bucket) with
    map-side partial combine means every partition builds a local CMS
    and the shuffle adds counters cell-wise — exactly how mergeable
    sketches ship between executors, and the reason the sketch relation
    (≤ DEPTH×WIDTH rows) is broadcastable to the probe side. Hashes
    derive from md5 (the dedup module's determinism contract), so both
    engines build bit-identical sketches and the certification is an
    exact integer match, not a tolerance band. Scale shape: the build
    is one explode(DEPTH) flatMap + one partial-combined groupBy; the
    probe side joins item-count rows against the broadcast sketch."""
    from etl_pipeline_sam_gov_spark.operators.dedup import _spark_hash60

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hrows = F.explode(
        F.array(*[F.lit(i) for i in range(CMS_DEPTH)])
    ).alias("i")
    cell = _spark_hash60(
        F.concat(F.col("i").cast("string"), F.lit(":"),
                 F.col("user_id").cast("string"))
    ) % CMS_WIDTH
    cells = (
        ev.select("user_id", hrows)
        .select("i", cell.alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    probes = exact.select("user_id", "exact_count", hrows).select(
        "user_id", "exact_count", "i", cell.alias("bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "user_id",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias(
                "overestimate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Exact weighted median (lower weighted median, integer weights)
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_median",
    oracle="""
WITH w AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
g AS (
  SELECT l_returnflag, price_c, CAST(SUM(wt) AS BIGINT) AS wt
  FROM w GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, price_c, wt,
         CAST(SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY price_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
         CAST(SUM(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
  FROM g
),
hit AS (
  SELECT l_returnflag, price_c, tw,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY price_c) AS rn
  FROM cum WHERE cw * 2 >= tw
)
SELECT l_returnflag, CAST(tw AS BIGINT) AS total_weight,
       price_c AS weighted_median_cents
FROM hit WHERE rn = 1
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted (lower) median: the smallest price whose
    cumulative quantity weight reaches half the group's total — the
    robust central-tendency statistic when rows carry multiplicity
    (per-unit price weighted by units sold), which plain
    percentile-of-rows gets wrong. Entirely exact int64: prices
    centize, weights are integer quantities, and the half-total test
    is ``2·cumw ≥ totw`` (no division, no float percentile
    interpolation — the lower-median convention makes the answer a
    DATA value, deterministic by construction).

    Scale shape: the corpus collapses to the (group, price) domain in
    one partial-combined groupBy FIRST; the cumulative-weight window
    and the first-hit selection run on that bounded domain relation,
    sharing its (group)-keyed exchange — never a row-level sort of
    the fact table."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    g = (
        li.select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("price_c"),
            F.col("l_quantity").cast("bigint").alias("wt"),
        )
        .groupBy("l_returnflag", "price_c")
        .agg(F.sum("wt").cast("bigint").alias("wt"))
    )
    run = (
        W.partitionBy("l_returnflag")
        .orderBy("price_c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    whole = W.partitionBy("l_returnflag")
    cum = g.select(
        "l_returnflag",
        "price_c",
        F.sum("wt").over(run).cast("bigint").alias("cw"),
        F.sum("wt").over(whole).cast("bigint").alias("tw"),
    )
    rn = F.row_number().over(
        W.partitionBy("l_returnflag").orderBy("price_c")
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("tw").alias("total_weight"),
            F.col("price_c").alias("weighted_median_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Exponential (power-of-two) histogram — latency/value distribution
# ---------------------------------------------------------------------------


@query(
    "agg_exponential_histogram",
    oracle="""
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE o_totalprice > 0
),
bucketed AS (
  SELECT CAST(len(bin(c)) - 1 AS INT) AS bucket, c FROM cents
),
agg AS (
  SELECT bucket,
         CAST(1 AS BIGINT) << bucket AS lo_cents,
         (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi_cents,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sum_cents
  FROM bucketed GROUP BY bucket
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM agg)
SELECT a.bucket, a.lo_cents, a.hi_cents, a.n, a.sum_cents,
       round(CAST(a.n AS DOUBLE) / t.nt, 6) + 0.0 AS share,
       round(CAST(SUM(a.n) OVER (ORDER BY a.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / t.nt, 6) + 0.0 AS cum_share
FROM agg a CROSS JOIN tot t
""",
)
def agg_exponential_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two exponential histogram of order values — the
    log-bucketed distribution readout behind latency SLO dashboards
    and heavy-tail monitoring (HdrHistogram / OpenTelemetry
    exponential histograms use exactly this bucket law: fixed relative
    error, ~60 buckets cover int64). Emits per-bucket bounds, count,
    exact sum, share, and cumulative share.

    Bucket index = bit length of the integer cents minus one — a
    STRING-length computation over the binary rendering, never
    floor(log2(double)): libm rounding at power-of-two boundaries is
    not an engine contract, binary digit count is. The cumulative
    window runs over the ≤64-row bucket relation.

    Scale shape: one partial-combined groupBy on a bounded key —
    histogram cost is one scan regardless of table size, and the
    bucket relation merges trivially across 100 TB of partitions (the
    mergeability that makes this THE distributed histogram)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = orders.filter(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c")
    )
    bucketed = cents.select(
        (F.length(F.bin("c")) - 1).cast("int").alias("bucket"), "c"
    )
    agg = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sum_cents"),
    )
    tot = agg.agg(F.sum("n").cast("bigint").alias("nt"))
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket)").alias("lo_cents"),
            (
                F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1)") - 1
            ).alias("hi_cents"),
            "n",
            "sum_cents",
            (F.round(F.col("n").cast("double") / F.col("nt"), 6) + F.lit(0.0)).alias(
                "share"
            ),
            (
                F.round(
                    F.sum("n").over(w).cast("double") / F.col("nt"), 6
                )
                + F.lit(0.0)
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# Per-nation Gini coefficient of customer spend (inequality profile)
# ---------------------------------------------------------------------------


@query(
    "agg_gini_customer_spend",
    oracle="""
WITH rev AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT c.c_nationkey AS nation, rev.r,
         row_number() OVER (PARTITION BY c.c_nationkey
                            ORDER BY rev.r, rev.ck) AS rk
  FROM rev JOIN customer c ON c.c_custkey = rev.ck
)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(r) AS BIGINT) AS spend_cents,
       round(CAST(2 * SUM(rk * r) - (COUNT(*) + 1) * SUM(r) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * SUM(r)), 6) + 0.0 AS gini
FROM ranked GROUP BY nation
""",
)
def agg_gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend within each nation — the
    standard inequality summary a marketplace-health dashboard tracks
    (0 = every customer spends alike, →1 = one whale is the market).
    Uses the rank formulation G = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)
    over spend sorted ascending, which needs one ordered pass instead
    of the all-pairs |xᵢ−xⱼ| definition.

    Determinism: spend is exact int64 cents; the rank's tie order is
    fixed by (r, custkey); numerator is exact int64 arithmetic (2·S₁
    and (n+1)·S₀ stay well inside int64 at any registered scale) and
    only the final division is floating point, with identical operand
    order in both engines (+0.0 normalizes a zero-inequality nation's
    −0.0). Scale shape: one partial-combined groupBy collapses orders
    to per-customer cents, one equi-join attaches the nation label,
    and the ranking window partitions by nation. Honest limit: nation
    cardinality is fixed (25), so each window task sorts ~|customers|/25
    rows — fine at any bench scale and parallel across nations, but at
    100 TB a per-nation sort is the bottleneck; the mitigation is the
    curation shard-packer's two-phase rank (range-partition spend
    within nation, local row_number, broadcast per-shard offsets),
    which trades one window for a rangepartition + map-side offset
    add. The scorecard is a |nations|-row rollup."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    rev = (
        t["orders"]
        .select(
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("r"),
        )
        .groupBy("ck")
        .agg(F.sum("r").cast("bigint").alias("r"))
    )
    ranked = rev.join(
        t["customer"].select(
            F.col("c_custkey").alias("ck"),
            F.col("c_nationkey").alias("nation"),
        ),
        "ck",
    ).select(
        "nation",
        "r",
        F.row_number()
        .over(W.partitionBy("nation").orderBy("r", "ck"))
        .alias("rk"),
    )
    n = F.count(F.lit(1))
    s0 = F.sum("r")
    s1 = F.sum(F.col("rk") * F.col("r"))
    return ranked.groupBy("nation").agg(
        n.cast("bigint").alias("n_customers"),
        s0.cast("bigint").alias("spend_cents"),
        (
            F.round(
                (2 * s1 - (n + 1) * s0).cast("double")
                / (n.cast("double") * s0),
                6,
            )
            + F.lit(0.0)
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# ROLLUP with GROUPING_ID: machine-readable subtotal levels
# ---------------------------------------------------------------------------


@query(
    "agg_grouping_id_rollup",
    oracle="""
SELECT r.r_name, n.n_name,
       CAST(GROUPING(r.r_name, n.n_name) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acct_cents
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""",
)
def agg_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with an explicit GROUPING_ID — the machine-readable
    subtotal discriminator: a NULL region in plain rollup output is
    ambiguous (real NULL key vs subtotal row); the grouping bitmask
    (first rollup column = most significant bit, identical convention
    in Spark and DuckDB, verified: detail=0, per-region=1, grand=3)
    lets a report consumer route each row without guessing — the
    contract OLAP cubes and BI tools actually depend on, completing
    the rollup/cube/grouping-sets family (agg_rollup, agg_cube,
    agg_grouping_sets emit the levels; this emits their identity).

    Scale shape: two broadcastable dim joins under AQE, one
    partial-combined rollup (Spark expands grouping sets map-side);
    money sums are exact int64 cents."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "region"))
    joined = (
        t["customer"]
        .join(
            t["nation"],
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            t["region"],
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("acct_cents"),
    )


# ---------------------------------------------------------------------------
# Modern aggregate surface: count_if / bool_and / bool_or / max_by / min_by
# ---------------------------------------------------------------------------


@query(
    "agg_modern_surface",
    oracle="""
WITH base AS (
  SELECT event_type, event_id, user_id, value,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_big,
       bool_and(value > 0) AS all_positive,
       bool_or(user_id % 3 = 0) AS any_refund_user,
       CAST(arg_max(event_id, cents * 1000000000 + event_id) AS BIGINT)
         AS top_value_event,
       CAST(arg_min(event_id, cents * 1000000000 + event_id) AS BIGINT)
         AS bottom_value_event
FROM base GROUP BY event_type
""",
)
def agg_modern_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern SQL aggregate surface in one scorecard: conditional
    counting without CASE scaffolding (count_if / FILTER), boolean
    quantifiers (bool_and/bool_or — "EVERY row" / "ANY row" as
    aggregates), and argmax/argmin row selection (max_by/min_by ↔
    DuckDB arg_max/arg_min) — the functions that replaced the
    sum(CASE…) idiom and the self-join-for-argmax anti-pattern
    (agg_argmax_orders shows the window formulation; this is the
    aggregate-function one, both certified).

    Determinism: the max_by/min_by ordering key is made UNIQUE by
    construction (cents·10⁹ + event_id — cents bounded far below 10⁹,
    event_id unique), so tie-breaking semantics — the classic
    cross-engine argmax trap — never engage. All outputs are exact
    ints/booleans from one partial-combined pass."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    key = cents * F.lit(1_000_000_000) + F.col("event_id")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_if(F.col("value") > 100).cast("bigint").alias("n_big"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("user_id") % 3 == 0).alias("any_refund_user"),
        F.max_by(F.col("event_id"), key).cast("bigint").alias(
            "top_value_event"
        ),
        F.min_by(F.col("event_id"), key).cast("bigint").alias(
            "bottom_value_event"
        ),
    )


# ---------------------------------------------------------------------------
# Higher central moments: skewness and excess kurtosis per event type
# ---------------------------------------------------------------------------


@query(
    "agg_higher_moments",
    oracle="""
WITH cents AS (
  SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS c FROM events
),
mu AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc
  FROM cents GROUP BY 1
),
centered AS (
  SELECT c.t, m.n,
         CAST(c.c AS DOUBLE) - CAST(m.sc AS DOUBLE) / m.n AS d
  FROM cents c JOIN mu m ON m.t = c.t
),
mom AS (
  SELECT t, n,
         SUM(d * d) / n AS m2,
         SUM(d * d * d) / n AS m3,
         SUM(d * d * d * d) / n AS m4
  FROM centered GROUP BY t, n
)
SELECT t AS event_type, n,
       round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 4) + 0.0 AS skewness,
       round(m4 / (m2 * m2) - 3.0, 4) + 0.0 AS excess_kurtosis
FROM mom
""",
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of each event type's
    value distribution — the shape diagnostics (asymmetry, tail
    weight) that mean/variance summaries miss and that decide whether
    a z-score control band (ts_anomaly_rolling_z) is even meaningful.
    Deliberately NOT the engines' built-in skewness()/kurtosis() —
    their bias-correction conventions differ between engines, the
    classic silent cross-engine trap — but the explicit population
    moments m_k = Σ(x−μ)^k/n computed in a TWO-PASS plan: exact
    integer mean per group first (broadcast back), then centered
    power sums, so the catastrophic cancellation of the raw-moment
    one-pass formula (Σx⁴ − …) never happens.

    Determinism: μ is a ratio of exact int64s; centered deviations
    and their powers are doubles with identical operand order,
    summed per group (partial-combined; addition-order ulps absorbed
    by round(4) on O(1)-magnitude standardized ratios); sqrt is
    correctly rounded. Scale shape: two partial-combined passes over
    the scan, one broadcastable |types|-row mean relation between
    them."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cents = ev.select(
        F.col("event_type").alias("t"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    mu = cents.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
    )
    d = F.col("c").cast("double") - F.col("sc").cast("double") / F.col("n")
    centered = cents.join(F.broadcast(mu), "t").select(
        "t", "n", d.alias("d")
    )
    mom = centered.groupBy("t", "n").agg(
        (F.sum(F.col("d") * F.col("d")) / F.col("n")).alias("m2"),
        (F.sum(F.col("d") * F.col("d") * F.col("d")) / F.col("n")).alias("m3"),
        (
            F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d"))
            / F.col("n")
        ).alias("m4"),
    )
    s2 = F.sqrt(F.col("m2"))
    return mom.select(
        F.col("t").alias("event_type"),
        "n",
        (F.round(F.col("m3") / (s2 * s2 * s2), 4) + F.lit(0.0)).alias(
            "skewness"
        ),
        (
            F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0, 4)
            + F.lit(0.0)
        ).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation via count-min inner products
# ---------------------------------------------------------------------------


def _join_card_sql(hash60, gen_rows) -> str:
    """ONE SQL text (hash + generator spellings aside): build one
    count-min sketch per join side, estimate |A ⋈ B| as the MIN over
    hash rows of the sketches' bucket-wise inner product (Alon-
    Matias-Szegedy / Cormode-Muthukrishnan join-size bound — an
    overestimate with probability 1), and certify against the exact
    size computed per-key."""
    h = hash60("h.i || ':' || CAST(user_id AS {t})")
    return f"""
WITH hrows AS (SELECT {gen_rows} AS i),
p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id FROM events WHERE event_type = 'click'),
pcells AS (
  SELECT h.i, {h} % {CMS_WIDTH} AS b, CAST(COUNT(*) AS BIGINT) AS n
  FROM p CROSS JOIN hrows h GROUP BY 1, 2
),
ccells AS (
  SELECT h.i, {h} % {CMS_WIDTH} AS b, CAST(COUNT(*) AS BIGINT) AS n
  FROM c CROSS JOIN hrows h GROUP BY 1, 2
),
ip AS (
  SELECT pc.i, CAST(SUM(pc.n * cc.n) AS BIGINT) AS dot
  FROM pcells pc JOIN ccells cc ON pc.i = cc.i AND pc.b = cc.b
  GROUP BY pc.i
),
est AS (SELECT CAST(MIN(dot) AS BIGINT) AS estimate FROM ip),
peru AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS nc
  FROM events GROUP BY user_id
),
truth AS (SELECT CAST(SUM(np * nc) AS BIGINT) AS true_size FROM peru)
SELECT t.true_size, e.estimate,
       round(CAST(e.estimate - t.true_size AS DOUBLE) / t.true_size, 6)
         AS rel_overestimate,
       e.estimate >= t.true_size AS bound_holds
FROM truth t CROSS JOIN est e
"""


@query(
    "agg_join_size_estimate",
    oracle=_join_card_sql(
        lambda e: "('0x' || substr(md5(" + e.format(t="VARCHAR") + "), 1, 15))::BIGINT",
        f"unnest(range({CMS_DEPTH}))",
    ),
)
def agg_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE ESTIMATION from per-side count-min sketches — the
    cost-based-optimizer statistic that decides broadcast vs shuffle
    vs skew mitigation BEFORE running a join: |A ⋈_k B| is estimated
    as min over hash rows of Σ_b cmA[r][b]·cmB[r][b] (the AMS/CM
    inner-product bound, overestimate-only), here for the
    purchases ⋈ clicks self-join on user_id whose true size Σ np·nc
    is skew-dominated — exactly the case where a naive
    |A|·|B|/ndv estimate fails. The exact size rides along and the
    query emits the certified bound_holds verdict plus relative slack.

    The sketches reuse the engine's mergeable count-min build (one
    partial-combined groupBy per side — each partition sketches
    locally, the shuffle merges cell-wise); the inner product joins
    two ≤ DEPTH×WIDTH cell relations. ONE SQL text drives both engines
    (md5 spelling + row generator aside); everything is exact int64
    until the final slack ratio."""
    load_tables(spark, sf_dir, ("events",))
    return spark.sql(
        _join_card_sql(
            lambda e: (
                "CAST(conv(substring(md5("
                + e.format(t="STRING")
                + "), 1, 15), 16, 10) AS BIGINT)"
            ),
            f"explode(sequence(0, {CMS_DEPTH - 1}))",
        )
    )
