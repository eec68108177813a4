"""Join breadth + TPC-H-style multi-table queries (SURVEY.md §2.3).

The reference's only join is a 3-row dict-lookup enrichment
(``lambda_function.py:94-99`` — a degenerate broadcast hash join); this
module provides the full join surface an analytics engine needs:
inner / left / full-outer / left-semi / left-anti / cross / non-equi
range joins, plus the multi-join aggregation pipelines (TPC-H Q1/Q3/
Q4/Q5/Q13 shapes) that exercise them at scale.

Scale notes (100 TB):

- Broadcast policy: explicit ``F.broadcast`` hints are pinned ONLY on
  bounded-cardinality sides — ``region``/``nation`` (constant), literal
  band tables, 1-row scalar aggregates, top-k results. Scale-class
  tables (``customer``, ``supplier``, ``part``, and anything derived
  from them) carry NO hint: at small SF the planner still broadcasts
  them from size estimates, and at 100 TB AQE can demote to a shuffle
  join instead of OOMing executors on a pinned 10-TB build side.
- Fact-fact joins (``orders`` ⋈ ``lineitem``) shuffle on the join key;
  both sides hash-partition on ``orderkey``, and AQE skew-join splits
  oversized partitions. On a real warehouse these tables would be
  bucketed by orderkey so the shuffle disappears entirely.
- Aggregations after joins reuse Catalyst's partial (map-side) + final
  aggregation; nothing here materializes an intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.functions.exact import (
    SQL_REVENUE_SUM,
    davg,
    dec2,
    dsum,
    revenue_sum,
    sql_davg,
    sql_dsum,
)
from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {SQL_REVENUE_SUM} AS sum_disc_price,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → grouped
    partial+final aggregation. The widest-used agg pattern; exact
    decimal sums keep it hash-stable (see functions.exact)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            revenue_sum("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {SQL_REVENUE_SUM} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem →
    grouped revenue → top-10 (TakeOrderedAndProject). The customer side
    is deliberately un-hinted — size-based planning broadcasts it at
    small SF, AQE demotes it at customer-table scale."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t["orders"]
        .filter(F.col("o_orderdate") < cutoff)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["lineitem"].filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue_sum("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join (no row duplication,
    the build side deduplicates inside the hash join)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    big_items = t["lineitem"].filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(big_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q5_local_supplier",
    oracle=f"""
SELECT n_name, {SQL_REVENUE_SUM} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. The constant dims (region ⋈
    nation) are pinned broadcasts; customer and supplier sides are
    un-hinted so the planner sizes them — the only mandatory shuffles
    are the fact-side repartitions (orders ⋈ lineitem on orderkey) and
    the final small groupBy."""
    t = load_tables(
        spark, sf_dir, ("region", "nation", "customer", "supplier", "orders", "lineitem")
    )
    nations = (
        t["region"]
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = t["customer"].join(
        F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey")
    )
    ords = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        t["lineitem"]
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(revenue_sum("revenue"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
) t
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with a join-time predicate (the
    predicate must NOT filter unmatched left rows), double aggregation."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") != "P"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "join_anti_inactive_customers",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_inactive
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c_mktsegment
""",
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (null-safe, unlike NOT IN) —
    customers with no RECENT order (the filtered-right-side anti
    join; "no order ever" is empty in this fixture, which certified
    the original form only vacuously — the zero-row-audit lesson)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


@query(
    "join_full_outer_nation_activity",
    oracle="""
WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(c.k, s.k) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.k = s.k
""",
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nations with customers vs with
    suppliers); exercises both-null-side coalescing."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].groupBy(F.col("c_nationkey").alias("ck")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("sk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, c.ck == s.sk, "full_outer").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


#: Quantity bands for the non-equi range join (inline dimension).
_BANDS = [(0, 10, "XS"), (10, 20, "S"), (20, 30, "M"), (30, 40, "L"), (40, 51, "XL")]
_BANDS_SQL = ", ".join(f"({lo}, {hi}, '{label}')" for lo, hi, label in _BANDS)


@query(
    "join_range_quantity_bands",
    oracle=f"""
WITH bands(lo, hi, band) AS (VALUES {_BANDS_SQL})
SELECT band, COUNT(*) AS n_items, {sql_dsum('l_extendedprice')} AS band_value
FROM lineitem
JOIN bands ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
""",
)
def join_range_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/interval) join against a tiny banding dimension.
    Spark plans this as BroadcastNestedLoopJoin — correct for a 5-row
    build side at any fact scale; for large range dimensions the scale
    path is bucketizing the range key into an equi-join (see
    operators.analytics.asof_join for that technique)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    bands = li.sparkSession.createDataFrame(_BANDS, "lo int, hi int, band string")
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "band_value"),
        )
    )


@query(
    "join_cross_region_status",
    oracle="""
SELECT r_name, o_orderstatus, COUNT(*) AS n
FROM region
CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
CROSS JOIN nation
WHERE n_regionkey = r_regionkey
GROUP BY r_name, o_orderstatus
""",
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (small×small only — a guarded operation at
    scale; Spark requires crossJoin() or a hint by design)."""
    t = load_tables(spark, sf_dir, ("region", "nation", "orders"))
    statuses = t["orders"].select("o_orderstatus").distinct()
    return (
        t["region"]
        .crossJoin(statuses)
        .crossJoin(t["nation"])
        .filter(F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_null_safe_nation_groups",
    oracle="""
SELECT coalesce(CAST(ck AS VARCHAR), 'NULL') AS group_key,
       COUNT(*) AS n_pairs
FROM (SELECT nullif(c_nationkey % 5, 4) AS ck FROM customer) c
JOIN (SELECT nullif(s_nationkey % 5, 4) AS sk FROM supplier) s
  ON c.ck IS NOT DISTINCT FROM s.sk
GROUP BY 1
""",
)
def join_null_safe_nation_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension
    regular equi-joins can't express. Planned as a hash join on the
    null-safe key, not a nested loop."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].select(F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("ck"))
    s = t["supplier"].select(F.nullif(F.col("s_nationkey") % 5, F.lit(4)).alias("sk"))
    return (
        c.join(s, F.col("ck").eqNullSafe(F.col("sk")))
        .groupBy(F.coalesce(F.col("ck").cast("string"), F.lit("NULL")).alias("group_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "sort_offset_pagination",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2))::DOUBLE AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25 OFFSET 50
""",
)
def sort_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: total order + LIMIT/OFFSET (page 3 of 25).
    The total (price, key) sort key makes the page deterministic. At
    100 TB, deep OFFSET degrades to scanning offset+limit rows — real
    pagination should be keyset-based (WHERE key > last_seen) — but the
    operator itself belongs in the surface."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
        )
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .offset(50)
        .limit(25)
    )


SKEW_SALT = 8  # replication factor: caps any one key's reducer rows at 1/8
SKEW_SAMPLE_MOD = 16  # heavy-hitter sketch samples 1/16 of fact rows
SKEW_HOT_MIN = 3  # sampled-row count that nominates a key as hot


@query(
    "join_salted_skewed_orders",
    oracle=f"""
SELECT o_orderpriority, {SQL_REVENUE_SUM} AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def join_salted_skewed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual key-salting for a shuffle join whose key distribution is
    pathologically skewed: the probe side gets a deterministic salt
    (``l_linenumber % S`` — any per-row value works), the build side is
    replicated S× via ``explode(sequence(...))``, and the join keys on
    (key, salt). One hot key's rows now land on S reducers instead of
    one.

    AQE's skew-join (enabled engine-wide) already splits oversized
    sort-merge partitions at runtime; explicit salting is the declared
    fallback for when a SINGLE key exceeds what one task can hold even
    after AQE splits — at 100 TB, a "null-key flood" or one viral
    entity. The oracle is the plain unsalted join: salting must be
    result-invariant by construction.

    PARTIAL salting (the production form): replicating the whole build
    side S× multiplies the shuffle by S for keys that never needed help
    (measured: the naive full-salt plan cost 31 s at the 16x stress
    step — S× the join input, all of it cold keys). Instead a
    deterministic hash-sample sketch (1/16 of fact rows, exact-count
    threshold — no rand(), so retries and engines agree) nominates the
    heavy-hitter key set, which is broadcast. r6 shape: ONE unified
    join — each side takes a broadcast LEFT join against the hot set
    and salts CONDITIONALLY (hot fact rows get ``l_linenumber % S``,
    cold rows salt 0; hot dim rows explode into S replicas, cold rows
    into exactly one) so a single (key, salt) shuffle join serves both
    populations. vs the earlier two-lane semi/anti split + union: one
    fact scan instead of two, one dim scan instead of two, one join
    instead of two (measured time-parity solo at sf0.1 — 1.65 vs
    1.67 s, where the page cache makes rescans nearly free — adopted
    for the halved scan volume at real scale). The hot set is small by
    definition (a key qualifies only when several of its rows survive
    the 1/16 sample), so the broadcast is bounded at any corpus
    size."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    from etl_pipeline_sam_gov_spark.operators.dedup import _spark_hash60

    fact = t["lineitem"]
    dim = t["orders"]
    # Heavy-hitter sketch: deterministic 1/16 row sample, keys with >=
    # SKEW_HOT_MIN sampled rows are "hot". On the TPC-H fixture (<= 7
    # lines/order) this nominates the ~1% tail — enough to keep BOTH
    # lanes exercised by the oracle compare at every fixture scale.
    sample = fact.filter(
        _spark_hash60(
            F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber"))
        )
        % SKEW_SAMPLE_MOD
        == 0
    )
    hot = (
        sample.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= SKEW_HOT_MIN)
        .select(F.col("l_orderkey").alias("hot_key"))
    )
    fact_salted = (
        fact.join(
            F.broadcast(hot), fact["l_orderkey"] == F.col("hot_key"), "left"
        )
        .select(
            "l_orderkey",
            "l_extendedprice",
            "l_discount",
            F.when(
                F.col("hot_key").isNotNull(),
                F.col("l_linenumber") % SKEW_SALT,
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("salt"),
        )
    )
    dim_salted = (
        dim.join(F.broadcast(hot), dim["o_orderkey"] == F.col("hot_key"), "left")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.when(
                        F.col("hot_key").isNotNull(), F.lit(SKEW_SALT - 1)
                    ).otherwise(F.lit(0)),
                )
            ).alias("salt_r"),
        )
    )
    return (
        fact_salted.join(
            dim_salted,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("salt_r") == F.col("salt")),
        )
        .groupBy("o_orderpriority")
        .agg(
            revenue_sum("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "merge_incremental_upsert",
    oracle="""
WITH upd AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2))
              * CAST(1.10 AS DECIMAL(3,2)) AS DOUBLE) AS c_price,
         'U' AS c_status
  FROM orders WHERE o_orderkey % 10 = 0
),
ins AS (
  SELECT o_orderkey + 100000000 AS o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS c_price,
         'N' AS c_status
  FROM orders WHERE o_orderkey % 13 = 0
),
changes AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT COALESCE(o.o_orderkey, c.o_orderkey) AS o_orderkey,
       COALESCE(c.c_price, CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE))
         AS final_price,
       COALESCE(c.c_status, o.o_orderstatus) AS final_status
FROM orders o FULL OUTER JOIN changes c USING (o_orderkey)
""",
)
def merge_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (matched → update, not-matched → insert) as
    a full-outer join + coalesce — generalizing the reference's
    overwrite-the-whole-snapshot sink (``lambda_function.py:15,126-128``)
    to incremental upserts, the shape every continuously-refreshed
    training corpus needs.

    The change set here is derived deterministically from the base
    (±10% reprice for keys %10, brand-new keys offset by 1e8 for %13)
    so the oracle can rebuild it. At 100 TB: the base is bucketed by
    the merge key, the (small) change set broadcasts, and the join
    becomes shuffle-free on the base side; with a transactional table
    format this compiles to ``MERGE INTO`` directly — the plan shape
    below is exactly what those formats execute underneath."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    upd = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("c_key"),
        (dec2("o_totalprice") * F.lit("1.10").cast("decimal(3,2)"))
        .cast("double")
        .alias("c_price"),
        F.lit("U").alias("c_status"),
    )
    ins = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 100_000_000).alias("c_key"),
        dec2("o_totalprice").cast("double").alias("c_price"),
        F.lit("N").alias("c_status"),
    )
    changes = upd.unionByName(ins)
    return (
        orders.join(changes, F.col("o_orderkey") == F.col("c_key"), "full_outer")
        .select(
            F.coalesce("o_orderkey", "c_key").alias("o_orderkey"),
            F.coalesce(
                "c_price", dec2("o_totalprice").cast("double")
            ).alias("final_price"),
            F.coalesce("c_status", "o_orderstatus").alias("final_status"),
        )
    )


@query(
    "recursive_hierarchy_walk",
    oracle="""
WITH RECURSIVE walk(doc_id, anc, depth) AS (
  SELECT doc_id, doc_id, 0 FROM documents
  UNION ALL
  SELECT w.doc_id, w.anc // 2, w.depth + 1 FROM walk w WHERE w.anc > 1
)
SELECT doc_id,
       CAST(MAX(depth) AS BIGINT) AS depth,
       MIN(anc) AS root
FROM walk
GROUP BY doc_id
""",
)
def recursive_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal via a RECURSIVE CTE (Spark 4) — the
    org-chart / category-tree / thread-ancestry query shape. The
    fixture hierarchy is the implicit binary tree parent(n) = n DIV 2;
    each doc walks to its root, emitting depth and root id. The
    recursion is ACYCLIC (strictly decreasing ancestor), which is the
    shape Spark's recursive CTE supports today (UNION ALL frontier; a
    cyclic closure still needs the iterative-join loop of
    dedup_cluster_components). Each recursion step is one self-join of
    the frontier — O(log maxId) rounds here, and the frontier shrinks
    as walks terminate."""
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
WITH RECURSIVE walk(doc_id, anc, depth) AS (
  SELECT doc_id, doc_id, 0 FROM documents
  UNION ALL
  SELECT w.doc_id, w.anc DIV 2, w.depth + 1 FROM walk w WHERE w.anc > 1
)
SELECT doc_id,
       CAST(MAX(depth) AS BIGINT) AS depth,
       MIN(anc) AS root
FROM walk
GROUP BY doc_id
"""
    )


#: Shared verbatim by the Spark query AND the DuckDB oracle — the infix
#: bit operators parse identically in both engines, so the Morton-code
#: arithmetic has a single source of truth.
_ZORDER_SQL = """
WITH pts AS (
  SELECT o_orderkey, o_custkey % 65536 AS x, o_orderkey % 65536 AS y
  FROM orders
),
a AS (SELECT o_orderkey, x, y,
             (x | (x << 8)) & 16711935 AS xs,
             (y | (y << 8)) & 16711935 AS ys FROM pts),
b AS (SELECT o_orderkey, x, y,
             (xs | (xs << 4)) & 252645135 AS xs,
             (ys | (ys << 4)) & 252645135 AS ys FROM a),
c AS (SELECT o_orderkey, x, y,
             (xs | (xs << 2)) & 858993459 AS xs,
             (ys | (ys << 2)) & 858993459 AS ys FROM b),
d AS (SELECT o_orderkey, x, y,
             (xs | (xs << 1)) & 1431655765 AS xs,
             (ys | (ys << 1)) & 1431655765 AS ys FROM c)
SELECT o_orderkey, x, y, xs | (ys << 1) AS zkey
FROM d
"""


@query("fn_zorder_interleave", oracle=_ZORDER_SQL)
def fn_zorder_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key: interleave the bits of two 16-bit
    dimensions into one sort key — the multi-dimensional clustering
    primitive behind Delta/Iceberg Z-ORDER table layout. Writing a
    table range-partitioned + sorted by zkey co-locates rows that are
    close in BOTH dimensions, so min-max row-group stats prune scans
    filtered on either column. Pure integer expressions (the classic
    4-step shift-mask bit spread), staged through CTEs so no
    subexpression is textually duplicated; the SQL runs verbatim on
    both engines."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(_ZORDER_SQL)


#: Shared verbatim by Spark and the DuckDB oracle — comma-LATERAL with
#: correlated ORDER BY + LIMIT parses identically in both engines.
_LATERAL_TOPK_SQL = """
SELECT n.n_name, t.o_orderkey, t.o_totalprice
FROM nation n, LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
) AS t
"""


@query("join_lateral_topk_orders", oracle=_LATERAL_TOPK_SQL)
def join_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (SQL:2016 lateral derived table): for
    each nation, the top-2 orders of its customers by price — the
    "top-N per outer row" shape users otherwise hand-roll with window
    + filter. Catalyst decorrelates the lateral subquery via the
    DomainJoin rewrite into a join + per-domain-key sort/limit rather
    than re-executing the inner query per outer row (the RIGHT plan:
    one shuffle keyed on the correlation key, never N scans of
    orders). Ties are broken by o_orderkey so both engines pick
    identical rows. The SQL runs verbatim on both engines."""
    load_tables(spark, sf_dir, ("nation", "customer", "orders"))
    return spark.sql(_LATERAL_TOPK_SQL)


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning
# ---------------------------------------------------------------------------

#: Bloom geometry: BLOOM_M bit positions, BLOOM_K hashes per key. At the
#: fixture scale ~300 build keys set ≤900 of 8192 positions (~11%), so a
#: random probe key survives all three membership tests with p ≈ 0.11³
#: ≈ 0.13% — the filter removes ≈99.9% of non-matching probe rows
#: before the join shuffle.
BLOOM_M = 8192
BLOOM_K = 3


def _bloom_pos(col: Column, i: int) -> Column:
    """Bloom position i for a key: native xxhash64 with the hash index
    as a seed column, folded into [0, BLOOM_M). Unlike the dedup
    family's md5-derived hashing, this does NOT need to be
    engine-neutral: the oracle checks the final JOIN RESULT (bloom
    transparency), not the positions — build and probe only have to
    agree with each other, so the engine's fastest 64-bit hash wins
    (measured ~25% end-to-end vs the md5→hex→conv chain)."""
    return F.abs(F.xxhash64(col, F.lit(i))) % BLOOM_M


@query(
    "join_bloom_prefilter",
    oracle=f"""
SELECT c.c_custkey, COUNT(*) AS n_orders, {sql_dsum('o.o_totalprice')} AS spend
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY c.c_custkey
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: build a bloom filter over the
    dimension side's join keys (customers in one segment), broadcast
    it, and discard probe-side (orders) rows that cannot join BEFORE
    the join's shuffle — the "runtime filter" / sideways-information-
    passing mechanism every warehouse engine applies to selective
    star joins. Generalizes the reference's dict-lookup enrichment
    (``lambda_function.py:94-99``) to the case where the lookup side is
    too big to inline but its *bloom signature* never is.

    Semantics are TRANSPARENT: a bloom filter has no false negatives,
    and the inner join afterwards removes the ~0.1% false positives —
    the oracle is therefore the PLAIN join, proving the prefilter
    loses nothing.

    Scale shape (100 TB): the bloom build is one partial-combined
    bit_or aggregation into ≤ BLOOM_M/64 word rows, assembled into a
    single DENSE bigint[128] row (a real 8192-bit bitmap, ≤1 KB
    broadcast regardless of dimension cardinality; when keys saturate
    m the filter degrades gracefully toward pass-through, never
    dropping a match). Each probe-side membership test is O(1) —
    ``element_at`` word fetch + shift/mask, JVM-side, applied in the
    scan stage BELOW the join exchange (gated in tests/test_plans.py)
    — so the ~99.9% of non-joining fact rows never enter the shuffle
    and the per-row probe cost is independent of the build side (a
    set-membership formulation over collect_set measured 5× slower:
    array_contains scans the whole position set per row). The
    join itself is pinned to shuffle (``hint("merge")``) precisely to
    model the 100 TB case where the dimension exceeds the broadcast
    threshold — the regime where runtime filters matter. Spark's own
    AQE runtime bloom (``spark.sql.optimizer.runtime.bloomFilter``)
    injects this same shape automatically for InSubquery-like plans;
    building it explicitly keeps the mechanism engine-visible and
    deterministic (md5-derived positions both engines reproduce)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    cust = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    n_words = BLOOM_M // 64
    positions = cust.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("c_custkey"), i) for i in range(BLOOM_K)])
        ).alias("pos")
    )
    words = positions.groupBy((F.col("pos") / 64).cast("int").alias("w")).agg(
        # SQL form: the shiftleft Python wrapper only takes literal ints
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").alias(
            "bits"
        )
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.col("wm")[i], F.lit(0).cast("bigint")),
        ).alias("bloom_words")
    )

    orders = t["orders"]

    #: O(1) membership: 0-based word fetch + shift/mask (SQL shiftright
    #: accepts a column shift amount; the Python wrapper does not)
    _member = (
        "(shiftright(bloom_words[CAST(p{i} / 64 AS INT)],"
        " CAST(p{i} % 64 AS INT)) & 1) = 1"
    )
    probe_pos = [_bloom_pos(F.col("o_custkey"), i) for i in range(BLOOM_K)]
    probed = orders.join(F.broadcast(bloom))  # 1-row bloom side-input
    for i, pp in enumerate(probe_pos):
        probed = probed.withColumn(f"p{i}", pp)
    survived = probed.filter(
        F.expr(" AND ".join(_member.format(i=i) for i in range(BLOOM_K)))
    ).drop("bloom_words", *[f"p{i}" for i in range(BLOOM_K)])
    return (
        survived.hint("merge")
        .join(cust, survived["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spend"))
    )


#: Shared verbatim by Spark and the DuckDB oracle: entity-resolution
#: blocking + edit-distance verification + deterministic best-match.
#: The dirty side is derived from the base (customers whose key is
#: ≡0 mod 13 get their name's last two digits transposed — a classic
#: keyboard transposition typo), so the oracle can rebuild it exactly.
_FUZZY_MATCH_SQL = """
WITH dirty AS (
  SELECT c_custkey + 9000000 AS dirty_id,
         c_name || '!' AS dirty_name
  FROM customer WHERE c_custkey % 13 = 0
),
cand AS (
  SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name,
         levenshtein(d.dirty_name, c.c_name) AS edit_dist
  FROM dirty d JOIN customer c
    ON substr(d.dirty_name, 12, 7) = substr(c.c_name, 12, 7)
  WHERE levenshtein(d.dirty_name, c.c_name) <= 2
)
SELECT dirty_id, dirty_name, c_custkey AS matched_key,
       CAST(edit_dist AS BIGINT) AS edit_dist
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY dirty_id ORDER BY edit_dist, c_custkey) AS rn
  FROM cand
) WHERE rn = 1
"""


@query("join_fuzzy_name_match", oracle=_FUZZY_MATCH_SQL)
def join_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-resolution join (record linkage): match corrupted
    records (a stray trailing character — OCR/form-field noise) back
    to the master table by BLOCKING on a stable substring key, then
    verifying candidates with Levenshtein edit distance and keeping
    the deterministic best match (min distance, then min key). The
    corruption is chosen so the TRUE match is the provably unique
    minimum: the appended character costs exactly 1 edit against the
    original and ≥2 against every other entity (they already differ in
    ≥1 digit) — the first transposed-digit variant collided with other
    REAL entity names in the dense keyspace, so every "fuzzy" match
    was an exact-but-wrong one (edit_dist ≡ 0; the degenerate-output
    audit caught it).
    This is the blocking-verification shape every dedup/ER system uses
    (Fellegi-Sunter style): all-pairs edit distance over N×M records
    is infeasible, but an equi-join on a block key reduces candidates
    to same-block pairs — the string-domain analogue of
    dedup_simhash_blocked's byte-band pigeonhole.

    Scale shape: the block-key equi-join shuffles both sides on the
    key (hash-partitioned, AQE-skew-splittable if one block is hot);
    Levenshtein runs JVM-side only on candidates; the best-match
    row_number partitions by dirty_id — one shuffle each, no cross
    join anywhere. The block key is the LAST seven digits of the
    entity number (positions 12-18): zero-padded identifiers carry
    all their entropy at the tail, so blocks stay ~|C|/10^7-sized
    (the 16x stress step showed a 5-digit key's 10^5 keyspace
    saturating — block size, and with it candidate volume, must not
    grow with the corpus);
    the original leading-digit key (positions 10-14) was "00000" for
    almost every row — a degenerate two-block partition whose "blocked"
    join was secretly all-pairs (measured 29 s at sf0.1, fixed to
    <0.5 s; the scale-stress battery caught it). The SQL runs verbatim
    on both engines (the appended character never touches positions
    12-18, so a true match can never be blocked away — recall is
    provable, the blocked-SimHash discipline)."""
    load_tables(spark, sf_dir, ("customer",))
    return spark.sql(_FUZZY_MATCH_SQL)


_PIPE_AGGS = (
    "COUNT(*) AS n_orders,\n"
    "             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
    " AS total_price,\n"
    "             round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))"
    " AS DOUBLE) / COUNT(*), 6) AS avg_price"
)


@query(
    "sql_pipe_topsegments",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus <> 'F'
GROUP BY c_mktsegment
ORDER BY total_price DESC, c_mktsegment
LIMIT 3
""",
)
def sql_pipe_topsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 ``|>`` operators, SQL:2023-adjacent):
    the same segment-revenue ranking as a classic SELECT, expressed as
    a linear pipeline — FROM |> WHERE |> JOIN |> AGGREGATE |> ORDER BY
    |> LIMIT. The pipe form parses to the identical logical plan (the
    parser desugars each stage into the corresponding relational
    operator), so Catalyst optimizes it exactly like the oracle's
    nested form: filter pushed below the join, decimal partial
    aggregation, TakeOrderedAndProject for the ORDER+LIMIT. Registered
    because the surface itself is the capability — a user migrating
    pipe-syntax queries needs the engine to accept them verbatim.
    Money sums go through exact decimals per functions/exact.py."""
    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        f"""
FROM orders
|> WHERE o_orderstatus <> 'F'
|> JOIN customer ON o_custkey = c_custkey
|> AGGREGATE {_PIPE_AGGS}
   GROUP BY c_mktsegment
|> ORDER BY total_price DESC, c_mktsegment
|> LIMIT 3
"""
    )


@query(
    "sql_parameterized_query",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice >= 50000
GROUP BY o_orderpriority
""",
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+/4.x named-parameter API with an
    ``IDENTIFIER()`` table binding): the injection-safe templating
    surface — values bind as typed literals, identifiers through the
    dedicated clause, and neither ever goes through string
    interpolation. The analyzer substitutes parameters BEFORE
    optimization, so the plan is identical to the inlined oracle
    (predicate pushed to the scan, decimal partial agg). The
    capability under test is the binding API itself: a user migrating
    templated dashboards needs ``spark.sql(query, args=...)`` to
    accept the named-parameter + IDENTIFIER form verbatim."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM IDENTIFIER(:tbl)
WHERE o_orderstatus = :status AND o_totalprice >= :min_price
GROUP BY o_orderpriority
""",
        args={"tbl": "orders", "status": "O", "min_price": 50000},
    )


@query(
    "sql_session_variables",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(50000.0 + 25000.0 AS DOUBLE) AS threshold_used
FROM orders
WHERE o_totalprice >= 50000.0 + 25000.0
GROUP BY o_orderstatus
""",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 ``DECLARE VARIABLE`` /
    ``SET VAR``): the procedural-scripting surface that lets a SQL-only
    workflow thread computed values between statements without client
    round-trips. The variable is declared, reassigned with an
    expression over its prior value, and referenced BOTH in a
    predicate (where constant folding pushes the resolved value into
    the parquet scan) and in the projection (echoed so the oracle
    verifies the SET VAR arithmetic, not just the filter). DECLARE OR
    REPLACE keeps the query re-runnable within one session — registry
    sweeps call every query repeatedly."""
    load_tables(spark, sf_dir, ("orders",))
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 50000.0"
    )
    spark.sql("SET VAR price_floor = price_floor + 25000.0")
    return spark.sql(
        """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       price_floor AS threshold_used
FROM orders
WHERE o_totalprice >= price_floor
GROUP BY o_orderstatus, price_floor
"""
    )


@query(
    "sql_execute_immediate",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders
WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0
GROUP BY o_orderpriority
""",
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL via Spark 4's ``EXECUTE IMMEDIATE ... USING``: the
    statement text arrives as a session-variable string and positional
    parameters bind as typed literals — the stored-procedure-style
    surface SQL-only orchestration layers use to build statements at
    runtime without client-side string interpolation (and without the
    injection risk of interpolating values). The parameters land as
    analyzer-substituted literals, so the optimized plan is identical
    to the static oracle: both predicates reach the parquet scan."""
    load_tables(spark, sf_dir, ("orders",))
    spark.sql("DECLARE OR REPLACE VARIABLE stmt STRING")
    spark.sql(
        """SET VAR stmt =
 'SELECT o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
  FROM orders
  WHERE o_orderstatus = ? AND o_orderkey % ? = 0
  GROUP BY o_orderpriority'"""
    )
    return spark.sql("EXECUTE IMMEDIATE stmt USING 'F', 3")


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) query
# ---------------------------------------------------------------------------

#: Local-frontier fan-out: candidate pruning buckets for the
#: distributed skyline's first stage.
_SKYLINE_BUCKETS = 16


@query(
    "join_skyline_parts",
    oracle="""
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS INT) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
""",
)
def join_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: the parts not dominated on
    (minimize retail price, maximize size) — the multi-criteria
    shortlist operator (Börzsönyi et al., ICDE'01). The oracle states
    the semantics as the quadratic NOT-EXISTS dominance anti-join; the
    engine computes the identical set WITHOUT any self-join, via the
    two-stage distributed sort-filter skyline:

    1. Local stage: hash the table into buckets; inside each bucket a
       cumulative-max window over the price order finds the bucket's
       local frontier (a point dominated within ANY subset is dominated
       globally, so survivors ⊇ the true frontier).
    2. Global stage: re-run the same window over the union of local
       frontiers — a relation the size of the summed local frontiers
       (≈ O(buckets × frontier), tiny), so its single-partition window
       is bounded, not corpus-sized.

    Dominance testing via windows: with rows ordered by price cents,
    a part is on the frontier iff its size equals the running max over
    price ≤ its own (RANGE frame — price ties included: an equal-price
    larger-size row dominates) AND strictly exceeds the running max
    over price < its own (RANGE … 1 PRECEDING — a strictly-cheaper
    equal-size row dominates). Prices quantize exactly to integer
    cents (2-decimal doubles), making the RANGE offset frame exact
    integer arithmetic on both stages."""
    from pyspark.sql import Window as W

    part = load_tables(spark, sf_dir, ("part",))["part"]
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
    base = part.select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("int").alias("p_size"),
        cents.alias("cents"),
    )

    def frontier(df: DataFrame, *bucket_cols: str) -> DataFrame:
        w_incl = (
            W.partitionBy(*bucket_cols)
            .orderBy("cents")
            .rangeBetween(W.unboundedPreceding, 0)
        )
        w_strict = (
            W.partitionBy(*bucket_cols)
            .orderBy("cents")
            .rangeBetween(W.unboundedPreceding, -1)
        )
        return df.select(
            "p_partkey",
            "p_retailprice",
            "p_size",
            "cents",
            F.max("p_size").over(w_incl).alias("m_incl"),
            F.max("p_size").over(w_strict).alias("m_strict"),
        ).filter(
            (F.col("p_size") == F.col("m_incl"))
            & (
                F.col("m_strict").isNull()
                | (F.col("p_size") > F.col("m_strict"))
            )
        ).select("p_partkey", "p_retailprice", "p_size", "cents")

    local = frontier(
        base.withColumn(
            "bucket", F.pmod(F.col("p_partkey"), F.lit(_SKYLINE_BUCKETS))
        ),
        "bucket",
    )
    return frontier(local).select("p_partkey", "p_retailprice", "p_size")


# ---------------------------------------------------------------------------
# Spatial radius join via grid-cell blocking
# ---------------------------------------------------------------------------

#: Coordinate domain is [0, 1000) in hundredth-units (0..99999 int) —
#: exact integer geometry, no float coordinates anywhere.
GEO_DOMAIN_C = 100_000
GEO_RADIUS_C = 500  #: join radius: 5.00 units, in hundredth-units


@query(
    "join_spatial_grid_radius",
    oracle=f"""
WITH s AS (
  SELECT s_suppkey,
         ('0x' || substr(md5('g' || s_suppkey), 1, 15))::BIGINT % {GEO_DOMAIN_C} AS x,
         ('0x' || substr(md5('g' || s_suppkey), 17, 15))::BIGINT % {GEO_DOMAIN_C} AS y
  FROM supplier
),
c AS (
  SELECT c_custkey,
         ('0x' || substr(md5('g' || c_custkey), 1, 15))::BIGINT % {GEO_DOMAIN_C} AS x,
         ('0x' || substr(md5('g' || c_custkey), 17, 15))::BIGINT % {GEO_DOMAIN_C} AS y
  FROM customer
)
SELECT s.s_suppkey, c.c_custkey,
       (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y) AS dist_sq_c
FROM s JOIN c
  ON c.x BETWEEN s.x - {GEO_RADIUS_C} AND s.x + {GEO_RADIUS_C}
 AND (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y)
       <= {GEO_RADIUS_C} * {GEO_RADIUS_C}
""",
)
def join_spatial_grid_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join (all customer sites within 5 units of each
    supplier site) via GRID-CELL BLOCKING — the geospatial join kernel
    (geofencing, store-catchment, sensor-neighborhood) that Spark has
    no native operator for, expressed as the standard distributed
    decomposition: hash every point into a 2R-sized grid cell and
    QUADRANT-probe — a disc of radius R spans at most TWO 2R cells per
    axis (its own plus the one on whichever side of the cell midline
    the point sits), so the probe side explodes to exactly 4 cells,
    not the 3×3=9 a radius-sized grid needs. The equi-join on cell ids
    is a plain hash join — corpus-linear with a 4× probe fan-out,
    NEVER the quadratic cross product; skew is bounded by cell
    capacity, and the cheap exact predicate absorbs the slightly
    larger candidate cells (16R² vs 9R² of blocked area — exchange
    rows, the expensive resource, drop 2.25×; scan-stage compares,
    the cheap one, absorb the difference). Geometry is exact int64
    throughout (hundredth-unit coordinates, squared distances; no
    float, no sqrt; the d<=R boundary is inclusive and the midline
    rule keeps exactly-at-R corner points covered). The oracle states
    DIFFERENT physics — an x-band interval join (DuckDB IEJoin) plus
    the exact filter — so the hash match proves the quadrant blocking
    loses no pair (formulation-independence, the PCA discipline).
    Coordinates are md5-derived from the keys (derivation-oracle)."""
    t = load_tables(spark, sf_dir, ("supplier", "customer"))

    def pts(df: DataFrame, key: str, out: str) -> DataFrame:
        # ONE md5 per point, two disjoint 60-bit slices for (x, y) —
        # the hash is the scan stage's dominant cost and both engines
        # slice the same digest identically.
        h = F.md5(F.concat(F.lit("g"), F.col(key).cast("string")))
        coord = lambda start: (  # noqa: E731
            F.conv(F.substring(h, start, 15), 16, 10).cast("bigint")
            % GEO_DOMAIN_C
        )
        return df.select(
            F.col(key).alias(out),
            coord(1).alias("x"),
            coord(17).alias("y"),
        )

    s = pts(t["supplier"], "s_suppkey", "s_suppkey")
    c = pts(t["customer"], "c_custkey", "c_custkey")
    two_r = 2 * GEO_RADIUS_C
    cell = lambda v: F.floor(v / two_r)  # noqa: E731
    # Midline rule: the R-disc reaches the +1 neighbor cell iff the
    # point sits in the upper half of its 2R cell, else the -1 one.
    side = lambda v: F.when(  # noqa: E731
        v % two_r >= GEO_RADIUS_C, F.lit(1)
    ).otherwise(F.lit(-1))
    c_cells = c.select(
        "c_custkey", "x", "y",
        cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"),
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(
                    (side(F.col("x")) * F.lit(ux)).alias("dx"),
                    (side(F.col("y")) * F.lit(uy)).alias("dy"),
                )
                for ux in (0, 1)
                for uy in (0, 1)
            ]
        )
    ).alias("o")
    s_probes = s.select(
        F.col("s_suppkey"), F.col("x").alias("sx"), F.col("y").alias("sy"),
        offsets,
    ).select(
        "s_suppkey", "sx", "sy",
        (cell(F.col("sx")) + F.col("o.dx")).alias("cx"),
        (cell(F.col("sy")) + F.col("o.dy")).alias("cy"),
    )
    d2 = (F.col("sx") - F.col("x")) * (F.col("sx") - F.col("x")) + (
        F.col("sy") - F.col("y")
    ) * (F.col("sy") - F.col("y"))
    return (
        s_probes.join(c_cells, ["cx", "cy"])
        .filter(d2 <= GEO_RADIUS_C * GEO_RADIUS_C)
        .select("s_suppkey", "c_custkey", d2.alias("dist_sq_c"))
    )


@query(
    "sql_join_hints",
    oracle="""
SELECT n.n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
""",
)
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint surface: ``/*+ MERGE(c), BROADCAST(r) */`` —
    the escape hatch when statistics mislead the planner (a "small"
    dim that blew past the broadcast threshold after a filter
    changed, or a fact-fact join where AQE's estimate picks the
    wrong side). Values are identical with or without hints by
    construction — what the oracle certifies — while
    tests/test_plans.py pins the STRATEGY: region must appear on the
    build side of a BroadcastHashJoin and every join touching
    customer must plan as SortMergeJoin despite customer being
    broadcast-eligible at this scale (MERGE outranks the size
    estimate; two hints on one join would resolve by Spark's
    broadcast-first priority, so each hint here names a DIFFERENT
    join). Strategy hints are the one planner control a migrating
    Trino/Presto user expects verbatim (same syntax there)."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "region"))
    for name, df in t.items():
        df.createOrReplaceTempView(name)
    return spark.sql(
        """
SELECT /*+ MERGE(c), BROADCAST(r) */
       n.n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
"""
    )


# ---------------------------------------------------------------------------
# SQL-declared scalar functions (Spark 4 CREATE FUNCTION ... RETURN)
# ---------------------------------------------------------------------------


@query(
    "sql_declared_functions",
    oracle="""
SELECT CASE WHEN l_extendedprice * (1.0 - l_discount) < 1000 THEN 'lo'
            WHEN l_extendedprice * (1.0 - l_discount) < 30000 THEN 'mid'
            ELSE 'hi' END AS net_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                      AS BIGINT)) AS DOUBLE) / 100, 2) AS net_revenue
FROM lineitem
GROUP BY 1
""",
)
def sql_declared_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDFs (Spark 4 ``CREATE FUNCTION … RETURNS …
    RETURN <expr>``): the net-price formula and its banding rule are
    DECLARED once in the catalog and reused by name — the way a data
    platform centralizes business definitions so every query computes
    "net revenue" identically. Because the body is a SQL expression
    (not Python), Catalyst INLINES it: the plan is identical to
    writing the expression by hand — whole-stage codegen, pushdown,
    no serialization wall — which is exactly what the oracle checks
    by inlining the same expressions verbatim.

    Scale: one scan + partial-combined agg; the function layer adds
    zero runtime cost by construction (it dissolves at plan time)."""
    load_tables(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_band(x DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN x < 1000 THEN 'lo' "
        "WHEN x < 30000 THEN 'mid' ELSE 'hi' END"
    )
    return spark.sql(
        """
SELECT net_band(net_price(l_extendedprice, l_discount)) AS net_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(round(net_price(l_extendedprice, l_discount) * 100)
                      AS BIGINT)) AS DOUBLE) / 100, 2) AS net_revenue
FROM lineitem
GROUP BY 1
"""
    )
