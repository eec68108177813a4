"""Window functions (SURVEY.md §2.5 — absent in the reference, whose
rank-like behavior is a derived score + total sort; this is the real
windowed surface).

Scale notes: a window shuffles once on its partition key and sorts
within partitions; all window columns sharing one (partitionBy,
orderBy) spec are computed in a single pass. Partition keys here
(user_id, priority, lang) are low-skew; for skewed keys at 100 TB the
pattern is two-level windows (salt → partial → merge) or a bounded
``rowsBetween`` frame so state stays O(frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_sam_gov_spark.registry import query
from etl_pipeline_sam_gov_spark.tables import load_tables


@query(
    "window_rank_orders",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(o_totalprice AS DECIMAL(18,2)) :: DOUBLE AS price,
       rn, rnk, drnk
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         row_number() OVER w AS rn,
         rank()       OVER (PARTITION BY o_orderpriority ORDER BY round(o_totalprice / 10000) DESC) AS rnk,
         dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY round(o_totalprice / 10000) DESC) AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
) t
WHERE rn <= 5
""",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank; the rank pair runs over a
    coarsened key so real ties exist (rank ≠ dense_rank)."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w_unique = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_ties = W.partitionBy("o_orderpriority").orderBy(
        F.desc(F.round(F.col("o_totalprice") / 10000))
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
            # bigint, not int: DuckDB's rank family returns BIGINT and the
            # driver's value-hash is typed.
            F.row_number().over(w_unique).cast("bigint").alias("rn"),
            F.rank().over(w_ties).cast("bigint").alias("rnk"),
            F.dense_rank().over(w_ties).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "window_running_user",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) AS ts_us,
       round(sum(value) OVER w, 6) AS running_value,
       round(lag(value)  OVER w, 6) AS prev_value,
       round(lead(value) OVER w, 6) AS next_value,
       row_number() OVER w AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def window_running_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals + lag/lead over a per-user event timeline.
    The cumulative sum accumulates in identical order in both engines
    (total order via (ts, event_id)), so values are bit-stable."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.sum("value").over(w_run), 6).alias("running_value"),
        F.round(F.lag("value").over(w_ord), 6).alias("prev_value"),
        F.round(F.lead("value").over(w_ord), 6).alias("next_value"),
        F.row_number().over(w_ord).cast("bigint").alias("seq"),
    )


@query(
    "window_frames_moving",
    oracle="""
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg4,
       round(first_value(value) OVER wfull, 6) AS first_val,
       round(last_value(value)  OVER wfull, 6) AS last_val,
       ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
FROM events
WINDOW wfull AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_frames_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (moving average), whole-partition frame
    (first/last), and ntile bucketing."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_move = w_ord.rowsBetween(-3, W.currentRow)
    w_full = w_ord.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w_move), 6).alias("moving_avg4"),
        F.round(F.first("value").over(w_full), 6).alias("first_val"),
        F.round(F.last("value").over(w_full), 6).alias("last_val"),
        F.ntile(4).over(w_ord).cast("bigint").alias("quartile"),
    )


@query(
    "window_topk_docs_per_lang",
    oracle="""
SELECT lang, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) t
WHERE rn <= 2
""",
)
def window_topk_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the canonical window idiom (row_number ≤ K).
    At scale this beats groupBy+collect_list by never materializing
    groups; AQE handles partition skew on hot keys."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = W.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@query(
    "window_distribution_prices",
    oracle="""
SELECT o_orderkey,
       round(percent_rank() OVER w, 8) AS pr,
       round(cume_dist() OVER w, 8) AS cd,
       nth_value(o_orderkey, 3) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_distribution_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value. The (price, key) order key is total, so both engines
    agree on every rank; rounding absorbs the (n-1) division ulp."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 8).alias("pr"),
        F.round(F.cume_dist().over(w), 8).alias("cd"),
        F.nth_value("o_orderkey", 3).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("third_key"),
    )


@query(
    "window_range_price_neighborhood",
    oracle="""
SELECT o_orderkey,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_orderpriority ORDER BY o_totalprice
            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_below
FROM orders
""",
)
def window_range_price_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames (value-based, not row-based): peers are defined by
    the ORDER BY value distance, so ties share one frame — the frame
    semantics ROWS cannot express. One shuffle + one sort per
    (partitionBy, orderBy) pair, both window columns share it."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w.rangeBetween(-1000, 1000)).alias("n_near"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rangeBetween(-1000, W.currentRow))
        .cast("double")
        .alias("sum_below"),
    )


@query(
    "window_cumulative_distinct_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
daily_new AS (
  SELECT first_day AS day, COUNT(*) AS new_users
  FROM first_seen GROUP BY first_day
),
daily_active AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS active_users
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT strftime(a.day, '%Y-%m-%d') AS day,
       a.active_users,
       COALESCE(n.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY a.day) AS BIGINT)
         AS cumulative_users
FROM daily_active a LEFT JOIN daily_new n ON a.day = n.day
""",
)
def window_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric a
    naive COUNT(DISTINCT) OVER (ORDER BY day) cannot compute scalably
    (distinct-over-running-frame holds the whole history per frame).
    The standard reformulation: each user collapses to their FIRST
    active day (one partial-combined min), daily first-appearance
    counts then accumulate with an ordinary running sum — turning an
    O(days × users) distinct into two aggregations plus a window over
    the days-sized relation. Daily actives ride along for the
    active/cumulative ratio.

    The running-sum window is unpartitioned BUT ordered over the
    ~60-row day relation (post-aggregation, bounded — the audited
    small-relation window pattern, cf. tpch.py:334). Dates are emitted
    as formatted strings per the registry timestamp convention."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.to_date("ts")
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    daily_active = ev.groupBy(day.alias("day")).agg(
        F.count_distinct("user_id").alias("active_users")
    )
    w = W.orderBy("day")
    return (
        daily_active.join(F.broadcast(daily_new), "day", "left")
        .select(
            "day",
            "active_users",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "active_users",
            "new_users",
            F.sum("new_users").over(w).alias("cumulative_users"),
        )
    )


@query(
    "window_moving_median",
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS v2
  FROM events
)
SELECT event_id, user_id,
       round(quantile_cont(v2, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) / 100, 6)
         AS moving_median
FROM c
""",
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over each user's trailing 6 events — the robust
    smoother that rolling means can't match on spiky data (one outlier
    shifts a mean by outlier/n but leaves the median untouched). Spark
    evaluates the exact ``percentile`` aggregate over a ROWS window
    frame; DuckDB's ``quantile_cont`` over the same frame is its
    contractual equal (the fn_winsorize_values equivalence, here per
    frame instead of per group).

    Determinism: the median interpolates between exact integer cent
    values — midpoints are x.5 exactly in both engines regardless of
    interpolation formula (ints and their halves are binary-exact), so
    no float-summation hazard exists anywhere; the /100 rescale and
    round(6) render identically. One shuffle on user_id; the frame
    buffer is O(6) per row."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    c = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v2"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, 0)
    )
    return c.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(v2, 0.5)").over(w) / 100, 6).alias(
            "moving_median"
        ),
    )


@query(
    "window_pattern_peaks",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
         lag(value, 2) OVER w AS v_m2,
         lag(value, 1) OVER w AS v_m1,
         lead(value, 1) OVER w AS v_p1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, ts_us,
       round(v_m2, 6) AS v_m2, round(v_m1, 6) AS v_m1,
       round(value, 6) AS v_peak, round(v_p1, 6) AS v_p1
FROM seq
WHERE v_m2 < v_m1 AND v_m1 < value AND value > v_p1
""",
)
def window_pattern_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern detection over per-user event streams — the
    MATCH_RECOGNIZE / Flink-CEP kernel (``PATTERN (UP UP DOWN)``)
    lowered to a lag/lead chain: a row is a *peak* when the two
    preceding values (in (ts, event_id) order) rise monotonically into
    it and the next value falls. This shape powers spike/alert
    detection, price-swing screens, and micro-trend labeling.

    Scale shape: ONE window exchange keyed on user_id computes all
    three offsets in a single sort pass (shared window spec); rows at
    the partition edges where an offset is undefined are excluded by
    the NULL-rejecting comparisons on both engines — no per-row UDF,
    no self-joins, state is O(1) per row (bounded offsets, not
    unbounded frames). The deterministic (ts, event_id) tiebreak makes
    every lag/lead value engine-identical; values are rounded only on
    OUTPUT (comparisons run on raw doubles both sides)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lag("value", 2).over(w).alias("v_m2"),
        F.lag("value", 1).over(w).alias("v_m1"),
        F.lead("value", 1).over(w).alias("v_p1"),
    )
    return seq.filter(
        (F.col("v_m2") < F.col("v_m1"))
        & (F.col("v_m1") < F.col("value"))
        & (F.col("value") > F.col("v_p1"))
    ).select(
        "user_id",
        "event_id",
        "ts_us",
        F.round("v_m2", 6).alias("v_m2"),
        F.round("v_m1", 6).alias("v_m1"),
        F.round("value", 6).alias("v_peak"),
        F.round("v_p1", 6).alias("v_p1"),
    )


#: Trailing window width (rows) for the rolling trend slope.
TREND_N = 24


@query(
    "window_rolling_trend_slope",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS y,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS i
  FROM events
),
frames AS (
  SELECT user_id, event_id, ts_us, y, i,
         COUNT(*) OVER w AS n,
         CAST(SUM(i) OVER w AS BIGINT) AS si,
         CAST(SUM(i * i) OVER w AS BIGINT) AS sii,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(i * y) OVER w AS BIGINT) AS siy
  FROM seq
  WINDOW w AS (PARTITION BY user_id ORDER BY i
               ROWS BETWEEN {TREND_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, ts_us,
       round(CAST(n * siy - si * sy AS DOUBLE)
             / CAST(n * sii - si * si AS DOUBLE) / 100, 6) + 0.0
         AS slope_per_event
FROM frames WHERE n = {TREND_N}
""",
)
def window_rolling_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend slope: for each event, the least-squares slope
    of the user's last TREND_N values against their sequence position
    — the online trend detector behind "usage accelerating/decaying"
    features, strictly stronger than a moving-average delta (it weighs
    every point, not just the endpoints). The closed form
    (n·Σiy − Σi·Σy)/(n·Σi² − (Σi)²) runs on EXACT int64 window sums
    (positions are row numbers, values are cents; the shift-invariance
    of the slope lets absolute positions stand in for frame-relative
    ones — no per-frame re-centering), so both engines agree
    bit-for-bit up to the single final division. Partial frames are
    excluded (n = TREND_N) rather than emitting noisy short-window
    slopes.

    Scale shape: ONE exchange keyed on user_id computes the row
    numbers and all four trailing sums in the same sorted pass (shared
    window spec, O(frame) state); no self-joins, no per-row UDF."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
        F.row_number().over(order).cast("bigint").alias("i"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(-(TREND_N - 1), W.currentRow)
    )
    frames = seq.select(
        "user_id",
        "event_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("i").over(w).cast("bigint").alias("si"),
        F.sum(F.col("i") * F.col("i")).over(w).cast("bigint").alias("sii"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("y")).over(w).cast("bigint").alias("siy"),
    )
    n, si, sii, sy, siy = (
        F.col(c) for c in ("n", "si", "sii", "sy", "siy")
    )
    return frames.filter(n == TREND_N).select(
        "user_id",
        "event_id",
        "ts_us",
        (
            F.round(
                (n * siy - si * sy).cast("double")
                / (n * sii - si * si).cast("double")
                / 100,
                6,
            )
            + F.lit(0.0)
        ).alias("slope_per_event"),
    )


# ---------------------------------------------------------------------------
# Ratio-to-report: each order's share of its priority group's revenue
# ---------------------------------------------------------------------------


@query(
    "window_ratio_to_report",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice > 400000
),
tot AS (
  SELECT o_orderkey, o_orderpriority, cents,
         CAST(SUM(cents) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS group_cents
  FROM base
)
SELECT o_orderkey, o_orderpriority, cents, group_cents,
       round(CAST(cents AS DOUBLE) / group_cents, 6) + 0.0 AS share
FROM tot
""",
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report — the classic reporting window (Oracle's
    RATIO_TO_REPORT, BigQuery's safe share-of-total): each large
    order's fraction of its priority group's revenue, computed as one
    unordered SUM OVER (PARTITION BY) with no self-join and no
    two-pass group total — the window formulation that replaced the
    groupBy-then-rejoin anti-pattern for share-of-total reports.

    Determinism: cents and group totals are exact int64; the share is
    one division rounded at the end. Scale shape: one shuffle on the
    partition key; the frame is unordered (whole-partition aggregate,
    no sort inside the window) and the >400k predicate pushes to the
    scan so the window only sees the filtered slice."""
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("o_orderpriority")
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("group_cents"),
    ).select(
        "*",
        (
            F.round(F.col("cents").cast("double") / F.col("group_cents"), 6)
            + F.lit(0.0)
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Value-navigation window surface: first/last/nth_value with full frames
# ---------------------------------------------------------------------------


@query(
    "window_value_navigation",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(first_c) AS BIGINT) AS first_cents,
       CAST(MIN(last_c) AS BIGINT) AS last_cents,
       CAST(MIN(third_c) AS BIGINT) AS third_cents
FROM (
  SELECT user_id,
         first_value(cents) OVER w AS first_c,
         last_value(cents) OVER w AS last_c,
         nth_value(cents, 3) OVER w AS third_c
  FROM seq
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
GROUP BY user_id
""",
)
def window_value_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-navigation window surface — first_value, last_value,
    nth_value over an explicit UNBOUNDED-to-UNBOUNDED frame: each
    user's first, most recent, and third-ever transaction amount in
    one windowed pass (the "how did this account start vs where is it
    now" projection). The full-frame spec matters and is the point:
    last_value over the DEFAULT frame (unbounded-to-CURRENT) is the
    row's own value — the most common window-function bug in review —
    so the frame is spelled out and the oracle would catch the
    default-frame mistake on every user with >1 event.

    Determinism: navigation picks concrete row values (exact cents)
    under a total per-user order (ts, event_id); the per-user collapse
    via MIN is over identical-per-row window results. Scale shape: one
    user-keyed shuffle, one sort, one pass — then a partial-combined
    rollup on the same key."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    seq = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    nav = seq.select(
        "user_id",
        F.first("cents").over(w).alias("first_c"),
        F.last("cents").over(w).alias("last_c"),
        F.nth_value("cents", 3).over(w).alias("third_c"),
    )
    return nav.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("first_c").cast("bigint").alias("first_cents"),
        F.min("last_c").cast("bigint").alias("last_cents"),
        F.min("third_c").cast("bigint").alias("third_cents"),
    )
