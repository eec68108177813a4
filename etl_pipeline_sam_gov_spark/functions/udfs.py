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
             / stddev_samp(value) OVER (PARTITION BY user_id), 4) + 0.0 AS zscore
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
                # + 0.0 normalizes IEEE negative zero (a z-score that
                # rounds to -0.0 at 4 decimals stringifies differently
                # from 0.0 under the driver's pandas canonicalizer)
                "zscore": ((pdf["value"] - mu) / sd).round(4) + 0.0,
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


#: EWMA smoothing factor (y_i = EWMA_ALPHA*x_i + (1-EWMA_ALPHA)*y_{i-1}).
EWMA_ALPHA = 0.3


def _ewma_oracle() -> str:
    """The oracle replays the recurrence itself via a RECURSIVE CTE,
    stepping rn -> rn+1 per user with EXACTLY the same three IEEE
    double operations the Spark-side Python loop performs
    (a*x, (1-a)*y, add) — so the two engines produce bit-identical
    doubles and round(6) can never flip on a boundary. (A closed-form
    reweighting oracle was tried first and differed by ~1e-11, enough
    to flip the 6th decimal on ~4 rows in 10k.)"""
    a = EWMA_ALPHA
    return f"""
WITH RECURSIVE seq AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
rec AS (
  SELECT event_id, user_id, value, rn, value AS y FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_id, s.user_id, s.value, s.rn, {a} * s.value + {1 - a} * r.y
  FROM seq s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT event_id, user_id, value,
       CAST(CAST(CAST(y AS VARCHAR) AS DECIMAL(18,6)) AS DOUBLE) AS ewma
FROM rec
"""


@query("udf_ewma_user_values", oracle=_ewma_oracle())
def udf_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average over the event
    timeline — the smoothing/trend kernel of metric pipelines, and the
    canonical *sequentially-recursive* per-group computation that no
    built-in window frame expresses (each output depends on the whole
    prefix through a recurrence). applyInPandas is the sanctioned
    escape: each user's history arrives as one Arrow-backed DataFrame,
    is sorted (Spark guarantees no intra-group order), and smoothed by
    pandas' C-implemented ewm kernel. The DuckDB oracle evaluates the
    same recurrence through its closed form — a completely different
    formulation, so the Python path is checked against real math, not
    itself. Scale: one shuffle keyed on user_id; per-task memory is one
    user's history (bounded), and skewed users would shard via the
    salted-prefix pattern of agg_salted_heavy_hitters."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        # explicit loop, NOT pandas .ewm(): the oracle replays the same
        # recurrence op-for-op, and .ewm()'s weighted-average form
        # (numerator/denominator tracking) differs in the last ulp
        a = EWMA_ALPHA
        pdf = pdf.sort_values(["ts", "event_id"])
        ys, y = [], None
        for x in pdf["value"].tolist():
            y = x if y is None else a * x + (1 - a) * y
            ys.append(y)
        out = pdf[["event_id", "user_id", "value"]].copy()
        out["ewma"] = ys
        return out

    smoothed = (
        ev.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            smooth,
            T.StructType(
                [
                    T.StructField("event_id", T.LongType()),
                    T.StructField("user_id", T.LongType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("ewma", T.DoubleType()),
                ]
            ),
        )
    )
    return smoothed.select(
        "event_id", "user_id", "value", F.round("ewma", 6).alias("ewma")
    )


@query(
    "udf_arrow_batch_pricing",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_price
FROM lineitem
WHERE l_linestatus = 'F'
""",
)
def udf_arrow_batch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch API below mapInPandas — the
    Arrow RecordBatch arrives as-is (no pandas conversion, no index
    materialization), which is the right surface for kernels that are
    already columnar (pyarrow.compute, numpy over buffers, or handing
    batches to a native library). The kernel computes net price in
    Arrow compute; the engine-visible filter stays a Catalyst
    predicate ABOVE the scan so pushdown still happens, and the final
    rounding uses Spark's round (HALF_UP) so the cross-engine rounding
    convention stays in one place."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]

    def price_batches(batches):
        for b in batches:
            net = pc.multiply(
                pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                ),
                pc.add(pa.scalar(1.0), b.column("l_tax")),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), net],
                ["l_orderkey", "l_linenumber", "net_raw"],
            )

    priced = (
        li.filter(F.col("l_linestatus") == "F")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
        .mapInArrow(
            price_batches,
            T.StructType(
                [
                    T.StructField("l_orderkey", T.LongType()),
                    T.StructField("l_linenumber", T.IntegerType()),
                    T.StructField("net_raw", T.DoubleType()),
                ]
            ),
        )
    )
    return priced.select(
        "l_orderkey", "l_linenumber", F.round("net_raw", 6).alias("net_price")
    )


@query(
    "udtf_installment_schedule",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         1 + o_orderkey % 4 AS n
  FROM orders WHERE o_totalprice > 400000
),
ex AS (
  SELECT o_orderkey, cents, n,
         unnest(generate_series(1, n)) AS i
  FROM o
)
SELECT o_orderkey,
       CAST(i AS INT) AS installment_no,
       CAST(CASE WHEN i = 1 THEN cents // n + cents % n
            ELSE cents // n END AS BIGINT) AS amount_cents
FROM ex
""",
)
def udtf_installment_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF #2 — variable-arity row expansion: split each large
    order into 1–4 equal installments (count keyed off the order key),
    remainder cents folded into the first installment so the schedule
    always sums exactly to the order total. The financial-amortization
    shape: imperative per-row loop with data-dependent fan-out, which
    is what separates a true table function from a constant-arity
    explode.

    Float-hazard-free by construction: the cents conversion happens in
    Spark expression space BEFORE the UDTF (the certified
    round(x*100)→bigint lane), so the Python kernel sees only int64 —
    the DuckDB generate_series oracle replays identical integer
    division. Same lane economics as udtf_quantity_milestones: per-row
    Python on the >400k slice only."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="okey bigint, installment_no int, amount_cents bigint")
    class Installments:
        def eval(self, orderkey: int, cents: int):
            n = 1 + orderkey % 4
            base, rem = divmod(cents, n)
            for i in range(1, n + 1):
                yield orderkey, i, base + (rem if i == 1 else 0)

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    return big.lateralJoin(
        Installments(F.col("o_orderkey").outer(), F.col("cents").outer())
    ).select(
        F.col("okey").alias("o_orderkey"), "installment_no", "amount_cents"
    )


#: Holt's linear-trend smoothing parameters (level / trend gains).
HOLT_ALPHA = 0.5
HOLT_GAMMA = 0.3


def _holt_oracle() -> str:
    """Recursive-CTE replay of Holt's TWO coupled recurrences with the
    identical IEEE op order as the Python loop (the EWMA oracle's move,
    doubled): l' = a·x + (1−a)·(l + b); b' = g·(l' − l) + (1−g)·b."""
    a, g = HOLT_ALPHA, HOLT_GAMMA
    return f"""
WITH RECURSIVE seq AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
rec AS (
  SELECT user_id, rn, n, value AS l, CAST(0.0 AS DOUBLE) AS b
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.n,
         {a} * s.value + {1 - a} * (r.l + r.b),
         {g} * (({a} * s.value + {1 - a} * (r.l + r.b)) - r.l)
           + {1 - g} * r.b
  FROM seq s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(l, 6) + 0.0 AS level,
       round(b, 6) + 0.0 AS trend,
       round(l + b, 6) + 0.0 AS forecast_next
FROM rec WHERE rn = n
"""


@query("udf_holt_linear_users", oracle=_holt_oracle())
def udf_holt_linear_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing per user — the
    level+trend upgrade of the EWMA recurrence (udf_ewma_user_values):
    TWO coupled state variables advance together each event, which is
    strictly beyond any window frame AND beyond a single-accumulator
    fold — the canonical case for the grouped-map escape hatch. Emits
    each user's final level, trend, and one-step-ahead forecast
    (level + trend), i.e. "where is this account heading".

    Cross-engine exactness is the EWMA contract doubled: the Python
    loop and the recursive-CTE oracle perform the IDENTICAL IEEE op
    sequence per step (the l' expression is repeated verbatim inside
    b' rather than referencing a temporary, so both engines compute it
    the same way), making every intermediate bit-identical before
    round(6). Scale: one user-keyed shuffle; per-task state is two
    doubles; the recursion depth is each user's history length."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        a, g = HOLT_ALPHA, HOLT_GAMMA
        pdf = pdf.sort_values(["ts", "event_id"])
        l = b = None
        for x in pdf["value"].tolist():
            if l is None:
                l, b = x, 0.0
            else:
                l_new = a * x + (1 - a) * (l + b)
                b = g * ((a * x + (1 - a) * (l + b)) - l) + (1 - g) * b
                l = l_new
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "level_raw": [l],
                "trend_raw": [b],
            }
        )

    out = (
        ev.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            smooth,
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("n_events", T.LongType()),
                    T.StructField("level_raw", T.DoubleType()),
                    T.StructField("trend_raw", T.DoubleType()),
                ]
            ),
        )
    )
    return out.select(
        "user_id",
        "n_events",
        (F.round("level_raw", 6) + F.lit(0.0)).alias("level"),
        (F.round("trend_raw", 6) + F.lit(0.0)).alias("trend"),
        (F.round(F.col("level_raw") + F.col("trend_raw"), 6) + F.lit(0.0)).alias(
            "forecast_next"
        ),
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection (clamped two-sided recursion)
# ---------------------------------------------------------------------------

#: CUSUM reference: target mean 50 (the fixture's corpus mean), slack
#: K=25 (~half a standard deviation), alarm threshold H=250. The
#: recurrences use the PRE-FOLDED literals 75.0 (=MU+K) and 25.0
#: (=MU-K) so both engines execute the identical IEEE op sequence —
#: writing ``value - 50.0 - 25.0`` would leave association to chance.
CUSUM_UP = 75.0
CUSUM_DN = 25.0
CUSUM_H = 250.0


def _cusum_oracle() -> str:
    """Recursive-CTE replay of the clamped two-sided CUSUM recursion —
    the EWMA oracle's move: same op order, bit-identical doubles."""
    return f"""
WITH RECURSIVE seq AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
rec AS (
  SELECT event_id, user_id, value, rn,
         GREATEST(0.0, value - {CUSUM_UP}) AS cp,
         GREATEST(0.0, {CUSUM_DN} - value) AS cn
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_id, s.user_id, s.value, s.rn,
         GREATEST(0.0, r.cp + (s.value - {CUSUM_UP})),
         GREATEST(0.0, r.cn + ({CUSUM_DN} - s.value))
  FROM seq s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT event_id, user_id, value,
       round(cp, 6) AS cusum_pos,
       round(cn, 6) AS cusum_neg,
       (cp > {CUSUM_H} OR cn > {CUSUM_H}) AS alarm
FROM rec
"""


@query("udf_cusum_drift_alarm", oracle=_cusum_oracle())
def udf_cusum_drift_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detector per user (Page 1954): the
    clamped recursions ``c+ = max(0, c+ + (x - (μ+k)))`` and
    ``c- = max(0, c- + ((μ-k) - x))`` accumulate evidence of a
    sustained mean shift and alarm past H — the sequential
    change-detection primitive behind metric-regression monitors and
    data-drift alerts (dq_psi_value_drift is its batch distributional
    cousin; this one is ORDER-sensitive and so beyond window frames:
    the clamp makes it a non-linear recurrence, the grouped-map lane's
    textbook case alongside EWMA and Holt).

    Cross-engine exactness is the EWMA contract: the Python loop and
    the recursive CTE perform the identical IEEE sequence per step
    (pre-folded μ±k literals, clamp via max/GREATEST), so every state
    is bit-identical before round(6). Scale: one user-keyed shuffle;
    per-task state is two doubles; non-resetting variant (alarms mark
    every sample past threshold, the audit-trail convention)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        cp = cn = 0.0
        cps, cns = [], []
        for x in pdf["value"].tolist():
            cp = max(0.0, cp + (x - CUSUM_UP))
            cn = max(0.0, cn + (CUSUM_DN - x))
            cps.append(cp)
            cns.append(cn)
        out = pdf[["event_id", "user_id", "value"]].copy()
        out["cusum_pos"] = cps
        out["cusum_neg"] = cns
        return out

    walked = (
        ev.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            cusum,
            T.StructType(
                [
                    T.StructField("event_id", T.LongType()),
                    T.StructField("user_id", T.LongType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("cusum_pos", T.DoubleType()),
                    T.StructField("cusum_neg", T.DoubleType()),
                ]
            ),
        )
    )
    return walked.select(
        "event_id",
        "user_id",
        "value",
        F.round("cusum_pos", 6).alias("cusum_pos"),
        F.round("cusum_neg", 6).alias("cusum_neg"),
        (
            (F.col("cusum_pos") > CUSUM_H) | (F.col("cusum_neg") > CUSUM_H)
        ).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (level + trend + 24 seasonals)
# ---------------------------------------------------------------------------

HW_ALPHA = 0.3  #: level gain
HW_BETA = 0.1   #: trend gain
HW_DELTA = 0.2  #: seasonal gain
HW_PERIOD = 24  #: hour-of-day seasonality


def _hw_oracle() -> str:
    """Recursive-CTE replay of the THREE coupled Holt-Winters
    recurrences, the seasonal state carried as a DOUBLE[24] list
    column spliced per step (list_slice ‖ [new] ‖ list_slice) — the
    Holt oracle's move plus vector state. Every l'/b'/s' expression is
    repeated verbatim (never referenced via a temporary), so both
    engines execute the identical IEEE op sequence per step."""
    a, g, d, m = HW_ALPHA, HW_BETA, HW_DELTA, HW_PERIOD
    zeros = "[" + ", ".join("0.0" for _ in range(m)) + "]"
    lp = (
        f"{a} * (CAST(s.c AS DOUBLE) - r.seas[s.slot + 1]) "
        f"+ {1 - a} * (r.l + r.b)"
    )
    return f"""
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, c,
         CAST(EXTRACT(hour FROM h) AS BIGINT) AS slot,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
rec AS (
  SELECT event_type, rn, n, slot,
         CAST(c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b,
         CAST({zeros} AS DOUBLE[]) AS seas
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.rn, s.n, s.slot,
         {lp},
         {g} * (({lp}) - r.l) + {1 - g} * r.b,
         list_slice(r.seas, 1, s.slot)
           || [{d} * (CAST(s.c AS DOUBLE) - ({lp}))
               + {1 - d} * r.seas[s.slot + 1]]
           || list_slice(r.seas, s.slot + 2, {m})
  FROM seq s JOIN rec r
    ON s.event_type = r.event_type AND s.rn = r.rn + 1
),
final AS (
  SELECT event_type, slot, l, b, seas FROM rec WHERE rn = n
),
horizons AS (
  SELECT CAST(unnest(generate_series(1, {m})) AS BIGINT) AS h
)
SELECT f.event_type, z.h AS horizon_h,
       round(f.l, 6) + 0.0 AS level,
       round(f.b, 6) + 0.0 AS trend,
       round(f.seas[CAST((f.slot + z.h) % {m} AS INT) + 1], 6) + 0.0
         AS seasonal,
       round(f.l + z.h * f.b
             + f.seas[CAST((f.slot + z.h) % {m} AS INT) + 1], 6) + 0.0
         AS forecast
FROM final f CROSS JOIN horizons z
"""


@query("udf_holt_winters_hourly", oracle=_hw_oracle())
def udf_holt_winters_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE SEASONAL smoothing of hourly revenue per
    event type — the triple-exponential upgrade of Holt
    (udf_holt_linear_users): level, trend, and a 24-slot hour-of-day
    seasonal vector advance together each observed hour, then the
    final state emits a 24-hour-ahead forecast fan
    ŷ(t+h) = l + h·b + s[(slot+h) mod 24]. This is the capacity-
    planning / anomaly-baseline forecaster every metrics platform
    runs, and the textbook case where grouped-map state is a VECTOR,
    not a scalar pair — beyond window frames and beyond the
    scalar-fold lane.

    Cross-engine exactness: the Python loop and the recursive CTE
    (seasonal state as a DOUBLE[24] list column, spliced per step)
    perform the identical IEEE sequence — inputs are exact int64
    cent sums, the three gain constants are shared literals, and
    every derived expression is repeated verbatim on both sides.

    Scale: one (type, hour) pre-aggregation collapses the corpus to
    |types|·|hours| rows; the sequential walk then runs per type with
    O(period) state per task — the same shape a 1000-executor run
    wants (series count = parallelism, series length = per-task
    work)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c"))
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        a, g, d, m = HW_ALPHA, HW_BETA, HW_DELTA, HW_PERIOD
        pdf = pdf.sort_values("h")
        l = b = None
        seas = [0.0] * m
        slot = 0
        for c, hod in zip(pdf["c"].tolist(), pdf["h"].dt.hour.tolist()):
            x = float(c)
            slot = int(hod)
            if l is None:
                l, b = x, 0.0
                continue
            s_old = seas[slot]
            l_new = a * (x - s_old) + (1 - a) * (l + b)
            b = g * (l_new - l) + (1 - g) * b
            seas[slot] = d * (x - l_new) + (1 - d) * s_old
            l = l_new
        rows = []
        for h in range(1, m + 1):
            s_h = seas[(slot + h) % m]
            rows.append(
                (pdf["event_type"].iloc[0], h, l, b, s_h)
            )
        return pd.DataFrame(
            rows, columns=["event_type", "horizon_h", "l_raw", "b_raw", "s_raw"]
        )

    out = hourly.groupBy("event_type").applyInPandas(
        hw,
        T.StructType(
            [
                T.StructField("event_type", T.StringType()),
                T.StructField("horizon_h", T.LongType()),
                T.StructField("l_raw", T.DoubleType()),
                T.StructField("b_raw", T.DoubleType()),
                T.StructField("s_raw", T.DoubleType()),
            ]
        ),
    )
    return out.select(
        "event_type",
        "horizon_h",
        (F.round("l_raw", 6) + F.lit(0.0)).alias("level"),
        (F.round("b_raw", 6) + F.lit(0.0)).alias("trend"),
        (F.round("s_raw", 6) + F.lit(0.0)).alias("seasonal"),
        (
            F.round(
                F.col("l_raw")
                + F.col("horizon_h") * F.col("b_raw")
                + F.col("s_raw"),
                6,
            )
            + F.lit(0.0)
        ).alias("forecast"),
    )


# ---------------------------------------------------------------------------
# 1-D Kalman filter (constant-state model, per user)
# ---------------------------------------------------------------------------

KF_Q = 0.5  #: process-noise variance per step
KF_R = 4.0  #: measurement-noise variance


def _kalman_oracle() -> str:
    """Recursive-CTE replay of the predict/update cycle with the gain
    expression repeated VERBATIM inside x' and P' (the EWMA/Holt
    oracle discipline), so every state is bit-identical per step."""
    q, r = KF_Q, KF_R
    k = f"((r.p + {q}) / ((r.p + {q}) + {r}))"
    return f"""
WITH RECURSIVE seq AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
rec AS (
  SELECT user_id, rn, n, value AS x, CAST({r} AS DOUBLE) AS p,
         CAST(0.0 AS DOUBLE) AS k
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.n,
         r.x + {k} * (s.value - r.x),
         (1.0 - {k}) * (r.p + {q}),
         {k}
  FROM seq s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(x, 6) + 0.0 AS kalman_estimate,
       round(p, 6) + 0.0 AS error_variance,
       round(k, 6) + 0.0 AS kalman_gain
FROM rec WHERE rn = n
"""


@query("udf_kalman_filter_users", oracle=_kalman_oracle())
def udf_kalman_filter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter per user over the event-value stream
    (constant-state model, Q=0.5 process / R=4 measurement noise) —
    the OPTIMAL linear sequential estimator and the fifth member of
    the grouped-map recurrence family (EWMA = fixed gain, Holt adds
    trend, Holt-Winters adds seasonality, CUSUM detects shifts; the
    Kalman gain ADAPTS each step as K = P⁻/(P⁻+R), so early noisy
    estimates converge toward the steady-state gain). Emits each
    user's final estimate, error variance, and last gain — the
    "filtered sensor" readout of IoT/metrics smoothing pipelines.

    The update contains a per-step DIVISION, which is the reason this
    is beyond exact-integer window algebra: determinism instead comes
    from the EWMA contract — the Python loop and the recursive CTE
    perform the identical IEEE op sequence (the gain expression is
    repeated verbatim inside x' and P', never held in a SQL
    temporary), so every intermediate is bit-identical before
    round(6). Scale: one user-keyed shuffle; per-task state is three
    doubles; recursion depth = history length."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def kalman(pdf: pd.DataFrame) -> pd.DataFrame:
        q, r = KF_Q, KF_R
        pdf = pdf.sort_values(["ts", "event_id"])
        x = p = None
        k = 0.0
        for z in pdf["value"].tolist():
            if x is None:
                x, p = z, r
                continue
            p_pred = p + q
            k = p_pred / (p_pred + r)
            x = x + k * (z - x)
            p = (1.0 - k) * p_pred
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "x_raw": [x],
                "p_raw": [p],
                "k_raw": [k],
            }
        )

    out = (
        ev.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            kalman,
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("n_events", T.LongType()),
                    T.StructField("x_raw", T.DoubleType()),
                    T.StructField("p_raw", T.DoubleType()),
                    T.StructField("k_raw", T.DoubleType()),
                ]
            ),
        )
    )
    return out.select(
        "user_id",
        "n_events",
        (F.round("x_raw", 6) + F.lit(0.0)).alias("kalman_estimate"),
        (F.round("p_raw", 6) + F.lit(0.0)).alias("error_variance"),
        (F.round("k_raw", 6) + F.lit(0.0)).alias("kalman_gain"),
    )


# ---------------------------------------------------------------------------
# Viterbi decode over a 2-state HMM (browse / buy-intent)
# ---------------------------------------------------------------------------

import math as _math

#: Emission probabilities per hidden state (browse, intent) for each
#: event type, and the transition/initial matrices. The LOG constants
#: below are computed once in Python and embedded as shared literals,
#: so neither engine ever calls ln() — the whole DP is max/+ on doubles.
VIT_EMIT = {
    "view": (0.35, 0.15),
    "click": (0.30, 0.30),
    "signup": (0.10, 0.10),
    "error": (0.15, 0.05),
    "purchase": (0.10, 0.40),
}
VIT_TRANS = (0.8, 0.2, 0.3, 0.7)  #: a00, a01, a10, a11
VIT_INIT = (0.5, 0.5)

_LE = {t: (_math.log(p0), _math.log(p1)) for t, (p0, p1) in VIT_EMIT.items()}
_LA = tuple(_math.log(p) for p in VIT_TRANS)
_LI = tuple(_math.log(p) for p in VIT_INIT)


def _viterbi_oracle() -> str:
    """Recursive-CTE replay of the Viterbi DP: state (v0, v1) is the
    max log-prob of any path ending in each hidden state; per step
    v_j' = max(v_0 + lnA_0j, v_1 + lnA_1j) + lnB_j(obs) via GREATEST —
    the identical max/+ sequence as the Python loop."""
    a00, a01, a10, a11 = (f"CAST({a!r} AS DOUBLE)" for a in _LA)

    def emit(j: int) -> str:
        return (
            "CASE s.event_type "
            + " ".join(
                f"WHEN '{t}' THEN CAST({lp[j]!r} AS DOUBLE)"
                for t, lp in sorted(_LE.items())
            )
            + " END"
        )

    def emit1(j: int) -> str:
        return emit(j).replace("s.event_type", "event_type")

    return f"""
WITH RECURSIVE seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
rec AS (
  SELECT user_id, rn, n,
         CAST({_LI[0]!r} AS DOUBLE) + CAST({emit1(0)} AS DOUBLE) AS v0,
         CAST({_LI[1]!r} AS DOUBLE) + CAST({emit1(1)} AS DOUBLE) AS v1
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.n,
         GREATEST(r.v0 + {a00}, r.v1 + {a10}) + {emit(0)},
         GREATEST(r.v0 + {a01}, r.v1 + {a11}) + {emit(1)}
  FROM seq s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(CASE WHEN v1 > v0 THEN v1 ELSE v0 END, 6) + 0.0
         AS viterbi_logprob,
       CAST(CASE WHEN round(v1, 6) > round(v0, 6) THEN 1 ELSE 0 END AS BIGINT)
         AS best_final_state
FROM rec WHERE rn = n
"""


@query("udf_viterbi_2state", oracle=_viterbi_oracle())
def udf_viterbi_2state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decoding of a 2-state HMM (browse vs buy-intent) over
    each user's event-type sequence — the max-product DYNAMIC PROGRAM
    (Viterbi 1967; Rabiner 1989) behind session-intent tagging,
    activity segmentation, and every sequence-labeling pipeline. Per
    step the DP keeps the best log-probability of any path ending in
    each hidden state; the readout is the best final path's log-prob
    and its ending state. A NEW kernel class for the grouped-map lane:
    the recurrences so far were smoothers (EWMA/Holt/HW/Kalman) and
    detectors (CUSUM); this is a max-plus DP over a latent space —
    non-linear (max), non-invertible, strictly beyond window frames.

    Determinism: all ln() calls happen ONCE in Python; both engines
    receive the same double literals and perform only max/+ (exact,
    order-pinned via GREATEST ≡ Python max with identical operand
    order), so every DP cell is bit-identical; ties in the final
    argmax break to state 0 in both. Scale: one user-keyed shuffle;
    per-task state is two doubles; depth = history length."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    a00, a01, a10, a11 = _LA

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        v0 = v1 = None
        for t in pdf["event_type"].tolist():
            e0, e1 = _LE[t]
            if v0 is None:
                v0, v1 = _LI[0] + e0, _LI[1] + e1
            else:
                n0 = max(v0 + a00, v1 + a10) + e0
                n1 = max(v0 + a01, v1 + a11) + e1
                v0, v1 = n0, n1
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "v0": [v0],
                "v1": [v1],
            }
        )

    out = (
        ev.select("event_id", "user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandas(
            viterbi,
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("n_events", T.LongType()),
                    T.StructField("v0", T.DoubleType()),
                    T.StructField("v1", T.DoubleType()),
                ]
            ),
        )
    )
    best = F.when(F.col("v1") > F.col("v0"), F.col("v1")).otherwise(F.col("v0"))
    return out.select(
        "user_id",
        "n_events",
        (F.round(best, 6) + F.lit(0.0)).alias("viterbi_logprob"),
        # the argmax compares ROUND(·,6) values (the emitted precision):
        # a sub-emission 1-ulp DP divergence between engines must not be
        # able to flip the label on a near-tie (observed at sf0.01)
        F.when(F.round(F.col("v1"), 6) > F.round(F.col("v0"), 6), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("best_final_state"),
    )


# ---------------------------------------------------------------------------
# Croston's method (intermittent-demand forecasting)
# ---------------------------------------------------------------------------

CROSTON_A = 0.2  #: smoothing gain for both size and interval


def _croston_oracle() -> str:
    """Recursive-CTE replay over the per-user PURCHASE subsequence:
    Croston smooths demand SIZE and inter-demand INTERVAL as two EWMA
    recurrences that update only when demand occurs — the rn here
    indexes purchases, and the interval input is the gap in EVENTS
    since the previous purchase (position within the full timeline),
    both exact integers before the recursion's doubles."""
    a = CROSTON_A
    return f"""
WITH RECURSIVE pos AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS pidx
  FROM events
),
dem AS (
  SELECT user_id, value, pidx,
         row_number() OVER (PARTITION BY user_id ORDER BY pidx) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         pidx - COALESCE(lag(pidx) OVER (PARTITION BY user_id
                                         ORDER BY pidx), 0) AS iv
  FROM pos WHERE event_type = 'purchase'
),
rec AS (
  SELECT user_id, rn, n, value AS z, CAST(iv AS DOUBLE) AS p
  FROM dem WHERE rn = 1
  UNION ALL
  SELECT d.user_id, d.rn, d.n,
         {a} * d.value + {1 - a} * r.z,
         {a} * CAST(d.iv AS DOUBLE) + {1 - a} * r.p
  FROM dem d JOIN rec r ON d.user_id = r.user_id AND d.rn = r.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_demands,
       round(z, 6) + 0.0 AS smoothed_size,
       round(p, 6) + 0.0 AS smoothed_interval,
       round(z / p, 6) + 0.0 AS demand_rate
FROM rec WHERE rn = n
"""


@query("udf_croston_demand", oracle=_croston_oracle())
def udf_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) per user over the purchase stream — THE
    intermittent-demand forecaster (spare parts, reorders, sparse
    purchasing): classic exponential smoothing is biased when most
    periods have zero demand, so Croston smooths two series that
    update ONLY at demand points — the demand size z and the
    inter-demand interval p — and forecasts the demand RATE z/p. The
    event-TRIGGERED update is the family-distinguishing feature
    (EWMA/Holt/HW/Kalman update every observation; CUSUM clamps;
    Croston's clock only ticks on nonzero demand).

    Exactness is the EWMA contract on the purchase SUBSEQUENCE:
    intervals are exact integer event-position gaps, sizes raw
    doubles, and the Python loop and recursive CTE run the identical
    IEEE sequence per demand point before round(6). Scale: one
    user-keyed shuffle; state is two doubles; depth = purchases per
    user."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def croston(pdf: pd.DataFrame) -> pd.DataFrame:
        a = CROSTON_A
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        z = p = None
        n = 0
        last_pos = 0
        for pos, (t, v) in enumerate(
            zip(pdf["event_type"].tolist(), pdf["value"].tolist()), start=1
        ):
            if t != "purchase":
                continue
            iv = pos - last_pos
            last_pos = pos
            n += 1
            if z is None:
                z, p = v, float(iv)
            else:
                z = a * v + (1 - a) * z
                p = a * float(iv) + (1 - a) * p
        if n == 0:
            return pd.DataFrame(
                columns=["user_id", "n_demands", "z_raw", "p_raw"]
            ).astype(
                {"user_id": "int64", "n_demands": "int64",
                 "z_raw": "float64", "p_raw": "float64"}
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_demands": [n],
                "z_raw": [z],
                "p_raw": [p],
            }
        )

    out = (
        ev.select("event_id", "user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandas(
            croston,
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("n_demands", T.LongType()),
                    T.StructField("z_raw", T.DoubleType()),
                    T.StructField("p_raw", T.DoubleType()),
                ]
            ),
        )
    )
    return out.select(
        "user_id",
        "n_demands",
        (F.round("z_raw", 6) + F.lit(0.0)).alias("smoothed_size"),
        (F.round("p_raw", 6) + F.lit(0.0)).alias("smoothed_interval"),
        (F.round(F.col("z_raw") / F.col("p_raw"), 6) + F.lit(0.0)).alias(
            "demand_rate"
        ),
    )
