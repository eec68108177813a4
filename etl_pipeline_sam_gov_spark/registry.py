"""Query/oracle registry backing the driver contract (``__spark_entry__.py``).

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string run
against the same parquet tables. The driver compares the two at sf=0.01
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates go through exact decimal arithmetic or a final
  ``round()`` so both engines produce bit-identical doubles;
- timestamps are emitted as formatted strings or ``unix_micros`` ints
  (DuckDB ``epoch_us``) — never raw timestamps, to stay timezone-proof.
"""

from __future__ import annotations

import functools
import weakref
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Queries whose constructed DataFrame is memoized per (session, sf_dir)
#: — the prepared-statement path. A query function is a PURE plan
#: builder: same (spark, sf_dir) → the identical immutable plan, so
#: rebuilding it per invocation only re-pays the py4j round trips of
#: expression construction (measured 23% of total headline bench time
#: at sf0.1 — up to 0.9 s for the widest composed DAGs, pure
#: single-threaded driver CPU that a loaded machine inflates worst).
#: The cached plan still EXECUTES in full on every action — nothing is
#: materialized — so bench numbers keep measuring real engine work.
#:
#: Opt-in and structurally gated: queries that persist()/collect()
#: internally (iterative graph loops, shared-scan dedup, prefix-sum
#: packing) are excluded, because returning their cached DataFrame
#: would serve re-runs from the persisted relations and measure
#: Spark's block cache instead of the query. tests/test_plans.py
#: asserts every name below builds a plan with ZERO InMemoryRelation
#: nodes, so a stateful helper sneaking into a cached query fails CI.
PLAN_CACHED: frozenset[str] = frozenset(
    {
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "agg_rollup",
        "window_running_user",
        "sessionize_events",
        "contracts_transform",
        "ann_bruteforce_topk",
        "fn_json_events",
        "q10_returned_items",
        "text_quality_score",
        "q9_product_type_profit",
        "q21_sole_returning_supplier",
        "ann_ivf_topk",
        "merge_incremental_upsert",
        "text_redact_pii",
        "multimodal_features",
        "resample_interpolate_hourly",
        "join_bloom_prefilter",
        "text_bm25_retrieval",
        "ts_anomaly_rolling_z",
        "join_spatial_grid_radius",
        "similarity_maxsim_topk",
        "agg_gini_customer_spend",
        "ts_peak_concurrency_minutes",
        "dq_referential_orphans",
        "pipeline_health_report",
        "ab_test_cuped",
        "seq_session_trigrams",
        "text_boilerplate_removal",
        "ann_mmr_rerank",
        "udf_holt_winters_hourly",
        # mwu stays cacheable: its r8 exchange-reuse-independence fix
        # is deterministic width_bucket slicing (a pure row function),
        # not the persist the other five fan-out sites took — so it
        # still builds zero InMemoryRelation nodes.
        "ab_mann_whitney_u",
        "dedup_levenshtein_blocked",
        # r9: the remaining pure-plan-builder headliners (no persist,
        # no collect anywhere in their construction — the zero-
        # InMemoryRelation gate in tests/test_plans.py covers them like
        # the rest). Their widest DAGs (the 11-branch profile union,
        # the two-leg fusion) were paying up to ~1 s of pure py4j
        # plan-construction per bench invocation.
        # (pipeline_training_corpus_v2 stays OUT: semantic_keep
        # persists its cluster assignment internally.)
        "join_fuzzy_name_match",
        "join_salted_skewed_orders",
        "agg_table_profile",
        "dq_constraint_suite",
        "retrieval_hybrid_rrf",
    }
)

#: session → {(query name, sf_dir) → prepared DataFrame}. Weak-keyed so
#: a stopped session's plans (bound to a dead JVM handle) can never be
#: served to a new session that reuses the same id().
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)

#: r10 (VERDICT r09 #3): queries that run with AQE free to re-optimize
#: the output partitioning of their persisted (InMemoryRelation) setup
#: caches — ``canChangeCachedPlanOutputPartitioning=true``. With the
#: default (false), a cached ``repartition("src")`` always materializes
#: at the static shuffle-partition count (cores, locally), and every
#: downstream per-round stage of the iterative kernels inherits that
#: width no matter how small the cache is; with AQE allowed, the cache's
#: partition count derives from its measured BYTES (advisory partition
#: size) — the scale-adaptive sizing guide §2 asks for. Results are
#: partitioning-invariant (all six iterative graph outputs asserted
#: identical under both values; everything is rounded/exact per repo
#: convention, full oracle sweep green under the pinned set).
#:
#: Membership is MEASURED per query (interleaved best-of-N at sf0.1,
#: twice, plus an order-alternating tiebreak — OPTIMIZATION_r10.md §3):
#: the listed queries improved 12–43%; ``graph_kcore_membership`` is
#: deliberately ABSENT (it regressed ~20–26% both times: its early peel
#: rounds do full-edge-set work that a bytes-coalesced cache narrows to
#: too few cores at this SF), as are ``dedup_minhash_lsh`` (+7–10%),
#: ``pipeline_training_corpus_v2`` and ``ml_isotonic_calibration``
#: (flat-to-worse). Every registered query EXECUTES under an explicitly
#: pinned value (true here, false otherwise), so plan shape never
#: depends on which query ran before.
CACHED_PLAN_AQE_REPARTITION: frozenset[str] = frozenset(
    {
        "graph_pagerank_bipartite",
        "graph_personalized_pagerank",
        "graph_bfs_hops",
        "graph_label_propagation",
        "graph_random_walks",
        "reco_item_lift",
        "text_bpe_merge_rounds",
        # Non-headliner persisting queries, same A/B protocol (outputs
        # identical; order-alternating best-of-6 at sf0.1):
        # hits 0.53 (5.86->3.09, every sample separated), cc 0.79,
        # triangle 0.83, cluster-components 0.88. ts_exponential_fit_ks
        # measured flat (1.02) and stays false.
        "graph_hits_scores",
        "graph_clustering_coefficient",
        "graph_triangle_count",
        "dedup_cluster_components",
    }
)

_CCPOP_CONF = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"


def _pin_cached_plan_conf(name: str, fn: QueryFn) -> QueryFn:
    """Pin _CCPOP_CONF for this query's build AND execution.

    Set BEFORE the builder (iterative builders may run setup jobs) and
    re-asserted AFTER it (composed builders invoke other registered
    queries inline, whose own pins would otherwise leak into this
    query's execution, which happens after the wrapper returns)."""
    val = "true" if name in CACHED_PLAN_AQE_REPARTITION else "false"

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.conf.set(_CCPOP_CONF, val)
        except Exception:  # conf-less session stub in unit tests
            return fn(spark, sf_dir)
        df = fn(spark, sf_dir)
        spark.conf.set(_CCPOP_CONF, val)
        return df

    # tests' fresh() unwraps ONE level to reach the raw builder; keep
    # that contract across the (pin ∘ plan-cache) double wrapper.
    wrapper.__wrapped__ = getattr(fn, "__wrapped__", fn)
    return wrapper


def _plan_cached(name: str, fn: QueryFn) -> QueryFn:
    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            per = _PLAN_CACHE.setdefault(spark, {})
        except TypeError:  # non-weakref-able session stub in tests
            return fn(spark, sf_dir)
        key = (name, sf_dir)
        df = per.get(key)
        if df is None:
            df = per[key] = fn(spark, sf_dir)
        return df

    return wrapper

#: Deliberately non-scalable ground-truth twins: query name → the
#: registered scale-path variant that is the engine's production answer
#: for the same problem. A baseline stays registered (it shares its
#: oracle with the twin, PROVING the twin's blocking/bucketing loses
#: nothing) but must never be mistaken for the serving plan.
BASELINE_OF: dict[str, str] = {}


def query(
    name: str,
    oracle: Optional[str] = None,
    baseline_of: Optional[str] = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as its DuckDB SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator
    (streaming stateful ops, approximate sketches); the driver then runs
    a weaker rows-only check.

    ``baseline_of="x"`` marks this query as the exact-but-O(n²)/(Q×N)
    ground-truth twin of scale-path query ``x`` — kept registered so
    the pair stays oracle-green together, never the production path.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = _pin_cached_plan_conf(
            name, _plan_cached(name, fn) if name in PLAN_CACHED else fn
        )
        if oracle is not None:
            ORACLES[name] = oracle
        if baseline_of is not None:
            BASELINE_OF[name] = baseline_of
        return fn

    return deco
