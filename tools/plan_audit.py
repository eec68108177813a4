"""Registry-wide physical-plan audit.

Builds every registered query's plan at the given sf dir and records
the scale-relevant node counts — shuffles (Exchange minus
BroadcastExchange), broadcasts, windows, generates, Python eval nodes,
cartesians — plus red flags (undeclared cartesian, Python in an
oracle-checked relational path). One line per query; a JSON artifact
for diffing plan shapes across rounds the way BENCH_FLOOR diffs
timings.

Counts are TEXTUAL over the plan string: for iterative queries whose
rounds persist intermediates (CC labels, PageRank, BPE), the cached
relations' build lineage prints inside InMemoryTableScan, so their
counts overstate what executes (each cached subtree runs once). The
numbers are for round-over-round DIFFING, not absolute cost.

Usage: python tools/plan_audit.py [sf_dir] [out_json]
(defaults: /root/testdata/sf0.001, /tmp/plan_audit.json)
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import etl_pipeline_sam_gov_spark as eng  # noqa: E402
from etl_pipeline_sam_gov_spark.plans.introspect import physical_plan  # noqa: E402
from etl_pipeline_sam_gov_spark.session import get_spark  # noqa: E402

#: semantically-cross queries where CartesianProduct is the plan
DECLARED_CROSS = {"join_cross_region_status"}
#: queries whose POINT is the Python lane
PYTHON_LANES = ("udf_", "udtf_", "multimodal_")
#: declared Arrow grouped-map kernels outside those prefixes: greedy
#: MMR selection and PAV pooling are inherently sequential per group —
#: the sanctioned escape hatch, not a relational op that fell off the
#: JVM path (row-at-a-time BatchEvalPython stays banned by test_plans)
DECLARED_PYTHON = {"ann_mmr_rerank", "ml_isotonic_calibration"}

#: Window frames whose LOWER bound moves while the upper is unbounded
#: ("shrinking" frames): Spark re-aggregates the whole remaining frame
#: per row — O(n²) per partition (measured 12× super-linear on the
#: caliper-match walk before its fix). The reversed-sort running frame
#: computes the same value incrementally; nothing in the registry
#: should plan one.
_FRAME_RE = re.compile(
    r"specifiedwindowframe\((?:Row|Range)Frame, "
    r"(unboundedpreceding\$\(\)|currentrow\$\(\)|[^,]+?), "
    r"(unboundedfollowing\$\(\))\)"
)


def shrinking_frames(plan: str) -> int:
    return sum(
        1
        for m in _FRAME_RE.finditer(plan)
        if m.group(1) != "unboundedpreceding$()"
    )


# --- corpus-scale global-window gate ---------------------------------------
# A Window with NO partition spec funnels its whole input through one
# partition. That is fine on a bounded relation (a post-aggregation
# score lattice, a K-row candidate table) and a 100×-scale killer on a
# corpus relation. The gate walks the OPTIMIZED LOGICAL plan: flag any
# no-partition Window whose subtree reaches a corpus-table leaf without
# an intervening aggregation or limit (either bounds cardinality below
# corpus scale). Leaves are identified by their parquet schema attrs.

#: column prefixes / names that identify an SF-scaling fixture table
#: (region/nation are constant-size and deliberately absent)
_CORPUS_PREFIXES = ("l_", "o_", "c_", "p_", "ps_", "s_")
_CORPUS_NAMES = {"event_id", "user_id", "doc_id", "vec_id", "embedding"}
#: logical nodes that bound output cardinality regardless of input size.
#: WindowGroupLimit is the rank<=k pushdown: it caps each group at k
#: rows per map task BEFORE the window shuffle, so a per-group top-k
#: window never carries whole groups (the sanctioned per-lang sampling
#: shape).
_BOUNDING_NODES = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
    "WindowGroupLimit",
}

#: queries whose global window provably rides a bounded relation the
#: gate cannot see through: the two-stage distributed skyline's global
#: pass runs over the UNION OF LOCAL FRONTIERS (O(buckets × frontier)
#: rows, produced by a filter the gate cannot size) — the textbook
#: final stage of Börzsönyi-style skylines, not a corpus funnel.
DECLARED_BOUNDED_GLOBAL_WINDOW = {"join_skyline_parts"}


def _is_corpus_leaf(node) -> bool:
    out = node.output()
    for i in range(out.size()):
        n = out.apply(i).name()
        if n in _CORPUS_NAMES or n.startswith(_CORPUS_PREFIXES):
            return True
    return False


def _reaches_corpus(node) -> bool:
    if node.nodeName() in _BOUNDING_NODES:
        return False
    ch = node.children()
    if ch.size() == 0:
        return _is_corpus_leaf(node)
    return any(_reaches_corpus(ch.apply(i)) for i in range(ch.size()))


def corpus_global_windows(df) -> int:
    """Count no-partition Windows riding an unaggregated corpus scan."""
    hits = 0

    def walk(node) -> None:
        nonlocal hits
        if node.nodeName() == "Window" and node.partitionSpec().size() == 0:
            ch = node.children()
            if any(_reaches_corpus(ch.apply(i)) for i in range(ch.size())):
                hits += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return hits


# --- low-cardinality window funnel gate -------------------------------------
# The SPRT lesson generalized: a Window partitioned ONLY by a 2-5-value
# key (arm, event_type, lang, source) holds a constant FRACTION of the
# corpus in one task — the same funnel as a no-partition window, made
# invisible to the stress battery because time stays linear while
# parallelism is capped at |key|. Flag any Window whose partition keys
# are all drawn from the known low-cardinality fixture columns and
# whose subtree reaches a corpus leaf without a bounding node.

#: fixture columns whose distinct-value count never grows with the
#: corpus (2-6 values each) — a window keyed ONLY by these is a funnel
_LOW_CARD_KEYS = {
    "event_type",
    "arm",
    "lang",
    "source",
    "split",
    "treated",
    "prev_type",
    "next_type",
    "kind",
}

_ATTR_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def low_card_corpus_windows(df) -> int:
    """Count Windows keyed only by low-cardinality columns riding an
    unaggregated corpus scan."""
    hits = 0

    def walk(node) -> None:
        nonlocal hits
        if node.nodeName() == "Window" and node.partitionSpec().size() > 0:
            ps = node.partitionSpec()
            keys: set[str] = set()
            for i in range(ps.size()):
                keys.update(_ATTR_RE.findall(ps.apply(i).toString()))
            if keys and keys <= _LOW_CARD_KEYS:
                ch = node.children()
                if any(_reaches_corpus(ch.apply(i)) for i in range(ch.size())):
                    hits += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return hits


#: queries whose low-card-keyed window provably rides a relation the
#: gate cannot size (none currently — the three r5 members were
#: restructured instead of declared)
DECLARED_BOUNDED_LOW_CARD_WINDOW: set = set()


# --- corpus×corpus nested-loop join gate -------------------------------------
# VERDICT r05 #2: the auditor counted CartesianProduct but a CONDITIONED
# BroadcastNestedLoopJoin — what Catalyst plans when a join condition has
# no extractable equi-keys, e.g. an OR of band equalities — has the same
# O(n·m) candidate asymptotics and went uncounted. That blind spot is
# exactly how multimodal_image_dhash_pairs' all-pairs plan survived a
# "0 flags" audit. Gate: walk the PHYSICAL plan; flag any BNLJ or
# CartesianProduct where BOTH children reach a corpus leaf without a
# bounding node. A bounded build side (band table, day grid, ≤7-type
# lattice, 1-row model, broadcast seed set) passes by construction.

#: physical nodes that bound output cardinality regardless of input size
#: (nodeName() strips the Exec suffix). Deduplicate and Aggregate lower
#: to the *Aggregate nodes; rank<=k pushdown lowers to WindowGroupLimit.
_PHYS_BOUNDING = {
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
}

#: DECLARED all-pairs plans whose asymptotics are the point:
#:   ann_bruteforce_topk    — exact O(Q×N) ground truth, registered
#:                            baseline of ann_ivf_topk
#:   ann_recall_at_k        — the recall evaluator; consumes the same
#:                            brute-force ground truth by definition
#:   dedup_simhash          → scale twin dedup_simhash_blocked
#:   dedup_embedding_cosine → scale twin ann_lsh_bucketed_topk
#: (The two dedup baselines currently pass the walk anyway — their
#: signature relations sit behind a per-doc Aggregate, which this gate,
#: like the window gates, treats as bounding — but they are declared so
#: a signature-pipeline refactor can't turn a deliberate baseline into
#: a surprise flag.)
DECLARED_CORPUS_BNLJ = {
    "ann_bruteforce_topk",
    "ann_recall_at_k",
    "dedup_simhash",
    "dedup_embedding_cosine",
}


def _phys_reaches_corpus(node) -> bool:
    if node.nodeName() in _PHYS_BOUNDING:
        return False
    ch = node.children()
    if ch.size() == 0:
        return _is_corpus_leaf(node)
    return any(_phys_reaches_corpus(ch.apply(i)) for i in range(ch.size()))


def corpus_nested_loop_joins(df) -> int:
    """Count BNLJ/CartesianProduct nodes with BOTH sides at corpus scale
    (all-pairs candidate work regardless of output size)."""
    hits = 0

    def walk(node) -> None:
        nonlocal hits
        if node.nodeName() in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            ch = node.children()
            if all(
                _phys_reaches_corpus(ch.apply(i)) for i in range(ch.size())
            ):
                hits += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit.json"
    spark = get_spark("plan-audit")
    rows: dict[str, dict] = {}
    flags: list[str] = []
    for name, fn in eng.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            s = physical_plan(df)
            corpus_windows = corpus_global_windows(df)
            low_card_windows = low_card_corpus_windows(df)
            corpus_nlj = corpus_nested_loop_joins(df)
        except Exception as e:
            rows[name] = {"error": str(e)[:200]}
            flags.append(f"{name}: plan failed")
            continue
        r = {
            "shuffles": s.count("Exchange") - s.count("BroadcastExchange"),
            "broadcasts": s.count("BroadcastExchange"),
            "windows": s.count("Window"),
            "generates": s.count("Generate"),
            "python": s.count("BatchEvalPython")
            + s.count("ArrowEvalPython")
            + s.count("FlatMapGroupsInPandas")
            + s.count("MapInPandas")
            + s.count("PythonMapInArrow"),
            "cartesian": s.count("CartesianProduct"),
            "scans": s.count("FileScan"),
        }
        rows[name] = r
        r["shrinking_frames"] = shrinking_frames(s)
        r["corpus_global_windows"] = corpus_windows
        if corpus_windows and name not in DECLARED_BOUNDED_GLOBAL_WINDOW:
            flags.append(
                f"{name}: {corpus_windows} no-partition Window(s) over an "
                "unaggregated corpus relation (single-partition funnel)"
            )
        r["low_card_windows"] = low_card_windows
        if low_card_windows and name not in DECLARED_BOUNDED_LOW_CARD_WINDOW:
            flags.append(
                f"{name}: {low_card_windows} Window(s) keyed only by a "
                "low-cardinality column over an unaggregated corpus "
                "relation (|key|-task funnel)"
            )
        r["corpus_nlj"] = corpus_nlj
        if corpus_nlj and name not in DECLARED_CORPUS_BNLJ:
            flags.append(
                f"{name}: {corpus_nlj} corpus×corpus nested-loop join(s) "
                "(BNLJ/Cartesian with both sides unbounded — all-pairs "
                "candidate work at scale)"
            )
        if r["cartesian"] and name not in DECLARED_CROSS:
            flags.append(f"{name}: undeclared CartesianProduct")
        if (
            r["python"]
            and not name.startswith(PYTHON_LANES)
            and name not in DECLARED_PYTHON
        ):
            flags.append(f"{name}: Python eval in a relational path")
        if r["shrinking_frames"]:
            flags.append(f"{name}: shrinking window frame (O(n²) per row)")
    with open(out_json, "w") as f:
        json.dump({"sf_dir": sf_dir, "plans": rows, "flags": flags}, f, indent=1)
    worst = sorted(
        ((n, r) for n, r in rows.items() if "shuffles" in r),
        key=lambda kv: -kv[1]["shuffles"],
    )[:10]
    print(f"{len(rows)} queries audited; {len(flags)} flags")
    for fl in flags:
        print("FLAG:", fl)
    print("top shuffle counts:")
    for n, r in worst:
        print(f"  {n:36s} shuffles={r['shuffles']:2d} broadcasts={r['broadcasts']:2d}")


if __name__ == "__main__":
    main()
