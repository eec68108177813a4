"""The bench regression guard must catch plan damage, not machine load.

Round-2 postmortem (VERDICT.md "What's wrong" #2): a loaded driver
machine inflated *every* headline query 1.3-2.0x and failed the guard
on the one that crossed 2.0x, even though no plan changed. The guard
now divides out the run's median inflation first; these tests pin both
sides of that contract with synthetic timings (no Spark needed).
"""

from __future__ import annotations

import json

import bench


FLOOR = {"qa": 1.0, "qb": 0.5, "qc": 2.0, "qd": 0.25, "qe": 0.8}


def _run(tmp_path, monkeypatch, timings):
    floor_file = tmp_path / "floor.json"
    floor_file.write_text(json.dumps(FLOOR))
    monkeypatch.setattr(bench, "FLOOR_PATH", str(floor_file))
    rc = bench.check_floor(timings)
    return rc, json.loads(floor_file.read_text())


def test_uniformly_loaded_run_passes(tmp_path, monkeypatch):
    # Every query 2.2x its floor — worse than the raw 2x cutoff, but
    # uniform: median inflation is divided out, so the guard passes.
    timings = {n: f * 2.2 for n, f in FLOOR.items()}
    rc, floor_after = _run(tmp_path, monkeypatch, timings)
    assert rc == 0
    assert floor_after == FLOOR  # a slow run never tightens the floor


def test_single_query_regression_fails_even_under_load(tmp_path, monkeypatch):
    # Machine 1.5x loaded AND one query's plan regressed 4x: the median
    # sits at 1.5, so qc still shows 4/1.5 = 2.7x > 2x and trips.
    timings = {n: f * 1.5 for n, f in FLOOR.items()}
    timings["qc"] = FLOOR["qc"] * 4 * 1.5
    rc, _ = _run(tmp_path, monkeypatch, timings)
    assert rc == 1


def test_clean_run_with_one_regression_fails(tmp_path, monkeypatch):
    timings = dict(FLOOR)
    timings["qb"] = FLOOR["qb"] * 2.5
    rc, _ = _run(tmp_path, monkeypatch, timings)
    assert rc == 1


def test_improvements_tighten_floor_from_raw_times(tmp_path, monkeypatch):
    timings = dict(FLOOR)
    timings["qa"] = 0.6
    rc, floor_after = _run(tmp_path, monkeypatch, timings)
    assert rc == 0
    assert floor_after["qa"] == 0.6
    assert floor_after["qc"] == FLOOR["qc"]


def test_unknown_queries_and_empty_floor_pass(tmp_path, monkeypatch):
    floor_file = tmp_path / "floor.json"
    floor_file.write_text("{}")
    monkeypatch.setattr(bench, "FLOOR_PATH", str(floor_file))
    assert bench.check_floor({"new_query": 9.9}) == 0


def test_regressions_helper_drives_the_retrial_pass(tmp_path, monkeypatch):
    # The retrial pass in main() re-times exactly the queries this
    # helper flags. Uniform load → nothing flagged (no wasted retrials);
    # one outlier → only that query flagged.
    uniform = {n: f * 1.8 for n, f in FLOOR.items()}
    assert bench.regressions(uniform, FLOOR) == {}
    outlier = dict(uniform)
    outlier["qd"] = FLOOR["qd"] * 1.8 * 3
    assert set(bench.regressions(outlier, FLOOR)) == {"qd"}


def test_median_inflation_helper_matches_guard_semantics():
    """r7 (VERDICT r06 next-round #5): the bench JSON's
    median_inflation field must be the exact factor regressions()
    divides out — median per-query ratio to floor, clamped at 1.0, 1.0
    on an empty floor — so a reader can reconstruct the guard's
    normalized numbers from the JSON alone."""
    t = {"qa": 2.2, "qb": 1.1, "qc": 4.4, "qd": 0.55, "qe": 1.76}
    # uniform 2.2x: median ratio is exactly 2.2
    assert bench.median_inflation(t, FLOOR) == 2.2
    # faster-than-floor runs clamp to 1.0 (never deflate)
    fast = {k: v * 0.4 for k, v in FLOOR.items()}
    assert bench.median_inflation(fast, FLOOR) == 1.0
    # no floor -> 1.0, and regressions() must agree with the field:
    assert bench.median_inflation(t, {}) == 1.0
    flagged = bench.regressions(t, FLOOR)
    for name, (tt, fl, inf) in flagged.items():
        assert inf == bench.median_inflation(t, FLOOR)
