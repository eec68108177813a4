"""Slot queries must survive cross-SF alternation in one session.

Session-slot keys deliberately omit sf_dir (pop-and-release keeps at
most one invocation's relations alive), so invoking a slot query at
one scale and then another must rebuild cleanly — stale persisted
relations, CacheManager plan-equality collisions, or a landing/dir
helper keyed wrongly would surface as a value drift at the SECOND
scale or on the return to the first. The driver itself alternates
scales in one process (entry() at sf0.001, then the sweep at sf0.01),
so this is the harness's own access pattern, pinned. The r8 probe ran
nine slot queries through sf0.001 → sf0.01 → sf0.001 with a full
oracle compare at every step; this test keeps four representatives
(one per slot idiom: iterative graph loop, shared co-supply edges,
range fan-out persist, grouped-map cache) in CI.
"""

from __future__ import annotations

import pytest

from oracle_compare import compare

import etl_pipeline_sam_gov_spark as eng

REPRESENTATIVES = [
    "graph_random_walks",        # iterative loop, per-step persists
    "graph_triangle_count",      # shared co-supply edge cache
    "ab_sequential_sprt",        # range fan-out persist (r8)
    "ml_isotonic_calibration",   # grouped-map Arrow cache
]


def _fresh(name):
    fn = eng.QUERIES[name]
    return getattr(fn, "__wrapped__", fn)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_cross_sf_alternation_matches_oracle(spark, name):
    for sf in ("sf0.001", "sf0.01", "sf0.001"):
        compare(
            spark, name, _fresh(name), eng.ORACLES[name],
            f"/root/testdata/{sf}",
        )
