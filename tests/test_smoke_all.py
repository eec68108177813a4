"""Every registered query must also run at the smoke scale (sf0.001) —
guards against tiny-data edge cases (empty partitions, empty groups,
short documents) that the sf0.01 oracle sweep can mask. Streaming
queries are exercised per-query in test_streaming/test_oracle_parity
and skipped here to keep the sweep fast."""

from __future__ import annotations

import pytest

import etl_pipeline_sam_gov_spark as eng

SMOKE_SF = "/root/testdata/sf0.001"

BATCH_QUERIES = sorted(n for n in eng.QUERIES if not n.startswith("stream_"))


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_query_runs_at_smoke_scale(spark, name):
    df = eng.QUERIES[name](spark, SMOKE_SF)
    assert df.count() >= 0  # runs end-to-end; schema resolves; no throw


def test_registry_metadata_is_coherent():
    """baseline_of targets must be registered scale-path queries, and a
    baseline must itself be oracle-checked (that is its whole job);
    declared rows-only queries must be exactly the oracle-less ones."""
    import __spark_entry__ as ent

    for base, twin in eng.BASELINE_OF.items():
        assert base in eng.QUERIES and twin in eng.QUERIES
        assert base in eng.ORACLES, f"baseline {base} lost its oracle"
        assert twin not in eng.BASELINE_OF, f"{twin} is both baseline and twin"
    assert set(ent.rows_only()) == set(eng.QUERIES) - set(eng.ORACLES)
