"""Differential gate: every registered query with an oracle must match
DuckDB exactly at the local test scale factor (mirrors the driver's
CORRECTNESS check at sf0.01, SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

import etl_pipeline_sam_gov_spark as eng
from tests.oracle_compare import compare


@pytest.mark.parametrize("name", sorted(eng.ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, name, eng.QUERIES[name], eng.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(eng.QUERIES) - set(eng.ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = eng.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
