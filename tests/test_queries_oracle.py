"""Differential gate: every registered query with an oracle must match
DuckDB at sf0.001 (fast smoke; the driver re-runs this at sf0.01).
Run the full-scale gate locally with EA_ORACLE_SF_DIR=/root/testdata/sf0.01.
Queries without an oracle get a rows-runnable smoke check."""

from __future__ import annotations

import os

import pytest

from easy_alterator_spark.queries import ORACLES, QUERIES, load_all

from .conftest import SF_SMOKE, make_duck
from .util import assert_df_matches_oracle

load_all()

SF_GATE = os.environ.get("EA_ORACLE_SF_DIR", SF_SMOKE)


@pytest.fixture(scope="module")
def duck_gate():
    return make_duck(SF_GATE)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck_gate):
    df = QUERIES[name](spark, SF_GATE)
    assert_df_matches_oracle(df, duck_gate, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(name, spark):
    df = QUERIES[name](spark, SF_GATE)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
