"""Differential gate: every registered query with an oracle must match
DuckDB at sf0.001 (fast smoke; the driver re-runs this at sf0.01).
Queries without an oracle get a rows-runnable smoke check."""

from __future__ import annotations

import pytest

from easy_alterator_spark.queries import ORACLES, QUERIES, load_all

from .conftest import SF_SMOKE
from .util import assert_df_matches_oracle

load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck_smoke):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_df_matches_oracle(df, duck_smoke, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(name, spark):
    df = QUERIES[name](spark, SF_SMOKE)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
