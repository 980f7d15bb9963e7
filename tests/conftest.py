from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import os

    from easy_alterator_spark.session import get_spark

    # local[8] (r12, VERDICT-r11 task 3 — suite wall-clock): the suite
    # is ~1000 Spark-executing tests whose jobs run 32 shuffle
    # partitions over tiny data; 8 cores halve the task-wave count per
    # stage vs the old local[4] (A/B on test_operators.py: 126 s ->
    # 117 s — modest, the floor is per-job scheduling, but free on any
    # 8+-core host). Overridable for constrained hosts.
    cores = os.environ.get("EA_TEST_CORES", "8")
    s = get_spark("easy-alterator-spark-tests", master=f"local[{cores}]")
    yield s
    s.stop()


def make_duck(sf_dir: str):
    """DuckDB connection with the star-schema tables as views."""
    import duckdb

    from easy_alterator_spark.sources import TABLE_NAMES

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    return make_duck(SF_SMOKE)


@pytest.fixture(scope="session")
def duck_oracle():
    return make_duck(SF_ORACLE)
