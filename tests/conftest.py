from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from easy_alterator_spark.session import get_spark

    s = get_spark("easy-alterator-spark-tests", master="local[4]")
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
