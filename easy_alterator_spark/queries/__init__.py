"""Query inventory: declared relational queries (SURVEY.md §2.10) plus
north-star extension queries, each registered with an optional DuckDB
oracle SQL string for the differential correctness gate."""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# queries excluded from bench.py timing: fixed-size fixture runs whose
# latency is plan overhead, not data-scale work (their bulk/scaled
# variants ARE benched)
NO_BENCH: set[str] = set()


def query(
    name: str, oracle: str | None = None, bench: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is equivalent DuckDB SQL (omit for
    ops the oracle can't express — the driver then does a rows-only
    check). ``bench=False`` keeps fixture-sized correctness queries out
    of the timing suite."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        # Defensive conf fix-up: registered queries must be correct on
        # ANY session (the driver passes its own vanilla one), not just
        # the tuned session from session.get_spark().
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        if not bench:
            NO_BENCH.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import (  # noqa: F401
        analytics,
        corpusops,
        evalops,
        extensions,
        featureops,
        relational,
        scaleops,
        schema_tools,
        sketchops,
    )


__all__ = ["QUERIES", "ORACLES", "NO_BENCH", "query", "load_all"]
