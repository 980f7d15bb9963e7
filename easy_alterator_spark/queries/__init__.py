"""Query inventory: declared relational queries (SURVEY.md §2.10) plus
north-star extension queries, each registered with an optional DuckDB
oracle SQL string for the differential correctness gate."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is equivalent DuckDB SQL (omit for
    ops the oracle can't express — the driver then does a rows-only
    check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import extensions, relational  # noqa: F401


__all__ = ["QUERIES", "ORACLES", "query", "load_all"]
