"""Parquet table sources for the synthetic star schema.

The reference never reads data files — it only reads table *metadata*
(SURVEY.md §2.1). The new engine reads actual Parquet via
``spark.read.parquet`` so filters and projections push down to the scan
(check ``.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always broadcast in joins. At 100 TB the
# fact tables (lineitem/orders/events/documents) grow; these stay small.
BROADCAST_TABLES = frozenset({"region", "nation"})


# (appId, realpath, mtime_ns) -> raw parquet StructType. Schema
# inference (footer read + file listing) is ~74 ms warm per
# spark.read.parquet call — across a 161-query bench (x3 timed runs,
# ~1.7 tables each) that is tens of seconds of pure re-resolution.
# Only the SCHEMA is cached, never the DataFrame: every call still
# builds a fresh plan via spark.read.schema(...).parquet(path), so two
# load_table calls for the same table keep distinct expression IDs —
# returning one shared DataFrame object turns correlated-subquery
# shapes (q36's per-region min-cost supplier) into ambiguous
# self-joins. Keyed by applicationId (a stopped/rebuilt session gets a
# fresh id) and st_mtime_ns (a rewritten tmp-dir table misses the
# cache). Non-os.stat-able paths (hadoop-scheme URIs) bypass the cache.
_SCHEMA_CACHE: dict[tuple[str, str, int], "object"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Defensive: the caller may hand us a vanilla session (the
    # correctness driver does); the nanos parquet read and oracle
    # parity need these confs regardless of who built the session.
    from ..session import ensure_confs

    ensure_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = None
    try:
        st = os.stat(path)
        key = (spark.sparkContext.applicationId, os.path.realpath(path), st.st_mtime_ns)
    except OSError:
        pass
    schema = _SCHEMA_CACHE.get(key) if key is not None else None
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_CACHE[key] = df.schema
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long (nanosAsLong); rebuild
            # micros with integer division — float math would lose
            # precision at 2^63-scale nanosecond epochs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Naive parquet timestamps (isAdjustedToUTC=false) arrive
            # as TIMESTAMP_NTZ, which Spark refuses to cast to
            # numeric types. The session is pinned to UTC
            # (ensure_confs), so NTZ -> TIMESTAMP keeps the same
            # wall-clock AND the same epoch the DuckDB oracle sees,
            # while restoring cast("long") epoch math downstream.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
