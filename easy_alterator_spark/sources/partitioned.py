"""Hive-style date partitioning: write-time layout that turns time
filters into directory pruning.

At 100 TB an event log is append-only and nearly every query carries a
time predicate. Partitioning the files by day means a `WHERE d = ...`
never lists — let alone reads — the other days' files: the filter is
resolved against partition VALUES during planning (PartitionFilters in
the scan node), so query cost scales with the days touched, not the
corpus size. This composes with the other layout tools here:
partition by day, bucket by join key (bucketing.py), Z-order within
files (layout.py) — three independent pruning axes.

Partition-count discipline (the 100 TB failure mode): daily
granularity over years is thousands of directories — fine; do NOT
partition by high-cardinality keys (user_id would create millions of
tiny files). The writer repartitions by the partition column first so
each day writes one file per day×shuffle-partition instead of one per
input-partition×day (the small-files explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_daily_partitioned(
    events: DataFrame, path: str, ts_col: str = "ts"
) -> None:
    """Write events Hive-partitioned by day (`d=YYYY-MM-DD/` dirs).

    The pre-write repartition on the partition key bounds file count
    to one file per day here (coalesced by AQE); on a cluster, add a
    salt column to the repartition for write parallelism within a day.
    """
    with_day = events.withColumn(
        "d", F.to_date(F.date_trunc("day", F.col(ts_col)))
    )
    (
        with_day.repartition("d")
        .write.mode("overwrite")
        .partitionBy("d")
        .parquet(path)
    )


def read_day(spark: SparkSession, path: str, day: str) -> DataFrame:
    """One day's slice — planner prunes to the single `d=` directory
    (assert via PartitionFilters in the scan; tests do)."""
    return spark.read.parquet(path).filter(F.col("d") == F.lit(day))
