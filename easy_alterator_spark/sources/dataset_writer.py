"""Governed dataset writer: partitioned, sorted, size-capped parquet
plus a queryable file manifest.

The write path a training-data release needs (beyond
write_daily_partitioned's date layout and compact_parquet's
maintenance rewrite): Hive partitioning for pruning, a within-file
sort so min/max page statistics actually skip (sorted columns give
parquet row-group zone maps their selectivity), `maxRecordsPerFile`
so no shard outgrows a loader's memory, and a manifest the release
process can diff/audit without listing object storage. The manifest
is computed FROM the written files (`input_file_name`), so it
witnesses what landed, not what was intended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write `df` as a governed parquet dataset.

    With `partition_by`, rows are first repartitioned on the
    partition columns so each Hive directory is written by the tasks
    that own its rows (without this, every task writes a sliver of
    every partition — the small-files explosion `compact_parquet`
    exists to clean up). `sort_by` orders rows WITHIN files (zone-map
    selectivity); it composes with partitioning because
    sortWithinPartitions runs after the exchange.
    """
    out = df
    if partition_by:
        out = out.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        out = out.sortWithinPartitions(
            *[F.col(c) for c in (partition_by or []) + sort_by]
        )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def dataset_manifest(spark: SparkSession, path: str) -> DataFrame:
    """(file_path, n_rows) per written file — one scan of the dataset
    grouped by `input_file_name`. Join-ready for release diffs;
    at object-store scale this replaces a LIST call with a
    metadata-only column scan."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file_path"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
