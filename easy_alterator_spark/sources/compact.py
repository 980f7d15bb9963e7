"""Size-targeted parquet compaction — the small-files maintenance
operator every 100 TB lake needs.

Streaming ingestion and fine-grained partitioning leave behind files
far below the scan-efficient size (~128 MB-1 GB); a table of 10 KB
files makes every query pay per-file open/footer costs and starves
the vectorized reader. Compaction rewrites a directory into
`ceil(input_bytes / target_size)` files, optionally range-sorted on a
key so downstream scans get min/max pruning on that column.

Plan shape: one scan -> repartitionByRange(n, key) (a single shuffle,
range boundaries from a sampled sketch) -> sortWithinPartitions ->
write. With no sort key: repartition(n) round-robin, no ordering
guarantee, same single shuffle.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> DataFrame:
    """Rewrite `src_dir` parquet into `dst_dir` with ~target-size files.

    Returns a one-row summary DataFrame (files_before, files_after,
    rows) so callers can assert/report the effect. File count is
    derived from the SOURCE's on-disk bytes — parquet-to-parquet
    compaction preserves encoding, so input bytes ≈ output bytes; for
    local paths, plain os.walk; on a cluster use the Hadoop
    FileSystem API (same arithmetic).
    """
    df = spark.read.parquet(src_dir)
    n_files = max(1, math.ceil(_dir_bytes(src_dir) / target_file_bytes))
    if sort_col is not None:
        out = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    got = spark.read.parquet(dst_dir)
    files_after = len(
        [f for f in os.listdir(dst_dir) if f.endswith(".parquet")]
    )
    files_before = len(
        [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
    ) or 1
    return spark.createDataFrame(
        [(files_before, files_after, got.count())],
        "files_before int, files_after int, rows long",
    )
