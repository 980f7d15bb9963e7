"""Schema-diff engine: DDL corpus vs catalog snapshot, corpus-wide.

The reference diffs one table at a time in a Python loop
(/root/reference/src/bin/alterator.py:518). Here the whole corpus is
diffed in one Spark plan: every per-table pandas merge becomes a
DataFrame join keyed by ``table_name``, so 458 or 458k tables is the
same plan. Catalog snapshots are plain DataFrames (FIXTURES.md B2/B3),
fed either from test fixtures or from the live Spark catalog
(:mod:`easy_alterator_spark.diff.catalog`).
"""

from .hive import hive_diff  # noqa: F401
from .iceberg import iceberg_diff  # noqa: F401
from .report import build_report  # noqa: F401
