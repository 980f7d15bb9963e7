"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the end-to-end
training-corpus pipeline (quality gate -> exact dedup ->
decontamination -> stratified sample -> sequence packing) — on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2/§2.10 plus the north-star extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the differential correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from easy_alterator_spark.queries import ORACLES, QUERIES, load_all

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pipeline_training_corpus"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops)."""
    return dict(ORACLES)
