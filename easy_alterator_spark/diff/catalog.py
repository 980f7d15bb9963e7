"""Live Spark-catalog snapshot + statement application.

Replaces the reference's boto3 Glue calls (glue_utils.py:13-114) with
the Spark catalog API: the same engine runs against the session
catalog in tests and a Glue-backed catalog in production (the catalog
implementation is a config swap — ``spark.sql.catalog.*`` settings —
not a code change).

Catalog *reads* produce the FIXTURES.md B2/B3 DataFrames the diff
engine consumes; catalog *writes* stay driver-side sequential (DDL is
a metadata operation; never issue it from executors — SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_COLS_SCHEMA = (
    "table_name string, name string, type string, position int, "
    "is_partition boolean, field_id int"
)
_TABLES_SCHEMA = (
    "table_name string, table_type string, format string, "
    "metadata_location string, properties map<string,string>, version_id string"
)


def _table_format(spark: SparkSession, table: str) -> tuple[str, dict[str, str]]:
    """(PARQUET|ICEBERG|TEXT, properties) from DESCRIBE EXTENDED."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    provider = ""
    props: dict[str, str] = {}
    for r in rows:
        if r["col_name"] == "Provider":
            provider = (r["data_type"] or "").lower()
        elif r["col_name"] == "Table Properties":
            raw = (r["data_type"] or "").strip("[]")
            for pair in raw.split(","):
                if "=" in pair:
                    k, _, v = pair.partition("=")
                    props[k.strip()] = v.strip()
    if provider == "iceberg" or props.get("table_type", "").upper() == "ICEBERG":
        fmt = "ICEBERG"
    elif provider in ("parquet", "hive"):
        fmt = "PARQUET"
    else:
        fmt = "TEXT"
    return fmt, props


def snapshot_catalog(
    spark: SparkSession, tables: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Snapshot live tables into the (cat_cols, cat_tables) fixture
    shape. ``tables`` are db-qualified names; missing tables are simply
    absent from the snapshot (the diff routes them as new).

    The per-table catalog calls happen on the driver — same as the
    reference's Glue round-trips — but the snapshot is taken ONCE and
    the diff itself is a single distributed plan, so catalog latency
    is O(tables) while diff cost is O(columns) distributed.
    """
    col_rows, tbl_rows = [], []
    for table in tables:
        if not spark.catalog.tableExists(table):
            continue
        cols = spark.catalog.listColumns(table)
        data_pos = part_pos = 0
        for c in cols:
            if c.isPartition:
                col_rows.append((table, c.name.lower(), c.dataType.lower(), part_pos, True, None))
                part_pos += 1
            else:
                col_rows.append((table, c.name.lower(), c.dataType.lower(), data_pos, False, None))
                data_pos += 1
        fmt, props = _table_format(spark, table)
        tbl_rows.append(
            (table, "EXTERNAL_TABLE", fmt, props.get("metadata_location"), props, "0")
        )
    return (
        spark.createDataFrame(col_rows, _COLS_SCHEMA),
        spark.createDataFrame(tbl_rows, _TABLES_SCHEMA),
    )


def apply_statements(spark: SparkSession, statements: list[str]) -> list[str]:
    """Execute rendered ALTERs sequentially on the driver; returns the
    statements that ran (for the run report / audit trail)."""
    for stmt in statements:
        spark.sql(stmt)
    return statements
