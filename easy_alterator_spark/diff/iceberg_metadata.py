"""Iceberg ``metadata.json`` reader (S7 in SURVEY.md §2.1).

The reference GETs the table's metadata.json from S3 and plucks the
current schema, default partition spec, and properties
(iceberg_schema_handler.py:131-151). Here the file is read through
``spark.read.text(wholetext=True)`` — same code path for local files,
S3, HDFS — and parsed driver-side (one small JSON per table), then
shaped into the FIXTURES.md B2/B3 snapshot rows the diff engine
consumes. With the Iceberg Spark runtime on the classpath the same
rows come from ``spark.table(t).schema`` + the ``.snapshots`` metadata
table; this reader keeps the engine functional without that jar.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_COLS_SCHEMA = (
    "table_name string, name string, type string, position int, "
    "is_partition boolean, field_id int"
)


def parse_metadata(meta: dict[str, Any], table_name: str) -> tuple[list, dict]:
    """metadata dict -> (cat_cols rows, properties).

    Rows carry the Iceberg *metadata* type vocabulary (long,
    timestamptz, ...); the diff layer maps it to the comparison
    vocabulary (diff/iceberg.py), mirroring the reference's split.
    """
    schema_id = meta["current-schema-id"]
    schemas = {s.get("schema-id", i): s for i, s in enumerate(meta["schemas"])}
    fields = schemas[schema_id]["fields"]
    spec_id = meta.get("default-spec-id", 0)
    specs = {s.get("spec-id", i): s for i, s in enumerate(meta.get("partition-specs", []))}
    part_fields = specs.get(spec_id, {}).get("fields", [])

    rows = [
        (table_name, f["name"].lower(), str(f["type"]), pos, False, f["id"])
        for pos, f in enumerate(fields)
    ]
    rows += [
        (table_name, p["name"].lower(), "", pos, True, p["field-id"])
        for pos, p in enumerate(part_fields)
    ]
    props = dict(meta.get("properties", {}))
    props.pop("owner", None)  # not a real iceberg property (ref :150)
    return rows, props


def read_metadata_files(
    spark: SparkSession, locations: dict[str, str]
) -> tuple[DataFrame, dict[str, dict[str, str]]]:
    """Read {table_name: metadata.json path} -> (cat_cols DataFrame,
    per-table properties). Paths may be local, s3://, hdfs:// — any
    Hadoop-visible filesystem."""
    if not locations:
        return spark.createDataFrame([], _COLS_SCHEMA), {}
    by_path = {v: k for k, v in locations.items()}
    texts = (
        spark.read.text(list(locations.values()), wholetext=True)
        .selectExpr("input_file_name() as path", "value")
        .collect()
    )
    rows: list = []
    props: dict[str, dict[str, str]] = {}
    for r in texts:
        # input_file_name returns a URI; match on suffix
        table = next(
            (t for p, t in by_path.items() if r["path"].endswith(p.lstrip("file:"))),
            None,
        )
        if table is None:
            continue
        t_rows, t_props = parse_metadata(json.loads(r["value"]), table)
        rows.extend(t_rows)
        props[table] = t_props
    return spark.createDataFrame(rows, _COLS_SCHEMA), props
