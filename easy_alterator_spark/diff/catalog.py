"""Live Spark-catalog snapshot + statement application.

Replaces the reference's boto3 Glue calls (glue_utils.py:13-114) with
the Spark catalog API: the same engine runs against the session
catalog in tests and a Glue-backed catalog in production (the catalog
implementation is a config swap — ``spark.sql.catalog.*`` settings —
not a code change).

Catalog *reads* produce the FIXTURES.md B2/B3 DataFrames the diff
engine consumes; catalog *writes* stay driver-side sequential (DDL is
a metadata operation; never issue it from executors — SURVEY.md §4.2).

For live ICEBERG tables the column snapshot comes from the table's
``metadata.json`` (via :mod:`.iceberg_metadata`), NOT from
``listColumns``: the iceberg diff joins partition specs on Iceberg
*field ids*, which only the metadata file carries — a listColumns
snapshot would emit ``field_id = NULL`` and make every partition field
look simultaneously new and dropped (reference reads the same file,
iceberg_schema_handler.py:131-151).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_COLS_SCHEMA = (
    "table_name string, name string, type string, position int, "
    "is_partition boolean, field_id int"
)
_TABLES_SCHEMA = (
    "table_name string, table_type string, format string, "
    "metadata_location string, properties map<string,string>, version_id string"
)

# The reference's parquet_check (rule_book.py:33-89) requires the FULL
# Hive parquet triple — a 'hive'-provider table is only PARQUET when
# its storage handler actually is; CSV/ORC/Avro Hive tables must route
# to non_parquet/format_changed, not into the ALTER path.
_PARQUET_INPUT = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat"
_PARQUET_OUTPUT = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"
_PARQUET_SERDE = "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"

# InputFormat class-name fragment -> diff-vocabulary format token.
_INPUT_FORMAT_TOKENS = (
    ("orc", "ORC"),
    ("avro", "AVRO"),
    ("sequencefile", "SEQUENCEFILE"),
    ("text", "TEXT"),
)


def _parse_props(raw: str) -> dict[str, str]:
    """Parse a DESCRIBE 'Table Properties' value ``[k=v, k2=v2, ...]``.

    Split only on commas that START a new ``key=`` pair, so property
    VALUES containing commas (e.g. a column list) survive intact.
    """
    props: dict[str, str] = {}
    for pair in re.split(r",\s*(?=[\w.\-]+=)", raw.strip("[]")):
        if "=" in pair:
            k, _, v = pair.partition("=")
            props[k.strip()] = v.strip()
    return props


def _table_format(spark: SparkSession, table: str) -> tuple[str, dict[str, str]]:
    """(PARQUET|ICEBERG|ORC|AVRO|SEQUENCEFILE|TEXT, properties) from
    DESCRIBE EXTENDED."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    provider = input_format = serde = ""
    output_format = ""
    props: dict[str, str] = {}
    for r in rows:
        key = (r["col_name"] or "").strip()
        val = (r["data_type"] or "").strip()
        if key == "Provider":
            provider = val.lower()
        elif key == "Table Properties":
            props = _parse_props(val)
        elif key == "InputFormat":
            input_format = val
        elif key == "OutputFormat":
            output_format = val
        elif key in ("Serde Library", "SerDe Library"):
            serde = val
    # Glue Iceberg tables carry table_type=ICEBERG + metadata_location;
    # either marks the table (Spark's session catalog reserves/swallows
    # `table_type`, but metadata_location — an Iceberg-only property —
    # survives, so it doubles as the detection signal in tests).
    if (
        provider == "iceberg"
        or props.get("table_type", "").upper() == "ICEBERG"
        or "metadata_location" in props
    ):
        fmt = "ICEBERG"
    elif provider == "parquet":
        fmt = "PARQUET"
    elif provider == "hive":
        if (input_format, output_format, serde) == (
            _PARQUET_INPUT,
            _PARQUET_OUTPUT,
            _PARQUET_SERDE,
        ):
            fmt = "PARQUET"
        else:
            low = input_format.lower()
            fmt = next((tok for frag, tok in _INPUT_FORMAT_TOKENS if frag in low), "TEXT")
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

    ICEBERG tables that expose a ``metadata_location`` property get
    their columns (with REAL field ids), partition spec, and properties
    from the metadata.json — all locations are read in ONE Spark text
    scan. Iceberg tables WITHOUT a metadata location fall back to
    listColumns rows (field_id NULL); the apply path refuses partition
    DDL for those (see cli.run_alterator).
    """
    from .iceberg_metadata import read_metadata_files

    col_rows, tbl_rows = [], []
    ice_locations: dict[str, str] = {}
    for table in tables:
        if not spark.catalog.tableExists(table):
            continue
        fmt, props = _table_format(spark, table)
        meta_loc = props.get("metadata_location")
        if fmt == "ICEBERG" and meta_loc:
            ice_locations[table] = meta_loc
        else:
            cols = spark.catalog.listColumns(table)
            data_pos = part_pos = 0
            for c in cols:
                if c.isPartition:
                    col_rows.append((table, c.name.lower(), c.dataType.lower(), part_pos, True, None))
                    part_pos += 1
                else:
                    col_rows.append((table, c.name.lower(), c.dataType.lower(), data_pos, False, None))
                    data_pos += 1
        tbl_rows.append(
            (table, "EXTERNAL_TABLE", fmt, meta_loc, props, "0")
        )
    cols_df = spark.createDataFrame(col_rows, _COLS_SCHEMA)
    if ice_locations:
        meta_cols, meta_props = read_metadata_files(spark, ice_locations)
        cols_df = cols_df.unionByName(meta_cols)
        # metadata.json properties are authoritative for iceberg prop
        # diff (reference plucks them from the same file)
        tbl_rows = [
            (t, tt, fmt, loc, meta_props.get(t, props), ver)
            if t in meta_props
            else (t, tt, fmt, loc, props, ver)
            for (t, tt, fmt, loc, props, ver) in tbl_rows
        ]
    return cols_df, spark.createDataFrame(tbl_rows, _TABLES_SCHEMA)


# Injected boto3 Glue client (tests pass a moto client; production
# leaves None and the client is built lazily from the session's AWS
# environment when the session is Glue-backed).
GLUE_CLIENT = None


def _glue_backed(spark: SparkSession) -> bool:
    """True when the session's metastore client factory is AWS Glue
    (the get_spark(glue=True) wiring, session.py:62)."""
    try:
        factory = spark.conf.get("hive.metastore.client.factory.class", "") or ""
    except Exception:  # noqa: BLE001 — conf key may be restricted
        factory = ""
    return "glue" in factory.lower()


def glue_table_version(table: str, client=None) -> str | None:
    """Native Glue VersionId — the reference's actual S6 signal
    (src/utils/glue_utils.py:90-114 ``get_table_versions``; newest
    version first). Returns None when boto3/Glue is unreachable or the
    table is unknown, so callers can fall back to the digest form.
    """
    client = client or GLUE_CLIENT
    if client is None:
        try:
            import boto3

            client = boto3.client("glue")
        except Exception:  # noqa: BLE001 — no boto3 / no credentials
            return None
    parts = table.split(".")
    if len(parts) == 3:  # iceberg catalog prefix: glue_catalog.db.tbl
        _, db, name = parts
    elif len(parts) == 2:
        db, name = parts
    else:
        return None
    try:
        resp = client.get_table_versions(DatabaseName=db, TableName=name)
        ids = [v.get("VersionId") for v in resp.get("TableVersions", []) if v.get("VersionId")]
        if not ids:
            return None
        # real Glue returns newest first, moto oldest first — take the
        # numerically-largest id rather than trusting order
        return max(ids, key=lambda s: (int(s) if s.isdigit() else -1, s))
    except Exception:  # noqa: BLE001 — fall back to digest versioning
        return None


def table_version(spark: SparkSession, table: str) -> str | None:
    """A catalog version id for the S6 version bracket.

    The reference brackets Glue ``update_table`` with two
    ``get_table_versions`` calls (alterator.py:434-440). On a
    Glue-backed session (or with an injected client) the bracket uses
    the NATIVE Glue VersionId via :func:`glue_table_version`;
    otherwise Spark's session catalog has no versioning, so it uses
    the strongest signal each catalog offers:

    - Iceberg: the ``metadata_location`` property — a NEW metadata file
      per commit, so it IS the table version.
    - otherwise: a digest of the schema + table properties, which
      changes exactly when an ALTER lands.
    """
    import hashlib

    if GLUE_CLIENT is not None or _glue_backed(spark):
        v = glue_table_version(table)
        if v is not None:
            return v
    if not spark.catalog.tableExists(table):
        return None
    _, props = _table_format(spark, table)
    if props.get("metadata_location"):
        return props["metadata_location"]
    schema_sig = ",".join(
        f"{c.name}:{c.dataType}:{int(c.isPartition)}"
        for c in spark.catalog.listColumns(table)
    )
    sig = f"{schema_sig}|{sorted(props.items())}"
    return hashlib.md5(sig.encode()).hexdigest()[:12]


def apply_statements(spark: SparkSession, statements: list[str]) -> list[str]:
    """Execute rendered ALTERs sequentially on the driver; returns the
    statements that ran (for the run report / audit trail)."""
    for stmt in statements:
        spark.sql(stmt)
    return statements
