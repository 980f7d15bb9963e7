"""Interchange-format sources/sinks beyond parquet: ORC, CSV, JSON
lines.

The engine's internal format is parquet (column pruning + predicate
pushdown + min/max skipping), but an ingest pipeline meets all three of
these at its edges. Discipline per format:

- **ORC**: the only other format with real scan-level pushdown; treat
  it exactly like parquet (`PushedFilters` asserted in
  tests/test_formats.py).
- **CSV**: ALWAYS an explicit schema. `inferSchema` runs a whole extra
  pass over the data before the real read — at 100 TB that is a second
  full scan; with a schema the read is single-pass and malformed rows
  are surfaced via `mode=PERMISSIVE` + `_corrupt_record` instead of a
  driver crash.
- **JSON lines**: explicit schema for the same reason; Spark prunes
  the parse to the referenced fields (Jackson-level projection), so a
  2-column read of a 40-field JSON does not materialize 40 fields.

Round-trip fidelity caveat, encoded in the tests: CSV/JSON are TEXT
formats — timestamps round-trip through ISO strings (micros preserved
under the session's UTC pin) and floats through repr, so round-trips
are value-equal but not bit-for-bit file-equal; ORC is binary-faithful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_WRITERS = {"orc", "csv", "json"}


def write_as(df: DataFrame, fmt: str, path: str) -> None:
    """Write ``df`` at ``path`` in ``fmt`` (orc/csv/json).

    CSV keeps a header purely for human debugging — the read path
    (:func:`read_as`) never relies on it for typing.
    """
    if fmt not in _WRITERS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(_WRITERS)}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_as(
    spark: SparkSession, fmt: str, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read ``path`` as ``fmt``. CSV/JSON REQUIRE an explicit schema —
    passing none raises rather than silently triggering an inference
    scan (the expensive mistake this module exists to prevent)."""
    if fmt not in _WRITERS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(_WRITERS)}")
    r = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema (no inference scans)")
        r = r.schema(schema)
        if fmt == "csv":
            r = r.option("header", "true")
    elif schema is not None:
        r = r.schema(schema)
    return r.load(path)
