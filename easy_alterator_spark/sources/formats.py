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


# ---------------------------------------------------------------------------
# Raw media ingestion: binaryFile source
# ---------------------------------------------------------------------------

_KIND_BY_EXT = {
    "jpg": ("image", "image/jpeg"), "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"), "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"), "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "mp4": ("video", "video/mp4"), "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"),
}


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None, recursive: bool = True
):
    """Raw-file scan via Spark's ``binaryFile`` source: one row per
    object with (path, modificationTime, length, content). This is the
    ingestion edge for media lakes — list + read is executor-side and
    partition-parallel, with NO driver listing loop; ``glob`` prunes at
    the listing (pathGlobFilter evaluates before any byte is read).

    100 TB note: binaryFile caps at spark.sql.files.maxPartitionBytes
    per task, so many small objects coalesce into shared tasks while a
    huge object gets its own; pair with `sources/compact.py` afterward
    to fix small-file output.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    r = r.option("recursiveFileLookup", "true" if recursive else "false")
    return r.load(path)


def media_from_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary directory -> the engine's media table shape
    (operators/multimodal.MEDIA_SCHEMA): media_id derived from the
    file path (xxhash64 — stable under re-listing, independent of
    listing order), kind/mime from the extension, content + n_bytes
    from the scan. Pure Column projection over the binaryFile rows;
    decode/resize/frame-sample stages chain directly on the result.
    """
    from pyspark.sql import functions as F

    raw = read_binary_dir(spark, path, glob=glob)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    kind = F.lit(None).cast("string")
    mime = F.lit(None).cast("string")
    for e, (k, m) in _KIND_BY_EXT.items():
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.coalesce(kind, F.lit("binary")).alias("kind"),
        mime.alias("mime"),
        F.col("content"),
        F.col("length").alias("n_bytes"),
    )
