"""Corpus snapshot diff: added / removed / changed documents between
two versions of a dataset.

The reference engine diffs SCHEMAS (DDL vs catalog); a training-data
engine needs the same discipline for the DATA: when a corpus is
re-crawled, re-filtered, or re-licensed, "what exactly changed since
the snapshot we trained on" is the provenance question every dataset
card has to answer.

Design (the 100 TB shape):

- Each side is projected to (id, md5(content)) at the scan — the diff
  never carries document text, only 32-byte fingerprints, so the
  full-outer join shuffles ~48 bytes/row regardless of document size.
- The join key is the document id; both sides hash-partition on it —
  the unavoidable exchange. When snapshots are stored bucketed by id
  (sources/bucketing.py), the exchange disappears entirely.
- Output is CHANGE-sized, not corpus-sized: `unchanged` rows (the
  overwhelming bulk of any real re-release) are dropped inside the
  join projection before anything else happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, status) with status in {'added', 'removed', 'changed'}:
    the change-set from `old` to `new`, judged by content fingerprint.

    Unchanged documents are filtered out pre-shuffle-materialization;
    a doc present in both snapshots with different content is
    `changed` (content is compared by md5, so whitespace edits count —
    normalize upstream if they shouldn't).
    """
    o = old.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("oh"))
    n = new.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("nh"))
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("oh").isNull(), "added")
        .when(F.col("nh").isNull(), "removed")
        .when(F.col("oh") != F.col("nh"), "changed")
    )
    return (
        j.select(F.col("id").alias(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


def diff_summary(
    diff: DataFrame, dims: DataFrame | None = None, id_col: str = "doc_id"
) -> DataFrame:
    """(status[, dim...], n): change-set rollup, optionally joined to
    per-doc dimensions (source, lang) — the dataset-card table. The
    dims side is joined broadcast when provided (dimension lookups are
    id->attrs projections of whichever snapshot carries them)."""
    if dims is not None:
        diff = diff.join(F.broadcast(dims), id_col)
        keys = ["status"] + [c for c in dims.columns if c != id_col]
    else:
        keys = ["status"]
    return diff.groupBy(*keys).agg(F.count("*").cast("long").alias("n"))
