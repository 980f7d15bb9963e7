"""Changelog application (MERGE / CDC upsert semantics) as a batch
operator: fold a stream of keyed inserts/updates/deletes into a base
snapshot, latest-change-wins per key.

This is the batch core of every warehouse MERGE INTO: the reference's
catalog-sync applies schema changelogs the same way (latest ALTER wins
per column); here the payload is rows instead of DDL. At 100 TB the
base never rewrites wholesale — a table format (Iceberg/Delta)
restricts the rewrite to files whose key ranges intersect the
changelog (merge-on-read or copy-on-write file pruning). The
*dataflow* below is exactly what those engines run inside the pruned
file set: (1) collapse the changelog to latest-per-key (one shuffle of
the SMALL side), (2) anti-join the base against the surviving key set
(broadcast when the changelog fits, so the 100 TB side never
shuffles), (3) union the non-deleted latest rows back in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a changelog to its last change per key: row_number
    over (key) ordered by ``seq_col`` DESC, then ``tiebreak_cols``
    DESC. One shuffle, sized by the changelog (not the base).

    Determinism contract: without ``tiebreak_cols``, ``seq_col`` MUST
    be unique per key (the usual CDC offset/LSN case) — two changes
    with the same key and equal ``seq_col`` would pick a
    sort-nondeterministic winner, so a replay could produce a
    different snapshot. When the sequence can collide (e.g. an event
    timestamp), pass a real secondary change identifier (ingest id,
    file offset) as ``tiebreak_cols``; the key columns themselves are
    constant within the window and can never break the tie.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), *[F.desc(c) for c in (tiebreak_cols or [])]
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
    broadcast_changelog: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Merged snapshot: base rows whose key has no change, plus the
    latest non-delete change per key, tagged ``src`` =
    'base' | 'upsert'.

    ``changelog`` must carry the base's columns plus ``seq_col`` and
    ``op_col``. With ``broadcast_changelog`` (the common
    small-changelog case) the base side — the 100 TB side — is
    scanned once with a broadcast anti-join and never shuffled; turn
    it off for changelogs too large to broadcast and the anti-join
    becomes a key-partitioned shuffle instead.

    ``tiebreak_cols`` follows :func:`latest_per_key`'s determinism
    contract: required whenever ``seq_col`` can repeat within a key.
    """
    payload = [c for c in base.columns]
    latest = latest_per_key(changelog, key_cols, seq_col, tiebreak_cols)
    keys = latest.select(*key_cols)
    if broadcast_changelog:
        keys = F.broadcast(keys)
    kept_base = base.join(keys, key_cols, "left_anti").select(
        *payload, F.lit("base").alias("src")
    )
    upserts = latest.filter(F.col(op_col) != delete_op).select(
        *payload, F.lit("upsert").alias("src")
    )
    return kept_base.unionByName(upserts)
