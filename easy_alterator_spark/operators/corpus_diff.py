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


# ---------------------------------------------------------------------------
# corpus-level overlap estimation (per-source MinHash signatures)
# ---------------------------------------------------------------------------

# Portable permutation schedule: h31 = md5-derived base hash folded
# into [0, M); perm i = (A[i]*h31 + B[i]) mod M. M = 2^31 - 1 keeps
# every intermediate product under 2^62, so the SAME integer math runs
# overflow-free as Spark Column arithmetic AND DuckDB BIGINT SQL (the
# engines must agree bit-for-bit for the estimate to hash-match).
# Constants are fixed literals (Knuth multiplicative + odd offsets) so
# the oracle SQL can inline them.
OVERLAP_M = 2147483647
OVERLAP_AB = tuple(
    ((2654435761 * (i + 1)) % OVERLAP_M or 1, (40503 * (i + 7) + 11) % OVERLAP_M)
    for i in range(64)
)


def source_overlap_minhash(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_perm: int = 64,
) -> DataFrame:
    """Pairwise token-set overlap BETWEEN corpus slices (sources,
    crawls, snapshots), estimated from per-slice MinHash signatures:
    (src_a, src_b, matches, est_jaccard).

    The dataset-composition question ("how much does crawl B repeat
    crawl A?") needs slice-level Jaccard, not doc-level pairs. Exact
    slice Jaccard unions every vocabulary; the MinHash form reduces
    each slice to `num_perm` integers with ONE pass: distinct
    (slice, token) pairs -> 64 integer permutations of one md5-derived
    base hash -> per-slice element-wise min (partial agg, map-side
    combined). The pairwise stage then joins signature rows —
    #slices² rows of 64 ints, driver-trivial at any corpus size.
    est_jaccard = matching-slot fraction (standard MinHash estimator;
    E[est] = J, σ = sqrt(J(1-J)/num_perm) ≈ 0.06 at num_perm=64).
    """
    from ..functions import text as T

    if num_perm > len(OVERLAP_AB):
        raise ValueError(f"num_perm > {len(OVERLAP_AB)} needs a longer schedule")
    toks = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(T.distinct_tokens(F.col(text_col))).alias("tok"),
        )
        .distinct()
    )
    m = F.lit(OVERLAP_M)
    base = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long") % m
    sig = toks.select(
        "grp",
        *[
            ((F.lit(a) * base + F.lit(b)) % m).alias(f"h{i}")
            for i, (a, b) in enumerate(OVERLAP_AB[:num_perm])
        ],
    ).groupBy("grp").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_perm)]
    ).select("grp", F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))
    # Pairwise stage WITHOUT a self-join: a non-equi (grp < grp)
    # self-join plans as a nested-loop join whose two inputs each
    # re-evaluate the signature subtree — i.e. TWO corpus scans. The
    # signature table is |slices| rows, so fold it into ONE row and
    # enumerate pairs with array functions: corpus scanned once,
    # pair generation is |slices|²-cell driver-free array work.
    allsig = sig.agg(F.collect_list(F.struct("grp", "sig")).alias("xs"))
    pair_arr = F.flatten(
        F.transform(
            F.col("xs"),
            lambda x: F.filter(
                F.transform(
                    F.col("xs"),
                    lambda y: F.struct(x.alias("x"), y.alias("y")),
                ),
                lambda p: p["x"]["grp"] < p["y"]["grp"],
            ),
        )
    )
    pairs = allsig.select(F.explode(pair_arr).alias("p"))
    matches = F.size(
        F.filter(
            F.zip_with(
                F.col("p.x.sig"), F.col("p.y.sig"), lambda x, y: x == y
            ),
            lambda v: v,
        )
    ).cast("long")
    return pairs.select(
        F.col("p.x.grp").alias("src_a"),
        F.col("p.y.grp").alias("src_b"),
        matches.alias("matches"),
        F.round(matches / num_perm, 4).alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# partition-level anti-entropy checksums (replica sync without row diff)
# ---------------------------------------------------------------------------


def partition_checksum(
    df: DataFrame,
    partition_expr,
    row_cols: list[str],
    part_name: str = "part",
) -> DataFrame:
    """(part, n_rows, checksum): a commutative per-partition
    fingerprint — row count plus the SUM of a 32-bit md5 slice of each
    row's canonical string — for anti-entropy replica comparison
    (Merkle-tree leaf level; Dynamo/Cassandra repair, warehouse
    cross-region sync).

    Comparing replicas row-by-row moves both tables; comparing
    partition checksums moves ONE ROW PER PARTITION, and only
    mismatched partitions pay a row-level diff afterwards
    (:func:`snapshot_diff` scoped to the partition). Design points:

    - The checksum is a SUM, so it is order- and partitioning-
      independent and partially aggregable (map-side combine; the
      shuffle carries one row per partition per map task).
    - The row hash is a 32-bit slice of md5 over a '|'-joined string
      of ``row_cols`` — portable integer math that any engine
      (DuckDB, Trino, Spark) reproduces bit-for-bit, which is the
      whole point: the two sides of a sync check are DIFFERENT
      engines more often than not. Keep ``row_cols`` to exactly-
      stringifiable types (integers, strings, dates) — float
      formatting differs across engines.
    - NULLs are encoded with an explicit sentinel before joining —
      ``concat_ws`` SKIPS nulls, which would make (NULL, 'b') and
      ('b', NULL) rows hash identically and let a NULL-position
      difference slide through the check.
    - 32-bit slices keep ``sum`` inside BIGINT for up to 2^31 rows
      per partition; size partitions (or widen to two checksum
      columns) beyond that.
    - Collision odds: two differing partitions collide with
      probability ~2^-32 per check — and only when row counts ALSO
      match; fine for repair scheduling, not for audit proofs (use
      the full md5 via snapshot_diff for those).
    """
    if not row_cols:
        raise ValueError("row_cols must be non-empty")
    canon = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("(null)"))
            for c in row_cols
        ],
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    return df.groupBy(partition_expr.alias(part_name)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).alias("checksum"),
    )
