"""Scale-first non-equi joins: bucketized range join and
interval-overlap join.

A range predicate (``point BETWEEN lo AND hi`` or interval overlap)
has no equi-key, so naive Spark plans it as
BroadcastNestedLoopJoin — O(|A|·|B|) comparisons that only survive
when one side is broadcastable — or, worse, a CartesianProduct.
The scale-correct form is the classic bucketization from the spatial
/ interval-join literature (also what commercial Spark range-join
hints implement under the hood):

1. pick a bucket width ``w`` near the typical interval length;
2. each interval explodes into its covering buckets
   ``floor(lo/w) .. floor(hi/w)`` (≈ len/w + 1 rows);
3. each point maps to exactly ONE bucket ``floor(v/w)``;
4. equi-join on the bucket id — a plain shuffled/broadcast hash
   join — then re-check the exact predicate on the survivors.

Candidate volume is |points| · (local interval density), never
|A|·|B|; the join key is a dense integer, so AQE's skew handling
applies if one bucket is hot. For point-in-interval the pair appears
exactly once (the point owns one bucket); for interval×interval each
pair can collide in every shared bucket, so the join keeps only the
FIRST shared bucket — ``bucket == floor(max(lo_a, lo_b)/w)`` — the
standard emit-once guard, duplicate-free without a ``distinct``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join ``points`` to every row of ``ranges`` whose
    ``[lo_col, hi_col]`` interval contains ``point_col``
    (inclusive both ends), as an equi-join on bucket ids.

    Columns of both inputs are preserved (names must not clash,
    except none are required to match). Empty/inverted intervals
    (hi < lo) match nothing, as with BETWEEN.
    """
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    b_lo = F.floor(F.col(lo_col) / w)
    b_hi = F.floor(F.col(hi_col) / w)
    exploded = ranges.filter(F.col(hi_col) >= F.col(lo_col)).withColumn(
        "__bucket", F.explode(F.sequence(b_lo, b_hi))
    )
    keyed = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    return (
        keyed.join(exploded, "__bucket")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Join interval table ``left`` to interval table ``right`` on
    overlap (``l_lo <= r_hi AND r_lo <= l_hi``, closed intervals),
    bucketized as above with the first-shared-bucket emit-once guard
    so each overlapping pair appears exactly once.
    """
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def _explode(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.col(hi) >= F.col(lo)).withColumn(
            "__bucket",
            F.explode(F.sequence(F.floor(F.col(lo) / w), F.floor(F.col(hi) / w))),
        )

    joined = _explode(left, left_lo, left_hi).join(
        _explode(right, right_lo, right_hi), "__bucket"
    )
    first_shared = F.floor(F.greatest(F.col(left_lo), F.col(right_lo)) / w)
    return (
        joined.filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col("__bucket") == first_shared)
        ).drop("__bucket")
    )
