"""Semantic deduplication (SemDeDup-style) over an embedding column.

Cluster the corpus in embedding space, then deduplicate ONLY within
clusters: a document is dropped when some lower-id document in its own
cluster is more similar than ``threshold``. This is the
cluster-then-prune shape of SemDeDup (Abbas et al. 2023,
arXiv:2303.09540): the clustering turns an O(n²) all-pairs similarity
problem into Σ|bucket|² local work — with k balanced clusters the
candidate volume drops by ~k×, and each bucket's pair generation is an
ordinary shuffle-local self-join.

Spark-first construction (no reference twin — the reference engine has
no embedding operators; extension per BASELINE.json north star):

- centroids are the deterministic md5-ordered seed from
  operators/similarity.py (reproducible in the DuckDB oracle);
- bucket assignment is the same row-local argmax over the broadcast
  centroid array ``ivf_topk`` uses — the vector table never shuffles
  for assignment;
- the within-bucket self-join carries identical subtrees on both
  sides + a shuffle_hash hint, so the bucketed exchange is computed
  once and reused (same pattern as the MinHash band join);
- the drop set joins back as a broadcast (it is at most the duplicate
  count, which is small relative to the corpus whenever dedup is
  worth running).

100 TB notes: cluster count should scale with corpus size (SemDeDup
uses ~100k clusters for LAION-scale data) so buckets stay ~constant
size; a skewed bucket (one dense semantic region) is the classic
salting case — sub-bucket by a secondary hash and union the results.
With k ∝ n the per-bucket work is O(n) total and the only wide ops are
the bucket-key shuffle and the final broadcast anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import vectors as V
from .similarity import _centroid_array, _nearest_centroid, ivf_centroids


def semantic_dedup(
    vectors: DataFrame,
    num_clusters: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket, keep) for every input vector.

    ``keep`` is false iff some same-bucket vector with a smaller id has
    cosine similarity >= ``threshold`` — the deterministic version of
    SemDeDup's "keep one representative per semantic duplicate group"
    (lowest id stands in for the random choice in the paper).
    """
    cents = ivf_centroids(vectors, num_clusters, id_col, vec_col)
    assigned = vectors.crossJoin(F.broadcast(_centroid_array(cents))).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vv"),
        _nearest_centroid(F.col("cents"), F.col(vec_col)).alias("bucket"),
    )
    # unit-normalize ONCE per row below the exchange: the pair
    # condition is then a single dot product instead of dot + two
    # norms (3 interpreted array-aggregates per colliding pair -> 1;
    # measured 10.9 s -> ~4 s at sf0.1)
    a = assigned.select(
        F.col("id").alias("ida"), V.unit(F.col("vv")).alias("ua"), "bucket"
    )
    b = assigned.select(
        F.col("id").alias("idb"), V.unit(F.col("vv")).alias("ub"), "bucket"
    )
    # identical subtrees + shuffle_hash -> the bucket exchange is
    # computed once and the second side is a ReusedExchange
    dropped = (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("ida") < F.col("idb"))
            & (a["bucket"] == b["bucket"])
            & (V.dot(F.col("ua"), F.col("ub")) >= F.lit(threshold)),
        )
        .select(F.col("idb").alias("id"))
        .distinct()
    )
    return (
        assigned.join(F.broadcast(dropped.withColumn("dropped", F.lit(True))), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "bucket",
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep"),
        )
    )
