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


def semantic_dedup_kernel(
    vectors: DataFrame,
    num_clusters: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same contract as :func:`semantic_dedup`, with the within-bucket
    pair scoring swapped for a per-bucket numpy matmul inside
    ``applyInPandas`` — the FAISS-style kernel SemDeDup deployments
    actually run.

    The Column form evaluates one interpreted dot per colliding pair
    (dim multiplies through a HOF lambda); this form ships each
    bucket's vectors through Arrow ONCE and scores all pairs with a
    single BLAS matmul (U @ U.T), then keeps a row iff no smaller-id
    row in its bucket reaches ``threshold``. At 100 TB buckets are
    ~constant size (k grows with n), so per-group memory is bounded
    and the only wide op is the bucket shuffle — identical to the
    Column form's exchange, with the pair enumeration moved from
    interpreted expression eval to vectorized C.

    Equality caveat (why the oracle-checked query keeps the Column
    form): matmul accumulates in SIMD order, so a pair whose cosine
    sits within ~1e-12 of the threshold can flip vs the sequential
    sum. tests/test_operators.py pins exact agreement on the test
    corpus at both sf0.001 and sf0.01.
    """
    import pandas as pd

    cents = ivf_centroids(vectors, num_clusters, id_col, vec_col)
    assigned = vectors.crossJoin(F.broadcast(_centroid_array(cents))).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vv"),
        _nearest_centroid(F.col("cents"), F.col(vec_col)).alias("bucket"),
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id").reset_index(drop=True)
        m = np.stack(pdf["vv"].map(lambda v: np.asarray(v, dtype=np.float64)))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        u = m / norms[:, None]
        sim = u @ u.T
        # strictly-lower-triangle: smaller-id (earlier row) duplicates
        dup = (np.tril(sim >= threshold, k=-1)).any(axis=1)
        return pd.DataFrame(
            {"id": pdf["id"], "bucket": pdf["bucket"], "keep": ~dup}
        )

    return (
        assigned.groupBy("bucket")
        .applyInPandas(prune, "id long, bucket int, keep boolean")
        .withColumnRenamed("id", id_col)
    )


def semantic_contaminated(
    train: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(train id, nearest eval id, cos) for every training vector whose
    embedding is >= ``threshold`` cosine to ANY evaluation vector —
    SEMANTIC benchmark decontamination (paraphrase leakage that the
    n-gram scrub in operators/decontaminate.py cannot see; cf. the
    contamination audits in GPT-4/Llama reports, which pair lexical
    n-gram checks with embedding-similarity checks).

    100 TB posture mirrors the n-gram decontaminator: the benchmark
    side is always tiny (thousands of eval items), so it is collected
    ONCE into a (m, dim) float64 matrix and shipped in the task
    closure; the 100 TB training side is mapInPandas — each Arrow
    batch scores against the whole eval matrix with one BLAS matmul
    and emits only hits. No shuffle at any scale; cost is one
    training-corpus scan.

    Determinism: scores are computed as dot / (|t|·|e|) in float64 —
    the same expression a SQL engine evaluates — and the nearest eval
    id breaks exact ties toward the SMALLEST eval id (eval rows are
    sorted by id, numpy argmax takes the first maximum). Matmul SIMD
    reordering can flip a pair within ~1e-12 of the threshold; the
    oracle-checked query pins agreement on the test corpus.
    """
    import numpy as np

    eval_rows = (
        evalset.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .collect()
    )
    eval_ids = np.array([r[0] for r in eval_rows], dtype=np.int64)
    em = np.stack([np.asarray(r[1], dtype=np.float64) for r in eval_rows])
    enorm = np.linalg.norm(em, axis=1)
    enorm[enorm == 0.0] = 1.0

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(
                pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64))
            )
            tnorm = np.linalg.norm(m, axis=1)
            tnorm[tnorm == 0.0] = 1.0
            cos = (m @ em.T) / np.outer(tnorm, enorm)
            best = cos.argmax(axis=1)
            best_cos = cos[np.arange(len(m)), best]
            hit = best_cos >= threshold
            if not hit.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[hit],
                    "eval_vec_id": eval_ids[best[hit]],
                    "cos": best_cos[hit],
                }
            )

    out_schema = f"{id_col} long, eval_vec_id long, cos double"
    return (
        train.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(score, out_schema)
        .select(id_col, "eval_vec_id", F.round("cos", 4).alias("cos"))
    )
