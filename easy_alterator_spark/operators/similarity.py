"""Similarity search over an embedding column (array<float>).

Two paths:

- **brute force**: score every (query, candidate) pair, keep top-k per
  query with a window. Exact; O(|Q|·|C|) — right when |Q| is small or
  as the verify stage.
- **IVF (inverted file)**: k-means-lite bucketing. Centroids are
  sampled deterministically, every vector is assigned to its nearest
  centroid (one broadcast join — no shuffle of the big side), and a
  query only scores vectors in its own bucket (nprobe=1). At 100 TB
  the candidate set per query drops by ~|centroids|×, and the bucket
  assignment doubles as a partitioning key for the vector store.

All scoring is JVM-side Column math from functions/vectors.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import vectors as V


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).

    Output: (q_id, n_id, rank, score) with score rounded to 4.
    """
    # normalize each side ONCE below the join (see vectors.unit) —
    # per-pair work is then a single dot product
    prep = V.unit if metric == "cosine" else V.as_double
    q = queries.select(F.col(id_col).alias("q_id"), prep(F.col(vec_col)).alias("qv"))
    c = candidates.select(F.col(id_col).alias("n_id"), prep(F.col(vec_col)).alias("nv"))
    # queries are the small side -> broadcast them past the candidates
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", V.dot(F.col("qv"), F.col("nv")).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("score", 4).alias("score"))
    )


def refine_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd (k-means) refinement of an initial centroid set.

    Per iteration: broadcast-assign every vector to its nearest
    centroid, then recompute each centroid as the element-wise mean of
    its bucket. The mean is computed via posexplode ->
    groupBy(bucket, pos) — partial aggregation runs map-side, so the
    shuffle carries only |centroids| × dim rows regardless of input
    size; the big side never shuffles whole vectors. Buckets that end
    up empty drop out (the centroid count can shrink).

    Returns a (c_id, cv) DataFrame shaped like the input centroids —
    drop-in for :func:`assign_ivf_buckets`'s sampled seed.
    """
    v = vectors.select(F.col(id_col).alias("v_id"), F.col(vec_col).alias("vv"))
    for _ in range(iters):
        scored = v.join(F.broadcast(centroids)).select(
            "v_id", "vv", "c_id", V.cosine(F.col("vv"), F.col("cv")).alias("sim")
        )
        assigned = scored.groupBy("v_id").agg(
            F.max_by("c_id", F.struct(F.col("sim"), (-F.col("c_id")).alias("tb"))).alias(
                "bucket"
            ),
            F.any_value("vv").alias("vv"),
        )
        by_pos = assigned.select(
            "bucket", F.posexplode(V.as_double(F.col("vv"))).alias("pos", "val")
        )
        means = by_pos.groupBy("bucket", "pos").agg(F.avg("val").alias("m"))
        centroids = means.groupBy("bucket").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        ).select(F.col("bucket").alias("c_id"), "cv")
    return centroids


def ivf_centroids(
    vectors: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """Deterministic centroid seed (md5-ordered first N — md5 so the
    DuckDB differential oracle can reproduce the exact sample), with
    optional Lloyd refinement."""
    centroids = (
        vectors.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
        .orderBy(F.md5(F.col("c_id").cast("string")))
        .limit(num_centroids)
    )
    if refine_iters > 0:
        centroids = refine_centroids(
            vectors, centroids, iters=refine_iters, vec_col=vec_col, id_col=id_col
        )
    return centroids


def _nearest_centroid(cents_arr: F.Column, vec: F.Column) -> F.Column:
    """Inline argmax-cosine bucket id: highest sim, ties -> lowest c_id
    (struct max over (sim, -c_id), the same order max_by(c_id,
    struct(sim, -c_id)) would use). Pure row-local expression — no
    groupBy, no join-back — so assignment never shuffles the vectors.
    """
    best = F.array_max(
        F.transform(
            cents_arr,
            lambda c: F.struct(
                V.cosine(vec, c["cv"]).alias("sim"), (-c["c_id"]).alias("nc")
            ),
        )
    )
    return -best["nc"]


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """One-row DataFrame holding all centroids as a sorted array —
    broadcast-crossed into the vector scan for map-side assignment."""
    return centroids.agg(
        F.array_sort(F.collect_list(F.struct("c_id", "cv"))).alias("cents")
    )


def assign_ivf_buckets(
    vectors: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments): nearest-centroid bucket per vector.

    Assignment is a broadcast of the one-row centroid array crossed
    into the vector scan + a row-local argmax — fully map-side: the
    vector table neither shuffles (no groupBy) nor re-joins. At 100 TB
    the only data movement is the ≤num_centroids-row broadcast.
    """
    # NB: no unit-normalization here — this subtree is evaluated more
    # than once downstream (query side + candidate side of ivf_topk),
    # and the 16-centroid broadcast makes per-pair norms cheap anyway
    # (measured: pre-normalizing regresses ivf_topk ~2.5x).
    centroids = ivf_centroids(vectors, num_centroids, id_col, vec_col, refine_iters)
    assignments = (
        vectors.crossJoin(F.broadcast(_centroid_array(centroids)))
        .select(
            F.col(id_col).alias("v_id"),
            _nearest_centroid(F.col("cents"), F.col(vec_col)).alias("bucket"),
        )
    )
    return centroids, assignments


def ivf_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: search the query's ``nprobe`` nearest IVF
    buckets.

    nprobe is the recall lever at fixed centroid count: each query
    ranks the (broadcast) centroids and scans the union of its top-n
    buckets — candidate volume grows ~linearly in nprobe while the big
    side still never shuffles (each candidate lives in exactly one
    bucket, so no dedup stage is needed). nprobe=1 degenerates to
    bucket == own assignment (identical tie-break: sim DESC, c_id
    ASC). ``refine_iters`` Lloyd iterations tighten the hash-sampled
    centroids toward true cluster centers (measured recall improvement
    in tests/test_operators.py); the registered sim_ann_ivf queries
    keep 0 so their DuckDB oracles stay expressible.
    """
    cents = ivf_centroids(vectors, num_centroids, id_col, vec_col, refine_iters)
    # candidate-side bucket computed INLINE from the broadcast centroid
    # array — map-only; joining a precomputed assignment table back
    # onto `vectors` would shuffle the big side twice for nothing
    v = vectors.crossJoin(F.broadcast(_centroid_array(cents))).select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_centroid(F.col("cents"), F.col(vec_col)).alias("bucket"),
    )
    q = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    qw = Window.partitionBy("q_id").orderBy(F.col("csim").desc(), F.col("c_id"))
    probes = (
        q.join(F.broadcast(cents))
        .select("q_id", "qv", "c_id", V.cosine(F.col("qv"), F.col("cv")).alias("csim"))
        .withColumn("crn", F.row_number().over(qw))
        .filter(F.col("crn") <= nprobe)
        .select("q_id", "qv", F.col("c_id").alias("qb"))
    )
    scored = v.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("qb")) & (F.col(id_col) != F.col("q_id")),
    ).select("q_id", F.col(id_col).alias("n_id"), V.cosine(F.col("qv"), F.col(vec_col)).alias("score"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("score", 4).alias("score"))
    )


# ---------------------------------------------------------------------------
# product quantization (compressed-vector ANN)
# ---------------------------------------------------------------------------


def pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace PQ codebooks: ``cents[j][c][d]`` — subspace ``j``'s
    centroid ``c``. Deterministic md5-ordered seed (the same
    reproducible-sample trick as :func:`ivf_centroids`, so the DuckDB
    differential oracle can rebuild the exact codebooks).

    Collected to the driver BY DESIGN: PQ codebook training is an
    offline, sample-based step in every real system (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
    codebooks are k-means over a training sample, then frozen); 16×
    subvectors is KBs. The big table only ever sees the broadcast
    literal."""
    rows = (
        vectors.select(F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(num_centroids)
        .collect()
    )
    dim = len(rows[0]["v"])
    sub = dim // m
    return [
        [[float(r["v"][j * sub + d]) for d in range(sub)] for r in rows]
        for j in range(m)
    ]


def pq_encode(
    vectors: DataFrame,
    cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes): each vector compressed to ``m`` small ints —
    ``codes[j]`` = argmin-L2 centroid of subspace ``j`` (ties -> lowest
    centroid index). Row-local Column math over the broadcast codebook
    literal: the vector table never shuffles to encode. At 64-dim /
    m=8 / 16 centroids the code is 8 bytes vs 256 — the 32× that lets
    a 100 TB vector corpus sit ADC-scannable in ~3 TB.

    Higher-order-function encode is interpreted (not codegen); at
    cluster scale swap the same argmin into the Arrow-batched numpy
    path used by embedding_lsh_dedup_pairs — shape unchanged.
    """
    m = len(cents)
    sub = len(cents[0][0])
    # codebook as broadcast ROW DATA, not an inline literal — F.lit of
    # a 1024-element nested list is a CreateArray re-evaluated per row
    cb_row = vectors.sparkSession.createDataFrame(
        [(cents,)], "cb array<array<array<double>>>"
    )
    cl = F.col("cb")
    vd = V.as_double(F.col(vec_col))

    def code_for(j: F.Column) -> F.Column:
        vsub = F.slice(vd, j * sub + 1, sub)
        best = F.array_min(
            F.transform(
                F.element_at(cl, (j + 1).cast("int")),
                lambda c, ci: F.struct(
                    F.aggregate(
                        F.zip_with(vsub, c, lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    ci.alias("ci"),
                ),
            )
        )
        return best["ci"]

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for)
    return vectors.crossJoin(F.broadcast(cb_row)).select(
        F.col(id_col), codes.alias("codes")
    )


def pq_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    m: int = 8,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact, candidates are their reconstructed centroids —
    score(q, n) = Σ_j  q_subj · cents[j][codes_n[j]].

    Scan shape at scale: codes are 8 bytes/row, queries + codebooks
    broadcast, scoring is row-local, top-k per query is a bounded
    window — the only wide op. (Real deployments precompute the
    per-query 8×16 lookup table once; the per-candidate work is then 8
    table probes. The algebra here is identical, just inlined.)
    """
    cents = pq_codebooks(vectors, m, num_centroids, id_col, vec_col)
    sub = len(cents[0][0])
    cb_row = vectors.sparkSession.createDataFrame(
        [(cents,)], "cb array<array<array<double>>>"
    )
    cl = F.col("cb")
    enc = pq_encode(vectors, cents, id_col, vec_col).crossJoin(F.broadcast(cb_row))
    q = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), V.as_double(F.col(vec_col)).alias("qv")
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + V.dot(
            F.slice(F.col("qv"), j * sub + 1, sub),
            F.element_at(
                F.element_at(cl, (j + 1).cast("int")),
                (F.element_at(F.col("codes"), (j + 1).cast("int")) + 1).cast("int"),
            ),
        ),
    )
    scored = enc.join(F.broadcast(q), F.col("q_id") != F.col(id_col)).select(
        "q_id", F.col(id_col).alias("n_id"), score.alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("score", 4).alias("score"))
    )


def quantize_report_int8(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, n_vectors, mse, max_abs_err): reconstruction-error
    report for uint8 scalar quantization with global per-dimension
    [min, max] ranges — the go/no-go table before shipping a 4×
    compressed embedding store (ANN indexes, retrieval caches).

    Shape: per-dimension ranges via posexplode -> (dim, min, max)
    aggregate (dims × partitions rows through the exchange, map-side
    combined), folded to ONE broadcast row; the quantize/dequantize
    error is then a row-local zip_with against the broadcast range
    arrays, and the report is one tiny aggregate per label. The
    vector table is scanned twice (ranges + errors) — at 100 TB
    persist the 1-row range table and the second pass is the only
    scan. Quantizer q = floor((v-min)/range*255 + 0.5), deq =
    min + q*range/255; constant dimensions reconstruct exactly.
    """
    dims = vectors.select(
        F.posexplode(V.as_double(F.col(vec_col))).alias("i", "v")
    ).groupBy("i").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    ranges = dims.agg(
        F.array_sort(F.collect_list(F.struct("i", "mn", "mx"))).alias("rs")
    ).select(
        F.transform("rs", lambda r: r["mn"]).alias("mns"),
        F.transform("rs", lambda r: r["mx"] - r["mn"]).alias("rngs"),
    )

    def err(v: F.Column, mn: F.Column, rng: F.Column) -> F.Column:
        q = F.floor((v - mn) / rng * 255 + F.lit(0.5))
        deq = mn + q * rng / 255
        return F.when(rng == 0, F.lit(0.0)).otherwise(v - deq)

    errs = (
        vectors.crossJoin(F.broadcast(ranges))
        .select(
            F.col(label_col).alias("label"),
            F.zip_with(
                F.zip_with(
                    V.as_double(F.col(vec_col)),
                    F.col("mns"),
                    lambda v, mn: F.struct(v.alias("v"), mn.alias("mn")),
                ),
                F.col("rngs"),
                lambda p, rng: err(p["v"], p["mn"], rng),
            ).alias("es"),
        )
    )
    return errs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(
            F.avg(
                F.aggregate(F.col("es"), F.lit(0.0), lambda a, x: a + x * x)
                / F.size("es")
            ),
            9,
        ).alias("mse"),
        F.round(F.max(F.array_max(F.transform("es", F.abs))), 6).alias(
            "max_abs_err"
        ),
    )
