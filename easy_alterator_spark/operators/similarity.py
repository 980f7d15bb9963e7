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

Each ANN family ships two equality-pinned forms: a pure-Column form
(SQL-expressible — the DuckDB differential oracle) and an
Arrow-batched deployment form (``*_arrow``) whose dense per-vector
kernels run as one numpy matmul per batch — the justified pandas-UDF
family of SURVEY §2.9 (centroids/codebooks are frozen closure state;
the vector table is one map-only scan, never joined or shuffled).
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
    # queries are the small side -> broadcast them past the candidates;
    # both sides are already array<double> (prep), so the per-pair work
    # is ONE zip_with+aggregate pass (dot_d), not dot()'s three
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", V.dot_d(F.col("qv"), F.col("nv")).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("score", 4).alias("score"))
    )


def brute_force_topk_arrow(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched twin of :func:`brute_force_topk` (cosine): the
    query block is collected once (the small side — it was broadcast
    in the Column form anyway) and each candidate Arrow batch scores
    against it as one (n,d)@(d,q) matmul. Same justified pandas-UDF
    family as the IVF/PQ deployment forms; equality-pinned against the
    Column form in tests. The candidate table is one map-only scan —
    identical data movement to the Column form's broadcast join, ~50x
    less per-element overhead."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    ).collect()
    q_ids = np.array([r["q_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = np.inf
    Qu = (Q / qn[:, None]).T  # (d, q)

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(X, axis=1)
            nrm[nrm == 0] = np.inf
            S = (X / nrm[:, None]) @ Qu  # (n, q)
            out = []
            for j, q_id in enumerate(q_ids):
                mask = ids != q_id
                out.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(int(mask.sum()), q_id, dtype=np.int64),
                            "n_id": ids[mask],
                            "score": S[mask, j],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = candidates.select(id_col, vec_col).mapInPandas(
        score_batches, "q_id long, n_id long, score double"
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
    mean_decimals: int | None = None,
) -> DataFrame:
    """Lloyd (k-means) refinement of an initial centroid set.

    Per iteration: broadcast-assign every vector to its nearest
    centroid, then recompute each centroid as the element-wise mean of
    its bucket. The mean is computed via posexplode ->
    groupBy(bucket, pos) — partial aggregation runs map-side, so the
    shuffle carries only |centroids| × dim rows regardless of input
    size; the big side never shuffles whole vectors. Buckets that end
    up empty drop out (the centroid count can shrink).

    ``mean_decimals`` rounds each per-dimension mean (cross-engine
    determinism valve: a double AVG's value depends on accumulation
    order, so two engines — or two partitionings — can disagree in the
    last bits and flip a knife-edge assignment next iteration;
    rounding to a few decimals snaps both sides to the same centroid
    bit-for-bit, at k-means-noise-level precision cost).

    Returns a (c_id, cv) DataFrame shaped like the input centroids —
    drop-in for :func:`assign_ivf_buckets`'s sampled seed.
    """
    v = vectors.select(F.col(id_col).alias("v_id"), F.col(vec_col).alias("vv"))
    for _ in range(iters):
        assigned = nearest_assign(
            v, centroids, vec_col="vv", id_col="v_id", keep_vec=True
        )
        by_pos = assigned.select(
            "bucket", F.posexplode(V.as_double(F.col("vv"))).alias("pos", "val")
        )
        m_expr = F.avg("val")
        if mean_decimals is not None:
            m_expr = F.round(m_expr, mean_decimals)
        means = by_pos.groupBy("bucket", "pos").agg(m_expr.alias("m"))
        centroids = means.groupBy("bucket").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        ).select(F.col("bucket").alias("c_id"), "cv")
    return centroids


def nearest_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_vec: bool = False,
) -> DataFrame:
    """(v_id, bucket[, vv]): broadcast argmax-cosine assignment of
    every vector to its nearest centroid — highest sim, ties to the
    LOWEST c_id (max_by over (sim, -c_id)). The centroid table rides a
    broadcast join; the vector side never shuffles (the groupBy keys
    on v_id, which the scan already satisfies per-row — Catalyst
    plans it as a partial-only aggregate over the joined scan).

    The SQL-expressible assignment primitive shared by Lloyd
    refinement and the k-means registry query; the deployment twin is
    :func:`_nearest_centroid`'s inline unit-dot argmax inside the
    Arrow IVF path."""
    v = vectors.select(F.col(id_col).alias("v_id"), F.col(vec_col).alias("vv"))
    scored = v.join(F.broadcast(centroids)).select(
        "v_id", "vv", "c_id", V.cosine(F.col("vv"), F.col("cv")).alias("sim")
    )
    aggs = [
        F.max_by(
            "c_id", F.struct(F.col("sim"), (-F.col("c_id")).alias("tb"))
        ).alias("bucket")
    ]
    if keep_vec:
        aggs.append(F.any_value("vv").alias("vv"))
    return scored.groupBy("v_id").agg(*aggs)


def ivf_centroids(
    vectors: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    materialize: bool = True,
) -> DataFrame:
    """Deterministic centroid seed (md5-ordered first N — md5 so the
    DuckDB differential oracle can reproduce the exact sample), with
    optional Lloyd refinement.

    ``materialize=True`` (default) collects the ≤num_centroids rows
    once and rebuilds them as a local relation — the same offline-
    codebook discipline as :func:`pq_codebooks` (centroid training is
    a frozen, sample-based step in every real IVF system; Jégou et
    al. 2011). Downstream consumers reference the centroid set 2-3
    times (broadcast array + probe ranking); left lazy, EACH reference
    re-ran the TakeOrdered scan of the full vector table and compiled
    its own codegen stage — pure per-query job overhead, the measured
    source of the IVF family's r2->r3 bench creep."""
    centroids = (
        vectors.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
        .orderBy(F.md5(F.col("c_id").cast("string")))
        .limit(num_centroids)
    )
    if refine_iters > 0:
        centroids = refine_centroids(
            vectors, centroids, iters=refine_iters, vec_col=vec_col, id_col=id_col
        )
    if materialize:
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def _nearest_centroid(cents_arr: F.Column, vec: F.Column) -> F.Column:
    """Inline argmax-cosine bucket id: highest sim, ties -> lowest c_id
    (struct max over (sim, -c_id), the same order max_by(c_id,
    struct(sim, -c_id)) would use). Pure row-local expression — no
    groupBy, no join-back — so assignment never shuffles the vectors.

    The broadcast array carries UNIT centroids (``cvu``), so
    argmax_c cosine(vec, c) == argmax_c dot(vec, cvu): the vector's
    own norm is a constant positive factor across centroids and drops
    out of the argmax — per centroid the work is ONE fused
    zip_with+aggregate pass (cast inline), not cosine()'s three
    passes plus a per-centroid recomputation of norm(vec). r3 bench
    creep fix: ~3x less interpreted-HOF work in the assignment scan.
    """
    best = F.array_max(
        F.transform(
            cents_arr,
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(vec, c["cvu"], lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("sim"),
                (-c["c_id"]).alias("nc"),
            ),
        )
    )
    # coalesce makes the bucket PROVABLY non-null: without it, the
    # downstream equi-join's inferred isnotnull(bucket) filter is
    # pushed below the projection and re-evaluates this whole argmax
    # a second time per row (measured ~2x assignment cost at r4).
    # -1 is never a real c_id, so empty-centroid rows still match
    # nothing — same semantics as the null they'd otherwise carry.
    return F.coalesce(-best["nc"], F.lit(-1).cast("long"))


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """One-row DataFrame holding all centroids as a sorted array —
    broadcast-crossed into the vector scan for map-side assignment.
    Centroids are unit-normalized HERE, once for the whole broadcast,
    so the per-row argmax needs no norms at all."""
    return centroids.agg(
        F.array_sort(
            F.collect_list(F.struct("c_id", V.unit(F.col("cv")).alias("cvu")))
        ).alias("cents")
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
    # NB: the VECTOR table is never pre-normalized upstream (that
    # subtree would be evaluated once per downstream consumer);
    # normalization lives where it's O(rows): on the 8-row centroid
    # broadcast (_centroid_array) and inside single-scan projections.
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
    # onto `vectors` would shuffle the big side twice for nothing.
    # The same single scan also unit-normalizes the candidate (one
    # norm per ROW), so the pair join below is one dot per pair — the
    # r2->r3 creep was per-PAIR cosines recomputing both norms.
    v = vectors.crossJoin(F.broadcast(_centroid_array(cents))).select(
        F.col(id_col),
        V.unit(F.col(vec_col)).alias("nv"),
        _nearest_centroid(F.col("cents"), F.col(vec_col)).alias("bucket"),
    )
    q = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), V.unit(F.col(vec_col)).alias("qv")
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
    ).select("q_id", F.col(id_col).alias("n_id"), V.dot_d(F.col("qv"), F.col("nv")).alias("score"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("score", 4).alias("score"))
    )


def ivf_topk_arrow(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Arrow-batched twin of :func:`ivf_topk` — identical semantics
    (same centroids, same argmax/tie-breaks, same scores), with the
    per-vector kernels (bucket assignment + probe scoring) run as one
    numpy matmul per Arrow batch instead of interpreted Column HOFs.

    This is the deployment form, in the same justified pandas-UDF
    family as ``embedding_lsh`` and ``semantic_dedup_kernel``
    (SURVEY §2.9): the per-element interpreted-expression overhead of
    the Column form is ~50x a vectorized matmul, and the work is a
    dense (n,d)@(d,c) product with no SQL-visible structure for
    Catalyst to optimize. Centroids and query vectors are collected
    ONCE into the closure (offline-codebook discipline, as
    :func:`pq_codebooks`); the corpus pass is a single mapInPandas
    scan — no join, no shuffle of the vector table, and the only wide
    op is the bounded top-k window on the ~|queries|x|bucket| pairs.
    The Column form remains the differential-verify twin
    (tests/test_operators.py pins pair-for-pair equality).
    """
    import numpy as np
    import pandas as pd

    cent_rows = sorted(
        ivf_centroids(vectors, num_centroids, id_col, vec_col).collect(),
        key=lambda r: r["c_id"],
    )
    c_ids = np.array([r["c_id"] for r in cent_rows], dtype=np.int64)
    C = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    c_norm = np.linalg.norm(C, axis=1)
    c_norm[c_norm == 0] = np.inf
    Cu = C / c_norm[:, None]

    q_rows = (
        vectors.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    probes: list[tuple[int, np.ndarray, frozenset]] = []
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        qn = np.linalg.norm(qv)
        qu = qv / qn if qn else qv
        csim = Cu @ qu
        # rank centroids by (sim DESC, c_id ASC); c_ids already ASC so
        # a stable sort on -sim preserves the tie-break
        order = np.argsort(-csim, kind="stable")[:nprobe]
        probes.append((int(r["q_id"]), qu, frozenset(int(c_ids[i]) for i in order)))

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # bucket = argmax_c dot(x, unit(c)); ties -> first (lowest
            # c_id, columns are c_id-ascending) — as _nearest_centroid
            buckets = c_ids[np.argmax(X @ Cu.T, axis=1)]
            nrm = np.linalg.norm(X, axis=1)
            nrm[nrm == 0] = np.inf
            Xu = X / nrm[:, None]
            out_q, out_n, out_s = [], [], []
            for q_id, qu, pset in probes:
                mask = np.isin(buckets, list(pset)) & (ids != q_id)
                if not mask.any():
                    continue
                out_q.append(np.full(int(mask.sum()), q_id, dtype=np.int64))
                out_n.append(ids[mask])
                out_s.append(Xu[mask] @ qu)
            if out_q:
                yield pd.DataFrame(
                    {
                        "q_id": np.concatenate(out_q),
                        "n_id": np.concatenate(out_n),
                        "score": np.concatenate(out_s),
                    }
                )

    scored = vectors.select(id_col, vec_col).mapInPandas(
        score_batches, "q_id long, n_id long, score double"
    )
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

    Higher-order-function encode is interpreted (not codegen) — this
    Column form exists as the SQL-expressible oracle variant; the
    deployment form is :func:`pq_encode_arrow` (same codes,
    equality-pinned in tests/test_operators.py).
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


def _np_codebooks(cents) -> "list":
    import numpy as np

    return [np.asarray(cj, dtype=np.float64) for cj in cents]


def pq_encode_arrow(
    vectors: DataFrame,
    cents: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched twin of :func:`pq_encode` — identical codes
    (argmin-L2, ties -> lowest centroid index), computed as one numpy
    distance argmin per subspace per batch instead of the interpreted
    HOF fold. Same justified pandas-UDF family as
    ``semantic_dedup_kernel`` (r3 verdict task 4): the work is dense
    (n,sub)-vs-(c,sub) distance algebra with nothing for Catalyst to
    push or prune, and the codebook is closure state (KBs, frozen
    offline — Jégou et al. 2011). The vector table never shuffles."""
    import numpy as np
    import pandas as pd

    m = len(cents)
    sub = len(cents[0][0])
    CB = _np_codebooks(cents)

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                Xj = X[:, j * sub : (j + 1) * sub]
                # ||x||^2 - 2xc + ||c||^2; argmin picks the FIRST
                # minimum -> lowest centroid index on exact ties
                # direct (x-c)^2 form (not the expanded ||x||^2-2xc+||c||^2):
                # avoids cancellation so near-tie codes stay aligned
                # with the Column/oracle form's per-element sums
                diff = Xj[:, None, :] - CB[j][None, :, :]
                d = (diff * diff).sum(2)
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, codes array<int>"
    )


def pq_topk_arrow(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    m: int = 8,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched twin of :func:`pq_topk`: encode + ADC scoring in
    ONE mapInPandas scan. Per query the 8x16 lookup table
    L[j][c] = q_subj . cents[j][c] is precomputed once (the standard
    ADC deployment shape the Column form only alludes to); each
    candidate then costs m table probes: score = sum_j L[j, code_j].
    Exact same scores/tie-breaks as the Column form (equality-pinned
    in tests); the SQL-expressible Column form stays as the oracle
    variant."""
    import numpy as np
    import pandas as pd

    cents = pq_codebooks(vectors, m, num_centroids, id_col, vec_col)
    sub = len(cents[0][0])
    CB = _np_codebooks(cents)

    q_rows = (
        vectors.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    # per-query ADC lookup tables: L[j][c] = dot(q_subj, cents[j][c])
    qtabs = []
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        L = np.stack(
            [CB[j] @ qv[j * sub : (j + 1) * sub] for j in range(m)]
        )  # (m, c)
        qtabs.append((int(r["q_id"]), L))

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), m), dtype=np.int64)
            for j in range(m):
                Xj = X[:, j * sub : (j + 1) * sub]
                # direct (x-c)^2 form (not the expanded ||x||^2-2xc+||c||^2):
                # avoids cancellation so near-tie codes stay aligned
                # with the Column/oracle form's per-element sums
                diff = Xj[:, None, :] - CB[j][None, :, :]
                d = (diff * diff).sum(2)
                codes[:, j] = np.argmin(d, axis=1)
            js = np.arange(m)
            out = []
            for q_id, L in qtabs:
                mask = ids != q_id
                scores = L[js, codes[mask]].sum(1)
                out.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(int(mask.sum()), q_id, dtype=np.int64),
                            "n_id": ids[mask],
                            "score": scores,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = vectors.select(id_col, vec_col).mapInPandas(
        score_batches, "q_id long, n_id long, score double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", F.round("score", 4).alias("score"))
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
