"""Training-data selection operators: deterministic sampling and
token-budget sequence packing.

Both are staples of an LLM data pipeline that plain SQL engines make
awkward:

- **hash sampling** replaces rng-based `TABLESAMPLE` with a
  content-derived rule (md5 of the id), so a split is (a) reproducible
  across engines/runs/partitionings — the DuckDB oracle computes the
  SAME split — and (b) stable under re-runs over a growing corpus: a
  document's split membership never changes when other rows appear.
  Per-stratum rates (e.g. downsample English, keep all low-resource
  languages) are a literal rate map resolved per row.
- **sequence packing** assigns documents to fixed token-budget packs
  (the "concat-and-chunk" batching step before tokenization): a
  running token total over a deterministic document order, divided by
  the budget. One window over the order key — no driver loop, no UDF.

All pure Column expressions; the only shuffle is the window's
partition-by-stratum sort in pack_sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as T

# md5 hex chars are uniform: 4 leading hex digits give 16-bit
# resolution; rate r keeps rows whose bucket < r * 2^16.
_BUCKETS = 1 << 16


def hash_bucket(id_col: F.Column) -> F.Column:
    """Uniform [0, 2^16) bucket from md5(id) — reproducible anywhere
    md5 exists (Spark, DuckDB, Python)."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast("int")


def sample_hash(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    stratum_rates: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic sample: keep rows with hash_bucket < rate·2^16.

    With ``stratum_col``/``stratum_rates``, each stratum gets its own
    rate (fall back to ``rate``) — stratified sampling without a
    shuffle: the rate map is a literal when/otherwise chain, the
    filter is row-local, and Catalyst pushes it into the scan.
    """
    bucket = hash_bucket(F.col(id_col))
    if stratum_col and stratum_rates:
        r: F.Column = F.lit(rate)
        for k, v in sorted(stratum_rates.items()):
            r = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(r)
        return df.filter(bucket < (r * _BUCKETS).cast("int"))
    return df.filter(bucket < int(rate * _BUCKETS))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str | None = None,
) -> DataFrame:
    """(id, n_tokens, pack_id): greedy in-order packing into
    ``budget``-token packs.

    Documents are taken in ``id_col`` order (deterministic); a doc
    goes in pack ``floor((cumulative_tokens - n_tokens) / budget)`` —
    i.e. packs are cut where the RUNNING total crosses a budget
    multiple. Oversized single documents occupy their own pack(s).
    With ``partition_col`` (e.g. lang) packing is per-partition and
    the window sort distributes; without it the window is global —
    fine for ordering-sensitive packing, but at 100 TB prefer a
    partition column so no single-reducer sort exists.
    """
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    ).orderBy(id_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ntok = T.token_count(F.col(text_col)).cast("long")
    out = docs.select(
        F.col(id_col),
        *( [F.col(partition_col)] if partition_col else [] ),
        ntok.alias("n_tokens"),
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return out.select(
        id_col,
        *( [partition_col] if partition_col else [] ),
        "n_tokens",
        ((F.col("cum") - F.col("n_tokens")) / budget).cast("long").alias("pack_id"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, n_tok, first_tok, last_tok): split each document
    into fixed token-budget chunks — the context-window chunking step
    before tokenization/embedding.

    Row-local: the token array is sliced inside one projection (explode
    of a generated chunk-index sequence), so the operator is a pure map
    + explode with output proportional to total tokens / chunk size.
    No shuffle, no UDF; empty documents yield no chunks.
    """
    # empty docs are dropped BEFORE the explode: sequence(0, n_chunks-1)
    # with n_chunks=0 would be sequence(0,-1) = [0,-1] (Spark infers
    # step -1) — two spurious rows that a later filter would have to
    # clean up; filtering first keeps the invariant local
    base = docs.select(F.col(id_col), T.tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    n_chunks = F.ceil(F.size("toks").cast("double") / chunk_tokens).cast("int")
    chunked = base.select(
        F.col(id_col),
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_id") * chunk_tokens + 1, chunk_tokens
    )
    return chunked.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_tok"),
        F.element_at(piece, 1).alias("first_tok"),
        F.element_at(piece, -1).alias("last_tok"),
    )


def sample_weighted(
    df: DataFrame, weight_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Importance sampling: keep each row with probability equal to its
    own ``weight_col`` value in [0, 1] — deterministically, via the
    same content-derived md5 bucket as :func:`sample_hash` (floor'd to
    an integer threshold so any engine reproduces the exact set).

    The training-data use is quality-weighted mixing: high-quality
    documents are kept at ~their score, low-quality ones decimated,
    with no RNG — membership is stable across runs, engines, and
    corpus growth. Row-local filter: pushes to the scan when the
    weight is a stored column, stays map-side when computed.

    Out-of-contract weights are clamped into [0, 1] (w>1 keeps the
    row, w<0 or NaN drops it) instead of silently skewing the sample;
    NULL weights drop the row (NULL comparison is never true).
    """
    raw = F.col(weight_col)
    # NaN explicitly: Spark orders NaN ABOVE all doubles, so a bare
    # least/greatest clamp would turn NaN into "keep always"
    w = F.when(F.isnan(raw), F.lit(0.0)).otherwise(
        F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))
    )
    thresh = F.floor(w * _BUCKETS).cast("int")
    return df.filter(hash_bucket(F.col(id_col)) < thresh)


def mixture_resample(
    docs: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Resample a multi-source corpus toward a TARGET domain mixture —
    the "data mixing" step of pre-training pipelines (cf. The Pile /
    DoReMi-style fixed mixture weights): given ``targets`` =
    {source: weight} and a total token ``budget_tokens``, each source
    is hash-downsampled at rate min(1, budget·w_s / tokens_s) so the
    expected kept-token mass per source matches budget·w_s. Sources
    absent from ``targets`` are dropped.

    Shape at 100 TB: ONE map-side-combined aggregate computes
    per-source token totals (|sources| rows to the driver — tens, not
    data-scale); the rates become a literal when/otherwise chain
    inside the same deterministic md5-bucket filter
    :func:`sample_hash` uses, so the corpus pass is scan + row-local
    filter — pushdown-friendly, no shuffle, reproducible re-runs.
    Oversubscribed sources (tokens_s < budget·w_s) keep everything —
    rate clamps at 1; real pipelines then upsample by epoch repetition
    at training time, which is out of scope for the corpus pass.
    """
    from ..functions import text as T

    nt = F.size(T.tokens(F.col(text_col)))
    totals = {
        r[source_col]: r["toks"]
        for r in docs.groupBy(source_col)
        .agg(F.sum(nt).cast("double").alias("toks"))
        .collect()
    }
    rates = {
        s: min(1.0, budget_tokens * w / totals[s])
        for s, w in targets.items()
        if s in totals and totals[s] > 0
    }
    kept = docs.filter(F.col(source_col).isin(list(rates)))
    return sample_hash(kept, 0.0, id_col=id_col, stratum_col=source_col, stratum_rates=rates)


def quality_percent_rank(
    docs: DataFrame,
    score_col: str = "q",
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs + ``pr``: exact percent rank of ``score_col`` within each
    ``by`` group (ties broken by id, so the rank — and any filter on
    it — is fully deterministic).

    This is the EXACT quantile-filter form: one sort-shuffle per
    group. Groups are domains/sources (tens to thousands), so at
    100 TB a single group can be a large fraction of the corpus and
    the per-group sort is the bottleneck — that is what
    :func:`quality_threshold_filter` exists for. Keep this form for
    moderate group cardinality or when exact ranks are the contract.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    return docs.withColumn("pr", F.percent_rank().over(w))


def quality_threshold_filter(
    docs: DataFrame,
    quantile: float = 0.25,
    score_col: str = "q",
    by: str = "source",
) -> DataFrame:
    """Drop each group's bottom ``quantile`` of ``score_col`` — the
    100 TB quantile-filter path.

    Two passes, neither sorting the corpus: (1) a map-side-combined
    ``approx_percentile`` per group (t-digest-style mergeable sketch;
    |groups| rows out), (2) a broadcast join of the thresholds back
    and a row-local ``>=`` filter. The corpus never shuffles.
    Approximation only moves the CUT POINT by the sketch error
    (fraction of rows near the boundary) — everything clearly above
    or below the quantile is classified identically to the exact
    form (tests/test_operators.py pins agreement away from the cut).
    """
    thr = docs.groupBy(by).agg(
        F.percentile_approx(score_col, quantile, 10000).alias("q_cut")
    )
    return (
        docs.join(F.broadcast(thr), by)
        .filter(F.col(score_col) >= F.col("q_cut"))
        .drop("q_cut")
    )


def training_order(
    docs: DataFrame,
    num_shards: int = 8,
    seed: str = "42",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, pos): a deterministic global shuffle of the
    corpus into ``num_shards`` training shards — the "randomize your
    training order, reproducibly" primitive every run needs.

    The shuffle key is content-derived (md5 of seed:id, the same
    engine-portable rule as :func:`sample_hash`), so any engine — and
    any re-run — derives the identical order; changing ``seed`` gives
    an independent permutation. ``shard`` is the key mod num_shards;
    ``pos`` is the rank of the full hex key within the shard (ties
    impossible: md5 keys collide only when ids collide, and the id is
    appended as a tiebreak).

    100 TB shape: one hash-partitioned sort per shard. Pick
    num_shards so a shard fits a task (e.g. 100k shards for 100 TB ->
    ~1 GB each); the physical form is then
    ``repartition(num_shards, shard).sortWithinPartitions(key)`` —
    identical output, and the window below degenerates to exactly
    that one exchange + in-partition sort.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 4), 16, 10).cast("int"), F.lit(num_shards)
    )
    w = Window.partitionBy("shard").orderBy(F.col("k").asc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col), key.alias("k"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def stratified_topn(
    df: DataFrame,
    n: int,
    stratum_col: str,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Exact fixed-SIZE per-stratum sample: the ``n`` rows with the
    smallest md5(seed:id) in each stratum — the "give me exactly 10k
    eval docs per language" selection that rate-based sampling can't
    guarantee. Deterministic and engine-portable like
    :func:`sample_hash`; changing ``seed`` draws an independent sample.

    One hash-partitioned sort per stratum (row_number window). At
    100 TB a full per-stratum sort is the bottleneck swap point:
    two-pass it — approx_percentile of the key at n/|stratum| as a
    map-side pre-filter, exact rank only over the ~n survivors.
    """
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def chunk_documents_overlap(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking with overlap (stride < chunk size), the
    RAG/embedding convention that keeps sentences near a boundary
    visible to both neighboring chunks. Window ``i`` covers tokens
    ``[i*stride, i*stride + chunk_tokens)``; windows start while
    ``i*stride < n_tokens``, so the tail window may be short and empty
    docs yield no rows.

    Same shape as :func:`chunk_documents`: pure map + explode, output
    ~ total_tokens/stride rows, zero shuffle.
    """
    if not (0 < stride <= chunk_tokens):
        raise ValueError("stride must be in (0, chunk_tokens]")
    base = docs.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    n_chunks = F.ceil(F.size("toks").cast("double") / stride).cast("int")
    chunked = base.select(
        F.col(id_col),
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return chunked.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_tok"),
        F.element_at(piece, 1).alias("first_tok"),
        F.element_at(piece, -1).alias("last_tok"),
    )


def split_with_leakage_guard(
    docs: DataFrame,
    pairs: DataFrame,
    eval_rate: float = 0.2,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, role): deterministic train/eval split where TRAIN
    members near-duplicating an EVAL member are DROPPED — the leakage
    guard a benchmark-grade split needs (a hash split alone leaves
    near-copies of eval documents in train, silently inflating eval).

    role ∈ {'eval', 'train', 'dropped'}. Membership is content-stable:
    eval = md5-bucket < rate (sampling.hash_bucket), so re-splitting a
    grown corpus never moves existing docs; the guard drops a train
    doc when ANY near-dup pair (from whatever pair generator —
    MinHash-LSH at scale, exact Jaccard in the bounded oracle form)
    links it to an eval doc. Shape: the pair list is projected to
    (train_id) under the eval predicate on the OTHER side — pair-sized
    work — then a broadcast-able left anti-ish join marks the corpus;
    the corpus itself never self-joins here.
    """
    bucket = hash_bucket(F.col(id_col))
    cut = int(eval_rate * _BUCKETS)
    is_eval = bucket < cut

    def eval_of(c: str) -> F.Column:
        return hash_bucket(F.col(c)) < cut

    a, b = "doc_id_a", "doc_id_b"
    leaky = (
        pairs.select(F.col(a).alias("t"), F.col(b).alias("o"))
        .unionByName(pairs.select(F.col(b).alias("t"), F.col(a).alias("o")))
        .filter(~eval_of("t") & eval_of("o"))
        .select(F.col("t").alias("leak_id"))
        .distinct()
    )
    role = (
        F.when(is_eval, "eval")
        .when(F.col("leak_id").isNotNull(), "dropped")
        .otherwise("train")
    )
    return (
        docs.join(
            F.broadcast(leaky), docs[id_col] == leaky["leak_id"], "left"
        )
        .select(F.col(id_col), role.alias("role"))
    )


def pareto_frontier_2d(
    df: DataFrame, col_a: str, col_b: str, num_partitions: int | None = None
) -> DataFrame:
    """Rows on the 2-D Pareto frontier maximizing (``col_a``,
    ``col_b``): no other row is >= in both dimensions and > in one.
    The multi-objective form of data selection — "longest AND most
    lexically diverse" has no single threshold, the frontier IS the
    answer — and the NOT EXISTS formulation is an O(n²) self-join no
    engine survives at corpus scale.

    Exact O(n log n) sort shape instead: a row survives iff its
    ``col_b`` equals the max within its ``col_a`` group AND strictly
    exceeds every ``col_b`` at strictly larger ``col_a`` — i.e. the
    group maxima form a strictly decreasing staircase. One shuffle to
    group by ``col_a``, then :func:`~.rank.global_prefix_max` over
    ``col_a`` DESC on the (distinct-key-sized) group table — the
    terasort decomposition, no single-reducer window. Ties on both
    dims all survive (none dominates another).

    The join back is on ``col_a`` against the FRONTIER key set —
    usually tiny, but worst case (perfectly anti-correlated dims)
    data-sized, so it is left to AQE to broadcast at runtime rather
    than forced.
    """
    from .rank import global_prefix_max

    g = df.groupBy(col_a).agg(F.max(col_b).alias("__gb"))
    pm = global_prefix_max(
        g, [F.col(col_a).desc()], "__gb", "__pm", num_partitions=num_partitions
    )
    frontier_keys = pm.filter(
        F.col("__pm").isNull() | (F.col("__gb") > F.col("__pm"))
    ).select(col_a, "__gb")
    return (
        df.join(frontier_keys, col_a)
        .filter(F.col(col_b) == F.col("__gb"))
        .drop("__gb")
    )


def sample_weighted_fixed_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY-k weighted sampling without replacement per stratum
    (Efraimidis-Spiridon A-ES): each row draws key = ln(u)/w for a
    uniform u and weight w > 0; the k largest keys are a without-
    replacement sample with inclusion probability proportional to
    weight. The LLM-pipeline form is proportional-to-length document
    sampling under a fixed budget — w = token count gives every token
    equal selection mass while drawing whole documents.

    u is CONTENT-DERIVED, not RNG: 48 bits of md5(id), so the sample
    is reproducible across engines/runs/partitionings (same argument
    as :func:`sample_hash`) and any SQL engine replays it exactly.
    Rows with w <= 0, NULL, or NaN are excluded (zero weight = zero
    inclusion mass; ln(u)/0 would be -inf anyway, but explicitly so
    the contract doesn't ride on IEEE corner cases).

    Scale shape: with strata the top-k is one window per stratum
    (shuffle on the strata key). Without, the naive global window is
    the single-reducer anti-pattern, so it runs as local per-partition
    top-k first — the survivors are <= k x n_partitions rows, and only
    THAT sliver crosses the final single-partition ordering.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        + 0.5
    ) / float(1 << 48)
    w = F.col(weight_col).cast("double")
    keyed = df.filter(
        w.isNotNull() & ~F.isnan(w) & (w > 0)
    ).withColumn("__key", F.log(u) / w)
    order = [F.col("__key").desc(), F.col(id_col)]
    if strata_cols:
        win = Window.partitionBy(*strata_cols).orderBy(*order)
        return keyed.withColumn("__rn", F.row_number().over(win)).filter(
            F.col("__rn") <= k
        ).drop("__key", "__rn")
    local = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    survivors = keyed.withColumn("__rn", F.row_number().over(local)).filter(
        F.col("__rn") <= k
    )
    final = Window.orderBy(*order)  # <= k * n_partitions rows only
    return (
        survivors.withColumn("__grn", F.row_number().over(final))
        .filter(F.col("__grn") <= k)
        .drop("__key", "__rn", "__grn")
    )


def rendezvous_shard(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Assign every row to a shard by rendezvous (highest-random-
    weight) hashing: shard = argmax over s of md5(id '#' s).

    The property this buys over modulo sharding is CONSISTENCY under
    resizing: going N -> N+1 moves only the rows whose new shard's
    hash beats their old winner — an expected 1/(N+1) of the data,
    every move landing ON THE NEW SHARD — while id % N reshuffles
    almost everything. That is the difference between adding a
    training-data shard (or cache node / reducer group) with a 10%
    copy and a full re-layout at 100 TB.

    Row-local expression (array argmax over N md5 literals): no join,
    no shuffle, no state — the assignment runs inside the scan at any
    scale, and the md5-hex argmax is engine-portable (string compare
    of hex digests is identical everywhere), so a different engine
    can verify or extend the layout bit-for-bit.
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    scores = F.transform(
        F.sequence(F.lit(0), F.lit(num_shards - 1)),
        lambda s: F.struct(
            F.md5(
                F.concat(F.col(id_col).cast("string"), F.lit("#"), s.cast("string"))
            ).alias("h"),
            s.alias("s"),
        ),
    )
    return df.withColumn(out_col, F.array_max(scores)["s"].cast("int"))
