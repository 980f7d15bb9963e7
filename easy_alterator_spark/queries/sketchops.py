"""Deterministic-sketch queries: the oracle-replayable twins of the
engine-native approximate aggregates (operators/sketches.py).

HLL++ and t-digest state is engine-private — no external SQL engine
can reproduce the registers, so the production wrappers
(approx_distinct_by / approx_percentiles_by) are testable only against
tolerance bounds. These queries instead build the SAME sketch shapes
(KMV order statistics, HLL registers, count-min counter tables) from
an md5-derived 60-bit hash that DuckDB replays bit-for-bit, putting an
*approximate data structure* under the driver's exact value-hash gate:
every register, bucket count, and estimate digit must match.

Scale notes (SCALE.md "sketches"): all three are partial-aggregable —
KMV's rank filter plans as WindowGroupLimit (per-task top-k before the
shuffle), HLL registers cap the shuffle at m rows per group per task,
and the CMS table is depth*width rows total with a map-only broadcast
probe. The 100 TB swap is hash-only (xxhash64 for md5); the plan is
identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketches as K
from ..sources import load_table
from . import query

# DuckDB token fragment shared with extensions.py (functions/text.py::tokens)
_DTOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"

# DuckDB replay of operators/sketches.hash60: first 15 hex digits of
# md5(value-as-string [+ '#salt']) cast through a hex literal.
def _h60(expr: str, salt: str = "") -> str:
    s = f"{expr} || '#{salt}'" if salt else expr
    return f"CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"


_KMV_K = 64

@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH d AS (SELECT DISTINCT event_type,
                      {_h60("user_id::VARCHAR")} AS h
               FROM events),
    r AS (SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM d),
    t AS (SELECT event_type, COUNT(*)::BIGINT AS k_eff, MAX(h) AS kth_hash
          FROM r WHERE rn <= {_KMV_K} GROUP BY event_type)
    SELECT event_type, k_eff, kth_hash,
           CASE WHEN k_eff < {_KMV_K} THEN k_eff::DOUBLE
                ELSE FLOOR(({_KMV_K - 1}.0 * 1152921504606846976.0
                            / kth_hash::DOUBLE) * 1e4) / 1e4
           END AS est_distinct
    FROM t
    """,
)
def sketch_kmv_distinct(spark, sf_dir):
    """K-minimum-values distinct users per event type: the k smallest
    hash60 values pin the estimate (k-1)/(hk/2^60). Distinct pre-pass
    dedupes map-side; the rank filter plans as WindowGroupLimit so
    each task forwards <= k rows per group (plan contract pinned).
    Small groups (< k hashes) degrade to the exact count."""
    ev = load_table(spark, sf_dir, "events")
    return K.kmv_distinct_by(ev, "event_type", "user_id", k=_KMV_K)


# shared by the batch query and its streaming twin (stream_hll_distinct):
# a drained streaming register state must land on EXACTLY these rows
_HLL_ORACLE = f"""
    WITH h AS (SELECT event_type, {_h60("event_id::VARCHAR")} AS h
               FROM events),
    b AS (SELECT event_type, h % {K.HLL_M} AS idx,
                 h // {K.HLL_M} AS rest FROM h),
    r AS (SELECT event_type, idx,
                 MAX(CASE WHEN rest = 0 THEN 53
                          ELSE 53 - length(bin(rest)) END) AS reg
          FROM b GROUP BY event_type, idx),
    g AS (SELECT event_type,
                 SUM(1::BIGINT << (53 - reg))::BIGINT AS s_present,
                 COUNT(*)::BIGINT AS m_present
          FROM r GROUP BY event_type)
    SELECT event_type, m_present,
           ({K.HLL_M} - m_present)::BIGINT AS m_zero,
           (s_present + ({K.HLL_M} - m_present)
                        * 9007199254740992)::BIGINT AS s_scaled,
           FLOOR(({K.HLL_NUMERATOR!r}
                  / (s_present + ({K.HLL_M} - m_present)
                                 * 9007199254740992)::DOUBLE) * 1e4) / 1e4
             AS est_distinct
    FROM g
    """


@query("sketch_hll_distinct", oracle=_HLL_ORACLE)
def sketch_hll_distinct(spark, sf_dir):
    """Deterministic HyperLogLog (m=256) distinct event ids per event
    type — HLL is the HIGH-cardinality tool (the raw estimator is
    biased below ~2.5m distincts, and the standard linear-counting
    correction needs ln(), which is not bit-reproducible across
    engines; low-cardinality keys belong to KMV/exact). No distinct
    pre-pass — MAX(rho) absorbs duplicates, so the raw stream
    partial-aggregates into at most m register rows per group per
    task: the canonical 100 TB approx-distinct shape. The 2^-register
    sum is integer-scaled (2^(53-reg), exact in int64) so summation
    order can never flip a bit across engines; the estimate is one
    IEEE division, floor-gridded."""
    ev = load_table(spark, sf_dir, "events")
    return K.hll_distinct_by(ev, "event_type", "event_id")


_CMS_D, _CMS_W, _CMS_K = 4, 64, 10


def _cms_oracle() -> str:
    streams = "\n      UNION ALL ".join(
        f"SELECT {j} AS j, {_h60('user_id::VARCHAR', str(j))} % {_CMS_W} AS bucket FROM events"
        for j in range(_CMS_D)
    )
    probes = "\n    ".join(
        f"JOIN sk k{j} ON k{j}.j = {j} AND k{j}.bucket = "
        f"{_h60('u.user_id::VARCHAR', str(j))} % {_CMS_W}"
        for j in range(_CMS_D)
    )
    least = ", ".join(f"k{j}.cnt" for j in range(_CMS_D))
    return f"""
    WITH s AS ({streams}),
    sk AS (SELECT j, bucket, COUNT(*)::BIGINT AS cnt FROM s GROUP BY j, bucket),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id, least({least}) AS est_count
    FROM u
    {probes}
    ORDER BY est_count DESC, u.user_id
    LIMIT {_CMS_K}
    """


@query("sketch_countmin_topk", oracle=_cms_oracle())
def sketch_countmin_topk(spark, sf_dir):
    """Count-min-sketch heavy hitters: top-10 users by estimated event
    count from a 4x64 counter table. The sketch build is one hash
    aggregation into depth*width cells (size-independent of the data);
    the probe is map-only against the broadcast table; top-k is
    TakeOrderedAndProject. est >= exact is the CMS guarantee — pinned
    as a property test over every key (tests/test_sketches.py)."""
    ev = load_table(spark, sf_dir, "events")
    return K.countmin_topk(ev, "user_id", depth=_CMS_D, width=_CMS_W, k=_CMS_K)


_FH_DIM = 16

@query(
    "text_feature_hashing",
    # hashing-trick featurizer (Weinberger et al.): bucket =
    # hash60(token) % dim, sign = parity of md5 hex digit 16 — both
    # replayed exactly in SQL; weights are pure integer sums
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_DTOKS}) AS t
                 FROM documents WHERE doc_id <= 100)
    SELECT doc_id,
           ({_h60("t")} % {_FH_DIM})::INT AS dim,
           SUM(1 - 2 * (CAST(concat('0x', substr(md5(t), 16, 1)) AS INT)
                        % 2))::BIGINT AS weight
    FROM tok
    GROUP BY 1, 2
    """,
)
def text_feature_hashing(spark, sf_dir):
    """Signed hashing-trick featurizer: each document becomes a
    dim=16 sparse vector — bucket = hash60(token) mod dim, sign = a
    second independent hash bit, weight = signed token count (the
    unbiased-inner-product construction from feature-hashing ML
    pipelines). Output exploded as (doc_id, dim, weight) rows so the
    driver canon sees atomic columns. Plan: token explode into a
    (doc, bucket) partial aggregate — linear, no vocabulary state,
    which is the entire point of the trick at 100 TB: no vocab build,
    no dictionary broadcast, identical vectors on any cluster."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    tok = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("t"))
    sign = 1 - 2 * (
        F.conv(F.substring(F.md5(F.col("t")), 16, 1), 16, 10).cast("int") % 2
    )
    return (
        tok.select(
            "doc_id",
            (K.hash60(F.col("t")) % _FH_DIM).cast("int").alias("dim"),
            sign.alias("sign"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sign").alias("weight"))
    )


# 20% Bernoulli rate as an integer hash threshold: floor(2^60 / 5).
_SAMPLE_T = (1 << 60) // 5

@query(
    "sketch_sample_quantiles",
    # rank-statistic quantiles (element at rank ceil(p*n)), NOT
    # interpolated: the picked value is a raw data double, so there is
    # zero float arithmetic to diverge — interpolating quantile_cont
    # vs Spark percentile split by one ulp at a ROUND boundary when
    # this query was first drafted (click p50: 34.18 vs 34.17)
    oracle=f"""
    WITH s AS (SELECT event_type, value FROM events
               WHERE {_h60("event_id::VARCHAR")} < {_SAMPLE_T}),
    r AS (SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM s)
    SELECT event_type, MAX(n)::BIGINT AS n_sampled,
           MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                    THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                    THEN value END) AS p95,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                    THEN value END) AS p99
    FROM r GROUP BY event_type
    """,
)
def sketch_sample_quantiles(spark, sf_dir):
    """Rank-statistic quantiles over a deterministic ~20% Bernoulli
    sample: a row is sampled iff hash60(event_id) < floor(2^60/5), so
    the SAMPLE ITSELF is cross-engine identical, and each quantile is
    the element at rank ceil(p*n) — a raw data value, no interpolation
    — so the whole pipeline stays under the exact value-hash gate
    (unlike rand()-based sampling or t-digest state). Third rung of
    the quantile ladder after exact-interpolated (stats_quantiles) and
    engine t-digest (approx_percentiles_by): the sample predicate is a
    pushed-down scan filter, so at 100 TB the per-group sort cost
    drops by the sampling rate while p50/p95/p99 error stays
    O(1/sqrt(n_sampled)). Tail quantiles beyond p99.9 need the full
    stream (sampling thins exactly the rows that define them) — that
    is what the t-digest wrapper is for."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(K.hash60(F.col("event_id")) < _SAMPLE_T).select(
        "event_type", "value"
    )
    w = Window.partitionBy("event_type")
    r = s.select(
        "event_type",
        "value",
        F.row_number().over(w.orderBy("value")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )

    def pick(p: float, name: str):
        rank = F.ceil(F.lit(p) * F.col("n").cast("double"))
        return F.max(F.when(F.col("rn") == rank, F.col("value"))).alias(name)

    return r.groupBy("event_type").agg(
        F.max("n").alias("n_sampled"),
        pick(0.50, "p50"),
        pick(0.95, "p95"),
        pick(0.99, "p99"),
    )


_HLL_SINK_SEQ = [0]

@query("stream_hll_distinct", oracle=_HLL_ORACLE)
def stream_hll_distinct(spark, sf_dir):
    """STREAMING twin of sketch_hll_distinct — the reason sketches
    exist in streaming: the register table is an update-mode stateful
    aggregate holding at most m=256 rows of state per group FOREVER
    (registers are MAX-monotone, so no watermark is needed and state
    never grows with the stream), where a naive streaming distinct
    would hold every key ever seen. The drained register state is
    folded to the estimate batch-side with the SAME hll_fold the batch
    query uses, and must land on exactly the batch oracle's rows —
    registers are order-insensitive (MAX), so any file-to-micro-batch
    split converges to the identical sketch. Update mode re-emits a
    (group, idx) row whenever its register rises; max(reg) per key
    over the sink recovers the final state (register values are
    strictly increasing per re-emit)."""
    from ..operators.sketches import hll_fold, hll_registers
    from ..streaming.events import read_events_stream, run_to_memory

    _HLL_SINK_SEQ[0] += 1
    name = f"stream_hll_sink_{_HLL_SINK_SEQ[0]}"
    regs = hll_registers(
        read_events_stream(spark, sf_dir), "event_type", "event_id"
    )
    run_to_memory(regs, name, output_mode="update", state_partitions=8)
    final_regs = (
        spark.table(name)
        .groupBy("event_type", "idx")
        .agg(F.max("reg").alias("reg"))
    )
    return hll_fold(final_regs, "event_type")


@query("sketch_hll_merge_days", oracle=_HLL_ORACLE)
def sketch_hll_merge_days(spark, sf_dir):
    """Incremental-rollup form of the HLL sketch: registers are built
    PER (event_type, day) — the shape a daily pipeline materializes —
    then MAX-merged across days and folded, and the result must equal
    the direct whole-stream sketch exactly (register merge is lossless
    by construction), so the same batch oracle gates it. This is the
    sketch property that matters operationally at 100 TB: yesterday's
    register table + today's = month-to-date distinct estimate without
    rescanning a byte of history. Extra cost vs the direct form is one
    more partial-aggregate level over (group, day, idx) rows — still
    register-bounded per day per task."""
    from ..operators.sketches import hll_fold, hll_rho

    ev = load_table(spark, sf_dir, "events")
    idx, rho = hll_rho(F.col("event_id"))
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            idx.alias("idx"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "day", "idx")
        .agg(F.max("rho").alias("reg"))
    )
    merged = daily.groupBy("event_type", "idx").agg(F.max("reg").alias("reg"))
    return hll_fold(merged, "event_type")


@query(
    "sketch_theta_intersection",
    # DataSketches-style theta intersection replayed in SQL: per-type
    # KMV sketches, theta = min of the pair's k-th minima (2^60 for
    # sub-k complete sketches), estimate = overlap below theta scaled
    # by 2^60/theta
    oracle=f"""
    WITH d AS (SELECT DISTINCT event_type AS g,
                      {_h60("user_id::VARCHAR")} AS h FROM events),
    r AS (SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM d),
    km AS (SELECT g, h FROM r WHERE rn <= {_KMV_K}),
    st AS (SELECT g, COUNT(*)::BIGINT AS k_eff, MAX(h) AS kth
           FROM km GROUP BY g),
    tg AS (SELECT g, CASE WHEN k_eff < {_KMV_K} THEN 1152921504606846976
                          ELSE kth END AS theta_g FROM st),
    p AS (SELECT a.g AS group_a, b.g AS group_b, a.h,
                 least(ta.theta_g, tb.theta_g) AS theta
          FROM km a JOIN km b ON a.h = b.h AND a.g < b.g
          JOIN tg ta ON ta.g = a.g
          JOIN tg tb ON tb.g = b.g)
    SELECT group_a, group_b, MAX(theta) AS theta,
           COUNT(*)::BIGINT AS n_common,
           FLOOR((COUNT(*)::DOUBLE * 1152921504606846976.0
                  / MAX(theta)::DOUBLE) * 1e4) / 1e4 AS est_common
    FROM p WHERE h < theta
    GROUP BY 1, 2
    """,
)
def sketch_theta_intersection(spark, sf_dir):
    """Distinct-user overlap between every pair of event types,
    estimated from the per-type KMV sketches ALONE (theta-sketch set
    intersection). The raw data is touched once to build k-row-per-type
    sketches (the same WindowGroupLimit reduction as
    sketch_kmv_distinct); every pairwise — or by extension arbitrary
    set-expression — cardinality question is then arithmetic over
    k*|types| rows. At 100 TB this replaces a distinct self-join per
    pair of segments with sketch reuse; sub-k pairs degrade to exact
    overlap (theta = 2^60 makes the scale factor exactly 1.0)."""
    ev = load_table(spark, sf_dir, "events")
    return K.theta_intersection_by(ev, "event_type", "user_id", k=_KMV_K)


@query(
    "sketch_theta_union",
    oracle=f"""
    WITH d AS (SELECT DISTINCT event_type AS g,
                      {_h60("user_id::VARCHAR")} AS h FROM events),
    r AS (SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM d),
    km AS (SELECT g, h FROM r WHERE rn <= {_KMV_K}),
    st AS (SELECT g, COUNT(*)::BIGINT AS k_eff, MAX(h) AS kth
           FROM km GROUP BY g),
    tg AS (SELECT g, CASE WHEN k_eff < {_KMV_K} THEN 1152921504606846976
                          ELSE kth END AS theta_g FROM st),
    p AS (SELECT a.g AS ga, b.g AS gb,
                 least(ta.theta_g, tb.theta_g) AS theta
          FROM st a JOIN st b ON a.g < b.g
          JOIN tg ta ON ta.g = a.g
          JOIN tg tb ON tb.g = b.g),
    tag AS (SELECT p.ga, p.gb, p.theta, k.h
            FROM p JOIN km k ON k.g = p.ga OR k.g = p.gb),
    ph AS (SELECT ga, gb, theta, h, COUNT(*)::BIGINT AS sides
           FROM tag GROUP BY 1, 2, 3, 4),
    ur AS (SELECT ga, gb, h,
                  ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
           FROM ph),
    uni AS (SELECT ga, gb, COUNT(*)::BIGINT AS k_eff_union,
                   MAX(h) AS kth_union
            FROM ur WHERE rn <= {_KMV_K} GROUP BY 1, 2),
    ret AS (SELECT ga, gb,
                   SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END)::BIGINT
                     AS n_common,
                   COUNT(*)::BIGINT AS n_union_ret
            FROM ph WHERE h < theta GROUP BY 1, 2)
    SELECT ga AS group_a, gb AS group_b, k_eff_union,
           CASE WHEN k_eff_union < {_KMV_K} THEN k_eff_union::DOUBLE
                ELSE FLOOR(({_KMV_K - 1}.0 * 1152921504606846976.0
                            / kth_union::DOUBLE) * 1e4) / 1e4
           END AS est_union,
           n_common, n_union_ret,
           FLOOR((n_common::DOUBLE / n_union_ret::DOUBLE) * 1e4) / 1e4
             AS est_jaccard
    FROM uni JOIN ret USING (ga, gb)
    """,
)
def sketch_theta_union(spark, sf_dir):
    """Distinct-user UNION size and Jaccard similarity for every pair
    of event types, from the per-type KMV sketches alone — the other
    half of the theta set algebra (see sketch_theta_intersection).
    The union sketch is the k smallest of the merged k-min sets (KMV
    merge is exact), and Jaccard is the retained-region ratio below
    the pair theta. One raw scan builds the sketches; the pair algebra
    runs over k*|types| rows. Segment-overlap dashboards at 100 TB are
    exactly this shape: sketch once, answer every A-vs-B audience
    question from the sketch table."""
    ev = load_table(spark, sf_dir, "events")
    return K.theta_union_by(ev, "event_type", "user_id", k=_KMV_K)
