"""Mergeable-sketch aggregates: the 100 TB substitutes for exact
distinct counts and percentiles.

Exact `count_distinct` shuffles every distinct value; exact
`percentile` sorts each group. Both stop being reasonable when a group
holds billions of rows. The sketch forms (HyperLogLog++ for distinct,
t-digest for quantiles) are *mergeable*: partial sketches combine
map-side like any other partial aggregate, so the shuffle carries a
few KB per group regardless of group size — and the same property is
what makes them usable as incremental rollups (yesterday's sketch +
today's sketch = month-to-date) and in streaming state.

These wrappers pin the engine's accuracy contract (rsd / error knobs)
in one place; tests/test_sketches.py verifies the contract against the
exact computations at test scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ~2.3% default relative standard deviation for HLL++; tests assert a
# conservative 3x bound.
DISTINCT_RSD = 0.023
# t-digest accuracy knob: higher = tighter quantiles, bigger sketch.
PERCENTILE_ACCURACY = 10_000

# 2^60: the hash60 value range; 2^53: the HLL register scale unit.
_H60_RANGE = 1 << 60
_REG_UNIT = 1 << 53


def hash60(col: Column, salt: str = "", source: str = "md5") -> Column:
    """Deterministic 60-bit uniform hash as a non-negative BIGINT.

    ``source`` picks the schedule (same split as SimHash's
    ``bit_source``, `dedup.py:simhash_bits`):

    - ``md5`` (registry/oracle default): first 15 hex digits of
      md5(value-as-string[#salt]) — the derivation an external SQL
      engine replays with ``CAST(concat('0x', substr(md5(x), 1, 15))
      AS BIGINT)``, which is what makes every sketch built on it
      differentially testable (unlike xxhash64/HLL++ register state,
      which is engine-private).
    - ``xxhash64`` (production): JVM-native seeded hash masked to 60
      bits — no string-cast/hex round-trip; measured ~1.3x cheaper at
      the leaf (10M bigints on local[32]: 54 ms vs 69 ms) and hashes
      any input type directly instead of via cast-to-string. The
      sketch plans are identical, only this leaf expression changes.
      Accuracy invariance under the swap is pinned in
      tests/test_sketches.py.

    60 bits keep the value strictly positive in an int64 and leave
    headroom for register/bucket arithmetic.
    """
    if source == "xxhash64":
        seed = 0 if not salt else (sum(salt.encode()) + len(salt) * 131)
        return F.xxhash64(col, F.lit(seed)).bitwiseAND(F.lit(_H60_RANGE - 1))
    if source != "md5":
        raise ValueError(f"unknown hash60 source {source!r}")
    s = col.cast("string")
    if salt:
        s = F.concat(s, F.lit("#" + salt))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def approx_distinct_by(
    df: DataFrame, group_col: str, value_col: str, rsd: float = DISTINCT_RSD
) -> DataFrame:
    """(group, n_distinct_approx): HLL++ distinct count per group."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("n_distinct_approx")
    )


def approx_percentiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = PERCENTILE_ACCURACY,
) -> DataFrame:
    """(group, p_<q>...): t-digest percentile profile per group."""
    return df.groupBy(group_col).agg(
        *[
            F.percentile_approx(value_col, F.lit(p), F.lit(accuracy)).alias(
                f"p_{str(p).replace('0.', '')}"
            )
            for p in probs
        ]
    )


# ---------------------------------------------------------------------------
# Deterministic (oracle-replayable) sketches
#
# The wrappers above are the production knobs — engine-native HLL++ and
# t-digest, whose internal state no external engine reproduces. The
# three sketches below are the differential-testing twins: built
# entirely from hash60 + integer algebra, so DuckDB replays every
# register/bucket bit-for-bit and the driver's value-hash gate applies
# to an *approximate* data structure. Same mergeable shape as the real
# thing (partial-aggregable registers / bucket counts), so the 100 TB
# plan is identical — only the hash function differs.
# ---------------------------------------------------------------------------


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    hash_source: str = "md5",
) -> DataFrame:
    """K-minimum-values distinct estimate per group.

    (group, k_eff, kth_hash, est_distinct): keep the k smallest
    hash60 values per group; with the k-th smallest at fraction
    hk/2^60 of the hash space, distinct ~= (k-1) * 2^60 / hk. Groups
    holding fewer than k distinct hashes are exact (k_eff).

    Plan shape: distinct (group, hash) — map-side partial dedup, one
    shuffle on the pair — then the rank filter, which Spark rewrites
    to WindowGroupLimit: each map task forwards only its local k
    smallest per group, so the second shuffle carries <= k rows per
    group per task regardless of group size. The estimate is one IEEE
    multiply + divide on exact operands, floor-gridded to 4 dp.
    """
    d = df.select(
        F.col(group_col),
        hash60(F.col(value_col), source=hash_source).alias("h"),
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = topk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("k_eff"), F.max("h").alias("kth_hash")
    )
    raw = (
        F.lit(float(k - 1))
        * F.lit(float(_H60_RANGE))
        / F.col("kth_hash").cast("double")
    )
    est = F.when(F.col("k_eff") < k, F.col("k_eff").cast("double")).otherwise(
        F.floor(raw * 1e4) / 1e4
    )
    return agg.select(
        group_col, "k_eff", "kth_hash", est.alias("est_distinct")
    )


# HLL bias constant for m = 256 registers (Flajolet et al. alpha_m),
# pre-multiplied by m^2 * 2^53 so the estimate is a single division by
# the integer-exact scaled register sum. Kept as a Python float so the
# identical literal lands in both the Spark plan and the oracle SQL.
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_NUMERATOR = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(_REG_UNIT)


def hll_distinct_by(
    df: DataFrame, group_col: str, value_col: str, hash_source: str = "md5"
) -> DataFrame:
    """Deterministic HyperLogLog distinct estimate per group (m=256).

    (group, m_present, m_zero, s_scaled, est_distinct): register index
    = low 8 bits of hash60, rho = leading-zero count of the remaining
    52-bit field + 1 (computed integer-exactly as 53 - len(bin(rest)));
    registers are MAX(rho). The indicator sum sum(2^-reg) is kept
    integer-exact by scaling each term to 2^(53-reg) (max total
    256 * 2^53 = 2^61, inside int64), so cross-engine float summation
    order can never flip a bit; the estimate alpha*m^2/sum is then one
    IEEE division, floor-gridded.

    Unlike KMV this needs NO distinct pre-pass: MAX absorbs duplicate
    values, so the input streams straight into a (group, idx) partial
    aggregate — the shuffle carries at most m rows per group per map
    task. This is the textbook 100 TB approx-distinct shape; the
    engine-native twin is approx_distinct_by (HLL++, bias-corrected,
    not externally replayable).
    """
    regs = hll_registers(df, group_col, value_col, hash_source)
    return hll_fold(regs, group_col)


def hll_rho(value: Column, hash_source: str = "md5") -> tuple[Column, Column]:
    """(register index, rho) of a value under the hash60 schedule.

    Index = low HLL_P bits; rho = leading-zero count of the remaining
    52-bit field + 1, computed integer-exactly as 53 - len(bin(rest))
    (len(bin(x)) = floor(log2(x))+1 exactly — no float log2 boundary
    risk); all-zero field -> 53.
    """
    h = hash60(value, source=hash_source)
    rest = F.shiftright(h, HLL_P)
    rho = F.when(rest == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(rest))
    )
    return (h % HLL_M), rho


def hll_registers(
    df: DataFrame, group_col: str, value_col: str, hash_source: str = "md5"
) -> DataFrame:
    """(group, idx, reg): the HLL register table — MAX(rho) per
    (group, register index). MAX is what makes the sketch both
    mergeable (shard registers combine by MAX) and streaming-safe
    (registers are monotone under new data, so an update-mode stateful
    aggregate holds exactly m rows of state per group)."""
    idx, rho = hll_rho(F.col(value_col), hash_source)
    return (
        df.select(F.col(group_col), idx.alias("idx"), rho.alias("rho"))
        .groupBy(group_col, "idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_fold(regs: DataFrame, group_col: str) -> DataFrame:
    """Fold a register table (group, idx, reg) into the estimate row
    (group, m_present, m_zero, s_scaled, est_distinct). The 2^-reg sum
    is integer-scaled to 2^(53-reg) so it is exact in int64; the
    estimate is one IEEE division, floor-gridded."""
    byg = regs.groupBy(group_col).agg(
        # shiftleft needs a literal shift amount in the Column API —
        # the SQL form takes a column expression (1L keeps it int64)
        F.sum(F.expr("shiftleft(1L, 53 - reg)")).alias("s_present"),
        F.count(F.lit(1)).alias("m_present"),
    )
    s_scaled = F.col("s_present") + (F.lit(HLL_M) - F.col("m_present")) * F.lit(
        _REG_UNIT
    )
    est = F.floor(F.lit(HLL_NUMERATOR) / s_scaled.cast("double") * 1e4) / 1e4
    return byg.select(
        group_col,
        F.col("m_present").cast("bigint").alias("m_present"),
        (F.lit(HLL_M) - F.col("m_present")).cast("bigint").alias("m_zero"),
        s_scaled.cast("bigint").alias("s_scaled"),
        est.alias("est_distinct"),
    )


def theta_intersection_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    hash_source: str = "md5",
) -> DataFrame:
    """Theta-sketch set intersection: estimated distinct-value overlap
    for every pair of groups, from per-group KMV sketches alone.

    (group_a, group_b, theta, n_common, est_common): per group keep
    the k smallest hash60 values (the KMV sketch); for a pair, theta =
    min of the two k-th minima (or 2^60 when a group holds fewer than
    k values — its sketch IS the full set); the intersection estimate
    is |{h in A-sketch ∩ B-sketch : h < theta}| * 2^60 / theta. When
    both sketches are complete the estimate degrades to the exact
    overlap. This is the DataSketches-style set-expression answer: at
    100 TB the per-group sketches are built once (WindowGroupLimit,
    k rows per group out), and EVERY pairwise overlap question after
    that is arithmetic on tables of k*|groups| rows — no rescan, no
    distinct-pair join against the raw data.
    """
    d = df.select(
        F.col(group_col).alias("g"),
        hash60(F.col(value_col), source=hash_source).alias("h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    kmin = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    stats = kmin.groupBy("g").agg(
        F.count(F.lit(1)).alias("k_eff"), F.max("h").alias("kth")
    )
    # theta per group: the k-th minimum bounds the retained region; a
    # sub-k group retains everything -> theta = 2^60
    theta_g = stats.select(
        "g",
        F.when(F.col("k_eff") < k, F.lit(_H60_RANGE))
        .otherwise(F.col("kth"))
        .alias("theta_g"),
    )
    a = kmin.select(F.col("g").alias("ga"), F.col("h").alias("h"))
    b = kmin.select(F.col("g").alias("gb"), F.col("h").alias("h"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("ga") < F.col("gb"))
        .join(F.broadcast(theta_g.selectExpr("g as ga", "theta_g as ta")), "ga")
        .join(F.broadcast(theta_g.selectExpr("g as gb", "theta_g as tb")), "gb")
        .withColumn("theta", F.least("ta", "tb"))
        .filter(F.col("h") < F.col("theta"))
        .groupBy(F.col("ga").alias("group_a"), F.col("gb").alias("group_b"))
        .agg(
            F.max("theta").alias("theta"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    est = (
        F.col("n_common").cast("double")
        * F.lit(float(_H60_RANGE))
        / F.col("theta").cast("double")
    )
    return pairs.select(
        "group_a",
        "group_b",
        "theta",
        "n_common",
        (F.floor(est * 1e4) / 1e4).alias("est_common"),
    )


def theta_union_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    hash_source: str = "md5",
) -> DataFrame:
    """Theta-sketch union + Jaccard for every pair of groups, from the
    per-group KMV sketches alone.

    (group_a, group_b, k_eff_union, est_union, n_common, n_union_ret,
    est_jaccard): the union sketch of a pair is the k smallest of the
    merged k-min sets (KMV merge is exact — see the mergeability
    property test), estimated like any KMV sketch; the Jaccard
    estimate is the retained-region ratio |common < theta| /
    |union < theta| with theta = min of the pair's thetas. Together
    with theta_intersection_by this closes the set algebra: distinct
    counts of A, B, A∩B, A∪B, and their Jaccard, all from one scan's
    worth of k-row-per-group sketches.
    """
    d = df.select(
        F.col(group_col).alias("g"),
        hash60(F.col(value_col), source=hash_source).alias("h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    kmin = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    stats = kmin.groupBy("g").agg(
        F.count(F.lit(1)).alias("k_eff"), F.max("h").alias("kth")
    )
    theta_g = stats.select(
        "g",
        F.when(F.col("k_eff") < k, F.lit(_H60_RANGE))
        .otherwise(F.col("kth"))
        .alias("theta_g"),
    )
    glist = stats.select("g")
    pairs = (
        glist.selectExpr("g as ga")
        .join(F.broadcast(glist.selectExpr("g as gb")), F.expr("ga < gb"))
        .join(F.broadcast(theta_g.selectExpr("g as ga", "theta_g as ta")), "ga")
        .join(F.broadcast(theta_g.selectExpr("g as gb", "theta_g as tb")), "gb")
        .withColumn("theta", F.least("ta", "tb"))
        .select("ga", "gb", "theta")
    )
    # tag each sketch row onto every pair its group belongs to (sketch
    # tables are k*|groups| rows — all of this is tiny-side work)
    tagged = pairs.join(
        kmin.selectExpr("g", "h"),
        (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb")),
    ).select("ga", "gb", "theta", "h", "g")
    per_h = tagged.groupBy("ga", "gb", "theta", "h").agg(
        F.count(F.lit(1)).alias("sides")
    )
    # union sketch: k smallest of the merged k-mins
    wu = Window.partitionBy("ga", "gb").orderBy("h")
    ukmin = per_h.withColumn("rn", F.row_number().over(wu)).filter(
        F.col("rn") <= k
    )
    uni = ukmin.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("k_eff_union"), F.max("h").alias("kth_union")
    )
    raw_u = (
        F.lit(float(k - 1))
        * F.lit(float(_H60_RANGE))
        / F.col("kth_union").cast("double")
    )
    est_u = F.when(
        F.col("k_eff_union") < k, F.col("k_eff_union").cast("double")
    ).otherwise(F.floor(raw_u * 1e4) / 1e4)
    # jaccard from the retained region below theta
    ret = per_h.filter(F.col("h") < F.col("theta")).groupBy("ga", "gb").agg(
        F.sum(F.when(F.col("sides") == 2, 1).otherwise(0)).alias("n_common"),
        F.count(F.lit(1)).alias("n_union_ret"),
    )
    jac = F.floor(
        F.col("n_common").cast("double")
        / F.col("n_union_ret").cast("double")
        * 1e4
    ) / 1e4
    return (
        uni.join(ret, ["ga", "gb"])
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "k_eff_union",
            est_u.alias("est_union"),
            F.col("n_common").cast("bigint").alias("n_common"),
            "n_union_ret",
            jac.alias("est_jaccard"),
        )
    )


def countmin_topk(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    k: int = 10,
    hash_source: str = "md5",
) -> DataFrame:
    """Count-min-sketch heavy hitters: top-k keys by estimated count.

    (key, est_count): build a depth x width counter table (one hash
    aggregation over the raw stream — the sketch is depth*width rows
    TOTAL, independent of data size), collect it (model-sized, the
    bloom-bitmap pattern), and probe every distinct key map-side via
    array-literal lookups: est = least over the depth rows. CMS
    guarantees est >= true count (pinned by a property test); top-k is
    (est DESC, key ASC) — TakeOrderedAndProject, never a full sort.

    At 100 TB the sketch build is a map-side partial aggregate into
    depth*width cells, the probe plan has NO join node, and the
    candidate set is whatever key sample you care to probe — here every
    distinct key, the exhaustive audit form.
    """
    rows = [
        F.struct(
            F.lit(j).alias("j"),
            (hash60(F.col(key_col), str(j), hash_source) % width).alias("bucket"),
        )
        for j in range(depth)
    ]
    sketch = (
        df.select(F.explode(F.array(*rows)).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # The counter table IS the model — depth*width cells regardless of
    # data size — so ship it like the bloom bitmap: one model-sized
    # collect, then probe as array-literal lookups. Pure map-side (no
    # join in the plan at all); a broadcast-join probe would recompute
    # the unpersisted sketch subtree once per depth row.
    cells = {(r["j"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    tables = [
        F.array(*[F.lit(cells.get((j, b), 0)) for b in range(width)])
        for j in range(depth)
    ]
    est = F.least(
        *[
            F.get(
                tables[j],
                (hash60(F.col(key_col), str(j), hash_source) % width).cast("int"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(key_col)
        .distinct()
        .select(F.col(key_col), est.alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col(key_col))
        .limit(k)
    )
