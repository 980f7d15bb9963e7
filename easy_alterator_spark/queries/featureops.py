"""Round-8 feature/analytics extensions: higher-moment statistics,
rank correlation, recursive smoothing, multi-touch attribution,
co-occurrence recommendation, triangle counting, training-feature
tables, seasonal-naive backtesting, and corpus vocabulary-richness.

Every query keeps the repo's cross-engine discipline: integer (or
DECIMAL/HUGEINT) exactness through every aggregation, floats only in
FIXED expression trees of correctly-rounded IEEE ops, libm/sqrt-
bearing outputs floor-gridded at 1e-4 with a +1e-6 boundary nudge at
the x1e4 scale: the nudge is orders of magnitude above 1-ulp noise
but far below the grid step, so a TRUE value sitting exactly on a
grid point (rho = 1, kurtosis of a symmetric sample) can no longer
truncate down a whole step from half-ulp-below rounding, while
genuinely sub-grid differences still truncate identically on both
engines. No UDFs, no driver loops, no collect().
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import query

# exact integer cents — one shared IEEE multiply, exact +0.5, floor —
# the repo-wide pattern for float `value` (see events_value_ranks)
_CENTS = 'FLOOR("value" * 100 + 0.5)::BIGINT'


def _cents(col: str = "value") -> F.Column:
    return F.floor(F.col(col) * 100 + 0.5).cast("bigint")


# ---------------------------------------------------------------------------
# stats_skew_kurtosis — exact raw-moment folds in DECIMAL(38,0)/HUGEINT
# ---------------------------------------------------------------------------

@query(
    "stats_skew_kurtosis",
    # raw moments S1..S4 of exact integer cents, folded in HUGEINT;
    # A = n*S2 - S1^2 = n^2*m2, B = n^2*S3 - 3n*S1*S2 + 2*S1^3 = n^3*m3,
    # C = n^3*S4 - 4n^2*S1*S3 + 6n*S1^2*S2 - 3*S1^4 = n^4*m4 are exact
    # integers (shift-invariant central-moment multiples); skewness
    # g1 = B / (A*sqrt(A)) and excess kurtosis g2 = C/A^2 - 3 are fixed
    # IEEE trees (correctly-rounded conversions, sqrt, mul, div)
    oracle=f"""
    WITH c AS (SELECT event_type, {_CENTS} AS c FROM events),
    s AS (SELECT event_type, COUNT(*)::HUGEINT AS n,
                 SUM(c::HUGEINT) AS s1,
                 SUM((c * c)::HUGEINT) AS s2,
                 SUM((c * c * c)::HUGEINT) AS s3,
                 SUM((c * c)::HUGEINT * (c * c)::HUGEINT) AS s4
          FROM c GROUP BY event_type),
    m AS (SELECT event_type, n,
                 n * s2 - s1 * s1 AS a,
                 n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS b,
                 n * n * n * s4 - 4 * n * n * s1 * s3
                   + 6 * n * s1 * s1 * s2 - 3 * (s1 * s1) * (s1 * s1) AS d
          FROM s)
    SELECT event_type, n::BIGINT AS n,
           FLOOR(b::DOUBLE / (a::DOUBLE * sqrt(a::DOUBLE)) * 1e4 + 1e-6) / 1e4
               AS skewness,
           FLOOR((d::DOUBLE / (a::DOUBLE * a::DOUBLE) - 3) * 1e4 + 1e-6) / 1e4
               AS ex_kurtosis
    FROM m WHERE a > 0
    """,
)
def stats_skew_kurtosis(spark, sf_dir):
    """Skewness and excess kurtosis of the value distribution per
    event type — the moment statistics that catch heavy tails and
    asymmetry that mean/variance screens (stats_welch_ttest) miss.
    Exactness: values snap to integer cents; the four raw-moment sums
    fold in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both exact at
    these magnitudes (cents <= 1e5, so S4 <= n*1e20 and the largest
    combined term 6n*S1^2*S2 stays under 1e37 for per-group n up to
    ~2e5); A, B, C are exact integer multiples of the central moments
    and the statistics are fixed IEEE trees over their (correctly
    rounded) double conversions, floor-gridded at 1e-4. Shape: ONE
    map-side-partial hash aggregate, one row per event type — the
    cheapest distributed shape. At 100 TB the same fold applies; for
    per-group n beyond ~1e6 shift each group by its integer mean
    first (A/B/C are shift-invariant) to keep the fold inside
    DECIMAL(38)."""
    ev = load_table(spark, sf_dir, "events")
    c = _cents().alias("c")
    d38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    c2 = (F.col("c") * F.col("c")).alias("c2")
    base = ev.select("event_type", c).select("event_type", "c", c2)
    s = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38(F.col("c"))).alias("s1"),
        F.sum(d38(F.col("c2"))).alias("s2"),
        F.sum(d38(F.col("c2") * F.col("c"))).alias("s3"),
        F.sum(d38(F.col("c2")) * d38(F.col("c2"))).alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(x) for x in ("n", "s1", "s2", "s3", "s4"))
    a = n * s2 - s1 * s1
    b = n * n * s3 - F.lit(3) * n * s1 * s2 + F.lit(2) * s1 * s1 * s1
    dd = (
        n * n * n * s4
        - F.lit(4) * n * n * s1 * s3
        + F.lit(6) * n * s1 * s1 * s2
        - F.lit(3) * (s1 * s1) * (s1 * s1)
    )
    m = s.select(
        "event_type",
        n.cast("bigint").alias("n"),
        a.cast("double").alias("ad"),
        b.cast("double").alias("bd"),
        dd.cast("double").alias("dd"),
    ).filter(F.col("ad") > 0)
    return m.select(
        "event_type",
        "n",
        (
            F.floor(F.col("bd") / (F.col("ad") * F.sqrt("ad")) * 1e4 + 1e-6)
            / 1e4
        ).alias("skewness"),
        (
            F.floor((F.col("dd") / (F.col("ad") * F.col("ad")) - 3) * 1e4 + 1e-6)
            / 1e4
        ).alias("ex_kurtosis"),
    )


# ---------------------------------------------------------------------------
# stats_spearman — rank correlation with integer average ranks
# ---------------------------------------------------------------------------

@query(
    "stats_spearman",
    # Spearman rho between value-cents and epoch-seconds using DOUBLED
    # average ranks (the stats_mannwhitney trick: a tie group of size
    # t after cum-c smaller values has doubled rank 2*cum - c + 1, an
    # exact int64); the five rank sums stay int64 and the final
    # combination runs in HUGEINT before ONE fixed IEEE tree
    oracle=f"""
    WITH r AS (SELECT {_CENTS} AS v,
                      CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
               WHERE "value" IS NOT NULL),
    vx AS (SELECT v, COUNT(*)::BIGINT AS c FROM r GROUP BY v),
    vxr AS (SELECT v, (2 * SUM(c) OVER (ORDER BY v) - c + 1)::BIGINT AS rx
            FROM vx),
    vy AS (SELECT s, COUNT(*)::BIGINT AS c FROM r GROUP BY s),
    vyr AS (SELECT s, (2 * SUM(c) OVER (ORDER BY s) - c + 1)::BIGINT AS ry
            FROM vy),
    j AS (SELECT vxr.rx, vyr.ry FROM r
          JOIN vxr ON r.v = vxr.v JOIN vyr ON r.s = vyr.s),
    agg AS (SELECT COUNT(*)::HUGEINT AS n, SUM(rx)::HUGEINT AS sx,
                   SUM(ry)::HUGEINT AS sy, SUM(rx * rx)::HUGEINT AS sxx,
                   SUM(ry * ry)::HUGEINT AS syy,
                   SUM(rx * ry)::HUGEINT AS sxy
            FROM j)
    SELECT n::BIGINT AS n,
           FLOOR((n * sxy - sx * sy)::DOUBLE
                 / (sqrt((n * sxx - sx * sx)::DOUBLE)
                    * sqrt((n * syy - sy * sy)::DOUBLE)) * 1e4 + 1e-6)
               / 1e4
               AS spearman_rho
    FROM agg
    """,
)
def stats_spearman(spark, sf_dir):
    """Spearman rank correlation between event value and time — the
    monotone-trend screen that Pearson (stats_corr_matrix) misses on
    nonlinear drifts. Ranks are DOUBLED average ranks so tie groups
    stay exactly integral (the stats_mannwhitney device): for a value
    with c occurrences below cumulative count cum, rx = 2*cum - c + 1.
    Both rank tables are cumsums over DISTINCT values; rows join back
    on the value. The cumsums run through operators/rank.
    global_prefix_sum — the terasort decomposition (range-partition on
    the distinct value, local running sum, broadcast per-partition
    offsets) — so even a data-sized distinct-key universe (epoch
    seconds at 100 TB) never funnels through one reducer; the keys are
    distinct per row, so range boundaries cannot split ties and the
    result is bit-identical to SQL SUM() OVER (ORDER BY). The five
    sums stay int64 (rx <= 2n, so
    sum(rx*ry) <= 4n^3 — exact to n ~ 1e6); the final combination is
    exact in DECIMAL(38,0)/HUGEINT, then rho is one fixed IEEE tree,
    floor-gridded. NULL values are filtered on BOTH engines before the
    ordered cumsums (the operators/nonparam.py device): Spark ASC
    windows order NULLs first, DuckDB last, so an unfiltered NULL
    would shift every non-null rank on exactly one engine."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.filter(F.col("value").isNotNull()).select(
        _cents().alias("v"), F.unix_timestamp("ts").cast("bigint").alias("s")
    )

    from ..operators.rank import global_prefix_sum

    def rank2(df, col, out):
        cnt = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        ps = global_prefix_sum(cnt, [col], "c", "__ps")
        return ps.select(
            col,
            (2 * F.col("__ps") - F.col("c") + 1).cast("bigint").alias(out),
        )

    j = r.join(rank2(r, "v", "rx"), "v").join(rank2(r, "s", "ry"), "s")
    d38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    agg = j.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        d38(F.sum("rx")).alias("sx"),
        d38(F.sum("ry")).alias("sy"),
        d38(F.sum(F.col("rx") * F.col("rx"))).alias("sxx"),
        d38(F.sum(F.col("ry") * F.col("ry"))).alias("syy"),
        d38(F.sum(F.col("rx") * F.col("ry"))).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    dx = (n * F.col("sxx") - sx * sx).cast("double")
    dy = (n * F.col("syy") - sy * sy).cast("double")
    return agg.select(
        n.cast("bigint").alias("n"),
        (
            F.floor(num / (F.sqrt(dx) * F.sqrt(dy)) * 1e4 + 1e-6) / 1e4
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# events_ewma_smooth — recursive smoothing as an identical-order fold
# ---------------------------------------------------------------------------

# Shared by events_ewma_smooth and its streaming twin
# stream_ewma_smooth — both must land on the identical rows.
_EWMA_ORACLE = f"""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      SUM({_CENTS})::BIGINT AS spend
               FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, COUNT(*)::BIGINT AS n_days,
                 list(spend::DOUBLE ORDER BY day) AS xs
          FROM d GROUP BY user_id)
    SELECT user_id, n_days,
           FLOOR(list_reduce(xs, (acc, x) -> 0.5 * acc + 0.5 * x) * 1e4)
               / 1e4 AS ewma_spend
    FROM s
    """

_EWMA_SINK_SEQ = [0]


def _ewma_finish(d):
    """(user_id, day, spend) -> the EWMA output — shared by the batch
    query and the streaming twin so both evaluate the identical fold
    expression tree."""
    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.array_sort(
            F.collect_list(
                F.struct("day", F.col("spend").cast("double").alias("x"))
            )
        ).alias("sx"),
    )
    xs = F.transform(F.col("sx"), lambda e: e.getField("x"))
    ewma = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(0.5) * acc + F.lit(0.5) * x,
    )
    return s.select(
        "user_id",
        "n_days",
        (F.floor(ewma * 1e4) / 1e4).alias("ewma_spend"),
    )


@query(
    "events_ewma_smooth",
    # EWMA (alpha = 1/2) over each user's ordered daily-spend series.
    # The recurrence ewma_t = 0.5*ewma_{t-1} + 0.5*x_t is evaluated as
    # a LEFT FOLD over the day-ordered list on BOTH engines (Spark
    # aggregate() over the tail seeded with the head; DuckDB
    # list_reduce, which seeds with the head by definition) — the two
    # engines execute the IDENTICAL sequence of IEEE ops, so the
    # result is bit-identical before the defensive floor-grid
    oracle=_EWMA_ORACLE,
)
def events_ewma_smooth(spark, sf_dir):
    """Exponentially weighted moving average of daily spend per user
    (alpha = 1/2) — the classic recursive smoother behind burn-rate
    and engagement-trend features, and deliberately a RECURSIVE
    stateful computation: it cannot be a window SUM, so it exercises
    the ordered-fold pattern. Both engines fold the day-ordered list
    left-to-right seeded with the first element, executing the same
    multiply/add sequence (each correctly rounded), so results agree
    bit-for-bit; the 1e-4 floor-grid is defensive only. Scale shape:
    per-user day series are bounded (calendar-bounded — 30 days here,
    ~3650 for a decade), so collect_list stays KB-sized per key and
    the whole query is one (user, day) aggregate + one user aggregate
    — no window over raw events, no cross-row float ambiguity. The
    100 TB form is identical; the fold is applyInPandasWithState in
    streaming (see stream_user_entropy for the bounded-state twin
    pattern)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_cents()).alias("spend"))
    return _ewma_finish(d)


@query(
    "stream_ewma_smooth",
    # STREAMING twin of events_ewma_smooth, same batch oracle: the
    # per-(user, day) spend is an update-mode stateful SUM with
    # BOUNDED state (calendar-bounded rows per user) whose re-emits
    # are monotone (cents are non-negative), so max(sum) over the
    # sink recovers final state — the stream_user_entropy recovery
    # contract — and the recovered daily table goes through the SAME
    # _ewma_finish fold as the batch query
    oracle=_EWMA_ORACLE,
)
def stream_ewma_smooth(spark, sf_dir):
    """Streaming EWMA — the bounded-state streaming twin of
    events_ewma_smooth: the running (user, day) spend is an
    update-mode stateful aggregate whose state is calendar-bounded
    (<= observed days per user, ~30 here; a production deployment
    watermarks days closed and evicts), re-emitted rows are
    SUM-monotone over non-negative cents so max(spend) over the
    memory sink recovers the final per-day totals, and the recovered
    table folds through the IDENTICAL _ewma_finish expression tree as
    the batch query. The batch oracle gates both — any divergence
    between micro-batched and whole-table daily accumulation fails
    the value-hash."""
    from ..streaming.events import read_events_stream, run_to_memory

    _EWMA_SINK_SEQ[0] += 1
    name = f"stream_ewma_smooth_sink_{_EWMA_SINK_SEQ[0]}"
    daily = (
        read_events_stream(spark, sf_dir)
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(_cents()).alias("spend"))
    )
    run_to_memory(daily, name, output_mode="update", state_partitions=8)
    d = (
        spark.table(name)
        .groupBy("user_id", "day")
        .agg(F.max("spend").alias("spend"))
    )
    return _ewma_finish(d)


# ---------------------------------------------------------------------------
# events_attribution_positional — integer per-mille multi-touch credit
# ---------------------------------------------------------------------------

@query(
    "events_attribution_positional",
    # position-based (U-shaped) attribution with INTEGER per-mille
    # credit: 400/400 to first/last touch, 200 split over middles by
    # integer division with the remainder assigned to the EARLIEST
    # middles — deterministic, sums to exactly 1000 per converting
    # user, no per-row float credit to re-aggregate
    oracle="""
    WITH conv AS (SELECT user_id, MIN(ROW(ts, event_id)) AS c
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY user_id),
    t AS (SELECT e.user_id, e.event_type,
                 ROW_NUMBER() OVER (PARTITION BY e.user_id
                                    ORDER BY e.ts, e.event_id) AS pos,
                 COUNT(*) OVER (PARTITION BY e.user_id)::BIGINT AS k
          FROM events e JOIN conv ON e.user_id = conv.user_id
          WHERE ROW(e.ts, e.event_id) < conv.c),
    cr AS (SELECT event_type, user_id,
                  CASE WHEN k = 1 THEN 1000
                       WHEN k = 2 THEN 500
                       WHEN pos = 1 OR pos = k THEN 400
                       ELSE 200 // (k - 2)
                            + CASE WHEN pos - 1 <= 200 % (k - 2)
                                   THEN 1 ELSE 0 END
                  END::BIGINT AS permille
           FROM t)
    SELECT event_type, COUNT(*)::BIGINT AS touches,
           COUNT(DISTINCT user_id)::BIGINT AS users,
           SUM(permille)::BIGINT AS credit_permille
    FROM cr GROUP BY event_type
    """,
)
def events_attribution_positional(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution: each
    converting user's touches — events strictly before their FIRST
    purchase in (ts, event_id) order — credit 40% to the first touch,
    40% to the last, 20% split across the middles. Credit is INTEGER
    per-mille: the middle share uses integer division with the
    remainder given to the earliest middles, so every user's path sums
    to exactly 1000 and the channel aggregate is an int64 sum — no
    accumulated float credit anywhere (the flaw in most attribution
    jobs). Complements events_attribution_first_touch (100/0 rule).
    Shape: a user-keyed min-reduce for the conversion cutoff, one
    user-partitioned window for position/path-length, one hash
    aggregate — all shuffles on user_id, the natural key; at 100 TB
    identical."""
    ev = load_table(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("c"))
    )
    t = (
        ev.join(conv, "user_id")
        .filter(F.struct("ts", "event_id") < F.col("c"))
        .select(
            "user_id",
            "event_type",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("pos"),
            F.count(F.lit(1))
            .over(Window.partitionBy("user_id"))
            .cast("bigint")
            .alias("k"),
        )
    )
    k, pos = F.col("k"), F.col("pos")
    permille = (
        F.when(k == 1, F.lit(1000))
        .when(k == 2, F.lit(500))
        .when((pos == 1) | (pos == k), F.lit(400))
        .otherwise(
            F.expr("200 div (k - 2)")
            + F.when((pos - 1) <= F.pmod(F.lit(200), k - 2), 1).otherwise(0)
        )
        .cast("bigint")
    )
    return (
        t.select("event_type", "user_id", permille.alias("permille"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("touches"),
            F.countDistinct("user_id").alias("users"),
            F.sum("permille").alias("credit_permille"),
        )
    )


# ---------------------------------------------------------------------------
# rec_item_cooccur — co-visitation item-item similarity
# ---------------------------------------------------------------------------

@query(
    "rec_item_cooccur",
    # item-item collaborative filtering over co-visitation: per-user
    # DISTINCT item sets -> per-user pair explode (bounded by the
    # per-user item count) -> pair counts; cosine = co/sqrt(na*nb) is
    # reported but RANKING is by integer (co DESC, item_b) so no float
    # ordering ties decide the output
    oracle="""
    WITH uic AS (SELECT user_id,
                        json_extract_string(props, '$.k')::INT AS item,
                        COUNT(*)::BIGINT AS n_ev
                 FROM events
                 WHERE json_extract_string(props, '$.k') IS NOT NULL
                 GROUP BY 1, 2),
    ui AS (SELECT user_id, item FROM (
               SELECT user_id, item,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY n_ev DESC, item) AS rn
               FROM uic) WHERE rn <= 256),
    ic AS (SELECT item, COUNT(*)::BIGINT AS nu FROM ui GROUP BY item),
    co AS (SELECT a.item AS item_a, b.item AS item_b,
                  COUNT(*)::BIGINT AS co
           FROM ui a JOIN ui b
             ON a.user_id = b.user_id AND a.item < b.item
           GROUP BY 1, 2),
    sym AS (SELECT item_a, item_b, co FROM co
            UNION ALL
            SELECT item_b, item_a, co FROM co),
    ranked AS (SELECT s.item_a, s.item_b, s.co,
                      FLOOR(s.co::DOUBLE / sqrt((ia.nu * ib.nu)::DOUBLE)
                            * 1e4 + 1e-6) / 1e4 AS cosine,
                      ROW_NUMBER() OVER (PARTITION BY s.item_a
                                         ORDER BY s.co DESC, s.item_b)
                          AS rnk
               FROM sym s JOIN ic ia ON s.item_a = ia.item
                          JOIN ic ib ON s.item_b = ib.item
               WHERE s.co >= 5)
    SELECT item_a, item_b, co, cosine, rnk::BIGINT AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def rec_item_cooccur(spark, sf_dir):
    """Item-item co-visitation recommender (the classic 'users who
    touched A also touched B'): top-5 neighbors per item by raw
    co-count, with the cosine co/sqrt(na*nb) reported alongside.
    Ranking is by INTEGER (co DESC, item_b) — floats never order the
    output, so 1-ulp cosine noise can't flip rows. Shape: per-user
    item sets CAPPED at the 256 most-active items per user
    (row_number over (n_ev DESC, item), a user-keyed window — a
    heavy user contributing millions of distinct items is a bot and
    adds noise, and the cap bounds the pair explode at <= 256^2/2
    pairs per user, the standard production mitigation; the fixture
    max is 67 items/user, so the cap binds only on pathological
    inputs and is applied identically in the oracle) -> self-join on
    user_id -> pair hash-aggregate -> item counts joined back
    (item-dimension-sized, broadcast) -> per-item top-k window over
    item-grained groups. min-support co >= 5 keeps noise pairs out."""
    ev = load_table(spark, sf_dir, "events")
    # NULL items filtered BEFORE the cap window (ADVICE r10): Spark
    # sorts NULL first under the cap's (n_ev DESC, item ASC) order
    # while DuckDB defaults NULLS LAST, so a >256-item user with a
    # NULL json_extract result could be capped to different item sets
    # cross-engine; NULL items never survive the a.item < b.item join
    # anyway, so dropping them up front changes nothing else
    uic = ev.filter(
        F.get_json_object("props", "$.k").isNotNull()
    ).groupBy(
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    wcap = Window.partitionBy("user_id").orderBy(
        F.col("n_ev").desc(), F.col("item")
    )
    ui = (
        uic.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 256)
        .select("user_id", "item")
        # pinned (r11): three consumers (item counts + both self-join
        # sides) would each re-run the events aggregate + cap window
        .localCheckpoint(eager=False)
    )
    ic = ui.groupBy("item").agg(F.count(F.lit(1)).alias("nu"))
    a, b = ui.alias("a"), ui.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    sym = co.unionByName(
        co.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "co",
        )
    ).filter(F.col("co") >= 5)
    ia = ic.select(F.col("item").alias("item_a"), F.col("nu").alias("na"))
    ib = ic.select(F.col("item").alias("item_b"), F.col("nu").alias("nb"))
    ranked = (
        sym.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .select(
            "item_a",
            "item_b",
            "co",
            (
                F.floor(
                    F.col("co").cast("double")
                    / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
                    * 1e4
                    + 1e-6
                )
                / 1e4
            ).alias("cosine"),
            F.row_number()
            .over(
                Window.partitionBy("item_a").orderBy(
                    F.col("co").desc(), F.col("item_b")
                )
            )
            .cast("bigint")
            .alias("rnk"),
        )
    )
    return ranked.filter(F.col("rnk") <= 5)


# ---------------------------------------------------------------------------
# graph_triangles — triangle counting over the association graph
# ---------------------------------------------------------------------------

@query(
    "graph_triangles",
    # triangles over the above-average co-visitation graph: edge set =
    # item pairs with co*n_pairs > sum_co (integer cross-multiply, no
    # float threshold); count via the oriented two-join (a<b<c), then
    # explode each triangle to its three corners for per-node counts.
    # The pair build caps each user at their 256 most-active items
    # (identical cap, identical tie-break as rec_item_cooccur) so a
    # hot user cannot explode the upstream self-join quadratically.
    oracle="""
    WITH uic AS (SELECT user_id,
                        json_extract_string(props, '$.k')::INT AS item,
                        COUNT(*)::BIGINT AS n_ev
                 FROM events
                 WHERE json_extract_string(props, '$.k') IS NOT NULL
                 GROUP BY 1, 2),
    ui AS (SELECT user_id, item FROM (
               SELECT user_id, item,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY n_ev DESC, item) AS rn
               FROM uic) WHERE rn <= 256),
    co AS (SELECT a.item AS u, b.item AS v, COUNT(*)::BIGINT AS co
           FROM ui a JOIN ui b
             ON a.user_id = b.user_id AND a.item < b.item
           GROUP BY 1, 2),
    tot AS (SELECT COUNT(*)::BIGINT AS n_pairs, SUM(co)::BIGINT AS sum_co
            FROM co),
    e AS (SELECT u, v FROM co CROSS JOIN tot
          WHERE co * n_pairs > sum_co),
    tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1 JOIN e e2 ON e1.v = e2.u
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    corners AS (SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
    SELECT node, COUNT(*)::BIGINT AS triangles
    FROM corners GROUP BY node
    """,
)
def graph_triangles(spark, sf_dir):
    """Per-node triangle counts over the stronger-than-average
    co-visitation graph — the clustering-structure primitive behind
    community cohesion and spam-ring detection. The edge threshold is
    the integer cross-multiply co*n_pairs > sum_co (strictly above the
    mean co-count) so no float comparison defines the graph. Counting
    uses the DEGREE-ORIENTED two-join (Schank-Wagner / compact-
    forward): each undirected edge is directed from its lower-rank to
    its higher-rank endpoint under rank = (degree, id) — a total
    order, so the oriented graph is a DAG and every triangle has
    exactly one source node pointing at the other two. Wedges come
    from o1(a,b) JOIN o2(b,c) and close by probing o3(a,c); because
    every out-edge leaves the LOWER-degree endpoint, the wedge count
    is bounded by the sum of squared low-side degrees — O(m^1.5) on
    any graph — instead of blowing up quadratically on heavy-hitter
    hubs the way id-orientation does (a celebrity node with 10^6
    neighbors contributes ~0 wedges here, 10^12 there). The triangle
    SET is orientation-invariant, so the id-oriented oracle matches
    row-for-row. Degrees come from an edge-sized aggregate and join
    back via two broadcasts (node table is dimension-sized; at
    corpus scale swap for sort-merge on the edge key — still
    key-partitioned). Per-node counts explode each triangle to its
    three corners — output-sized work.

    The UPSTREAM co-visitation pair build is bounded the same way
    rec_item_cooccur's is: each user contributes only their 256
    most-active items (row_number over (n_ev DESC, item) — the
    identical cap and tie-break, applied identically in the oracle),
    so the per-user self-join emits at most 256^2/2 pairs per user.
    Without it, a hot user (a bot touching 1e5 distinct items) would
    emit 5e9 pairs BEFORE the mean-co edge threshold can prune
    anything — the one input axis the r9 degree orientation (which
    bounds the downstream wedge join) did not cover. The fixture max
    is 67 items/user, so the cap binds only on pathological inputs;
    when it does bind it changes co-counts only for such bot-grade
    users, the standard production mitigation."""
    ev = load_table(spark, sf_dir, "events")
    # NULL items filtered BEFORE the cap window (ADVICE r10): Spark
    # sorts NULL first under the cap's (n_ev DESC, item ASC) order
    # while DuckDB defaults NULLS LAST, so a >256-item user with a
    # NULL json_extract result could be capped to different item sets
    # cross-engine; NULL items never survive the a.item < b.item join
    # anyway, so dropping them up front changes nothing else
    uic = ev.filter(
        F.get_json_object("props", "$.k").isNotNull()
    ).groupBy(
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    wcap = Window.partitionBy("user_id").orderBy(
        F.col("n_ev").desc(), F.col("item")
    )
    ui = (
        uic.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 256)
        .select("user_id", "item")
    )
    aa, bb = ui.alias("a"), ui.alias("b")
    co = (
        aa.join(
            bb,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("u"), F.col("b.item").alias("v"))
        .agg(F.count(F.lit(1)).alias("co"))
        # pinned (r11): the mean-threshold needs BOTH the totals and
        # the filtered pass over this table — without the pin the
        # user self-join pair build re-executes per consumer (this is
        # the co-occurrence table a production pipeline materializes;
        # rec_item_cooccur's device)
        .localCheckpoint(eager=False)
    )
    tot = co.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("co").alias("sum_co")
    )
    e = (
        co.crossJoin(F.broadcast(tot))
        .filter(F.col("co") * F.col("n_pairs") > F.col("sum_co"))
        .select("u", "v")
        # pinned (r11): five consumers (degree agg, two degree
        # join-backs, and the o1/o2/o3 wedge self-joins on different
        # keys) — each would otherwise re-execute the whole pair
        # build + threshold
        .localCheckpoint(eager=False)
    )
    # degree-orient: every edge leaves its lower-(degree, id) endpoint
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        F.broadcast(deg.select(F.col("node").alias("u"),
                               F.col("deg").alias("du"))),
        "u",
    ).join(
        F.broadcast(deg.select(F.col("node").alias("v"),
                               F.col("deg").alias("dv"))),
        "v",
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
    )
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    tri = (
        o1.join(o2, F.col("o1.y") == F.col("o2.x"))
        .join(
            o3,
            (F.col("o3.x") == F.col("o1.x")) & (F.col("o3.y") == F.col("o2.y")),
        )
        .select(
            F.col("o1.x").alias("a"),
            F.col("o1.y").alias("b"),
            F.col("o2.y").alias("c"),
        )
    )
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))


# ---------------------------------------------------------------------------
# feature_lag_matrix — per-user training features with lags and labels
# ---------------------------------------------------------------------------

@query(
    "feature_lag_matrix",
    # the training-table staple: per (user, day) spend with lag-1,
    # trailing-7-row sum/count, and the NEXT observed day's spend as
    # the label — all exact int64 cents over one per-user day-ordered
    # window pass
    oracle=f"""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      SUM({_CENTS})::BIGINT AS spend
               FROM events GROUP BY 1, 2)
    SELECT user_id, day, spend,
           LAG(spend) OVER w AS lag1_spend,
           SUM(spend) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               ::BIGINT AS r7_sum,
           COUNT(*) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               ::BIGINT AS r7_days,
           LEAD(spend) OVER w AS next_spend
    FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)
    """,
)
def feature_lag_matrix(spark, sf_dir):
    """Per-(user, day) training-feature matrix: daily spend, previous
    observed day's spend (lag-1), trailing 7-observed-day sum and
    count, and the NEXT observed day's spend as the supervised label —
    the feature/label layout every churn or spend-forecast model
    trains on. All columns are exact int64 cents; lags are row-based
    over the observed-day series (day is unique per user after the
    daily rollup, so row order is total and engine-independent).
    Shape: one (user, day) hash aggregate, then ONE per-user ordered
    window pass produces every feature AND the label — no self-joins,
    no point-in-time join needed because the grain is already daily.
    At 100 TB this is a single user-keyed shuffle; features stay
    leakage-free by construction (every window frame ends at the
    current row; the only forward-looking column is the label)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_cents()).alias("spend"))
    w = Window.partitionBy("user_id").orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    return d.select(
        "user_id",
        "day",
        "spend",
        F.lag("spend").over(w).alias("lag1_spend"),
        F.sum("spend").over(w7).alias("r7_sum"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("r7_days"),
        F.lead("spend").over(w).alias("next_spend"),
    )


# ---------------------------------------------------------------------------
# events_forecast_backtest — seasonal-naive vs naive-1 backtest
# ---------------------------------------------------------------------------

@query(
    "events_forecast_backtest",
    # forecast backtest on daily event counts: seasonal-naive (count at
    # day-7) vs naive (day-1), scored on days where both forecasts
    # exist; absolute errors are exact int64 sums, MAE is one division
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      COUNT(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
    j AS (SELECT cur.event_type, cur.n,
                 s.n AS f_seasonal, p.n AS f_naive
          FROM d cur
          JOIN d s ON s.event_type = cur.event_type
                  AND s.day = cur.day - INTERVAL 7 DAY
          JOIN d p ON p.event_type = cur.event_type
                  AND p.day = cur.day - INTERVAL 1 DAY)
    SELECT event_type, COUNT(*)::BIGINT AS n_scored,
           SUM(ABS(n - f_seasonal))::BIGINT AS sae_seasonal,
           SUM(ABS(n - f_naive))::BIGINT AS sae_naive,
           SUM(ABS(n - f_seasonal))::DOUBLE / COUNT(*) AS mae_seasonal,
           SUM(ABS(n - f_naive))::DOUBLE / COUNT(*) AS mae_naive
    FROM j GROUP BY event_type
    """,
)
def events_forecast_backtest(spark, sf_dir):
    """Forecast-model backtest on daily event counts: the seasonal
    naive (same weekday last week) against the plain naive (yesterday)
    — the two baselines every real forecasting pipeline must beat, and
    the standard way to detect weekly seasonality strength (seasonal
    MAE << naive MAE). Scored only on days where BOTH forecasts exist,
    so the comparison is apples-to-apples. Absolute errors fold as
    exact int64; each MAE is ONE IEEE division of exact integers —
    deterministic, no grid needed. Shape: one (type, day) aggregate
    (calendar-bounded — thousands of rows per type at ANY corpus
    size), two self-joins on the tiny daily table, one aggregate; at
    100 TB the daily rollup is the only data-sized stage."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    cur, s, p = d.alias("cur"), d.alias("s"), d.alias("p")
    j = (
        cur.join(
            s,
            (F.col("s.event_type") == F.col("cur.event_type"))
            & (F.col("s.day") == F.date_sub(F.col("cur.day"), 7)),
        )
        .join(
            p,
            (F.col("p.event_type") == F.col("cur.event_type"))
            & (F.col("p.day") == F.date_sub(F.col("cur.day"), 1)),
        )
        .select(
            F.col("cur.event_type").alias("event_type"),
            F.col("cur.n").alias("n"),
            F.col("s.n").alias("f_seasonal"),
            F.col("p.n").alias("f_naive"),
        )
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.abs(F.col("n") - F.col("f_seasonal"))).alias("sae_seasonal"),
        F.sum(F.abs(F.col("n") - F.col("f_naive"))).alias("sae_naive"),
        (
            F.sum(F.abs(F.col("n") - F.col("f_seasonal"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae_seasonal"),
        (
            F.sum(F.abs(F.col("n") - F.col("f_naive"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae_naive"),
    )


# ---------------------------------------------------------------------------
# stats_trimmed_mean — robust location via rank-trimmed aggregation
# ---------------------------------------------------------------------------

@query(
    "stats_trimmed_mean",
    # 10%-trimmed mean per event type: total-order row_number over
    # (cents, event_id), drop the bottom/top n//10 rows, exact int64
    # sum over the kept band, ONE division
    oracle=f"""
    WITH c AS (SELECT event_type, event_id, {_CENTS} AS cents FROM events),
    r AS (SELECT event_type, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cents, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type)::BIGINT AS n
          FROM c)
    SELECT event_type, n,
           (n - 2 * (n // 10))::BIGINT AS n_kept,
           SUM(cents)::BIGINT AS kept_sum,
           SUM(cents)::DOUBLE / (n - 2 * (n // 10)) AS trimmed_mean_cents
    FROM r WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type, n
    """,
)
def stats_trimmed_mean(spark, sf_dir):
    """10%-trimmed mean of value cents per event type — the robust
    location estimate that survives the outliers events_winsorize
    clamps and plain AVG swallows. The trim is rank-exact: a total
    order over (cents, event_id) makes row_number engine-independent,
    the bottom and top n//10 rows drop, and the kept band sums in
    int64; the mean is ONE IEEE division of exact integers —
    deterministic, no grid. Shape: one per-type sort (partition-
    parallel across types) + hash aggregate. At 100 TB swap the
    per-group sort for the two-pass distributed-rank decomposition in
    operators/rank.py (same device as stats_histogram_equidepth) —
    the trim boundaries become two rank lookups instead of a full
    window."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", "event_id", _cents().alias("cents"))
    wp = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(wp.orderBy("cents", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
    )
    k = F.expr("n div 10")
    kept = r.filter((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
    return kept.groupBy("event_type", "n").agg(
        (F.col("n") - 2 * F.expr("n div 10")).cast("bigint").alias("n_kept"),
        F.sum("cents").alias("kept_sum"),
        (
            F.sum("cents").cast("double")
            / (F.col("n") - 2 * F.expr("n div 10"))
        ).alias("trimmed_mean_cents"),
    )


# ---------------------------------------------------------------------------
# text_hapax_ratio — vocabulary-richness screen per source
# ---------------------------------------------------------------------------

_DTOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


@query(
    "text_hapax_ratio",
    # vocabulary richness per source: token/type counts, hapax
    # legomena share, type-token ratio, Herdan's C = ln(types)/
    # ln(tokens); counts exact int64, ratios floor-gridded (C bears
    # libm ln — see module docstring for the grid caveat)
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_DTOKS}) AS term FROM documents),
    tc AS (SELECT source, term, COUNT(*)::BIGINT AS n
           FROM tok GROUP BY source, term),
    s AS (SELECT source, SUM(n)::BIGINT AS n_tokens,
                 COUNT(*)::BIGINT AS n_types,
                 SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
          FROM tc GROUP BY source)
    SELECT source, n_tokens, n_types, hapax,
           FLOOR(hapax::DOUBLE / n_types * 1e4) / 1e4 AS hapax_ratio,
           FLOOR(n_types::DOUBLE / n_tokens * 1e4) / 1e4 AS ttr,
           FLOOR(ln(n_types::DOUBLE) / ln(n_tokens::DOUBLE) * 1e4 + 1e-6) / 1e4
               AS herdan_c
    FROM s WHERE n_tokens > 1 AND n_types > 0
    """,
)
def text_hapax_ratio(spark, sf_dir):
    """Vocabulary-richness profile per corpus source: hapax-legomena
    share (tokens seen exactly once — high in natural prose, near zero
    in template spam and log dumps), type-token ratio, and Herdan's C
    (the length-robust richness exponent). Together with text_zipf_fit
    these are the standard lexical screens for machine-generated or
    boilerplate-heavy sources in training-data curation. Counts are
    exact int64 through both aggregates; the two count ratios are
    single IEEE divisions; Herdan's C bears two libm ln calls and is
    floor-gridded at 1e-4 (high-quality but not provably
    correctly-rounded libm — the grid makes divergence overwhelmingly
    unlikely, not impossible). Shape: token explode -> (source, term)
    hash aggregate -> source aggregate; both shuffles key on
    vocabulary-sized grains, the canonical word-count shape at any
    corpus size."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    tc = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("n"))
    s = tc.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax"),
    )
    nt = F.col("n_tokens").cast("double")
    ty = F.col("n_types").cast("double")
    return s.filter((F.col("n_tokens") > 1) & (F.col("n_types") > 0)).select(
        "source",
        "n_tokens",
        "n_types",
        "hapax",
        (F.floor(F.col("hapax").cast("double") / ty * 1e4) / 1e4).alias(
            "hapax_ratio"
        ),
        (F.floor(ty / nt * 1e4) / 1e4).alias("ttr"),
        (F.floor(F.log(ty) / F.log(nt) * 1e4 + 1e-6) / 1e4).alias("herdan_c"),
    )


# ---------------------------------------------------------------------------
# events_survival_km — Kaplan-Meier with an integer-gridded log cumprod
# ---------------------------------------------------------------------------

@query(
    "events_survival_km",
    # Kaplan-Meier time-to-first-purchase (right-censored at the last
    # observed day). The cumulative product PI(1 - d/n) is the float
    # hazard: engines sum/multiply window prefixes in different orders
    # (DuckDB's windowed SUM uses segment trees). Device: snap each
    # ln(1 - d/n) to a 1e-12 INTEGER grid first — the prefix sum is
    # then an exact int64 cumsum (order-free), and survival =
    # exp(cum/1e12) is one libm call per row, floor-gridded + nudged
    oracle="""
    WITH f AS (SELECT user_id,
                      CAST(MIN(ts) AS DATE) AS f_day,
                      CAST(MIN(CASE WHEN event_type = 'purchase'
                                    THEN ts END) AS DATE) AS p_day
               FROM events GROUP BY user_id),
    horizon AS (SELECT CAST(MAX(ts) AS DATE) AS end_day FROM events),
    dur AS (SELECT datediff('day', f.f_day,
                            COALESCE(f.p_day, h.end_day))::BIGINT AS t,
                   CASE WHEN f.p_day IS NULL THEN 0 ELSE 1 END AS ev
            FROM f CROSS JOIN horizon h),
    g AS (SELECT t, SUM(ev)::BIGINT AS d, COUNT(*)::BIGINT AS c
          FROM dur GROUP BY t),
    k AS (SELECT t, d, c,
                 (SUM(c) OVER ())::BIGINT
                 - COALESCE(SUM(c) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0)::BIGINT AS n_risk
          FROM g),
    l AS (SELECT t, d, n_risk,
                 CASE WHEN d < n_risk THEN
                      FLOOR(ln((n_risk - d)::DOUBLE / n_risk::DOUBLE)
                            * 1e12)::BIGINT
                 END AS lng,
                 CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS dead
          FROM k),
    s AS (SELECT t, d, n_risk,
                 SUM(COALESCE(lng, 0)) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     ::BIGINT AS cum,
                 MAX(dead) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS zero_seen
          FROM l)
    SELECT t, n_risk, d AS events,
           CASE WHEN zero_seen = 1 THEN 0.0
                ELSE FLOOR(exp(cum::DOUBLE / 1e12) * 1e4 + 1e-6) / 1e4
           END AS survival
    FROM s
    """,
)
def events_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve for time-to-first-purchase, right-
    censored at the last observed day — THE estimator for conversion-
    latency and churn questions ('what fraction of users have not yet
    purchased t days after their first touch'). The cumulative product
    PI(1 - d_i/n_i) cannot be a raw float window sum (engines order
    window prefix arithmetic differently — DuckDB's windowed SUM is a
    segment tree), so each per-row ln(1 - d/n) snaps to a 1e-12
    INTEGER grid and the prefix accumulates as an exact int64 cumsum;
    survival is exp of the gridded sum, floor-gridded at 1e-4 with the
    boundary nudge. The 31-row curve absorbs a <=3e-11 relative grid
    error — invisible at the output grid. A risk set hitting zero
    (d = n) pins survival to exactly 0.0 via an integer flag, not
    ln(0). Shape: one user-grained aggregate, a one-row horizon
    broadcast, then windows over the duration-grained table (calendar-
    bounded rows at any corpus size)."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("f_day"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .cast("date")
        .alias("p_day"),
    )
    horizon = ev.agg(F.max("ts").cast("date").alias("end_day"))
    dur = f.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.coalesce("p_day", "end_day"), "f_day")
        .cast("bigint")
        .alias("t"),
        F.when(F.col("p_day").isNull(), 0).otherwise(1).alias("ev"),
    )
    g = dur.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("c")
    )
    wall = Window.partitionBy()
    wbefore = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.select(
        "t",
        "d",
        (
            F.sum("c").over(wall)
            - F.coalesce(F.sum("c").over(wbefore), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    lng = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1e12
        ).cast("bigint"),
    )
    dead = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    s = k.select(
        "t",
        "d",
        "n_risk",
        F.sum(F.coalesce(lng, F.lit(0))).over(wcum).cast("bigint").alias("cum"),
        F.max(dead).over(wcum).alias("zero_seen"),
    )
    return s.select(
        "t",
        "n_risk",
        F.col("d").alias("events"),
        F.when(F.col("zero_seen") == 1, F.lit(0.0))
        .otherwise(
            F.floor(F.exp(F.col("cum").cast("double") / 1e12) * 1e4 + 1e-6)
            / 1e4
        )
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# text_source_log_odds — distinctive-term contrast per source
# ---------------------------------------------------------------------------

@query(
    "text_source_log_odds",
    # Monroe et al. log-odds with add-one Dirichlet prior, source vs
    # rest-of-corpus; RANKING is by the exact integer cross-multiplied
    # rate difference y_a*n_b - y_b*n_a (floats never order rows), the
    # z-score is reported floor-gridded
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_DTOKS}) AS term FROM documents),
    tc AS (SELECT source, term, COUNT(*)::BIGINT AS y
           FROM tok GROUP BY source, term),
    tot AS (SELECT source, SUM(y)::BIGINT AS n FROM tc GROUP BY source),
    gt AS (SELECT term, SUM(y)::BIGINT AS y_all FROM tc GROUP BY term),
    gn AS (SELECT SUM(y)::BIGINT AS n_all,
                  COUNT(DISTINCT term)::BIGINT AS v FROM tc),
    j AS (SELECT tc.source, tc.term, tc.y AS ya, tot.n AS na,
                 (gt.y_all - tc.y)::BIGINT AS yb,
                 (gn.n_all - tot.n)::BIGINT AS nb, gn.v
          FROM tc JOIN tot ON tc.source = tot.source
                  JOIN gt ON tc.term = gt.term
                  CROSS JOIN gn),
    z AS (SELECT source, term, ya, yb,
                 ya * nb - yb * na AS lift,
                 FLOOR((ln((ya + 1)::DOUBLE / (na + v - ya - 1)::DOUBLE)
                        - ln((yb + 1)::DOUBLE / (nb + v - yb - 1)::DOUBLE))
                       / sqrt(1.0/(ya + 1) + 1.0/(yb + 1))
                       * 1e4 + 1e-6) / 1e4 AS z_score,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY ya * nb - yb * na DESC, term)
                     AS rnk
          FROM j)
    SELECT source, term, ya AS y_source, yb AS y_rest, lift::BIGINT AS lift,
           z_score, rnk::BIGINT AS rnk
    FROM z WHERE rnk <= 10
    """,
)
def text_source_log_odds(spark, sf_dir):
    """Distinctive terms per corpus source — the Monroe et al. (2008)
    log-odds-ratio with an add-one Dirichlet prior against the rest of
    the corpus, the standard 'what words characterize this slice'
    statistic (tfidf_top_terms answers the per-DOCUMENT version).
    The top-10 per source ranks by the exact integer cross-multiplied
    rate difference ya*nb - yb*na (identical ordering on both engines
    — a float z-ordering could flip 1-ulp-apart rows at the cut), with
    the z-score reported alongside, floor-gridded + nudged. Shape:
    token explode -> (source, term) counts -> term-global and
    source-global rollups joined back (vocabulary-sized), one top-k
    window per source. All count algebra is int64-exact."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    tc = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("y"))
    tot = tc.groupBy("source").agg(F.sum("y").alias("n"))
    gt = tc.groupBy("term").agg(F.sum("y").alias("y_all"))
    gn = tc.agg(
        F.sum("y").alias("n_all"), F.countDistinct("term").alias("v")
    )
    j = (
        tc.join(F.broadcast(tot), "source")
        .join(gt, "term")
        .crossJoin(F.broadcast(gn))
        .select(
            "source",
            "term",
            F.col("y").alias("ya"),
            F.col("n").alias("na"),
            (F.col("y_all") - F.col("y")).alias("yb"),
            (F.col("n_all") - F.col("n")).alias("nb"),
            "v",
        )
    )
    ya, yb, na, nb, v = (F.col(x) for x in ("ya", "yb", "na", "nb", "v"))
    lift = ya * nb - yb * na
    delta = F.log((ya + 1).cast("double") / (na + v - ya - 1).cast("double")) - F.log(
        (yb + 1).cast("double") / (nb + v - yb - 1).cast("double")
    )
    sigma = F.sqrt(1.0 / (ya + 1) + 1.0 / (yb + 1))
    z = j.select(
        "source",
        "term",
        ya.alias("y_source"),
        yb.alias("y_rest"),
        lift.cast("bigint").alias("lift"),
        (F.floor(delta / sigma * 1e4 + 1e-6) / 1e4).alias("z_score"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy(lift.desc(), "term"))
        .cast("bigint")
        .alias("rnk"),
    )
    return z.filter(F.col("rnk") <= 10)


# ---------------------------------------------------------------------------
# events_interarrival — burstiness profile per event type
# ---------------------------------------------------------------------------

@query(
    "events_interarrival",
    # interarrival gaps per type under the (ts, event_id) total order;
    # mean and coefficient of variation from exact int64/HUGEINT gap
    # moments — CV >> 1 is the burstiness signature
    oracle="""
    WITH e AS (SELECT event_type,
                      -- floor, not ::BIGINT: DuckDB's double->bigint
                      -- cast ROUNDS while Spark unix_timestamp floors
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
               FROM events),
    g AS (SELECT event_type,
                 sec - LAG(sec) OVER (PARTITION BY event_type
                                      ORDER BY sec, event_id) AS gap
          FROM e),
    s AS (SELECT event_type, COUNT(gap)::HUGEINT AS n,
                 SUM(gap)::HUGEINT AS s1,
                 SUM(gap::HUGEINT * gap::HUGEINT) AS s2
          FROM g WHERE gap IS NOT NULL GROUP BY event_type)
    SELECT event_type, n::BIGINT AS n_gaps, s1::BIGINT AS sum_gap_s,
           s1::DOUBLE / n::DOUBLE AS mean_gap_s,
           FLOOR(sqrt((n * s2 - s1 * s1)::DOUBLE) / s1::DOUBLE * 1e4
                 + 1e-6) / 1e4 AS cv
    FROM s WHERE s1 > 0
    """,
)
def events_interarrival(spark, sf_dir):
    """Interarrival-time profile per event type: mean gap and the
    coefficient of variation sqrt(n*S2 - S1^2)/S1 — CV ~ 1 is Poisson
    arrivals, CV >> 1 is the burstiness signature of batch jobs and
    scripted traffic (the corpus-level complement of the per-user
    events_velocity_flags screen). Gaps are exact integer seconds
    under the (sec, event_id) total order; the two moment sums fold in
    DECIMAL(38,0)/HUGEINT (S2 can pass int64 at large n x month-long
    gaps), the variance numerator n*S2 - S1^2 is exact, and CV is a
    fixed sqrt/divide tree, floor-gridded + nudged. Mean is one IEEE
    division. Shape: one per-type ordered window for LAG, one hash
    aggregate — partition-parallel across types at any scale."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    g = e.select(
        "event_type", (F.col("sec") - F.lag("sec").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    d38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        d38(F.sum("gap")).alias("s1"),
        F.sum(d38(F.col("gap")) * d38(F.col("gap"))).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    return s.filter(s1 > 0).select(
        "event_type",
        n.cast("bigint").alias("n_gaps"),
        s1.cast("bigint").alias("sum_gap_s"),
        (s1.cast("double") / n.cast("double")).alias("mean_gap_s"),
        (
            F.floor(
                F.sqrt((n * s2 - s1 * s1).cast("double"))
                / s1.cast("double")
                * 1e4
                + 1e-6
            )
            / 1e4
        ).alias("cv"),
    )


# ---------------------------------------------------------------------------
# corpus_source_overlap — exact vocabulary Jaccard between sources
# ---------------------------------------------------------------------------

@query(
    "corpus_source_overlap",
    # pairwise vocabulary overlap between sources: distinct
    # (source, term) self-joined on term (vocabulary-sized), exact
    # integer intersection/union, one division per pair
    oracle=f"""
    WITH st AS (SELECT DISTINCT source,
                       unnest({_DTOKS}) AS term
                FROM documents),
    vs AS (SELECT source, COUNT(*)::BIGINT AS v FROM st GROUP BY source),
    inter AS (SELECT a.source AS source_a, b.source AS source_b,
                     COUNT(*)::BIGINT AS inter
              FROM st a JOIN st b
                ON a.term = b.term AND a.source < b.source
              GROUP BY 1, 2)
    SELECT i.source_a, i.source_b, i.inter,
           va.v AS vocab_a, vb.v AS vocab_b,
           i.inter::DOUBLE / (va.v + vb.v - i.inter)::DOUBLE AS jaccard
    FROM inter i JOIN vs va ON i.source_a = va.source
                 JOIN vs vb ON i.source_b = vb.source
    """,
)
def corpus_source_overlap(spark, sf_dir):
    """Exact vocabulary Jaccard between every pair of corpus sources —
    the source-level contamination/redundancy screen (two sources
    sharing 90% of their vocabulary are near-mirrors; candidates for
    dedup_minhash_lsh at the document level). Distinct (source, term)
    rows self-join on term: the join is VOCABULARY-sized, never
    document-sized, and the pair aggregate is |sources|^2-bounded.
    Intersection and union counts are exact int64; jaccard is one IEEE
    division — deterministic, no grid. At 100 TB the distinct
    (source, term) table is the only corpus-order stage (one shuffle),
    and a df-prune of ubiquitous terms bounds the per-term fanout the
    same way dedup_minhash_df_pruned does."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    st = docs.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("term")
    ).distinct()
    vs = st.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    va = vs.select(F.col("source").alias("source_a"), F.col("v").alias("vocab_a"))
    vb = vs.select(F.col("source").alias("source_b"), F.col("v").alias("vocab_b"))
    return (
        inter.join(F.broadcast(va), "source_a")
        .join(F.broadcast(vb), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            "vocab_a",
            "vocab_b",
            (
                F.col("inter").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# events_trending_items — rank-shift screen between two windows
# ---------------------------------------------------------------------------

@query(
    "events_trending_items",
    # trending screen: item counts in the last 7 observed days vs the
    # 7 before, both ranked by integer (count DESC, item); output the
    # current top-20 with the rank shift — all-integer, horizon from a
    # one-row MAX broadcast
    oracle="""
    WITH h AS (SELECT CAST(MAX(ts) AS DATE) AS end_day FROM events),
    e AS (SELECT json_extract_string(props, '$.k')::INT AS item,
                 CAST(ts AS DATE) AS day
          FROM events),
    cur AS (SELECT item, COUNT(*)::BIGINT AS n_now
            FROM e CROSS JOIN h
            WHERE day > end_day - INTERVAL 7 DAY GROUP BY item),
    prev AS (SELECT item, COUNT(*)::BIGINT AS n_prev
             FROM e CROSS JOIN h
             WHERE day <= end_day - INTERVAL 7 DAY
               AND day > end_day - INTERVAL 14 DAY GROUP BY item),
    rc AS (SELECT item, n_now,
                  ROW_NUMBER() OVER (ORDER BY n_now DESC, item) AS rank_now
           FROM cur),
    rp AS (SELECT item, n_prev,
                  ROW_NUMBER() OVER (ORDER BY n_prev DESC, item) AS rank_prev
           FROM prev)
    SELECT rc.item, rc.n_now, rp.n_prev,
           rc.rank_now::BIGINT AS rank_now,
           rp.rank_prev::BIGINT AS rank_prev,
           (rp.rank_prev - rc.rank_now)::BIGINT AS rank_delta
    FROM rc LEFT JOIN rp ON rc.item = rp.item
    WHERE rc.rank_now <= 20
    """,
)
def events_trending_items(spark, sf_dir):
    """Trending-item screen: the current top-20 items (last 7 observed
    days) with their rank shift against the previous 7-day window —
    the standard 'movers' panel behind every popularity dashboard and
    negative-sampling refresh in recsys training. Both rankings are by
    integer (count DESC, item) so the output is engine-deterministic;
    the window anchor is a one-row MAX(ts) broadcast, so the query
    needs no wall clock (reproducible on any snapshot). Items absent
    from the previous window surface rank_prev = NULL — genuinely new
    movers. Shape: two filtered item-grained aggregates + item-
    dimension windows + one small join; the raw-events scan is the
    only data-sized stage at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.agg(F.max(F.col("ts").cast("date")).alias("end_day"))
    e = ev.select(
        F.get_json_object("props", "$.k").cast("int").alias("item"),
        F.col("ts").cast("date").alias("day"),
    ).crossJoin(F.broadcast(h))
    cur = (
        e.filter(F.col("day") > F.date_sub("end_day", 7))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_now"))
    )
    prev = (
        e.filter(
            (F.col("day") <= F.date_sub("end_day", 7))
            & (F.col("day") > F.date_sub("end_day", 14))
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_prev"))
    )
    rc = cur.select(
        "item",
        "n_now",
        F.row_number()
        .over(Window.orderBy(F.col("n_now").desc(), "item"))
        .cast("bigint")
        .alias("rank_now"),
    )
    rp = prev.select(
        "item",
        "n_prev",
        F.row_number()
        .over(Window.orderBy(F.col("n_prev").desc(), "item"))
        .cast("bigint")
        .alias("rank_prev"),
    )
    return (
        rc.join(rp, "item", "left")
        .filter(F.col("rank_now") <= 20)
        .select(
            "item",
            "n_now",
            "n_prev",
            "rank_now",
            "rank_prev",
            (F.col("rank_prev") - F.col("rank_now")).alias("rank_delta"),
        )
    )


# ---------------------------------------------------------------------------
# search_lm_dirichlet — query-likelihood retrieval with Dirichlet smoothing
# ---------------------------------------------------------------------------

@query(
    "search_lm_dirichlet",
    # Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001),
    # mu = 2000: score(d) = sum_q ln((tf + mu*p_c(q)) / (dl + mu)).
    # The output is the FULL matching-doc set (no float top-k cut —
    # the row set is decided by integer tf > 0 alone), scores
    # floor-gridded + nudged
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DTOKS} AS t FROM documents),
    base AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks),
    q AS (SELECT doc_id, unnest(t) AS term FROM toks),
    cstat AS (SELECT COUNT(*)::BIGINT AS c_total FROM q),
    cf AS (SELECT term, COUNT(*)::BIGINT AS cf FROM q
           WHERE term IN ('window', 'shuffle', 'broadcast')
           GROUP BY term),
    tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM q
           WHERE term IN ('window', 'shuffle', 'broadcast')
           GROUP BY doc_id, term),
    scored AS (SELECT tf.doc_id, COUNT(*)::BIGINT AS n_terms,
                      SUM(FLOOR(ln((tf.tf::DOUBLE
                                    + 2000.0 * cf.cf::DOUBLE
                                      / s.c_total::DOUBLE)
                                   / (b.dl + 2000.0)) * 1e12)::BIGINT
                          )::BIGINT AS raw12
               FROM tf JOIN cf USING (term)
                       JOIN base b ON tf.doc_id = b.doc_id
                       CROSS JOIN cstat s
               GROUP BY tf.doc_id)
    SELECT doc_id, n_terms,
           FLOOR(raw12::DOUBLE / 1e12 * 1e4 + 1e-6) / 1e4 AS score
    FROM scored
    """,
)
def search_lm_dirichlet(spark, sf_dir):
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001, mu = 2000) — the language-modeling ranker that
    complements search_bm25's tf saturation: score(d) = sum over query
    terms of ln((tf + mu*p_collection) / (dl + mu)). The result set is
    every document matching >= 1 query term — membership is decided by
    INTEGER tf alone, so no float ordering picks rows (the bm25 query
    demonstrates the top-k form; this one demonstrates the full-score
    surface a downstream fusion like search_hybrid_rrf consumes).
    Counts are exact int64; each per-term log contribution is a fixed
    IEEE tree snapped to a 1e-12 INTEGER grid before the per-doc sum
    (the corpus_js_divergence device), so the <= |query|-term addition
    is int64 and order-free on both engines; one final division, then
    the 1e-4 floor grid + nudge. Shape: map-side query-
    vocabulary cut before the (doc, term) aggregate — the posting
    explode only materializes the 3 query terms; collection stats are
    one-row broadcasts. Same single-shuffle skeleton as search_bm25 at
    any corpus size."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    qterms = ["window", "shuffle", "broadcast"]
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("t"))
    base = toks.select("doc_id", F.size("t").cast("bigint").alias("dl"))
    q = toks.select("doc_id", F.explode("t").alias("term"))
    cstat = q.agg(F.count(F.lit(1)).alias("c_total"))
    qf = q.filter(F.col("term").isin(qterms))
    cf = qf.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tf = qf.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(F.broadcast(cf), "term")
        .join(base, "doc_id")
        .crossJoin(F.broadcast(cstat))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.floor(
                    F.log(
                        (
                            F.col("tf").cast("double")
                            + 2000.0
                            * F.col("cf").cast("double")
                            / F.col("c_total").cast("double")
                        )
                        / (F.col("dl") + 2000.0)
                    )
                    * 1e12
                ).cast("bigint")
            ).alias("raw12"),
        )
    )
    return scored.select(
        "doc_id",
        "n_terms",
        (
            F.floor(F.col("raw12").cast("double") / 1e12 * 1e4 + 1e-6) / 1e4
        ).alias("score"),
    )


# ---------------------------------------------------------------------------
# dq_volume_alerts — day-over-day volume anomaly screen
# ---------------------------------------------------------------------------

@query(
    "dq_volume_alerts",
    # ops data-quality screen: per (type, day) count vs the EXACT
    # median of the trailing 7 prior days (sorted 7-element list,
    # 4th element — pure integers); spike/drop flags by integer
    # cross-multiply, no float thresholds
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      COUNT(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, day, n,
                 list(n) OVER (PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                     AS prior
          FROM d),
    m AS (SELECT event_type, day, n,
                 list_sort(prior)[4]::BIGINT AS med7
          FROM w WHERE len(prior) = 7)
    SELECT event_type, day, n, med7,
           CASE WHEN n * 2 > 3 * med7 THEN 1 ELSE 0 END::BIGINT AS spike,
           CASE WHEN n * 2 < med7 THEN 1 ELSE 0 END::BIGINT AS drop_alert
    FROM m
    """,
)
def dq_volume_alerts(spark, sf_dir):
    """Day-over-day volume anomaly screen per event type — the
    pipeline-ops staple ('did yesterday's ingest spike 1.5x or halve
    vs the trailing week?'). The baseline is the EXACT median of the
    7 prior days: the window collects the 7 trailing counts as a list,
    sorts it, and takes the 4th element — all integers, no percentile
    estimator, no float baseline. Spike (n > 1.5x median) and drop
    (n < 0.5x median) flags are integer cross-multiplies (n*2 vs
    3*med / med), so no float comparison anywhere in the query. Days
    without a full 7-day history are excluded (no cold-start false
    alarms). Shape: daily rollup (the only data-sized stage), then a
    7-element window over the calendar-bounded daily table."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    m = (
        d.select(
            "event_type",
            "day",
            "n",
            F.collect_list("n").over(w).alias("prior"),
        )
        .filter(F.size("prior") == 7)
        .select(
            "event_type",
            "day",
            "n",
            F.element_at(F.array_sort("prior"), 4).cast("bigint").alias("med7"),
        )
    )
    return m.select(
        "event_type",
        "day",
        "n",
        "med7",
        F.when(F.col("n") * 2 > 3 * F.col("med7"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("spike"),
        F.when(F.col("n") * 2 < F.col("med7"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("drop_alert"),
    )


# ---------------------------------------------------------------------------
# graph_degree_distribution — degree histogram + power-law slope
# ---------------------------------------------------------------------------

@query(
    "graph_degree_distribution",
    # degree histogram of the above-average co-visitation graph +
    # log-log regression slope (the text_zipf_fit device applied to
    # graph structure); degrees and frequencies exact int64, slope
    # floor-gridded + nudged
    oracle="""
    WITH ui AS (SELECT DISTINCT user_id,
                       json_extract_string(props, '$.k')::INT AS item
                FROM events),
    co AS (SELECT a.item AS u, b.item AS v, COUNT(*)::BIGINT AS co
           FROM ui a JOIN ui b
             ON a.user_id = b.user_id AND a.item < b.item
           GROUP BY 1, 2),
    tot AS (SELECT COUNT(*)::BIGINT AS n_pairs, SUM(co)::BIGINT AS sum_co
            FROM co),
    e AS (SELECT u, v FROM co CROSS JOIN tot
          WHERE co * n_pairs > sum_co),
    deg AS (SELECT node, COUNT(*)::BIGINT AS degree FROM (
              SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node),
    h AS (SELECT degree, COUNT(*)::BIGINT AS n_nodes FROM deg
          GROUP BY degree),
    s AS (SELECT FLOOR(regr_slope(ln(n_nodes::DOUBLE), ln(degree::DOUBLE))
                       * 1e4 + 1e-6) / 1e4 AS slope
          FROM h WHERE degree > 0)
    SELECT h.degree, h.n_nodes, s.slope
    FROM h CROSS JOIN s WHERE h.degree > 0
    """,
)
def graph_degree_distribution(spark, sf_dir):
    """Degree histogram of the above-average co-visitation graph with
    the log-log power-law slope attached — the first diagnostic run on
    any production graph (a slope near -2..-3 says scale-free hub
    structure; flat says the threshold produced a near-clique, which
    changes every downstream join's cost model — see graph_triangles'
    degree-orientation note). Degrees and histogram counts are exact
    int64 from two hash aggregates; the slope is one regr_slope over
    the histogram-sized table (the text_zipf_fit device), floor-
    gridded + nudged, identical on every row. Shape: the co-visitation
    aggregate is the only data-sized stage; degree and histogram
    grains are item-dimension-sized."""
    ev = load_table(spark, sf_dir, "events")
    ui = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).distinct()
    aa, bb = ui.alias("a"), ui.alias("b")
    co = (
        aa.join(
            bb,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("u"), F.col("b.item").alias("v"))
        .agg(F.count(F.lit(1)).alias("co"))
        # pinned (r11): the mean-threshold needs BOTH the totals and
        # the filtered pass over this table — without the pin the
        # user self-join pair build re-executes per consumer (this is
        # the co-occurrence table a production pipeline materializes;
        # rec_item_cooccur's device)
        .localCheckpoint(eager=False)
    )
    tot = co.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("co").alias("sum_co")
    )
    e = (
        co.crossJoin(F.broadcast(tot))
        .filter(F.col("co") * F.col("n_pairs") > F.col("sum_co"))
        .select("u", "v")
        # pinned (r11): both union sides of the degree aggregate read
        # this edge table — one threshold pass instead of two
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    h = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    s = h.filter(F.col("degree") > 0).agg(
        (
            F.floor(
                F.regr_slope(
                    F.log(F.col("n_nodes").cast("double")),
                    F.log(F.col("degree").cast("double")),
                )
                * 1e4
                + 1e-6
            )
            / 1e4
        ).alias("slope")
    )
    return (
        h.filter(F.col("degree") > 0)
        .crossJoin(F.broadcast(s))
        .select("degree", "n_nodes", "slope")
    )


# ---------------------------------------------------------------------------
# events_growth_accounting — weekly new/retained/resurrected/churned
# ---------------------------------------------------------------------------

@query(
    "events_growth_accounting",
    # the growth-accounting decomposition: per ISO week, users split
    # into NEW (first-ever week), RETAINED (also active the previous
    # week), RESURRECTED (returning after a gap); CHURNED(w) = users
    # active in w-7 with no activity in w. All set logic rides one
    # per-user ordered window over the (user, week) distinct table
    oracle="""
    WITH uw AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS DATE) AS week
                FROM events),
    lagged AS (SELECT user_id, week,
                      MIN(week) OVER (PARTITION BY user_id) AS first_week,
                      LAG(week) OVER (PARTITION BY user_id
                                      ORDER BY week) AS prev_week,
                      LEAD(week) OVER (PARTITION BY user_id
                                       ORDER BY week) AS next_week
               FROM uw),
    horizon AS (SELECT MAX(week) AS max_week FROM uw),
    states AS (SELECT week,
                      SUM(CASE WHEN week = first_week
                               THEN 1 ELSE 0 END)::BIGINT AS new_users,
                      SUM(CASE WHEN prev_week = week - INTERVAL 7 DAY
                               THEN 1 ELSE 0 END)::BIGINT AS retained,
                      SUM(CASE WHEN week <> first_week
                                AND (prev_week IS NULL
                                     OR prev_week <> week - INTERVAL 7 DAY)
                               THEN 1 ELSE 0 END)::BIGINT AS resurrected
               FROM lagged GROUP BY week),
    churn AS (SELECT (week + INTERVAL 7 DAY)::DATE AS week,
                     COUNT(*)::BIGINT AS churned
              FROM lagged CROSS JOIN horizon
              WHERE (next_week IS NULL OR next_week <> week + INTERVAL 7 DAY)
                AND week + INTERVAL 7 DAY <= max_week
              GROUP BY 1)
    SELECT s.week, s.new_users, s.retained, s.resurrected,
           COALESCE(c.churned, 0)::BIGINT AS churned,
           CASE WHEN COALESCE(c.churned, 0) = 0 THEN NULL
                ELSE (s.new_users + s.resurrected)::DOUBLE / c.churned
           END AS quick_ratio
    FROM states s LEFT JOIN churn c ON s.week = c.week
    """,
)
def events_growth_accounting(spark, sf_dir):
    """Weekly growth accounting — the canonical user-base
    decomposition (Amplitude/a16z 'growth accounting'): every active
    (user, week) is NEW (first-ever week), RETAINED (also active the
    previous calendar week) or RESURRECTED (returning after a gap),
    and CHURNED(w) counts users active in w-7 who went silent in w.
    The quick ratio (new + resurrected) / churned > 1 means the base
    is growing. All classification is integer set logic over ONE
    per-user ordered window (lag/lead/min) on the distinct
    (user, week) table — no self-joins of the raw stream, no float
    anywhere except the final ratio (one IEEE division, NULL when
    churn is zero on both engines by explicit CASE). Churn rows stop
    at the observation horizon (one-row MAX broadcast) so the final
    week never reports phantom churn. Shape: the distinct rollup is
    the only data-sized stage; everything after runs at (user, week)
    and week grain."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    ).distinct()
    wuser = Window.partitionBy("user_id")
    worder = wuser.orderBy("week")
    lagged = uw.select(
        "user_id",
        "week",
        F.min("week").over(wuser).alias("first_week"),
        F.lag("week").over(worder).alias("prev_week"),
        F.lead("week").over(worder).alias("next_week"),
    )
    horizon = uw.agg(F.max("week").alias("max_week"))
    states = lagged.groupBy("week").agg(
        F.sum(
            F.when(F.col("week") == F.col("first_week"), 1).otherwise(0)
        ).alias("new_users"),
        F.sum(
            F.when(F.col("prev_week") == F.date_sub("week", 7), 1).otherwise(0)
        ).alias("retained"),
        F.sum(
            F.when(
                (F.col("week") != F.col("first_week"))
                & (
                    F.col("prev_week").isNull()
                    | (F.col("prev_week") != F.date_sub("week", 7))
                ),
                1,
            ).otherwise(0)
        ).alias("resurrected"),
    )
    churn = (
        lagged.crossJoin(F.broadcast(horizon))
        .filter(
            (
                F.col("next_week").isNull()
                | (F.col("next_week") != F.date_add("week", 7))
            )
            & (F.date_add("week", 7) <= F.col("max_week"))
        )
        .groupBy(F.date_add("week", 7).alias("week"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        states.join(churn, "week", "left")
        .select(
            "week",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).cast("bigint").alias("churned"),
            F.when(F.coalesce("churned", F.lit(0)) == 0, F.lit(None))
            .otherwise(
                (F.col("new_users") + F.col("resurrected")).cast("double")
                / F.col("churned")
            )
            .alias("quick_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# events_daily_percentiles — exact order-statistic SLO bands per day
# ---------------------------------------------------------------------------

@query(
    "events_daily_percentiles",
    # exact (not approximate) daily p50/p95/p99 of value cents via
    # order statistics: rank under the (cents, event_id) total order,
    # target ranks ceil(q*n) computed by integer arithmetic — no
    # percentile estimator, no interpolation, engine-identical
    oracle=f"""
    WITH c AS (SELECT CAST(ts AS DATE) AS day, event_id,
                      {_CENTS} AS cents FROM events),
    r AS (SELECT day, cents,
                 ROW_NUMBER() OVER (PARTITION BY day
                                    ORDER BY cents, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY day)::BIGINT AS n
          FROM c)
    SELECT day, n,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)::BIGINT AS p50,
           MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN cents END)::BIGINT
               AS p95,
           MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)::BIGINT
               AS p99
    FROM r GROUP BY day, n
    """,
)
def events_daily_percentiles(spark, sf_dir):
    """Exact daily p50/p95/p99 of the value distribution — the SLO /
    spend-band panel, computed as true order statistics instead of an
    estimator (percentile_approx drifts run-to-run; this is
    reproducible to the cent). Ranks run under the (cents, event_id)
    total order so row_number is engine-independent; the target ranks
    ceil(n/2), ceil(19n/20), ceil(99n/100) are integer arithmetic
    ((k*n + k) div m); the selected cents are exact int64. Shape: one
    per-day sort (partition-parallel across days) + one day-grain
    aggregate. At 100 TB swap the per-day sort for the two-pass
    distributed rank in operators/rank.py, same as
    stats_histogram_equidepth — the selected statistics are
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        F.col("ts").cast("date").alias("day"),
        "event_id",
        _cents().alias("cents"),
    )
    wd = Window.partitionBy("day")
    r = c.select(
        "day",
        "cents",
        F.row_number().over(wd.orderBy("cents", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wd).cast("bigint").alias("n"),
    )

    def pick(expr):
        return F.max(F.when(F.col("rn") == expr, F.col("cents"))).cast("bigint")

    return r.groupBy("day", "n").agg(
        pick(F.expr("(n + 1) div 2")).alias("p50"),
        pick(F.expr("(19 * n + 19) div 20")).alias("p95"),
        pick(F.expr("(99 * n + 99) div 100")).alias("p99"),
    )


# ---------------------------------------------------------------------------
# stats_cramers_v — categorical association over a dense contingency table
# ---------------------------------------------------------------------------

@query(
    "stats_cramers_v",
    # Cramer's V between event_type and item over the DENSE r x c
    # contingency (zero cells included — they carry expected mass).
    # Each cell's chi2 term (obs*n - r*c)^2 / (n*r*c) is a fixed IEEE
    # tree of exact-int conversions, snapped to a 1e-9 integer grid so
    # the cell SUM is order-free int64; V is one sqrt tree at the end
    oracle="""
    WITH base AS (SELECT event_type,
                         json_extract_string(props, '$.k')::INT AS item
                  FROM events),
    obs AS (SELECT event_type, item, COUNT(*)::BIGINT AS o
            FROM base GROUP BY 1, 2),
    rows_ AS (SELECT event_type, COUNT(*)::BIGINT AS r FROM base GROUP BY 1),
    cols_ AS (SELECT item, COUNT(*)::BIGINT AS c FROM base GROUP BY 1),
    n_ AS (SELECT COUNT(*)::BIGINT AS n FROM base),
    dense AS (SELECT rows_.event_type, cols_.item, rows_.r, cols_.c,
                     COALESCE(obs.o, 0)::BIGINT AS o
              FROM rows_ CROSS JOIN cols_
              LEFT JOIN obs ON obs.event_type = rows_.event_type
                           AND obs.item = cols_.item),
    terms AS (SELECT FLOOR(((o * n.n - r * c)::DOUBLE
                            * (o * n.n - r * c)::DOUBLE)
                           / ((n.n * r)::DOUBLE * c::DOUBLE)
                           * 1e9)::BIGINT AS t9,
                     n.n
              FROM dense CROSS JOIN n_ n),
    s AS (SELECT SUM(t9)::BIGINT AS chi9, MAX(n) AS n,
                 (SELECT COUNT(*) FROM rows_)::BIGINT AS nr,
                 (SELECT COUNT(*) FROM cols_)::BIGINT AS nc
          FROM terms)
    SELECT n, nr, nc,
           chi9::DOUBLE / 1e9 AS chi2,
           ((nr - 1) * (nc - 1))::BIGINT AS dof,
           FLOOR(sqrt(chi9::DOUBLE / 1e9
                      / (n::DOUBLE * LEAST(nr - 1, nc - 1)::DOUBLE))
                 * 1e4 + 1e-6) / 1e4 AS cramers_v
    FROM s
    """,
)
def stats_cramers_v(spark, sf_dir):
    """Cramer's V association between event type and item — the
    normalized chi-square that answers 'do different event types touch
    different items' on a 0..1 scale (stats_chi_square is the GoF
    sibling). The contingency table is DENSE: zero-observation cells
    still carry expected mass r*c/n, built by crossing the two
    dimension tables (r x c rows — dimension-sized at any corpus
    scale) and left-joining observed counts. Each cell's chi2 term is
    exact-int inputs through one fixed IEEE tree ((o*n - r*c)^2 /
    (n*r*c); the difference is exact int64 < 2^53 before squaring),
    snapped to a 1e-9 integer grid so the cell sum is ORDER-FREE int64
    (the events_survival_km device) — engines cannot disagree on
    summation order. chi2 and V are then literal divisions and one
    sqrt, floor-gridded + nudged. Shape: one data-sized aggregate,
    then everything at dimension grain."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    )
    obs = base.groupBy("event_type", "item").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows_ = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("r"))
    cols_ = base.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    n_ = base.agg(F.count(F.lit(1)).alias("n"))
    dense = (
        rows_.crossJoin(cols_)
        .join(obs, ["event_type", "item"], "left")
        .select(
            "event_type",
            "item",
            "r",
            "c",
            F.coalesce("o", F.lit(0)).cast("bigint").alias("o"),
        )
        .crossJoin(F.broadcast(n_))
    )
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    # chi2 cell term: (o - E)^2/E with E = r*c/n reduces to
    # (o*n - r*c)^2 / (n*r*c) — exactly ONE factor of n (the first
    # draft divided by n twice on BOTH engines and sailed through the
    # differential gate; the hand-computed 2x2 perfect-association
    # test below caught it. Shared-bug risk is why semantics tests
    # exist.)
    t9 = F.floor(
        diff
        * diff
        / ((F.col("n") * F.col("r")).cast("double") * F.col("c").cast("double"))
        * 1e9
    ).cast("bigint")
    terms = dense.select(t9.alias("t9"), "n")
    s = terms.agg(
        F.sum("t9").alias("chi9"), F.max("n").alias("n")
    ).crossJoin(
        F.broadcast(
            rows_.agg(F.count(F.lit(1)).alias("nr")).crossJoin(
                cols_.agg(F.count(F.lit(1)).alias("nc"))
            )
        )
    )
    return s.select(
        "n",
        "nr",
        "nc",
        (F.col("chi9").cast("double") / 1e9).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        (
            F.floor(
                F.sqrt(
                    F.col("chi9").cast("double")
                    / 1e9
                    / (
                        F.col("n").cast("double")
                        * F.least(F.col("nr") - 1, F.col("nc") - 1).cast(
                            "double"
                        )
                    )
                )
                * 1e4
                + 1e-6
            )
            / 1e4
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# corpus_js_divergence — distributional drift between sources
# ---------------------------------------------------------------------------

@query(
    "corpus_js_divergence",
    # Jensen-Shannon divergence between every source pair's unigram
    # distributions: per-term contributions 0.5*p*ln(p/m) +
    # 0.5*q*ln(q/m) snap to a 1e-12 integer grid, so the vocabulary-
    # sized sum is order-free int64 (libm 1-ulp flips at the grid are
    # ~1e-12 each — invisible at the 1e-4 output grid)
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_DTOKS}) AS term FROM documents),
    tc AS (SELECT source, term, COUNT(*)::BIGINT AS y
           FROM tok GROUP BY source, term),
    tot AS (SELECT source, SUM(y)::BIGINT AS n FROM tc GROUP BY source),
    pairs AS (SELECT a.term,
                     a.source AS source_a, b.source AS source_b,
                     a.y AS ya, b.y AS yb
              FROM tc a JOIN tc b
                ON a.term = b.term AND a.source < b.source),
    allpairs AS (
        SELECT term, source_a, source_b, ya, yb FROM pairs
        UNION ALL
        SELECT tc.term, tc.source AS source_a, o.source AS source_b,
               tc.y AS ya, 0::BIGINT AS yb
        FROM tc CROSS JOIN tot o
        WHERE tc.source < o.source
          AND NOT EXISTS (SELECT 1 FROM tc b WHERE b.term = tc.term
                          AND b.source = o.source)
        UNION ALL
        SELECT tc.term, o.source AS source_a, tc.source AS source_b,
               0::BIGINT AS ya, tc.y AS yb
        FROM tc CROSS JOIN tot o
        WHERE o.source < tc.source
          AND NOT EXISTS (SELECT 1 FROM tc a WHERE a.term = tc.term
                          AND a.source = o.source)
    ),
    terms AS (SELECT p.source_a, p.source_b,
                     FLOOR((
                       CASE WHEN p.ya > 0 THEN
                         0.5 * (p.ya::DOUBLE / na.n::DOUBLE)
                         * ln((p.ya::DOUBLE / na.n::DOUBLE)
                              / ((p.ya::DOUBLE / na.n::DOUBLE
                                  + p.yb::DOUBLE / nb.n::DOUBLE) / 2))
                       ELSE 0 END
                       +
                       CASE WHEN p.yb > 0 THEN
                         0.5 * (p.yb::DOUBLE / nb.n::DOUBLE)
                         * ln((p.yb::DOUBLE / nb.n::DOUBLE)
                              / ((p.ya::DOUBLE / na.n::DOUBLE
                                  + p.yb::DOUBLE / nb.n::DOUBLE) / 2))
                       ELSE 0 END) * 1e12)::BIGINT AS t12
              FROM allpairs p
              JOIN tot na ON p.source_a = na.source
              JOIN tot nb ON p.source_b = nb.source)
    SELECT source_a, source_b,
           FLOOR(SUM(t12)::DOUBLE / 1e12 * 1e4 + 1e-6) / 1e4
               AS js_divergence
    FROM terms GROUP BY source_a, source_b
    """,
)
def corpus_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence between every pair of source unigram
    distributions — the DISTRIBUTIONAL drift measure that complements
    corpus_source_overlap's set-based Jaccard (two sources can share
    vocabulary yet use it with wildly different frequencies; JS sees
    that, Jaccard cannot). Terms absent from one source contribute
    their full 0.5*p*ln(2) mass via the zero-filled side. Each
    per-term contribution is a fixed IEEE tree snapped to a 1e-12
    integer grid, making the vocabulary-sized per-pair sum an
    ORDER-FREE int64 cumsum; a 1-ulp libm disagreement flips a term's
    grid cell with probability ~ulp/grid and shifts the sum by 1e-12
    — invisible at the 1e-4 nudged output grid. Shape: (source, term)
    counts, a vocabulary-sized pair join (sources-squared fanout per
    term, dimension-bounded), one hash aggregate per pair. 0 <= JS <=
    ln(2) in nats."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    tc = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("y"))
    tot = tc.groupBy("source").agg(F.sum("y").alias("n"))
    # dense (term x source) matrix with zero fill, so one-sided terms
    # carry their mass without EXISTS anti-joins
    terms_dim = tc.select("term").distinct()
    dense = (
        terms_dim.crossJoin(F.broadcast(tot))
        .join(tc, ["term", "source"], "left")
        .select(
            "term",
            "source",
            "n",
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    a, b = dense.alias("a"), dense.alias("b")
    p = F.col("a.y").cast("double") / F.col("a.n").cast("double")
    q = F.col("b.y").cast("double") / F.col("b.n").cast("double")
    m = (p + q) / 2
    contrib = F.when(F.col("a.y") > 0, 0.5 * p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("b.y") > 0, 0.5 * q * F.log(q / m)).otherwise(F.lit(0.0))
    pairs = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .filter((F.col("a.y") > 0) | (F.col("b.y") > 0))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.floor(contrib * 1e12).cast("bigint").alias("t12"),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        (
            F.floor(F.sum("t12").cast("double") / 1e12 * 1e4 + 1e-6) / 1e4
        ).alias("js_divergence")
    )


# ---------------------------------------------------------------------------
# events_rank_stability_rbo — rank-biased overlap between weekly top-20s
# ---------------------------------------------------------------------------

# Tail weights W[m] = sum_{d=m}^{20} 0.9^(d-1)/d, PRE-SCALED to 1e15
# integers in Python so both engines sum the SAME integer literals —
# zero float accumulation anywhere in the metric.
_RBO_W15 = [
    2514833037385551, 1514833037385550, 1064833037385551, 794833037385551,
    612583037385551, 481363037385551, 382948037385551, 307027894528408,
    247240782028408, 199411092028408, 160669043128408, 128971003119317,
    102820120111817, 81094771151740, 62938586663676, 47687391693702,
    34819195937786, 23919077179834, 14653976235575, 6754258588364,
]
_RBO_CASE_SQL = "CASE GREATEST(rank_now, rank_prev) " + " ".join(
    f"WHEN {m} THEN {w}" for m, w in enumerate(_RBO_W15, start=1)
) + " END"


@query(
    "events_rank_stability_rbo",
    # rank-biased overlap (Webber et al. 2010, p=0.9, depth 20)
    # between this week's and last week's item top-20: each shared
    # item contributes a PRECOMPUTED integer weight by the deeper of
    # its two ranks; the sum is exact int64 and RBO is one literal
    # division — no float ever accumulates
    oracle=f"""
    WITH h AS (SELECT CAST(MAX(ts) AS DATE) AS end_day FROM events),
    e AS (SELECT json_extract_string(props, '$.k')::INT AS item,
                 CAST(ts AS DATE) AS day
          FROM events),
    cur AS (SELECT item, COUNT(*)::BIGINT AS n FROM e CROSS JOIN h
            WHERE day > end_day - INTERVAL 7 DAY GROUP BY item),
    prev AS (SELECT item, COUNT(*)::BIGINT AS n FROM e CROSS JOIN h
             WHERE day <= end_day - INTERVAL 7 DAY
               AND day > end_day - INTERVAL 14 DAY GROUP BY item),
    rc AS (SELECT item, ROW_NUMBER() OVER (ORDER BY n DESC, item)
                      AS rank_now FROM cur),
    rp AS (SELECT item, ROW_NUMBER() OVER (ORDER BY n DESC, item)
                      AS rank_prev FROM prev),
    shared AS (SELECT {_RBO_CASE_SQL} AS w15
               FROM rc JOIN rp USING (item)
               WHERE rank_now <= 20 AND rank_prev <= 20)
    SELECT COUNT(*)::BIGINT AS n_common,
           0.1 * SUM(w15)::DOUBLE / 1e15 AS rbo
    FROM shared
    """,
)
def events_rank_stability_rbo(spark, sf_dir):
    """Rank-biased overlap (Webber et al. 2010; p = 0.9, depth 20)
    between this week's and last week's item popularity top-20 — the
    principled week-over-week rank-stability score that
    events_trending_items eyeballs (RBO weights agreement at the top
    of the list geometrically, exactly how attention works). The
    implementation makes the metric FLOAT-FREE: each shared item's
    contribution sum_{d=max_rank}^{20} p^(d-1)/d is one of 20
    PRECOMPUTED integer literals (scaled 1e15, identical constants in
    the Spark expression and the oracle SQL), so the per-item sum is
    exact int64 and RBO = (1-p) * sum / 1e15 is a single literal
    division. Rankings themselves are integer (count DESC, item).
    Shape: two item-grained aggregates + dimension windows + one join;
    raw events scan is the only data-sized stage."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.agg(F.max(F.col("ts").cast("date")).alias("end_day"))
    e = ev.select(
        F.get_json_object("props", "$.k").cast("int").alias("item"),
        F.col("ts").cast("date").alias("day"),
    ).crossJoin(F.broadcast(h))
    cur = (
        e.filter(F.col("day") > F.date_sub("end_day", 7))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    prev = (
        e.filter(
            (F.col("day") <= F.date_sub("end_day", 7))
            & (F.col("day") > F.date_sub("end_day", 14))
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rc = cur.select(
        "item",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), "item"))
        .alias("rank_now"),
    )
    rp = prev.select(
        "item",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), "item"))
        .alias("rank_prev"),
    )
    w15 = F.element_at(
        F.array(*[F.lit(w) for w in _RBO_W15]),
        F.greatest("rank_now", "rank_prev"),
    )
    shared = (
        rc.join(rp, "item")
        .filter((F.col("rank_now") <= 20) & (F.col("rank_prev") <= 20))
        .select(w15.alias("w15"))
    )
    return shared.agg(
        F.count(F.lit(1)).alias("n_common"),
        (F.lit(0.1) * F.sum("w15").cast("double") / 1e15).alias("rbo"),
    )


# ---------------------------------------------------------------------------
# events_markov_backtest — next-event prediction accuracy, time-split
# ---------------------------------------------------------------------------

@query(
    "events_markov_backtest",
    # first-order Markov next-event-type model: train on transitions
    # whose successor falls in the first 23 observed days, predict by
    # integer-argmax (count DESC, type ASC), score on transitions whose
    # successor falls in the last 7 days — the temporal split every
    # sequence model is actually evaluated with. All counts int64,
    # accuracy is one division
    oracle="""
    WITH h AS (SELECT CAST(MAX(ts) AS DATE) AS end_day FROM events),
    seq AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day,
                   LEAD(event_type) OVER w AS next_type,
                   CAST(LEAD(ts) OVER w AS DATE) AS next_day
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    pairs AS (SELECT s.event_type AS prev, s.next_type AS nxt, s.next_day
              FROM seq s WHERE s.next_type IS NOT NULL),
    train AS (SELECT prev, nxt, COUNT(*)::BIGINT AS c
              FROM pairs CROSS JOIN h
              WHERE next_day <= end_day - INTERVAL 7 DAY
              GROUP BY prev, nxt),
    pred AS (SELECT prev, nxt AS pred_type FROM (
               SELECT prev, nxt,
                      ROW_NUMBER() OVER (PARTITION BY prev
                                         ORDER BY c DESC, nxt) AS rk
               FROM train) WHERE rk = 1),
    test AS (SELECT p.prev, p.nxt FROM pairs p CROSS JOIN h
             WHERE p.next_day > h.end_day - INTERVAL 7 DAY)
    SELECT t.prev AS prev_type, pr.pred_type,
           COUNT(*)::BIGINT AS n_test,
           SUM(CASE WHEN t.nxt = pr.pred_type THEN 1 ELSE 0 END)::BIGINT
               AS hits,
           SUM(CASE WHEN t.nxt = pr.pred_type THEN 1 ELSE 0 END)::DOUBLE
               / COUNT(*) AS accuracy
    FROM test t JOIN pred pr ON t.prev = pr.prev
    GROUP BY t.prev, pr.pred_type
    """,
)
def events_markov_backtest(spark, sf_dir):
    """First-order Markov next-event prediction with an honest
    TEMPORAL backtest: the transition model trains on pairs whose
    successor lands before the final 7 observed days and is scored
    only on pairs whose successor lands inside them — the split every
    production sequence model is actually judged by (random splits
    leak; events_transition_matrix describes the chain, this measures
    its predictive power). The per-state rule is the integer argmax
    (count DESC, type ASC) — no float ordering — and accuracy is one
    IEEE division of exact counts. Test pairs whose previous state
    never occurred in training are excluded by the inner join (no
    model, no score). Shape: one per-user ordered window builds ALL
    transitions in a single pass; train/test are filters off a shared
    one-row horizon broadcast; the model table is |types|^2 and
    broadcasts. At 100 TB the user-keyed window shuffle is the only
    data-sized stage."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.agg(F.max(F.col("ts").cast("date")).alias("end_day"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead(F.col("ts").cast("date")).over(w).alias("next_day"),
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.crossJoin(F.broadcast(h))
    train = (
        pairs.filter(F.col("next_day") <= F.date_sub("end_day", 7))
        .groupBy(F.col("event_type").alias("prev"), F.col("next_type").alias("nxt"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pred = (
        train.select(
            "prev",
            "nxt",
            F.row_number()
            .over(
                Window.partitionBy("prev").orderBy(F.col("c").desc(), "nxt")
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select("prev", F.col("nxt").alias("pred_type"))
    )
    test = pairs.filter(F.col("next_day") > F.date_sub("end_day", 7)).select(
        F.col("event_type").alias("prev"), F.col("next_type").alias("nxt")
    )
    hit = F.sum(
        F.when(F.col("nxt") == F.col("pred_type"), 1).otherwise(0)
    )
    return (
        test.join(F.broadcast(pred), "prev")
        .groupBy(F.col("prev").alias("prev_type"), "pred_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            hit.cast("bigint").alias("hits"),
            (hit.cast("double") / F.count(F.lit(1))).alias("accuracy"),
        )
    )


# ---------------------------------------------------------------------------
# stats_brown_forsythe — variance-equality test across groups
# ---------------------------------------------------------------------------

@query(
    "stats_brown_forsythe",
    # Brown-Forsythe (median-based Levene): z = |2x - (m1+m2)| uses
    # DOUBLED medians so ties stay integral; per-group moment terms
    # S2 - S1^2/n and S1^2/n are fixed IEEE trees snapped to a 1e-3
    # integer grid, so the cross-group sums are order-free int64 and
    # F is one fixed tree over exact integers
    oracle=f"""
    WITH c AS (SELECT event_type, {_CENTS} AS x FROM events),
    r AS (SELECT event_type, x,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type)::BIGINT AS n
          FROM c),
    med AS (SELECT event_type,
                   (MAX(CASE WHEN rn = (n + 1) // 2 THEN x END)
                    + MAX(CASE WHEN rn = n // 2 + 1 THEN x END))::BIGINT
                       AS med2
            FROM r GROUP BY event_type),
    z AS (SELECT c.event_type, ABS(2 * c.x - m.med2)::BIGINT AS z
          FROM c JOIN med m ON c.event_type = m.event_type),
    g AS (SELECT event_type, COUNT(*)::BIGINT AS nj,
                 SUM(z)::BIGINT AS s1, SUM(z * z)::BIGINT AS s2
          FROM z GROUP BY event_type),
    gg AS (SELECT nj, s1,
                  FLOOR((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / nj::DOUBLE)
                        * 1e3)::BIGINT AS w3,
                  FLOOR(s1::DOUBLE * s1::DOUBLE / nj::DOUBLE * 1e3)::BIGINT
                      AS b3
           FROM g),
    s AS (SELECT COUNT(*)::BIGINT AS k, SUM(nj)::BIGINT AS n_total,
                 SUM(s1)::BIGINT AS s1_all,
                 SUM(w3)::BIGINT AS ssw3, SUM(b3)::BIGINT AS sb3
          FROM gg)
    SELECT k, n_total,
           CASE WHEN ssw3 = 0 THEN NULL
                ELSE FLOOR((sb3 - FLOOR(s1_all::DOUBLE * s1_all::DOUBLE
                                        / n_total::DOUBLE * 1e3))::DOUBLE
                           / ssw3::DOUBLE
                           * ((n_total - k)::DOUBLE / (k - 1)::DOUBLE)
                           * 1e4 + 1e-6) / 1e4
           END AS f_stat
    FROM s
    """,
)
def stats_brown_forsythe(spark, sf_dir):
    """Brown-Forsythe test (the median-based Levene) for equality of
    value-spread across event types — the variance-homogeneity check
    that completes the A/B family (stats_srm_check gates the split,
    KS/Mann-Whitney/Welch compare locations, this compares
    dispersions; it is also Welch's own applicability screen).
    Deviations use DOUBLED group medians z = |2x - (m1+m2)| so
    even-group medians stay exactly integral; per-group sum-of-squares
    terms are fixed IEEE trees over exact int64 moments, snapped to a
    1e-3 integer grid so the cross-group sums are ORDER-FREE (five
    doubles summed in engine-chosen order would not be); the F
    statistic is one fixed tree over the gridded integers (the grid
    scale cancels in the ratio), floor-gridded + nudged. A zero
    within-group spread pins F to NULL explicitly on both engines.
    Shape: one per-type sort for the median ranks, one broadcast-sized
    median join back, two hash aggregates — partition-parallel at any
    scale (the per-type sort swaps for operators/rank.py's two-pass
    rank when a group outgrows a partition)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", _cents().alias("x"))
    wp = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "x",
        F.row_number().over(wp.orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
    )
    med = r.groupBy("event_type").agg(
        (
            F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("x")))
            + F.max(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("x")))
        )
        .cast("bigint")
        .alias("med2")
    )
    z = c.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("x") - F.col("med2")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("z").alias("s1"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    gg = g.select(
        "nj",
        "s1",
        F.floor(
            (F.col("s2").cast("double") - s1d * s1d / F.col("nj").cast("double"))
            * 1e3
        )
        .cast("bigint")
        .alias("w3"),
        F.floor(s1d * s1d / F.col("nj").cast("double") * 1e3)
        .cast("bigint")
        .alias("b3"),
    )
    s = gg.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("nj").alias("n_total"),
        F.sum("s1").alias("s1_all"),
        F.sum("w3").alias("ssw3"),
        F.sum("b3").alias("sb3"),
    )
    s1a = F.col("s1_all").cast("double")
    ssb3 = F.col("sb3") - F.floor(
        s1a * s1a / F.col("n_total").cast("double") * 1e3
    )
    f = (
        ssb3.cast("double")
        / F.col("ssw3").cast("double")
        * (
            (F.col("n_total") - F.col("k")).cast("double")
            / (F.col("k") - 1).cast("double")
        )
    )
    return s.select(
        "k",
        "n_total",
        F.when(F.col("ssw3") == 0, F.lit(None).cast("double"))
        .otherwise(F.floor(f * 1e4 + 1e-6) / 1e4)
        .alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# text_pmi_pairs — pointwise mutual information of co-occurring tokens
# ---------------------------------------------------------------------------

@query(
    "text_pmi_pairs",
    # document-level PMI: with N docs, c_a = docs containing a,
    # c_ab = docs containing both, pmi = ln(N*c_ab / (c_a*c_b)).
    # The ln argument is ONE division of exact integers -> identical
    # doubles; the ln output floor-grids at 1e-4 with the +1e-6 nudge
    # (the herdan_c device). Membership in the output is decided by
    # INTEGER support alone (c_ab >= 10). The per-doc token set is
    # CAPPED at the 64 highest-tf tokens (tf DESC, token ASC — the
    # rec_item_cooccur cap device) so the pair explode is bounded at
    # 64^2/2 per doc no matter how wide a real document's vocabulary
    # is; the cap is applied identically in this oracle
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_DTOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
           FROM tok GROUP BY doc_id, term),
    capped AS (SELECT doc_id, term FROM (
                 SELECT doc_id, term,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY tf DESC, term) AS rn
                 FROM tf) WHERE rn <= 64),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
    ca AS (SELECT term, COUNT(*)::BIGINT AS c FROM capped GROUP BY term),
    cab AS (SELECT a.term AS term_a, b.term AS term_b,
                   COUNT(*)::BIGINT AS c_ab
            FROM capped a JOIN capped b
              ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY 1, 2)
    SELECT cab.term_a, cab.term_b, cab.c_ab, x.c AS c_a, y.c AS c_b,
           FLOOR(ln((nn.n * cab.c_ab)::DOUBLE / (x.c * y.c)::DOUBLE)
                 * 1e4 + 1e-6) / 1e4 AS pmi
    FROM cab JOIN ca x ON cab.term_a = x.term
             JOIN ca y ON cab.term_b = y.term
             CROSS JOIN nn
    WHERE cab.c_ab >= 10
    """,
)
def text_pmi_pairs(spark, sf_dir):
    """Document-level pointwise mutual information of token pairs —
    the collocation / association primitive behind phrase mining and
    embedding-training diagnostics: pmi(a,b) = ln(N*c_ab / (c_a*c_b))
    over per-doc distinct-token sets, emitted for every pair with
    support c_ab >= 10 (INTEGER membership — no float decides the row
    set). Exactness: counts are exact int64, the ln argument is one
    IEEE division of exact integers (identical doubles cross-engine),
    and the ln output floor-grids at 1e-4 with the +1e-6 nudge — the
    repo's standard libm discipline. Scale design: the per-doc token
    set is capped at the 64 highest-tf tokens (tf DESC, token ASC —
    the same cap device as rec_item_cooccur / graph_triangles, and
    identical in the oracle), bounding the per-doc pair explode at
    64^2/2 regardless of document width; pair counts hash-aggregate
    with map-side combine (vocab^2-bounded, support-filtered); the
    unigram-count joins are broadcast at fixture scale and stated
    sort-merge-on-term at a 100 TB vocabulary."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    wcap = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("term")
    )
    capped = (
        tf.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 64)
        .select("doc_id", "term")
        # pinned (r11): three consumers (unigram counts + both pair
        # self-join sides) would each re-run tokenize + tf + cap
        .localCheckpoint(eager=False)
    )
    nn = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ca = capped.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    a, b = capped.alias("a"), capped.alias("b")
    cab = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 10)
    )
    x = ca.select(F.col("term").alias("term_a"), F.col("c").alias("c_a"))
    y = ca.select(F.col("term").alias("term_b"), F.col("c").alias("c_b"))
    return (
        cab.join(F.broadcast(x), "term_a")
        .join(F.broadcast(y), "term_b")
        .crossJoin(F.broadcast(nn))
        .select(
            "term_a",
            "term_b",
            "c_ab",
            "c_a",
            "c_b",
            (
                F.floor(
                    F.log(
                        (F.col("n") * F.col("c_ab")).cast("double")
                        / (F.col("c_a") * F.col("c_b")).cast("double")
                    )
                    * 1e4
                    + 1e-6
                )
                / 1e4
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_mix_plan — domain-reweighting plan against a token budget
# ---------------------------------------------------------------------------

# target mixture shares in integer percent (planning constants, shared
# verbatim with the oracle); unknown languages get share 0
_MIX_SHARES = {"en": 40, "zh": 15, "es": 15, "de": 15, "fr": 15}


@query(
    "corpus_mix_plan",
    # per-language exact token counts -> integer target allocation
    # target_l = floor(budget * share / 100) with budget = floor(T/2)
    # -> alloc = min(tokens, target), deficit = target - alloc, and
    # the per-doc sampling rate floor(alloc*1e6/tokens) — every output
    # integer except the one-division rate; all shares are constants
    oracle=f"""
    WITH t AS (SELECT lang,
                      SUM(len(list_filter(string_split_regex(
                              lower(trim(text)), '\\s+'), x -> x <> '')))
                          ::BIGINT AS tokens
               FROM documents GROUP BY lang),
    tot AS (SELECT (SUM(tokens) // 2)::BIGINT AS budget FROM t),
    p AS (SELECT t.lang, t.tokens,
                 (tot.budget * (CASE t.lang
                     {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_SHARES.items())}
                     ELSE 0 END)) // 100 AS target
          FROM t CROSS JOIN tot)
    SELECT lang, tokens, target::BIGINT AS target,
           LEAST(tokens, target)::BIGINT AS alloc,
           (target - LEAST(tokens, target))::BIGINT AS deficit,
           (LEAST(tokens, target) * 1000000 // tokens)::BIGINT
               AS rate_micro
    FROM p
    """,
)
def corpus_mix_plan(spark, sf_dir):
    """Data-mixing plan: per-language sampling rates that hit a target
    mixture (40% en / 15% each zh-es-de-fr, planning constants shared
    with the oracle) within a token budget of half the corpus — the
    static domain-reweighting step every multi-source training
    pipeline runs before sampling (the DoReMi-style learned weights
    replace the constants; the allocation arithmetic is identical).
    Exactness: per-language token counts are exact int64 over the
    whitespace tokenizer; target = floor(budget*share/100), alloc =
    min(tokens, target), deficit, and the per-doc sampling rate
    floor(alloc*1e6/tokens) take only integer inputs. Stated bound
    (ADVICE r10): Spark computes budget, target, and rate_micro via
    DOUBLE division (bigint/int), exact only below 2^53 total tokens
    (~9e15 — thousands of times this corpus; DuckDB's // path is
    integer the whole way), and alloc*1e6 wraps int64 past ~9.2e12
    tokens per language. Beyond those bounds the fold belongs in
    DECIMAL(38,0)/HUGEINT like eval_brier_decomposition — documented
    rather than applied because the decimal fold costs cycles on every
    run for headroom 3 orders of magnitude beyond the target scale.
    Shape: one data-sized map (token count per
    doc) into a |langs|-group hash aggregate with map-side combine,
    then broadcast-sized planning math — the cheapest distributed
    shape at any corpus size; a deficit > 0 row tells the operator
    which domain under-fills its quota (upsample or relax share)."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("lang").agg(
        F.sum(F.size(T.tokens(F.col("text"))).cast("long"))
        .cast("bigint")
        .alias("tokens")
    )
    tot = t.agg(
        F.floor(F.sum("tokens") / 2).cast("bigint").alias("budget")
    )
    share = F.lit(0)
    for k, v in _MIX_SHARES.items():
        share = F.when(F.col("lang") == k, v).otherwise(share)
    p = t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "tokens",
        F.floor(F.col("budget") * share / 100).cast("bigint").alias("target"),
    )
    alloc = F.least(F.col("tokens"), F.col("target"))
    return p.select(
        "lang",
        "tokens",
        "target",
        alloc.cast("bigint").alias("alloc"),
        (F.col("target") - alloc).cast("bigint").alias("deficit"),
        F.floor(alloc * 1000000 / F.col("tokens"))
        .cast("bigint")
        .alias("rate_micro"),
    )
