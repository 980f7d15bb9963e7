"""Analytics extension queries: TF-IDF, exact quantiles, pivot,
range-frame rolling windows, latest-wins compaction, grouping sets.

Each is a staple the reference lacks but any warehouse-grade engine
needs (SURVEY.md §2.5/§2.6 'absent' rows); every entry here carries an
exact DuckDB oracle. Spark-side plans are pure built-in Column
expressions — no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import tfidf as TI
from ..sources import load_table
from . import query

# DuckDB token fragment shared with extensions.py (functions/text.py::tokens)
_DTOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_DTOKS}) AS term FROM documents WHERE doc_id <= 200
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id <= 200),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * ln(n.n_docs / df.df), 4) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, rank, score FROM (
        SELECT doc_id, term, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rank
        FROM scored
    ) WHERE rank <= 3 AND doc_id <= 20
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document; corpus statistics (df, N) over
    the doc_id <= 200 slice, output bounded to doc_id <= 20."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    return TI.top_terms(docs, k=3).filter(F.col("doc_id") <= 20)


@query(
    "stats_quantiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95
    FROM orders GROUP BY o_orderstatus
    """,
)
def stats_quantiles(spark, sf_dir):
    """Exact linear-interpolated percentiles per group (matches DuckDB
    quantile_cont). Exact percentile sorts within each group — right
    for a bounded group count; at 100 TB swap in approx_percentile
    (t-digest, mergeable, single pass) when ±0.1% error is fine."""
    orders = load_table(spark, sf_dir, "orders")
    qs = {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p95": 0.95}
    return orders.groupBy("o_orderstatus").agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(p)), 2).alias(name)
            for name, p in qs.items()
        ]
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_counts",
    oracle="""
    SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'view') AS view
    FROM events GROUP BY d
    """,
)
def pivot_event_counts(spark, sf_dir):
    """Day × event-type count matrix. Pivot values are pinned (not
    inferred), so the plan is ONE aggregation — no extra distinct scan
    to discover columns, and the output schema is stable at any scale."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot yields NULL for empty cells; the oracle's FILTER count yields 0
    return piv.select(
        "d", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@query(
    "events_rolling_7d",
    # CAST(floor(epoch(ts)) ...) not epoch(ts)::BIGINT: DuckDB's cast
    # ROUNDS fractional seconds while Spark's ts.cast('long') TRUNCATES
    # — with sub-second micros in every timestamp, rounding would shift
    # ~half the range keys by 1s vs the Spark side.
    # Signed-event decomposition (r10): each event contributes +cents
    # at its second s and -cents at s + 604801 (first second outside
    # the trailing frame [t-604800, t]); the rolling sum at second t is
    # then the per-user RUNNING total of the signed deltas — a
    # cumulative frame both engines compute incrementally, instead of
    # the sliding RANGE frame Spark re-aggregates per row (O(n*frame):
    # measured 33 s on the genu10 hot-user corpus vs ~2 s decomposed).
    # Exact int64 cents make the regrouped addition order-free;
    # NULL-valued events contribute 0 by convention, identically here
    oracle="""
    WITH e AS (SELECT user_id, event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS k,
                      COALESCE(FLOOR(value * 100 + 0.5)::BIGINT, 0) AS c
               FROM events WHERE user_id < 20),
    sgn AS (SELECT user_id, event_id, k, c FROM e
            UNION ALL
            SELECT user_id, NULL, k + 604801, -c FROM e),
    run AS (SELECT user_id, event_id,
                   (SUM(c) OVER (PARTITION BY user_id ORDER BY k
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW))::BIGINT AS rc
            FROM sgn)
    SELECT user_id, event_id, rc::DOUBLE / 100.0 AS roll_sum
    FROM run WHERE event_id IS NOT NULL
    """,
)
def events_rolling_7d(spark, sf_dir):
    """7-day rolling sum of value per user — time-based (RANGE-frame
    semantics: all peer rows at the same second aggregate identically),
    computed by the SIGNED-EVENT decomposition instead of a sliding
    frame: every event contributes +cents at its second and -cents at
    the first second past the trailing window; the rolling sum at an
    event's second is then the per-user RUNNING (unbounded-preceding
    RANGE) total over the signed rows — peers at the same second share
    the frame, so the original (+) rows read their answer directly and
    the synthetic (-) rows are filtered out after the window. No join
    back, no regrouping: ONE shuffle on user_id.

    Why not `RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW` directly:
    Spark's sliding aggregate frames have no retraction — every row
    re-aggregates its whole frame, O(n * frame_size) per user, which
    the r10 hot-user rehearsal measured at 33 s on genu10 (one bot
    user holding ~68k events) vs ~2 s for this decomposition; the
    running frame both engines maintain incrementally. Exact integer
    cents make the reordered addition order-free cross-engine, and the
    final /100.0 is one IEEE division of identical ints. NULL-valued
    events contribute 0 (an all-NULL frame reports 0.0 rather than
    NULL — the decomposition convention, identical in the oracle).
    Shape: one union (2n rows), one user-keyed shuffle, one
    incremental window pass, one filter — every step linear."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    e = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("k"),
        F.coalesce(
            F.floor(F.col("value") * 100 + 0.5).cast("bigint"), F.lit(0)
        ).alias("c"),
    )
    sgn = e.unionByName(
        e.select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            (F.col("k") + 604801).alias("k"),
            (-F.col("c")).alias("c"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("k")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        sgn.select(
            "user_id",
            "event_id",
            F.sum("c").over(w).cast("bigint").alias("rc"),
        )
        .filter(F.col("event_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            (F.col("rc").cast("double") / 100.0).alias("roll_sum"),
        )
    )


@query(
    "events_latest_by_key",
    oracle="""
    SELECT user_id, event_id, event_type, ROUND(value, 2) AS value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def events_latest_by_key(spark, sf_dir):
    """Latest-wins compaction (SCD-1 / CDC upsert resolution): keep
    each key's most recent row. max_by over a composite (ts, event_id)
    order key is a single hash aggregation — partial max runs
    map-side, so the shuffle carries one candidate row per (key ×
    map partition) instead of sorting every version of every key the
    way the row_number() formulation does."""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("r")
    )
    return latest.select(
        "user_id",
        F.col("r.event_id").alias("event_id"),
        F.col("r.event_type").alias("event_type"),
        F.round(F.col("r.value"), 2).alias("value"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
           COUNT(*) AS n, SUM(n_chars)::BIGINT AS chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS (not the cube/rollup lattice): per-lang,
    per-source, and grand totals in ONE Expand + one shuffle — three
    aggregation levels without three scans."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupingSets([["lang"], ["source"], []], "lang", "source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").cast("long").alias("chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "n",
            "chars",
        )
    )


@query(
    "doc_chunk_split",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DTOKS} AS toks FROM documents),
    c AS (SELECT doc_id, toks,
                 unnest(range(CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS chunk_id
          FROM d WHERE len(toks) > 0)
    SELECT doc_id, chunk_id,
           len(list_slice(toks, chunk_id * 64 + 1, chunk_id * 64 + 64)) AS n_tok,
           toks[chunk_id * 64 + 1] AS first_tok,
           toks[LEAST(len(toks), chunk_id * 64 + 64)] AS last_tok
    FROM c
    """,
)
def doc_chunk_split(spark, sf_dir):
    """Context-window chunking: 64-token chunks per document (map +
    explode, no shuffle — see operators/sampling.py)."""
    from ..operators import sampling as SA

    return SA.chunk_documents(load_table(spark, sf_dir, "documents"), chunk_tokens=64)


@query(
    "events_gap_fill",
    oracle="""
    WITH daily AS (
        SELECT user_id AS k, CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
               ROUND(SUM(value), 2) AS sv
        FROM events WHERE user_id < 10 GROUP BY k, d),
    spine AS (
        SELECT k, unnest(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY))::DATE AS d
        FROM daily GROUP BY k),
    j AS (SELECT s.k, s.d, daily.sv FROM spine s LEFT JOIN daily USING (k, d))
    SELECT k AS user_id, d, sv,
           last_value(sv IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
           sv IS NULL AS is_gap
    FROM j
    """,
)
def events_gap_fill(spark, sf_dir):
    """Regular-grid resample + forward fill per user (gap days flagged;
    see operators/timeseries.py for the scale notes)."""
    from ..operators.timeseries import gap_fill_daily

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return gap_fill_daily(ev)


@query(
    "text_bpe_tokens",
    oracle=f"""
    SELECT lang,
           SUM(len(regexp_extract_all(text,
               '''[a-zA-Z]+| ?[a-zA-Z]+| ?[0-9]{{1,3}}| ?[^a-zA-Z0-9\\s]+')))::BIGINT
               AS bpe_tokens,
           SUM(len({_DTOKS}))::BIGINT AS ws_tokens,
           ROUND(AVG(len(regexp_extract_all(text,
               '''[a-zA-Z]+| ?[a-zA-Z]+| ?[0-9]{{1,3}}| ?[^a-zA-Z0-9\\s]+'))), 2)
               AS avg_bpe
    FROM documents GROUP BY lang
    """,
)
def text_bpe_tokens(spark, sf_dir):
    """Token-budget accounting per lang: BPE-ish pre-tokenizer count
    (functions/text.py::bpe_token_count) next to the whitespace count —
    the number training-data budgets are actually denominated in."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        T.bpe_token_count(F.col("text")).cast("long").alias("bpe"),
        T.token_count(F.col("text")).cast("long").alias("ws"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.round(F.avg("bpe"), 2).alias("avg_bpe"),
    )


@query(
    "pipeline_training_corpus",
    # End-to-end oracle: the same five stages in DuckDB SQL. Grams are
    # compared as strings here vs 64-bit hashes in Spark — identical
    # doc sets barring ~n²/2⁶⁴ hash-collision odds.
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, text FROM documents
        WHERE length(text) > 100 AND source <> 'src0'),
    fp AS (
        SELECT doc_id, lang, text,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
        FROM base),
    surv AS (
        SELECT doc_id, lang, text FROM fp
        QUALIFY ROW_NUMBER() OVER (PARTITION BY f ORDER BY doc_id) = 1),
    bt AS (SELECT {_DTOKS} AS t FROM documents WHERE source = 'src0'),
    bgrams AS (
        SELECT DISTINCT array_to_string(t[i:i+3], ' ') AS gram
        FROM bt, UNNEST(range(1, greatest(len(t) - 2, 1))) AS u(i)
        WHERE len(t) >= 4),
    st AS (SELECT doc_id, {_DTOKS} AS t FROM surv),
    sgrams AS (
        SELECT doc_id, array_to_string(t[i:i+3], ' ') AS gram
        FROM st, UNNEST(range(1, greatest(len(t) - 2, 1))) AS u(i)
        WHERE len(t) >= 4),
    cont AS (SELECT DISTINCT doc_id FROM sgrams JOIN bgrams USING (gram)),
    clean AS (
        SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
    samp AS (
        SELECT * FROM clean
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT <
              CASE WHEN lang = 'en' THEN CAST(0.25 * 65536 AS INT)
                   ELSE 65536 END),
    tok AS (SELECT doc_id, lang, len({_DTOKS})::BIGINT AS n_tokens FROM samp),
    packs AS (
        SELECT lang, n_tokens,
               ((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                // 512)::BIGINT AS pack_id
        FROM tok)
    SELECT lang, COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT pack_id)::BIGINT AS n_packs,
           SUM(n_tokens)::BIGINT AS total_tokens
    FROM packs GROUP BY lang
    """,
)
def pipeline_training_corpus(spark, sf_dir):
    """Flagship composition — the whole training-data pipeline in one
    oracle-checked plan: quality gate -> exact dedup (keep lowest id
    per fingerprint) -> benchmark decontamination (drop docs sharing a
    word 4-gram with the src0 corpus) -> deterministic stratified
    sample (25% of English, all of the rest) -> 512-token sequence
    packing -> per-lang corpus accounting.

    Every stage is the operator the standalone queries test
    individually (functions/text.fingerprint, operators/decontaminate,
    operators/sampling); composing them stays ONE Catalyst plan — no
    materialization barriers between stages, so column pruning and
    filter pushdown work across stage boundaries.
    """
    from ..functions import text as T
    from ..operators import decontaminate as DC
    from ..operators import sampling as SP

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter((F.length("text") > 100) & (F.col("source") != "src0"))
    # exact dedup: survivor = lowest doc_id per canonical fingerprint
    surv_ids = (
        base.select("doc_id", T.fingerprint(F.col("text")).alias("f"))
        .groupBy("f")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = base.join(surv_ids, "doc_id", "left_semi")
    bench = docs.filter(F.col("source") == "src0")
    dirty = DC.contaminated_docs(surv, bench, n=4).select("doc_id")
    clean = surv.join(dirty, "doc_id", "left_anti")
    samp = SP.sample_hash(
        clean, rate=1.0, stratum_col="lang", stratum_rates={"en": 0.25}
    )
    packed = SP.pack_sequences(samp, budget=512, partition_col="lang")
    return packed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("pack_id").cast("long").alias("n_packs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'view' AND e.ts >= s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
           GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s1)::BIGINT AS n_signup,
           (SELECT COUNT(*) FROM s2)::BIGINT AS n_viewed,
           (SELECT COUNT(*) FROM s3)::BIGINT AS n_purchased
    """,
)
def events_funnel(spark, sf_dir):
    """Sequential conversion funnel (signup -> later view -> later
    purchase): each step keeps users whose step event occurs at or
    after their previous step's first occurrence. Three aggregations
    on the SAME key — co-partitioned after the first shuffle, so the
    step joins add no new exchange of the events table; step counts
    are 1-row aggregates combined with literal cross joins."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").cast("long").alias("n_signup"))
        .crossJoin(s2.agg(F.count("*").cast("long").alias("n_viewed")))
        .crossJoin(s3.agg(F.count("*").cast("long").alias("n_purchased")))
    )


@query(
    "q22_correlated_avg",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n_small,
           ROUND(SUM(l_extendedprice), 2) AS small_rev
    FROM lineitem l
    WHERE l_partkey <= 200
      AND l_quantity < 0.5 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l_partkey
    """,
)
def q22_correlated_avg(spark, sf_dir):
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems under
    half their part's average quantity. Decorrelated the way Catalyst
    would — ONE pass with an average window over l_partkey instead of
    a per-row subquery; the filter and aggregate ride the same
    partitioning, so the whole query is a single shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 200)
    w = Window.partitionBy("l_partkey")
    flagged = li.select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.avg("l_quantity").over(w).alias("avg_qty"),
    ).filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    return flagged.groupBy("l_partkey").agg(
        F.count("*").alias("n_small"),
        F.round(F.sum("l_extendedprice"), 2).alias("small_rev"),
    )


@query(
    "events_outliers",
    oracle="""
    WITH s AS (SELECT user_id, value,
                      AVG(value) OVER (PARTITION BY user_id) AS mu,
                      STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sigma
               FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(*) FILTER (sigma > 0 AND abs(value - mu) > 2.5 * sigma)
               AS n_outliers
    FROM s GROUP BY user_id
    """,
)
def events_outliers(spark, sf_dir):
    """Per-entity z-score outlier flagging (anomalous event values vs
    the entity's own distribution) — the data-quality triage step
    before a value column feeds training. Mean/stddev come from an
    unordered window over the entity key, so the flagging and the
    final count ride ONE shuffle on user_id; no second scan, no join
    of a stats table back onto the events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    w = Window.partitionBy("user_id")
    flagged = ev.select(
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count(
            F.when(
                (F.col("sigma") > 0)
                & (F.abs(F.col("value") - F.col("mu")) > 2.5 * F.col("sigma")),
                1,
            )
        ).alias("n_outliers"),
    )


@query(
    "doc_sample_weighted",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, text, {_DTOKS} AS toks FROM documents),
    m AS (SELECT doc_id, lang,
                 len(toks) AS ntok,
                 CASE WHEN length(text) > 0
                      THEN length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
                           / length(text)
                      ELSE 0.0 END AS alpha_ratio,
                 CASE WHEN len(toks) > 0
                      THEN len(list_filter(toks, x -> list_contains(
                             ['the','a','of','and','to','in','is','it'], x)))::DOUBLE
                           / len(toks)
                      ELSE 0.0 END AS stop_ratio
          FROM t),
    s AS (SELECT doc_id, lang,
                 ROUND(0.5 * least(ntok / 50.0, 1.0)
                       + 0.3 * alpha_ratio
                       + 0.2 * least(stop_ratio * 5, 1.0), 4) AS q
          FROM m),
    kept AS (SELECT * FROM s
             WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT
                   < FLOOR(q * 65536)::INT)
    SELECT lang, COUNT(*)::BIGINT AS kept, ROUND(AVG(q), 4) AS avg_q
    FROM kept GROUP BY lang
    """,
)
def doc_sample_weighted(spark, sf_dir):
    """Quality-weighted importance sampling: each document survives
    with probability equal to its own quality score — deterministic
    (md5-bucket vs floor'd threshold, reproduced exactly by the
    oracle), so the mix is stable across runs and engines. The
    selection-bias effect shows in avg_q of the kept set."""
    from ..operators import sampling as SP
    from ..operators import textstats as X

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang").join(
        X.quality(docs).withColumnRenamed("quality", "q"), "doc_id"
    )
    kept = SP.sample_weighted(scored, "q")
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("kept"),
        F.round(F.avg("q"), 4).alias("avg_q"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH f AS (SELECT user_id, ts,
                      MIN(ts) OVER (PARTITION BY user_id) AS ft
               FROM events),
    w AS (SELECT user_id,
                 CAST(date_trunc('week', ft) AS DATE) AS cohort_week,
                 CAST(date_trunc('week', ts) AS DATE) AS wk
          FROM f)
    SELECT cohort_week,
           (date_diff('day', cohort_week, wk) // 7)::INT AS week_offset,
           COUNT(DISTINCT user_id)::BIGINT AS active_users
    FROM w GROUP BY cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Classic cohort-retention triangle: users grouped by first-seen
    week, counted distinct in each subsequent week offset.

    The first-seen timestamp is a frameless window min over user_id —
    ONE shuffle, no self-join back onto the event stream; the cohort
    rollup is a partial+final distinct-count on a tiny (cohort,
    offset) key space. At 100 TB both wide ops key uniformly (user
    id, then a few hundred cohort cells)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    cohort = F.date_trunc("week", F.min("ts").over(w)).cast("date")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    return (
        ev.withColumn("cohort_week", cohort)
        .withColumn("week_offset", F.floor(F.datediff(wk, F.col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "events_value_ranks",
    # ntile is tie-order-sensitive -> event_id tiebreak makes the
    # frame deterministic in both engines.
    oracle="""
    SELECT event_type, event_id,
           ROUND(PERCENT_RANK() OVER w, 4) AS pr,
           NTILE(4) OVER w AS quartile,
           ROUND(CUME_DIST() OVER w, 4) AS cd
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def events_value_ranks(spark, sf_dir):
    """Rank-family window breadth (percent_rank / ntile / cume_dist)
    in ONE window spec — one shuffle on event_type, one sort, all
    three functions share the frame."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_type",
        "event_id",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    )


@query(
    "doc_chunk_overlap",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DTOKS} AS toks FROM documents),
    c AS (SELECT doc_id, toks,
                 unnest(range(CAST(ceil(len(toks) / 32.0) AS BIGINT))) AS chunk_id
          FROM d WHERE len(toks) > 0)
    SELECT doc_id, chunk_id,
           len(list_slice(toks, chunk_id * 32 + 1, chunk_id * 32 + 64)) AS n_tok,
           toks[chunk_id * 32 + 1] AS first_tok,
           toks[LEAST(len(toks), chunk_id * 32 + 64)] AS last_tok
    FROM c
    """,
)
def doc_chunk_overlap(spark, sf_dir):
    """Sliding-window chunking with 50% overlap (64-token windows,
    stride 32) — the RAG/embedding convention; map + explode, no
    shuffle (operators/sampling.py::chunk_documents_overlap)."""
    from ..operators import sampling as SA

    return SA.chunk_documents_overlap(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, stride=32
    )


@query(
    "doc_sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY md5('s0:' || doc_id), doc_id) <= 20
    ORDER BY lang, doc_id
    """,
)
def doc_sample_stratified(spark, sf_dir):
    """Exact fixed-size per-stratum sample: 20 docs per language by
    smallest md5(seed:id) — deterministic, engine-portable eval-set
    selection (operators/sampling.py::stratified_topn; the 100 TB
    two-pass threshold swap is in its docstring)."""
    from ..operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return SA.stratified_topn(docs, 20, "lang").orderBy("lang", "doc_id")


@query(
    "events_ohlc_daily",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS d, ts,
               event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, DATE_TRUNC('day', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY user_id, DATE_TRUNC('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events WHERE user_id < 20)
    SELECT user_id, d,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           ROUND(MAX(value), 2) AS high,
           ROUND(MIN(value), 2) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           COUNT(*) AS n_events
    FROM e GROUP BY user_id, d ORDER BY user_id, d
    """,
)
def events_ohlc_daily(spark, sf_dir):
    """Time-series downsampling to daily OHLC bars per entity — the
    metrics/feature-store resample step. One hash aggregation: open and
    close are min_by/max_by over the composite (ts, event_id) order key
    (deterministic under same-timestamp ties), so partial aggregates
    collapse map-side and the shuffle carries <= one row per (user, day,
    map partition) — no per-key sort at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    key = F.struct("ts", "event_id")
    return (
        ev.withColumn("d", F.col("ts").cast("date"))
        .groupBy("user_id", "d")
        .agg(
            F.round(F.min_by("value", key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", key), 2).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "d")
    )


@query(
    "events_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events)
    SELECT event_type, next_type, COUNT(*) AS n,
           ROUND(COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (PARTITION BY event_type),
                 4) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type ORDER BY event_type, next_type
    """,
)
def events_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (the product-analytics "what happens after X" table).
    One shuffle to order each user's stream (lead window), then a
    tiny (type × type) aggregate; the row-probability normalization
    is a window over the aggregated matrix — at most |types|² rows,
    driver-scale regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    total = Window.partitionBy("event_type")
    return counts.select(
        "event_type", "next_type", "n",
        F.round(F.col("n") / F.sum("n").over(total), 4).alias("p"),
    ).orderBy("event_type", "next_type")


@query(
    "events_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           ROUND(MEDIAN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 3) AS med7
    FROM events WHERE user_id < 10
    """,
)
def events_rolling_median(spark, sf_dir):
    """Exact rolling median over each user's trailing 7 events — the
    robust-smoothing twin of events_rolling_7d (means are skew-prone
    on heavy-tailed values). Spark disallows median as a framed window
    aggregate, so the frame is materialized with collect_list (<= 7
    doubles — bounded state) and the median is the sorted-middle
    interpolation, matching DuckDB's MEDIAN on even counts. One
    shuffle on user_id; O(frame log frame) per row — constant. At
    100 TB the swap for LARGE frames is approx_percentile, or the
    two-heap streaming median in applyInPandasWithState for unbounded
    ones."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    s = F.array_sort(F.collect_list("value").over(w))
    n = F.size(s)
    lo = F.element_at(s, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(s, (F.floor(n / 2) + 1).cast("int"))
    # ROUND to 3 decimals, not 2: the median of 2-decimal values is an
    # exact multiple of 0.005, so rounding to 2 sits ON the half-way
    # boundary where Spark (binary HALF_UP) and DuckDB (decimal-repr
    # rounding) disagree by an ulp; at 3 decimals no boundary is near.
    med = lo + (hi - lo) / 2.0
    return ev.select(
        "event_id", "user_id", F.round(med, 3).alias("med7")
    )


@query(
    "events_dwell_time",
    # integer microsecond math on BOTH sides (epoch_us / unix_micros):
    # casting timestamps to whole seconds truncates vs rounds
    # differently across engines (see events_rolling_7d note)
    oracle="""
    WITH seq AS (
        SELECT event_type,
               epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
               - epoch_us(ts) AS gap_us
        FROM events)
    SELECT event_type, COUNT(*) AS n,
           ROUND(AVG(gap_us) / 1e6, 2) AS avg_gap_s,
           ROUND(quantile_cont(gap_us, 0.5) / 1e6, 2) AS p50_gap_s,
           ROUND(quantile_cont(gap_us, 0.9) / 1e6, 2) AS p90_gap_s
    FROM seq WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_dwell_time(spark, sf_dir):
    """Time-to-next-event distribution per event type (session dwell /
    engagement analysis): one lead window per user stream, then a
    |types|-key aggregate. Gaps are exact integer microseconds
    (unix_micros) — no truncate-vs-round divergence — and the sums are
    exact long arithmetic before the final division. Exact percentiles
    per type are fine at |types| groups; approx_percentile is the
    100 TB swap (stats_quantiles note)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("gap_us") / 1e6, 2).alias("avg_gap_s"),
            F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 2).alias(
                "p50_gap_s"
            ),
            F.round(F.percentile("gap_us", F.lit(0.9)) / 1e6, 2).alias(
                "p90_gap_s"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "events_winsorize",
    oracle="""
    WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           ROUND(LEAST(GREATEST(e.value, c.lo), c.hi), 2) AS clipped,
           (e.value < c.lo OR e.value > c.hi) AS was_clipped
    FROM events e JOIN cuts c USING (event_type)
    WHERE e.user_id < 10
    """,
)
def events_winsorize(spark, sf_dir):
    """Winsorization: clip each value into its event-type's
    [p05, p95] band — the robust-features step before model training
    (heavy tails dominate means and gradients otherwise). The cut
    table is |types| rows (exact percentiles here; approx_percentile
    at 100 TB) broadcast back onto the stream, so the data pass is
    scan + map — the aggregation never touches row payloads twice."""
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    out = ev.filter(F.col("user_id") < 10).join(F.broadcast(cuts), "event_type")
    return out.select(
        "event_id",
        "event_type",
        F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 2)
        .alias("clipped"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .alias("was_clipped"),
    )


@query(
    "events_scd2",
    # SCD-2 build from a changelog: collapse consecutive duplicate
    # attribute values per key, then bracket each run with
    # [valid_from, valid_to); open runs are current
    oracle="""
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events),
    c AS (SELECT user_id, event_type, ts AS valid_from, event_id FROM o
          WHERE prev IS NULL OR prev <> event_type),
    v AS (SELECT user_id, event_type, valid_from,
                 lead(valid_from) OVER (PARTITION BY user_id
                                        ORDER BY valid_from, event_id)
                     AS valid_to
          FROM c)
    SELECT user_id, event_type, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM v
    """,
)
def events_scd2(spark, sf_dir):
    """Slowly-changing-dimension type 2: turn the event changelog into
    a versioned dimension (one row per distinct run of event_type per
    user, valid_from/valid_to brackets, open = current). Two window
    passes over the SAME (user_id, ts, event_id) sort — Catalyst
    reuses the one sort+exchange; the output is change-sized, the
    standard CDC-to-warehouse compaction at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@query(
    "events_anomaly_mad",
    # robust z = |x - median| / (1.4826 * MAD): identical expression
    # order on both engines -> identical doubles -> identical flags
    oracle="""
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_id, e.event_type, e.value,
                   ABS(e.value - m.med) AS dev
            FROM events e JOIN med m USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value,
           ROUND(d.dev / (1.4826 * m.mad), 4) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND d.dev / (1.4826 * m.mad) > 3.5
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """Robust anomaly detection: median/MAD per event type instead of
    mean/stddev (events_outliers' moment form breaks down when the
    contamination itself inflates the stddev — MAD has a 50%
    breakdown point). Two tiny per-type aggregates broadcast back;
    the data passes are scan + row-local math. Exact oracle."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad")
    )
    z = F.col("dev") / (1.4826 * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (z > 3.5))
        .select("event_id", "event_type", "value", F.round(z, 4).alias("robust_z"))
    )


@query(
    "stats_regression_by_group",
    # Both engines use numerically-stable streaming covariance
    # accumulators for regr_*/corr; aggregation order still differs
    # across partitions, so outputs are rounded to 3 decimals — the
    # residual cross-engine delta is ~1e-10 relative on these sums.
    # "+ 0" collapses IEEE negative zero (DuckDB rounds tiny negative
    # correlations to -0.0, Spark to 0.0 — same value, different repr).
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(corr(l_extendedprice, l_quantity), 3) + 0 AS r,
           ROUND(regr_slope(l_extendedprice, l_quantity), 3) + 0 AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 3) + 0 AS icept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 3) + 0 AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_regression_by_group(spark, sf_dir):
    """Grouped OLS-by-aggregation: slope/intercept/r² of extended
    price on quantity per return flag, entirely as builtin streaming
    aggregates (regr_*, corr) — one map-side partial-aggregated
    shuffle on a 3-value key, no model loop, no UDF. The shape every
    feature-correlation audit of a 100 TB table takes: each statistic
    is a handful of merged sufficient statistics per group, so cost
    is one pass regardless of group count, and the same plan serves
    the corpus-quality use (does doc length predict quality score?)
    by swapping columns."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.corr(y, x), 3) + F.lit(0.0)).alias("r"),
        (F.round(F.regr_slope(y, x), 3) + F.lit(0.0)).alias("slope"),
        (F.round(F.regr_intercept(y, x), 3) + F.lit(0.0)).alias("icept"),
        (F.round(F.regr_r2(y, x), 3) + F.lit(0.0)).alias("r2"),
    )


@query(
    "join_point_in_time",
    # independent oracle: DuckDB evaluates the PIT lookup as the
    # literal interval join against the SCD-2 brackets (IEJoin);
    # Spark never builds an interval — union-sort carry-forward
    oracle="""
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events),
    c AS (SELECT user_id, event_type, ts AS valid_from, event_id FROM o
          WHERE prev IS NULL OR prev <> event_type),
    v AS (SELECT user_id, event_type, valid_from,
                 lead(valid_from) OVER (PARTITION BY user_id
                                        ORDER BY valid_from, event_id)
                     AS valid_to
          FROM c)
    SELECT s.event_type AS state_at_order,
           COUNT(*) AS n_orders,
           ROUND(SUM(ord.o_totalprice), 2) AS revenue
    FROM orders ord
    LEFT JOIN v s
      ON s.user_id = ord.o_custkey
     AND s.valid_from <= ord.o_orderdate
     AND (s.valid_to IS NULL OR ord.o_orderdate < s.valid_to)
    GROUP BY s.event_type
    """,
)
def join_point_in_time(spark, sf_dir):
    """Point-in-time lookup against the SCD-2 dimension
    (`operators/joins.py::asof_join_backward`): each order picks up
    the customer's activity state valid AT its order date — the
    leakage-free feature-lookup shape (training-data joins must never
    read a dimension version from the future). Spark executes the
    union-sort carry-forward: one shuffle+sort on the key, one
    `last(ignorenulls)` window — no interval join, no per-row
    subquery; the oracle is the literal valid_from/valid_to interval
    join, so the two formulations checking each other IS the
    correctness claim. Orders whose customer has no prior state (or
    no events at all) group under NULL — present in both engines."""
    from ..operators.joins import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    # right_tiebreak pins the winner when two state changes share a
    # (user_id, valid_from): the oracle's lead() orders by (valid_from,
    # event_id), which makes the lower-event_id bracket empty — the
    # carry-forward must likewise let the higher event_id win.
    pit = asof_join_backward(
        orders.withColumnRenamed("o_custkey", "user_id"),
        dim,
        on="user_id",
        left_ts="o_orderdate",
        right_ts="valid_from",
        value_cols=["state", "event_id"],
        right_tiebreak="event_id",
    )
    return pit.groupBy(F.col("state").alias("state_at_order")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "join_time_to_next",
    # independent oracle: DuckDB evaluates the forward lookup as the
    # literal correlated MIN-subquery; Spark never builds a subquery —
    # union-sort carry-BACKWARD (operators/joins.py::asof_join_forward)
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    m AS (SELECT v.user_id, v.ts,
                 (SELECT MIN(p.ts) FROM events p
                  WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
                        AND p.ts >= v.ts) AS pts
          FROM v),
    f AS (SELECT user_id,
                 CASE WHEN pts IS NOT NULL
                           AND date_diff('second', ts, pts) <= 604800
                      THEN date_diff('second', ts, pts) END AS lat
          FROM m)
    SELECT user_id, COUNT(*) AS n_views, COUNT(lat) AS n_converted_7d,
           floor(AVG(lat) * 100) / 100 AS avg_latency_s
    FROM f GROUP BY user_id
    """,
)
def join_time_to_next(spark, sf_dir):
    """Forward as-of join with tolerance
    (operators/joins.py::asof_join_forward): every view picks up the
    user's NEXT purchase at-or-after it, counted as converted only
    within 7 days — the forward label-assignment shape of training
    pipelines ("did the outcome follow this impression in the
    window"), which must read only the FUTURE side, exactly mirroring
    the leakage rule of the backward PIT lookup. Spark executes the
    union-sort carry: one shuffle+sort on user_id in REVERSED time
    order, one running last(ignorenulls) window (never a
    first()-over-unbounded-following, which Spark executes O(n²) per
    key), tolerance as a post-carry filter; the oracle is the literal
    correlated MIN-subquery, so the two formulations checking each
    other IS the correctness claim."""
    from ..operators.joins import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    hit = asof_join_forward(
        views,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="pts",
        value_cols=["purchase_id", "pts"],
        right_tiebreak="purchase_id",
        tolerance_seconds=604800,
    )
    lat = F.col("pts").cast("long") - F.col("ts").cast("long")
    return hit.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.count("purchase_id").alias("n_converted_7d"),
        # floor-grid: avg of second-counts is an off-grid double
        # quotient; ROUND halfway behavior differs cross-engine
        (F.floor(F.avg(lat) * 100) / 100).alias("avg_latency_s"),
    )


@query(
    "unpivot_event_stats",
    # the long->wide->long round trip: the oracle is the DIRECT long
    # aggregation, so pivot ∘ unpivot must be the identity on it
    oracle="""
    SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
           event_type, COUNT(*) AS n
    FROM events GROUP BY d, event_type
    """,
)
def unpivot_event_stats(spark, sf_dir):
    """UNPIVOT/melt — the reshape inverse every reporting pipeline
    needs back out of a pivoted matrix: the day x event-type count
    matrix (pivoted with PINNED values, one aggregation) melts back to
    long (d, event_type, n) via DataFrame.unpivot, dropping the NULL
    cells pivot manufactured for empty combinations (the oracle's
    direct GROUP BY never had them). Unpivot is a row-local Expand —
    no shuffle beyond the pivot's own aggregation; the round trip
    being the identity IS the correctness claim."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return (
        wide.unpivot("d", _EVENT_TYPES, "event_type", "n")
        .filter(F.col("n").isNotNull())
    )


@query(
    "stats_chi_square",
    oracle="""
    WITH o AS (SELECT lang, source, COUNT(*)::DOUBLE AS obs
               FROM documents GROUP BY lang, source),
    m AS (SELECT lang, SUM(obs) AS rl FROM o GROUP BY lang),
    s AS (SELECT source, SUM(obs) AS cs FROM o GROUP BY source),
    n AS (SELECT SUM(obs) AS total FROM o),
    e AS (SELECT o.lang, o.source, o.obs,
                 m.rl * s.cs / n.total AS exp
          FROM o JOIN m USING (lang) JOIN s USING (source) CROSS JOIN n)
    SELECT COUNT(*) AS n_cells,
           floor(SUM((obs - exp) * (obs - exp) / exp) * 10000) / 10000 AS chi2
    FROM e
    """,
)
def stats_chi_square(spark, sf_dir):
    """Chi-square independence test between two categorical columns
    (lang x source) — the screening statistic for 'does slice A's
    distribution depend on slice B' before stratifying a training mix.
    One aggregation builds the contingency table (cells = |lang| x
    |source|, tiny whatever the corpus); margins and the statistic are
    cell-table-sized work with the margins joined back BROADCAST.
    Expected counts never hit zero by construction (margins of
    observed cells are positive)."""
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    )
    rl = obs.groupBy("lang").agg(F.sum("obs").alias("rl"))
    cs = obs.groupBy("source").agg(F.sum("obs").alias("cs"))
    total = obs.agg(F.sum("obs").alias("total"))
    e = (
        obs.join(F.broadcast(rl), "lang")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(total))
        .withColumn("exp", F.col("rl") * F.col("cs") / F.col("total"))
    )
    diff = F.col("obs") - F.col("exp")
    return e.agg(
        F.count(F.lit(1)).alias("n_cells"),
        # floor-grid: chi2 is an off-grid double sum of quotients
        (F.floor(F.sum(diff * diff / F.col("exp")) * 10000) / 10000).alias(
            "chi2"
        ),
    )


@query(
    "stats_corr_matrix",
    oracle="""
    SELECT 'l_quantity|l_extendedprice' AS pair,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS r
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity|l_discount', ROUND(corr(l_quantity, l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice|l_discount',
           ROUND(corr(l_extendedprice, l_discount), 4)
    FROM lineitem
    """,
)
def stats_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the numeric columns —
    the multivariate screen of every feature audit. All three corr
    aggregates ride ONE scan and one partial+final aggregation (corr
    is algebraic: each pair folds to 6 running moments map-side); the
    long-format output is an inline array explode of the single
    result row, not three scans. The oracle's three UNION ALL scans
    restate the same numbers independently."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
    ]
    wide = li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"r{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(f"{a}|{b}").alias("pair"), F.col(f"r{i}").alias("r")
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return wide.select(F.inline(rows))


@query(
    "events_seasonal_anomaly",
    oracle="""
    WITH d AS (SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
                      COUNT(*) AS n
               FROM events GROUP BY day),
    w AS (SELECT day, n, dayofweek(day) AS dow FROM d),
    b AS (SELECT dow, AVG(n) AS mu,
                 COALESCE(stddev_samp(n), 0) AS sd, COUNT(*) AS n_days
          FROM w GROUP BY dow)
    SELECT w.day, w.n, ROUND(b.mu, 2) AS dow_mean,
           ROUND((w.n - b.mu) / b.sd, 3) AS z
    FROM w JOIN b USING (dow)
    WHERE b.n_days >= 3 AND b.sd > 0 AND ABS((w.n - b.mu) / b.sd) > 1.0
    """,
)
def events_seasonal_anomaly(spark, sf_dir):
    """Seasonality-aware volume anomaly: each day's event count
    scored against ITS WEEKDAY's baseline (mean/stddev over the same
    day-of-week) — the deseasonalized z-score that catches a quiet
    Tuesday a global threshold would bless because weekends are
    quieter still. Two aggregations, both day-count sized after the
    first rollup, baseline joined back BROADCAST; dow groups with
    under 3 observations or zero variance are unscorable and
    excluded (sd guard on both engines). Complements events_anomaly_mad
    (per-user robust outliers) with the per-time-slice seasonal form."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = days.withColumn("dow", F.dayofweek("day"))
    b = w.groupBy("dow").agg(
        F.avg("n").alias("mu"),
        F.coalesce(F.stddev_samp("n"), F.lit(0.0)).alias("sd"),
        F.count(F.lit(1)).alias("n_days"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        w.join(F.broadcast(b), "dow")
        .filter((F.col("n_days") >= 3) & (F.col("sd") > 0) & (F.abs(z) > 1.0))
        .select(
            "day",
            "n",
            F.round("mu", 2).alias("dow_mean"),
            F.round(z, 3).alias("z"),
        )
    )


@query(
    "events_active_streaks",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(DATE_TRUNC('day', ts) AS DATE) AS day
               FROM events),
    g AS (SELECT user_id, day,
                 day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY day) AS INT) AS grp
          FROM d),
    s AS (SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS streak_start
          FROM g GROUP BY user_id, grp)
    SELECT user_id, MAX(streak_len) AS longest_streak,
           COUNT(*) AS n_streaks,
           MIN(streak_start) AS first_day
    FROM s GROUP BY user_id
    """,
)
def events_active_streaks(spark, sf_dir):
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days (and how many distinct streaks) — the engagement-streak /
    uptime-window shape. The classic date-minus-row_number trick turns
    consecutiveness into a constant group key, so the whole island
    detection is ONE shuffle on user_id (distinct + window + both
    aggregations all key on it and reuse the exchange) — no self-join,
    no recursion, no per-row gap probe; at 100 TB the cost is the one
    exchange of (user, day) pairs."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w))
    )
    s = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    return s.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min("streak_start").alias("first_day"),
    )


@query(
    "events_share_of_total",
    oracle="""
    WITH t AS (SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
                      event_type, COUNT(*) AS n
               FROM events GROUP BY day, event_type)
    SELECT day, event_type, n,
           FLOOR(n * 10000.0 / SUM(n) OVER (PARTITION BY day)) / 10000
               AS day_share
    FROM t
    """,
)
def events_share_of_total(spark, sf_dir):
    """Ratio-to-report: each event type's share of its day's total —
    the percent-of-total window every BI layer ships (RATIO_TO_REPORT).
    One aggregation to (day, type) grain, then a window SUM over the
    tiny aggregate — the share math never touches raw events. Share
    snaps to the floor-grid (see q36), not ROUND: n/total is an
    off-grid double and the two engines' ROUND diverge on halfway
    points."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("day")
    share = F.floor(F.col("n") * 10000.0 / F.sum("n").over(w)) / 10000
    return t.select("day", "event_type", "n", share.alias("day_share"))


@query(
    "stats_gini",
    oracle="""
    WITH v AS (SELECT event_type, value,
                      ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY value, event_id) AS i
               FROM events WHERE value IS NOT NULL AND value >= 0),
    s AS (SELECT event_type, COUNT(*) AS n, SUM(value) AS tot,
                 SUM(i * value) AS iv
          FROM v GROUP BY event_type)
    SELECT event_type, n,
           FLOOR((2.0 * iv / (n * tot) - (n + 1.0) / n) * 10000) / 10000
               AS gini
    FROM s WHERE tot > 0
    """,
)
def stats_gini(spark, sf_dir):
    """Gini concentration of value per event type — the inequality
    measure behind 'do 20% of users generate 80% of value' and the
    balance check before weighting a training mixture by source mass.
    Exact rank-weighted form G = 2*sum(i*v_i)/(n*sum v) - (n+1)/n over
    ascending values: one shuffle on the group key serves the ranking
    window AND the aggregate (same partitioning); deterministic
    (value, event_id) rank order; floor-grid output (off-grid double,
    see q36)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    v = ev.select(
        "event_type", "value", F.row_number().over(w).alias("i")
    )
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("tot"),
        F.sum(F.col("i") * F.col("value")).alias("iv"),
    )
    gini = (
        F.floor(
            (2.0 * F.col("iv") / (F.col("n") * F.col("tot"))
             - (F.col("n") + 1.0) / F.col("n")) * 10000
        ) / 10000
    )
    return s.filter(F.col("tot") > 0).select(
        "event_type", "n", gini.alias("gini")
    )


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (SELECT unnest({_DTOKS}) AS term FROM documents),
    f AS (SELECT term, COUNT(*) AS freq FROM tok GROUP BY term),
    r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rank
          FROM f)
    SELECT COUNT(*) AS n_types,
           FLOOR(regr_slope(ln(freq), ln(rank)) * 10000 + 1e-6) / 10000
               AS zipf_slope,
           FLOOR(regr_r2(ln(freq), ln(rank)) * 10000 + 1e-6) / 10000 AS r2
    FROM r
    """,
)
def text_zipf_fit(spark, sf_dir):
    """Zipf-law fit of the corpus vocabulary: OLS slope of log(freq)
    on log(rank) — natural text sits near -1, and deviation is a fast
    corpus-health screen (template/boilerplate floods flatten the
    head; OCR noise fattens the tail). Token counting is the usual
    one-pass partial aggregate; ranking and the regression run on the
    VOCABULARY (types, not tokens), with regr_slope/regr_r2 folding
    map-side. The vocabulary rank runs through operators/
    rank.global_rank — the terasort decomposition (range-partition on
    (freq DESC, term), per-partition row_number, broadcast offsets) —
    so web-scale type counts never funnel through one reducer.
    Deterministic (freq DESC, term) rank order; floor-grid outputs."""
    from ..functions import text as T
    from ..operators.rank import global_rank

    docs = load_table(spark, sf_dir, "documents")
    f = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    r = global_rank(
        f, [F.col("freq").desc(), F.col("term")], "rank"
    ).select("freq", "rank")
    lf, lr = F.log(F.col("freq")), F.log(F.col("rank"))
    return r.agg(
        F.count(F.lit(1)).alias("n_types"),
        (F.floor(F.regr_slope(lf, lr) * 10000 + 1e-6) / 10000).alias("zipf_slope"),
        (F.floor(F.regr_r2(lf, lr) * 10000 + 1e-6) / 10000).alias("r2"),
    )


@query(
    "events_transition_matrix",
    # first-order Markov transitions over each user's event stream:
    # LAG pair counts normalized per source state; (ts, event_id)
    # tiebreak makes the lag deterministic cross-engine
    oracle="""
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events),
    p AS (SELECT prev AS from_type, event_type AS to_type,
                 COUNT(*)::BIGINT AS n
          FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, SUM(n)::BIGINT AS row_total FROM p GROUP BY 1)
    SELECT p.from_type, p.to_type, p.n,
           FLOOR((p.n::DOUBLE / t.row_total::DOUBLE) * 1e4) / 1e4 AS prob
    FROM p JOIN t USING (from_type)
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix of user behavior: for each
    (from_type -> to_type) pair, the count and conditional probability
    P(next=to | cur=from). One window pass (user-keyed sort, the
    events_scd2 exchange shape) into a types^2-bounded aggregate; the
    normalizer join is dimension-sized and broadcasts. The probability
    is one IEEE division of exact BIGINT counts, floor-gridded — the
    driver-grade determinism recipe."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    prob = F.col("n").cast("double") / F.col("row_total").cast("double")
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.floor(prob * 1e4) / 1e4).alias("prob"),
    )


@query(
    "events_bitmap_retention",
    # roaring-bitmap-style retention: per-user weekly activity bitmap
    # (BIT_OR of 1<<week, weeks < 63 fit one BIGINT), then week-w
    # retention of the week-0 cohort is a pair of bit tests — no
    # distinct-count per (cohort, week) cell anywhere
    oracle="""
    WITH bm AS (SELECT user_id,
                       BIT_OR(1::BIGINT << CAST(datediff('day',
                           DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS INT))
                         AS bits
                FROM events GROUP BY user_id),
    c AS (SELECT COUNT(*)::BIGINT AS cohort_size FROM bm WHERE (bits & 1) = 1),
    r AS (SELECT w.week_offset, COUNT(*)::BIGINT AS retained
          FROM bm CROSS JOIN range(63) w(week_offset)
          WHERE (bits & 1) = 1 AND ((bits >> w.week_offset) & 1) = 1
          GROUP BY 1)
    SELECT r.week_offset::INT AS week_offset, c.cohort_size, r.retained,
           FLOOR((r.retained::DOUBLE / c.cohort_size::DOUBLE) * 1e4) / 1e4
             AS rate
    FROM r CROSS JOIN c
    """,
)
def events_bitmap_retention(spark, sf_dir):
    """Bitmap-index retention: each user's weekly activity folds into
    ONE 8-byte bitmap (BIT_OR of 1<<week), and week-w retention of the
    week-0 cohort becomes two bit tests over the per-user bitmaps —
    the roaring-bitmap pattern that replaces a distinct-count per
    (cohort, week) cell with constant-width integer state. Versus
    events_retention_cohorts (the classic distinct-count triangle):
    same numbers for cohort week 0, but the aggregate state here is
    8 bytes per user regardless of how many weeks the stream spans —
    at 100 TB the bitmap groupBy shuffles (user, int64) pairs once,
    and every retention/engagement/overlap question after that is
    bit algebra on the SAME materialized bitmap table. 63-week window
    fits a BIGINT; longer horizons shard into (user, epoch) rows —
    the plan shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        / 7
    ).cast("int")
    bm = ev.select(
        "user_id", F.expr("1L").alias("one"), wk.alias("wk")
    ).select("user_id", F.expr("shiftleft(one, wk)").alias("b"))
    bits = bm.groupBy("user_id").agg(F.expr("bit_or(b)").alias("bits"))
    cohort = bits.filter((F.col("bits").bitwiseAND(1)) == 1)
    csize = cohort.groupBy().agg(F.count(F.lit(1)).alias("cohort_size"))
    offs = cohort.select(
        "bits", F.explode(F.sequence(F.lit(0), F.lit(62))).alias("week_offset")
    ).filter(F.expr("(shiftright(bits, week_offset) & 1) = 1"))
    r = offs.groupBy("week_offset").agg(F.count(F.lit(1)).alias("retained"))
    rate = F.col("retained").cast("double") / F.col("cohort_size").cast("double")
    return r.crossJoin(F.broadcast(csize)).select(
        F.col("week_offset").cast("int").alias("week_offset"),
        "cohort_size",
        "retained",
        (F.floor(rate * 1e4) / 1e4).alias("rate"),
    )


# Benford expected first-digit proportions log10(1+1/d), d=1..9 —
# precomputed to shared literals so both engines parse the identical
# doubles (correctly-rounded decimal->binary on both sides)
_BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


@query(
    "stats_benford",
    # first-significant-digit audit vs Benford's law: digits come from
    # the exact integer cents (floor(value*100 + 0.5) — one shared
    # IEEE multiply, exact +0.5, floor), so engines can never disagree
    # on the digit; one row per digit, no cross-engine float summation
    oracle=f"""
    WITH c AS (SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
               FROM events WHERE value IS NOT NULL),
    d AS (SELECT CAST(substr(cents::VARCHAR, 1, 1) AS INT) AS digit
          FROM c WHERE cents >= 1),
    g AS (SELECT digit, COUNT(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n)::BIGINT AS total FROM g)
    SELECT g.digit, g.n,
           FLOOR((g.n::DOUBLE / t.total::DOUBLE) * 1e4) / 1e4 AS freq,
           ({_BENFORD_P!r})[g.digit]::DOUBLE AS expected
    FROM g CROSS JOIN t
    """,
)
def stats_benford(spark, sf_dir):
    """Benford's-law first-digit audit over event values — the
    data-quality screen for fabricated or unit-mangled numeric
    columns: naturally occurring multiplicative quantities put ~30.1%
    of first significant digits at 1, and a flat or spiked digit
    histogram flags synthetic/corrupt slices. One row per digit
    (observed count, observed frequency, Benford expectation) so no
    cross-engine float reduction exists; digits derive from exact
    integer cents. One tiny hash aggregate over the stream + a one-row
    broadcast for the total — trivially scale-stable; per-slice
    variants group the same expression by (source, digit)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    d = (
        ev.filter(F.col("value").isNotNull())
        .select(cents.alias("cents"))
        .filter(F.col("cents") >= 1)
        .select(F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = g.groupBy().agg(F.sum("n").alias("total"))
    expected = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_P]), F.col("digit")
    )
    return g.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.floor(F.col("n").cast("double") / F.col("total").cast("double") * 1e4) / 1e4).alias("freq"),
        expected.alias("expected"),
    )


@query(
    "events_decayed_counts",
    # recency-weighted popularity with a half-life of one day: weight
    # 2^-age is dyadic, so integer-scaling to 2^(40-age) makes the SUM
    # exact in int64 (100k terms * 2^40 < 2^58) — no float summation
    # order exists; the score is one IEEE division by 2^40
    oracle="""
    WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS r FROM events),
    a AS (SELECT event_type,
                 LEAST(datediff('day', CAST(ts AS DATE), (SELECT r FROM ref)),
                       40) AS age
          FROM events),
    g AS (SELECT event_type, COUNT(*)::BIGINT AS n,
                 SUM(1::BIGINT << (40 - age))::BIGINT AS w
          FROM a GROUP BY event_type)
    SELECT event_type, n,
           FLOOR((w::DOUBLE / 1099511627776.0) * 1e4) / 1e4
             AS decayed_score
    FROM g
    """,
)
def events_decayed_counts(spark, sf_dir):
    """Exponentially-decayed event counts per type (half-life = 1 day,
    anchored at the newest day in the data): the trending-now
    primitive — yesterday's event counts half, 40+-day-old events
    round to zero. Determinism trick: the decay weight 2^-age is
    dyadic, so scaling to the integer 2^(40-age) makes the per-group
    SUM exact int64 arithmetic (no float summation-order hazard that a
    general e^-lambda*age decay would have); the score is one IEEE
    division, floor-gridded. Plan: scan -> one-row MAX broadcast ->
    one partial-aggregated groupBy — any scale. A general half-life h
    uses age/h in the exponent grid the same way."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.groupBy().agg(F.max(F.col("ts").cast("date")).alias("r"))
    a = ev.crossJoin(F.broadcast(ref)).select(
        "event_type",
        F.least(
            F.datediff(F.col("r"), F.col("ts").cast("date")), F.lit(40)
        ).alias("age"),
    )
    g = a.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("shiftleft(1L, 40 - age)")).alias("w"),
    )
    return g.select(
        "event_type",
        "n",
        (F.floor(F.col("w").cast("double") / F.lit(1099511627776.0) * 1e4) / 1e4)
        .alias("decayed_score"),
    )


@query(
    "events_ntile_quartiles",
    # NTILE is deterministic only under a TOTAL order — (value,
    # event_id) — and the outputs are raw data values (min/max per
    # tile), so no float arithmetic exists to diverge
    oracle="""
    WITH t AS (SELECT event_type, value,
                      NTILE(4) OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS tile
               FROM events)
    SELECT event_type, tile, COUNT(*)::BIGINT AS n,
           MIN(value) AS lo, MAX(value) AS hi
    FROM t GROUP BY event_type, tile
    """,
)
def events_ntile_quartiles(spark, sf_dir):
    """Quartile banding per event type via NTILE(4): each type's
    events split into four equal-count tiles with their value ranges —
    the binning step behind score bands, price tiers, and equal-count
    cohorts. Cross-engine determinism hinges on the TOTAL order
    (value, event_id): NTILE over a non-total order is
    engine-dependent for ties. Outputs are raw data values (counts +
    per-tile min/max), zero float arithmetic. One window sort per
    type-partition then a tiny aggregate; at 100 TB the same banding
    at global scope goes through the distributed-rank decomposition in
    operators/rank.py (stats_histogram_equidepth)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    t = ev.select("event_type", "value", F.ntile(4).over(w).alias("tile"))
    return t.groupBy("event_type", "tile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "stats_ks_test",
    # two-sample Kolmogorov-Smirnov, integer-exact: with per-value
    # counts (c1, c2) and cumulative counts (cum1, cum2), the KS
    # statistic max|F1 - F2| equals max|cum1*n2 - cum2*n1| / (n1*n2);
    # the numerator is pure int64, so engines agree bit-for-bit and
    # the only float is ONE IEEE division of exact integers
    oracle="""
    WITH g AS (SELECT value,
                      SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END)::BIGINT AS c1,
                      SUM(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END)::BIGINT AS c2
               FROM events
               WHERE event_type IN ('purchase', 'view')
                 AND value IS NOT NULL
               GROUP BY value),
    c AS (SELECT value,
                 (SUM(c1) OVER (ORDER BY value))::BIGINT AS cum1,
                 (SUM(c2) OVER (ORDER BY value))::BIGINT AS cum2
          FROM g),
    t AS (SELECT SUM(c1)::BIGINT AS n1, SUM(c2)::BIGINT AS n2 FROM g),
    d AS (SELECT c.value,
                 ABS(c.cum1 * t.n2 - c.cum2 * t.n1)::BIGINT AS diff,
                 t.n1, t.n2
          FROM c CROSS JOIN t),
    m AS (SELECT MAX(diff)::BIGINT AS d_scaled FROM d)
    SELECT d.n1, d.n2, m.d_scaled,
           m.d_scaled::DOUBLE / (d.n1 * d.n2)::DOUBLE AS d_stat,
           MIN(d.value) AS ks_at
    FROM d JOIN m ON d.diff = m.d_scaled
    GROUP BY d.n1, d.n2, m.d_scaled
    """,
)
def stats_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the purchase and
    view value distributions — the standard nonparametric drift screen
    between two corpus snapshots / traffic slices (no binning choice,
    unlike PSI). Integer-exact formulation: D = max|cum1*n2 - cum2*n1|
    / (n1*n2); every comparison happens in int64 and the single float
    is one IEEE division of exactly-representable integers, so the
    result is bit-identical cross-engine. ks_at is the value where the
    ECDF gap peaks (MIN over maxima = deterministic tiebreak). Shape:
    one hash aggregate to per-value counts, a global ordered cumsum
    over DISTINCT values (vocabulary-sized, not data-sized; the 100 TB
    swap is the two-pass distributed-rank decomposition in
    operators/rank.py), and a one-row broadcast for (n1, n2) and the
    max."""
    from ..operators.nonparam import ks_2samp

    ev = load_table(spark, sf_dir, "events")
    return ks_2samp(ev, "value", "event_type", "purchase", "view")


@query(
    "stats_mannwhitney",
    # Mann-Whitney U with average-rank tie handling, integer-exact:
    # a tie group of size t ending at cumulative position cumt holds
    # ranks averaging (2*cumt - t + 1)/2, so the DOUBLED rank sum
    # 2*R1 = SUM(c1 * (2*cumt - t + 1)) stays int64; U statistics and
    # the AUC effect size follow from it with one IEEE division
    oracle="""
    WITH g AS (SELECT value,
                      SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END)::BIGINT AS c1,
                      SUM(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END)::BIGINT AS c2
               FROM events
               WHERE event_type IN ('purchase', 'view')
                 AND value IS NOT NULL
               GROUP BY value),
    c AS (SELECT c1, c2, c1 + c2 AS t,
                 (SUM(c1 + c2) OVER (ORDER BY value))::BIGINT AS cumt
          FROM g),
    s AS (SELECT SUM(c1)::BIGINT AS n1, SUM(c2)::BIGINT AS n2,
                 SUM(c1 * (2 * cumt - t + 1))::BIGINT AS r1_x2
          FROM c)
    SELECT n1, n2,
           (r1_x2 - n1 * (n1 + 1))::BIGINT AS u1_x2,
           (2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)))::BIGINT AS u2_x2,
           (r1_x2 - n1 * (n1 + 1))::DOUBLE
               / (2 * n1 * n2)::DOUBLE AS auc
    FROM s
    """,
)
def stats_mannwhitney(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between the purchase and
    view value distributions, with textbook average-rank tie handling
    — the nonparametric location-shift test that pairs with
    stats_ks_test's shape test, and AUC = U1/(n1*n2) is the
    common-language effect size (P[purchase > view]). Integer-exact:
    ranks are doubled so tie-averages stay integral; 2*R1, 2*U1, 2*U2
    are all int64 and the one float output is a single IEEE division
    of exact integers — bit-identical cross-engine. Same scale shape
    as stats_ks_test: per-value counts, a distinct-values-sized global
    cumsum (rank.py two-pass decomposition at 100 TB), one-row
    reduction."""
    from ..operators.nonparam import mannwhitney_u

    ev = load_table(spark, sf_dir, "events")
    return mannwhitney_u(ev, "value", "event_type", "purchase", "view")


def _rfm_user_metrics(ev):
    """Per-user (rec, freq, cents) metric table — the un-pinned
    upstream of events_rfm_segments, exposed so plan contracts can
    assert scan pruning on the parquet scan (the registered query
    pins its range partitioning via rank._range_tagged, which
    truncates the visible plan at the checkpoint)."""
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    u = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_d"),
        F.count(F.lit(1)).alias("freq"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
        ).alias("cents"),
    )
    a = u.agg(F.max("last_d").alias("anchor"))
    return u.crossJoin(F.broadcast(a)).select(
        "user_id",
        F.datediff("anchor", "last_d").cast("bigint").alias("rec"),
        "freq",
        "cents",
    )


@query(
    "events_rfm_segments",
    # RFM segmentation: per-user recency/frequency/monetary, each
    # NTILE(4)-banded under a TOTAL order (metric, user_id), composed
    # into a 3-digit segment code. All-integer pipeline: days, counts,
    # exact cents — no float exists to diverge
    oracle="""
    WITH u AS (SELECT user_id,
                      MAX(CAST(ts AS DATE)) AS last_d,
                      COUNT(*)::BIGINT AS freq,
                      COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                        THEN CAST(FLOOR(value * 100 + 0.5)
                                                  AS BIGINT) END),
                               0)::BIGINT AS cents
               FROM events GROUP BY user_id),
    a AS (SELECT MAX(last_d) AS anchor FROM u),
    m AS (SELECT u.user_id,
                 date_diff('day', u.last_d, a.anchor)::BIGINT AS rec,
                 u.freq, u.cents
          FROM u CROSS JOIN a),
    t AS (SELECT cents,
                 NTILE(4) OVER (ORDER BY rec, user_id) AS r_tile,
                 NTILE(4) OVER (ORDER BY freq DESC, user_id) AS f_tile,
                 NTILE(4) OVER (ORDER BY cents DESC, user_id) AS m_tile
          FROM m)
    SELECT (r_tile * 100 + f_tile * 10 + m_tile)::BIGINT AS segment,
           COUNT(*)::BIGINT AS n_users,
           MIN(cents)::BIGINT AS min_cents,
           MAX(cents)::BIGINT AS max_cents
    FROM t GROUP BY 1
    """,
)
def events_rfm_segments(spark, sf_dir):
    """RFM segmentation — the classic user-value banding: recency
    (days from a user's last event to the corpus anchor), frequency
    (event count), monetary (exact purchase cents), each quartiled by
    NTILE(4) under a TOTAL order (metric, user_id) so ties are
    deterministic cross-engine, then composed into a 3-digit segment
    (111 = best everything). Integer-only outputs (segment codes,
    user counts, cents ranges). Shape: one user-grained aggregate, a
    one-row anchor broadcast, then three DISTRIBUTED quartile bandings
    via operators/rank.global_ntile — each is the terasort
    decomposition (range-partition on the metric, local row_number,
    broadcast per-partition offsets, exact NTILE remainder formula),
    so no metric ever funnels through a single reducer — and three
    user-keyed equi-joins to recompose (user_id-partitioned shuffles,
    the scalable shape; at 100 TB you would persist the user-grained
    table before branching). Bit-identical to the oracle's
    NTILE(4) OVER (ORDER BY metric, user_id) on every engine."""
    from ..operators.rank import global_ntile

    # pinned once (r11): four consumers (three ntile bandings + the
    # recompose join) otherwise re-execute the user aggregate and the
    # anchor broadcast each — at 100 TB you would persist this
    # user-grained table before branching, as the docstring says
    m = _rfm_user_metrics(load_table(spark, sf_dir, "events")).localCheckpoint(
        eager=False
    )
    r_t = global_ntile(
        m.select("user_id", "rec"),
        [F.col("rec"), F.col("user_id")],
        4,
        "r_tile",
    ).select("user_id", "r_tile")
    f_t = global_ntile(
        m.select("user_id", "freq"),
        [F.col("freq").desc(), F.col("user_id")],
        4,
        "f_tile",
    ).select("user_id", "f_tile")
    m_t = global_ntile(
        m.select("user_id", "cents"),
        [F.col("cents").desc(), F.col("user_id")],
        4,
        "m_tile",
    ).select("user_id", "m_tile")
    t = (
        m.select("user_id", "cents")
        .join(r_t, "user_id")
        .join(f_t, "user_id")
        .join(m_t, "user_id")
    )
    seg = (
        F.col("r_tile") * 100 + F.col("f_tile") * 10 + F.col("m_tile")
    ).cast("bigint")
    return t.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


@query(
    "events_level_shift",
    # CUSUM-style changepoint per event type over the daily count
    # series: the best split maximizes |cum_t*n - t*total| (integer!);
    # before/after means are single IEEE divisions of exact ints at
    # the argmax row only
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      COUNT(*)::BIGINT AS x
               FROM events GROUP BY 1, 2),
    c AS (SELECT event_type, day, x,
                 (SUM(x) OVER (PARTITION BY event_type
                               ORDER BY day))::BIGINT AS cum,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) AS idx,
                 (SUM(x) OVER (PARTITION BY event_type))::BIGINT AS total,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM d),
    g AS (SELECT event_type, day, cum, idx, total, n,
                 ABS(cum * n - idx * total)::BIGINT AS gap
          FROM c WHERE idx < n),
    m AS (SELECT event_type, MAX(gap)::BIGINT AS gap_scaled
          FROM g GROUP BY event_type),
    best AS (SELECT g.event_type, MIN(g.day) AS split_day, m.gap_scaled
             FROM g JOIN m ON g.event_type = m.event_type
                          AND g.gap = m.gap_scaled
             GROUP BY g.event_type, m.gap_scaled)
    SELECT b.event_type, b.split_day, b.gap_scaled,
           g.cum::DOUBLE / g.idx::DOUBLE AS mean_before,
           (g.total - g.cum)::DOUBLE / (g.n - g.idx)::DOUBLE AS mean_after
    FROM best b JOIN g ON g.event_type = b.event_type
                       AND g.day = b.split_day
    """,
)
def events_level_shift(spark, sf_dir):
    """Changepoint (level-shift) detection per event type over the
    daily-count series: the binary-segmentation statistic — for every
    split t, the gap |mean(1..t) - mean(t+1..n)| scaled by t*(n-t)*n
    to the integer |cum_t*n - t*total| — peaks at the most likely
    shift day (earliest-day tiebreak). The volume-anomaly screen for
    ingest pipelines: a collapsed source or a doubled feed shows up as
    the argmax split with divergent before/after means. Integer-exact
    comparisons; the two means are single IEEE divisions of exact
    integers computed only at the winning row. Shape: data-sized work
    is ONE (type, day) count aggregate; everything after runs on the
    days-per-type table (bounded by the calendar), windowed PER TYPE —
    no global sort anywhere."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    wt = Window.partitionBy("event_type")
    wc = wt.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "event_type",
        "day",
        F.sum("x").over(wc).alias("cum"),
        F.row_number().over(wt.orderBy("day")).alias("idx"),
        F.sum("x").over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    g = c.filter(F.col("idx") < F.col("n")).select(
        "event_type",
        "day",
        "cum",
        "idx",
        "total",
        "n",
        F.abs(F.col("cum") * F.col("n") - F.col("idx") * F.col("total")).alias(
            "gap"
        ),
    )
    m = g.groupBy(F.col("event_type").alias("m_type")).agg(
        F.max("gap").alias("gap_scaled")
    )
    best = (
        g.join(
            F.broadcast(m),
            (F.col("event_type") == F.col("m_type"))
            & (F.col("gap") == F.col("gap_scaled")),
        )
        .groupBy("m_type", "gap_scaled")
        .agg(F.min("day").alias("split_day"))
    )
    return (
        g.join(
            F.broadcast(best),
            (F.col("event_type") == F.col("m_type"))
            & (F.col("day") == F.col("split_day")),
        )
        .select(
            "event_type",
            "split_day",
            "gap_scaled",
            (F.col("cum").cast("double") / F.col("idx").cast("double")).alias(
                "mean_before"
            ),
            (
                (F.col("total") - F.col("cum")).cast("double")
                / (F.col("n") - F.col("idx")).cast("double")
            ).alias("mean_after"),
        )
    )


@query(
    "layout_compaction_bins",
    # small-file compaction planning: sequential first-fit of docs
    # into ~4 KB target bins per source via an exclusive-prefix-sum
    # window — bin = floor(bytes_before / target). All integers
    oracle="""
    WITH c AS (SELECT source, doc_id, n_chars,
                      COALESCE(SUM(n_chars) OVER (
                          PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)::BIGINT AS before
               FROM documents)
    SELECT source, (before // 4096)::BIGINT AS bin,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_chars)::BIGINT AS bytes,
           MIN(doc_id)::BIGINT AS first_doc,
           MAX(doc_id)::BIGINT AS last_doc
    FROM c GROUP BY 1, 2
    """,
)
def layout_compaction_bins(spark, sf_dir):
    """Compaction planning for the small-files problem: assign each
    document (stand-in for a data file, sized by n_chars) to a target
    ~4 KB output bin by sequential first-fit in (source, doc_id)
    order — bin = floor(exclusive_prefix_bytes / target). This is the
    planner behind OPTIMIZE/rewrite_data_files-style file compaction:
    contiguous inputs coalesce, bins are ~target-sized except where a
    single oversized input spills its own bin. Integer-exact
    throughout. Shape: one per-source window cumsum (partitioned — no
    global sort) into a (source, bin)-grained aggregate; at 100 TB
    the file manifest, not the data, is the input, so this plans
    petabyte compactions from a gigabyte manifest."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("before"),
    )
    # `div` is true int64 division (Spark `/` on bigints is a double
    # divide, exact only below 2^53 — not "integer-exact at any
    # scale" as this planner claims for petabyte manifests).
    return c.groupBy(
        "source", F.expr("before div 4096").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "feature_target_encode",
    # smoothed target encoding (empirical-Bayes shrinkage toward the
    # global rate, m=20): numerator and denominator are cross-
    # multiplied to exact integers so the rate is ONE IEEE division —
    # (pos*gcnt + m*gpos) / ((cnt+m)*gcnt)
    oracle="""
    WITH g AS (SELECT o_orderpriority AS category,
                      COUNT(*)::BIGINT AS cnt,
                      SUM(CASE WHEN o_orderstatus = 'F'
                               THEN 1 ELSE 0 END)::BIGINT AS pos
               FROM orders GROUP BY 1),
    t AS (SELECT SUM(cnt)::BIGINT AS gcnt, SUM(pos)::BIGINT AS gpos FROM g)
    SELECT g.category, g.cnt, g.pos,
           g.pos::DOUBLE / g.cnt::DOUBLE AS rate_raw,
           (g.pos * t.gcnt + 20 * t.gpos)::DOUBLE
               / ((g.cnt + 20) * t.gcnt)::DOUBLE AS rate_smoothed
    FROM g CROSS JOIN t
    """,
)
def feature_target_encode(spark, sf_dir):
    """Smoothed target encoding — the standard categorical-feature
    transform for training tables: replace a category with its
    empirical-Bayes-shrunk positive rate, rate = (pos + m*global_rate)
    / (cnt + m) with m=20, so rare categories pull toward the global
    rate instead of memorizing noise. Cross-multiplied to exact
    integers (pos*gcnt + m*gpos over (cnt+m)*gcnt) so each output is
    ONE IEEE division of exactly-representable int64s — bit-identical
    cross-engine, no float summation anywhere. Shape: one category-
    grained aggregate plus a one-row global broadcast; category
    cardinality bounds every post-aggregate stage, so the encoder is
    a pure map-side lookup table at training time."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("pos"),
    )
    t = g.agg(F.sum("cnt").alias("gcnt"), F.sum("pos").alias("gpos"))
    m = 20
    return g.crossJoin(F.broadcast(t)).select(
        "category",
        "cnt",
        "pos",
        (F.col("pos").cast("double") / F.col("cnt").cast("double")).alias(
            "rate_raw"
        ),
        (
            (F.col("pos") * F.col("gcnt") + m * F.col("gpos")).cast("double")
            / ((F.col("cnt") + m) * F.col("gcnt")).cast("double")
        ).alias("rate_smoothed"),
    )


@query(
    "join_nearest_event",
    # nearest-event as-of join (either direction, ties -> backward):
    # the union-and-window decomposition — ONE user-partitioned sort
    # gives every click its last prior and first following purchase
    # via RANGE frames (peers at equal ts included on both sides, so
    # tie semantics are engine-independent); gaps are integer micros
    oracle="""
    WITH u AS (SELECT user_id, ts, event_type,
                      CASE WHEN event_type = 'purchase'
                           THEN epoch_us(ts) END AS pus
               FROM events WHERE event_type IN ('click', 'purchase')),
    w AS (SELECT user_id, ts, event_type,
                 MAX(pus) OVER (PARTITION BY user_id ORDER BY ts
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS prev_us,
                 MIN(pus) OVER (PARTITION BY user_id ORDER BY ts
                                RANGE BETWEEN CURRENT ROW
                                      AND UNBOUNDED FOLLOWING) AS next_us
          FROM u),
    c AS (SELECT user_id,
                 CASE
                   WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
                   WHEN prev_us IS NULL THEN next_us - epoch_us(ts)
                   WHEN next_us IS NULL THEN epoch_us(ts) - prev_us
                   WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts)
                        THEN epoch_us(ts) - prev_us
                   ELSE next_us - epoch_us(ts)
                 END AS gap_us
          FROM w WHERE event_type = 'click')
    SELECT user_id, COUNT(*)::BIGINT AS n_clicks,
           COUNT(gap_us)::BIGINT AS n_matched,
           COALESCE(SUM(gap_us), 0)::BIGINT AS sum_gap_us,
           MAX(gap_us)::BIGINT AS max_gap_us
    FROM c GROUP BY user_id
    """,
)
def join_nearest_event(spark, sf_dir):
    """Nearest-event as-of join — each click matched to its temporally
    NEAREST purchase by the same user, either direction, ties to the
    backward match (the attribution primitive when causality can run
    both ways, e.g. click-near-purchase sessionization). Spark has no
    nearest-join operator; the scalable decomposition is union both
    streams and run ONE user-partitioned sort: RANGE-framed MAX/MIN
    carry the last prior and first following purchase timestamp onto
    every click (RANGE frames include equal-ts peers on BOTH sides,
    pinning tie semantics identically cross-engine), then pick the
    smaller integer-microsecond gap. No join at all — two window
    passes over one sort (cf. operators/joins.py as-of carry, which
    this generalizes bidirectionally). Per-user aggregate output keeps
    every value int64."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    us = F.unix_micros("ts")
    u = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", us).alias("pus"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # next-purchase carry runs on REVERSED time order with an
    # unbounded-PRECEDING frame: MIN over [current..end] in ascending
    # ts is identical to a running MIN in descending ts (RANGE frames
    # include equal-ts peers either way), but Spark executes
    # UnboundedFollowing frames by re-aggregating the remaining rows
    # per row (O(n²) per partition — measured 3.2 s vs 0.65 s at 1M
    # events on the zipf head user) while UnboundedPreceding is a
    # streaming accumulation.
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = u.select(
        "user_id",
        "ts",
        "event_type",
        F.max("pus").over(wp).alias("prev_us"),
        F.min("pus").over(wn).alias("next_us"),
    )
    back = us - F.col("prev_us")
    fwd = F.col("next_us") - us
    gap = (
        F.when(F.col("prev_us").isNull() & F.col("next_us").isNull(), F.lit(None))
        .when(F.col("prev_us").isNull(), fwd)
        .when(F.col("next_us").isNull(), back)
        .when(back <= fwd, back)
        .otherwise(fwd)
    )
    c = w.filter(F.col("event_type") == "click").select(
        "user_id", gap.alias("gap_us")
    )
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("gap_us").alias("n_matched"),
        F.coalesce(F.sum("gap_us"), F.lit(0)).alias("sum_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@query(
    "dq_slice_scan",
    # slice-finder: which (lang), (source), (lang,source) slice
    # over/under-produces low-quality docs — GROUPING SETS lattice in
    # one Expand+shuffle, lift cross-multiplied to exact integers so
    # each output is one IEEE division
    oracle="""
    WITH b AS (SELECT lang, source,
                      CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS bad
               FROM documents),
    t AS (SELECT COUNT(*)::BIGINT AS gcnt, SUM(bad)::BIGINT AS gbad FROM b),
    s AS (SELECT COALESCE(lang, 'ALL') AS lang,
                 COALESCE(source, 'ALL') AS source,
                 COUNT(*)::BIGINT AS cnt, SUM(bad)::BIGINT AS bad
          FROM b GROUP BY GROUPING SETS ((lang), (source), (lang, source)))
    SELECT s.lang, s.source, s.cnt, s.bad,
           (s.bad * t.gcnt)::DOUBLE / (s.cnt * t.gbad)::DOUBLE AS lift
    FROM s CROSS JOIN t
    """,
)
def dq_slice_scan(spark, sf_dir):
    """Anomalous-slice scan — the data-quality 'slice finder': for
    every slice in the (lang), (source), (lang, source) lattice, the
    lift of its low-quality rate (n_chars < 200) against the corpus
    rate. Slices with lift >> 1 localize a broken extractor or a
    polluted crawl source BEFORE training. One GROUPING SETS
    Expand + one shuffle covers all three aggregation levels (never
    three scans); the global rate is a one-row broadcast and lift is
    cross-multiplied to exact integers — one IEEE division per row,
    bit-identical cross-engine. Dimension cardinality bounds every
    post-aggregate stage."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "lang",
        "source",
        F.when(F.col("n_chars") < 200, 1).otherwise(0).alias("bad"),
    )
    t = b.agg(F.count(F.lit(1)).alias("gcnt"), F.sum("bad").alias("gbad"))
    s = (
        b.groupingSets([["lang"], ["source"], ["lang", "source"]], "lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("bad").alias("bad"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "cnt",
            "bad",
        )
    )
    return s.crossJoin(F.broadcast(t)).select(
        "lang",
        "source",
        "cnt",
        "bad",
        (
            (F.col("bad") * F.col("gcnt")).cast("double")
            / (F.col("cnt") * F.col("gbad")).cast("double")
        ).alias("lift"),
    )


@query(
    "events_acf",
    # autocorrelation of the per-type daily-count series at calendar
    # lags 1..7: Pearson r from six INTEGER moment sums (m, Sx, Sy,
    # Sxy, Sxx, Syy) joined on day+lag — missing days align correctly
    # because the lag is calendar arithmetic, not row offset; the only
    # floats are correctly-rounded sqrt/mul/div of exact integers
    oracle="""
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      COUNT(*)::BIGINT AS x
               FROM events GROUP BY 1, 2),
    l AS (SELECT unnest(range(1, 8)) AS lag),
    p AS (SELECT a.event_type, l.lag, a.x AS x1, b.x AS x2
          FROM d a CROSS JOIN l
          JOIN d b ON b.event_type = a.event_type
                  AND b.day = a.day + l.lag::INT),
    s AS (SELECT event_type, lag, COUNT(*)::BIGINT AS m,
                 SUM(x1)::BIGINT AS sx, SUM(x2)::BIGINT AS sy,
                 SUM(x1 * x2)::BIGINT AS sxy,
                 SUM(x1 * x1)::BIGINT AS sxx,
                 SUM(x2 * x2)::BIGINT AS syy
          FROM p GROUP BY 1, 2)
    SELECT event_type, lag::BIGINT AS lag, m,
           (m * sxy - sx * sy)::DOUBLE
               / (sqrt((m * sxx - sx * sx)::DOUBLE)
                  * sqrt((m * syy - sy * sy)::DOUBLE)) AS acf
    FROM s WHERE m >= 2 AND m * sxx > sx * sx AND m * syy > sy * sy
    """,
)
def events_acf(spark, sf_dir):
    """Autocorrelation function of each event type's daily-count
    series at calendar lags 1..7 days — the seasonality screen (a
    weekly cycle shows as an acf(7) spike) and the independence check
    behind every forecasting model. Lags join on day + lag (calendar
    arithmetic), so missing days align honestly instead of silently
    shifting like a row-offset LAG would. Pearson r folds to six
    integer moment sums — all comparisons exact; the final expression
    is correctly-rounded IEEE ops (sqrt, mul, div) on exact integers,
    identical cross-engine. Shape: data-sized work is ONE (type, day)
    aggregate; the lag join and moments run on the days-per-type
    table (calendar-bounded), with the 7-row lag list a broadcast
    explode."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    probe = d.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        F.col("x").alias("x1"),
        F.date_add("day", F.col("lag")).alias("day2"),
    )
    d2 = d.select(
        F.col("event_type").alias("e2"),
        F.col("day").alias("day2"),
        F.col("x").alias("x2"),
    )
    p = probe.join(
        d2, (probe["event_type"] == d2["e2"]) & (probe["day2"] == d2["day2"])
    )
    s = p.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x1").alias("sx"),
        F.sum("x2").alias("sy"),
        F.sum(F.col("x1") * F.col("x2")).alias("sxy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sxx"),
        F.sum(F.col("x2") * F.col("x2")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    deny = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    return (
        s.filter(
            (F.col("m") >= 2) & (denx > 0) & (deny > 0)
        )
        .select(
            "event_type",
            F.col("lag").cast("bigint").alias("lag"),
            "m",
            (num / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double")))).alias(
                "acf"
            ),
        )
    )


@query(
    "events_velocity_flags",
    # abuse/fraud velocity screen: max events per user in any trailing
    # 10-minute window, via an integer RANGE frame over epoch seconds
    # (peers at equal seconds included — engine-independent); integer
    # outputs only
    oracle="""
    WITH e AS (SELECT user_id, epoch(ts)::BIGINT AS sec FROM events),
    w AS (SELECT user_id,
                 COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
                                RANGE BETWEEN 600 PRECEDING
                                      AND CURRENT ROW)::BIGINT AS burst
          FROM e)
    SELECT user_id, COUNT(*)::BIGINT AS n_events,
           MAX(burst)::BIGINT AS max_burst_10m,
           CASE WHEN MAX(burst) >= 3 THEN 1 ELSE 0 END::BIGINT AS flagged
    FROM w GROUP BY user_id
    """,
)
def events_velocity_flags(spark, sf_dir):
    """Velocity screen — the rate-limit/abuse primitive: for every
    user, the maximum number of events inside ANY trailing 10-minute
    window, flagged at >= 3. A scraper or credential-stuffing run
    shows as max_burst_10m way above the human baseline. The sliding
    window is an integer RANGE frame over epoch seconds (value-based,
    so equal-second peers are in-frame on both engines — no row-order
    tie hazard), partitioned per user: one sort per user partition,
    no self-join, no explode of candidate windows. All outputs int64.
    At 100 TB this is the same per-key windowed shape as
    events_rolling_7d — partition-parallel, shuffle bounded by the
    user key."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", F.unix_timestamp("ts").alias("sec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-600, Window.currentRow)
    )
    b = e.select("user_id", F.count(F.lit(1)).over(w).alias("burst"))
    return b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("burst").alias("max_burst_10m"),
        F.when(F.max("burst") >= 3, 1).otherwise(0).cast("bigint").alias("flagged"),
    )


# Shared by events_user_entropy and its streaming twin
# stream_user_entropy — both must land on the identical rows.
_USER_ENTROPY_ORACLE = """
    WITH p AS (SELECT user_id,
                      SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS c1,
                      SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS c2,
                      SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS c3,
                      SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS c4,
                      SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS c5,
                      COUNT(*)::BIGINT AS n
               FROM events GROUP BY user_id)
    SELECT user_id, n,
           (c1 > 0)::INT + (c2 > 0)::INT + (c3 > 0)::INT
               + (c4 > 0)::INT + (c5 > 0)::INT AS n_types,
           FLOOR((
             (CASE WHEN c1 > 0 THEN -(c1::DOUBLE / n::DOUBLE) * ln(c1::DOUBLE / n::DOUBLE) ELSE 0 END)
             + (CASE WHEN c2 > 0 THEN -(c2::DOUBLE / n::DOUBLE) * ln(c2::DOUBLE / n::DOUBLE) ELSE 0 END)
             + (CASE WHEN c3 > 0 THEN -(c3::DOUBLE / n::DOUBLE) * ln(c3::DOUBLE / n::DOUBLE) ELSE 0 END)
             + (CASE WHEN c4 > 0 THEN -(c4::DOUBLE / n::DOUBLE) * ln(c4::DOUBLE / n::DOUBLE) ELSE 0 END)
             + (CASE WHEN c5 > 0 THEN -(c5::DOUBLE / n::DOUBLE) * ln(c5::DOUBLE / n::DOUBLE) ELSE 0 END)
           ) * 1e4 + 1e-6) / 1e4 AS entropy
    FROM p
    """

_ENTROPY_TYPES = ["click", "error", "purchase", "signup", "view"]
_ENTROPY_SINK_SEQ = [0]


def _entropy_select(p):
    """Fold fixed per-type count columns c1..c5 + n to the entropy
    output — shared by the batch query and its streaming twin so both
    evaluate the identical expression tree."""
    n = F.col("n").cast("double")

    def term(c):
        q = F.col(c).cast("double") / n
        return F.when(F.col(c) > 0, -q * F.log(q)).otherwise(F.lit(0.0))

    ent = term("c1") + term("c2") + term("c3") + term("c4") + term("c5")
    n_types = sum((F.col(f"c{i}") > 0).cast("int") for i in range(1, 6))
    return p.select(
        "user_id",
        "n",
        n_types.alias("n_types"),
        (F.floor(ent * 1e4 + 1e-6) / 1e4).alias("entropy"),
    )


@query(
    "events_user_entropy",
    # behavioral-entropy segmentation: per-user Shannon entropy over
    # the event-type mix. Counts pivot to FIXED columns so the 5-term
    # entropy sum is a fixed left-to-right expression tree (no
    # aggregation-order float hazard); ln is the only libm call and
    # the result is floor-gridded to 1e-4
    oracle=_USER_ENTROPY_ORACLE,
)
def events_user_entropy(spark, sf_dir):
    """Behavioral entropy per user — Shannon entropy of each user's
    event-type mix: bots pin near 0 (one repeated action), engaged
    humans spread toward ln(5). The float hazard of entropy-by-group
    (SUM of p*ln p in engine-chosen order) is designed out by pivoting
    the counts to FIXED per-type columns, so the 5-term sum is one
    left-to-right expression tree evaluated identically by both
    engines; each p is a single IEEE division of exact integers. ln is
    the one libm call — JVM Math.log and DuckDB ln are high-quality
    but NOT guaranteed correctly rounded, so the result is
    floor-gridded at 1e-4 WITH the +1e-6 boundary nudge (round-8
    device): a true on-grid entropy (e.g. 0 for a one-action bot)
    cannot truncate a whole step from half-ulp-below rounding, and an
    off-grid 1-ulp divergence would have to straddle a nudged
    boundary — overwhelmingly unlikely.
    One user-grained aggregate, map-side partial, no window, no join —
    the cheapest possible shape."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"c{i+1}")
        for i, t in enumerate(_ENTROPY_TYPES)
    ]
    p = ev.groupBy("user_id").agg(*aggs, F.count(F.lit(1)).alias("n"))
    return _entropy_select(p)


@query(
    "stream_user_entropy",
    # STREAMING twin of events_user_entropy, same batch oracle: the
    # per-(user, type) count is an update-mode stateful aggregate with
    # BOUNDED state (<= 5 rows per user forever, counts SUM-monotone,
    # no watermark needed); drained re-emits fold by max(cnt) and go
    # through the SAME _entropy_select expression tree
    oracle=_USER_ENTROPY_ORACLE,
)
def stream_user_entropy(spark, sf_dir):
    """Streaming behavioral entropy — the bounded-state streaming twin
    of events_user_entropy: the running (user_id, event_type) count is
    an update-mode stateful aggregate whose state is at most
    |types| = 5 rows per user FOREVER (counts are SUM-monotone, so no
    watermark is required and re-emitted rows are strictly
    increasing; max(cnt) over the sink recovers final state — the
    same recovery contract as stream_hll_distinct's registers). The
    drained counts pivot through the IDENTICAL _entropy_select
    expression tree as the batch query, and the batch oracle gates
    both — any divergence between micro-batched and whole-table
    counting fails the value-hash."""
    from ..streaming.events import read_events_stream, run_to_memory

    _ENTROPY_SINK_SEQ[0] += 1
    name = f"stream_user_entropy_sink_{_ENTROPY_SINK_SEQ[0]}"
    counts = (
        read_events_stream(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .count()
    )
    run_to_memory(counts, name, output_mode="update", state_partitions=8)
    final = (
        spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(F.max("count").alias("cnt"))
    )
    aggs = [
        F.sum(
            F.when(F.col("event_type") == t, F.col("cnt")).otherwise(F.lit(0))
        ).alias(f"c{i+1}")
        for i, t in enumerate(_ENTROPY_TYPES)
    ]
    p = final.groupBy("user_id").agg(*aggs, F.sum("cnt").alias("n"))
    return _entropy_select(p)


@query(
    "stats_srm_check",
    # sample-ratio-mismatch guard for hash-bucketed A/B assignment:
    # users split by md5-parity (the oracle-replayable hash60), per-
    # type distinct-user counts per arm, and the 1-dof chi-square
    # (nA-nB)^2/(nA+nB) as one IEEE division of exact integers
    oracle="""
    WITH a AS (SELECT DISTINCT event_type, user_id,
                      (CAST(concat('0x', substr(md5(user_id::VARCHAR), 1, 15))
                            AS BIGINT) % 2) AS arm
               FROM events),
    g AS (SELECT event_type,
                 SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
                 SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
          FROM a GROUP BY event_type)
    SELECT event_type, n_a, n_b,
           ((n_a - n_b) * (n_a - n_b))::DOUBLE
               / (n_a + n_b)::DOUBLE AS chi2_1dof
    FROM g
    """,
)
def stats_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch check — the first gate of every A/B
    readout: with users hash-assigned 50/50 (md5-parity via the
    oracle-replayable hash60, same leaf as the sketch family; swap to
    xxhash64 in production), a per-slice arm imbalance beyond the
    1-dof chi-square (nA-nB)^2/(nA+nB) flags broken bucketing or
    differential logging before anyone reads the metric. Integer
    counts of DISTINCT users per (event_type, arm); the statistic is
    one IEEE division of exact integers. One distinct aggregate +
    one tiny group — scale-stable."""
    from ..operators.sketches import hash60

    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "event_type",
        "user_id",
        (hash60(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).distinct()
    g = a.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        ((d * d).cast("double") / (F.col("n_a") + F.col("n_b")).cast("double")).alias(
            "chi2_1dof"
        ),
    )


@query(
    "events_cohort_ltv",
    # cohort LTV curve: cumulative purchase cents per signup cohort by
    # week offset — the revenue twin of events_retention_cohorts.
    # Cohort comes from a per-user MIN window (no join); cents are
    # exact integers, so the cumulative sum is int64-exact
    oracle="""
    WITH f AS (SELECT user_id, ts, event_type, value,
                      MIN(ts) OVER (PARTITION BY user_id) AS ft
               FROM events),
    p AS (SELECT CAST(date_trunc('week', ft) AS DATE) AS cohort_week,
                 (date_diff('day', CAST(date_trunc('week', ft) AS DATE),
                            CAST(date_trunc('week', ts) AS DATE)) // 7)::INT
                     AS week_offset,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
          FROM f WHERE event_type = 'purchase'),
    g AS (SELECT cohort_week, week_offset,
                 COUNT(*)::BIGINT AS n_purchases,
                 SUM(cents)::BIGINT AS cents
          FROM p GROUP BY 1, 2)
    SELECT cohort_week, week_offset, n_purchases, cents,
           (SUM(cents) OVER (PARTITION BY cohort_week
                             ORDER BY week_offset))::BIGINT AS cum_cents
    FROM g
    """,
)
def events_cohort_ltv(spark, sf_dir):
    """Cohort LTV curve — cumulative purchase revenue per signup
    cohort by week offset, the revenue companion to
    events_retention_cohorts: 'how much has the week-N cohort spent by
    week N+k' is the curve every growth model is fit to. The cohort
    label is a per-user MIN window (no join with a firsts table);
    revenue is exact integer cents so the per-cohort cumulative sum is
    int64-exact — zero float anywhere. Shape: one user-partitioned
    window over the raw stream, a (cohort, offset)-grained aggregate
    (calendar-bounded output), and a tiny per-cohort cumsum window."""
    ev = load_table(spark, sf_dir, "events")
    ft = F.min("ts").over(Window.partitionBy("user_id"))
    f = ev.select("user_id", "ts", "event_type", "value", ft.alias("ft"))
    cohort = F.to_date(F.date_trunc("week", "ft"))
    wk = F.to_date(F.date_trunc("week", "ts"))
    p = f.filter(F.col("event_type") == "purchase").select(
        cohort.alias("cohort_week"),
        (F.datediff(wk, cohort) / 7).cast("int").alias("week_offset"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    g = p.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("cents"),
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        "cohort_week",
        "week_offset",
        "n_purchases",
        "cents",
        F.sum("cents").over(wcum).alias("cum_cents"),
    )


@query(
    "events_lorenz_deciles",
    # Lorenz-curve deciles of event concentration: users NTILE(10)-
    # banded by activity under a TOTAL order; cumulative share is one
    # IEEE division of exact integer cumsums — the 'top 10% of users
    # produce X% of traffic' readout behind stats_gini's scalar
    oracle="""
    WITH u AS (SELECT user_id, COUNT(*)::BIGINT AS cnt
               FROM events GROUP BY user_id),
    d AS (SELECT cnt,
                 NTILE(10) OVER (ORDER BY cnt DESC, user_id) AS decile
          FROM u),
    g AS (SELECT decile, COUNT(*)::BIGINT AS n_users,
                 SUM(cnt)::BIGINT AS events
          FROM d GROUP BY decile),
    c AS (SELECT decile, n_users, events,
                 (SUM(events) OVER (ORDER BY decile))::BIGINT AS cum_events,
                 (SUM(events) OVER ())::BIGINT AS total
          FROM g)
    SELECT decile::BIGINT AS decile, n_users, events, cum_events,
           cum_events::DOUBLE / total::DOUBLE AS cum_share
    FROM c
    """,
)
def events_lorenz_deciles(spark, sf_dir):
    """Lorenz-curve deciles — the concentration readout behind
    stats_gini's scalar: users banded into activity deciles (NTILE(10)
    under the TOTAL order (cnt DESC, user_id) so ties are
    deterministic), with each decile's event share and the cumulative
    share ('the top decile produces X% of traffic'). All counts and
    cumsums are int64; each share is one IEEE division of exact
    integers. Shape: one user-grained aggregate, then the decile
    banding runs through operators/rank.global_ntile — the terasort
    decomposition (range-partition on (cnt DESC, user_id), local
    row_number, broadcast offsets, exact NTILE remainder formula), so
    the user table never funnels through a single reducer — then
    10-row arithmetic (the only remaining global windows run over the
    10-row decile table). Bit-identical to the oracle's NTILE(10)."""
    from ..operators.rank import global_ntile

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    d = global_ntile(
        u, [F.col("cnt").desc(), F.col("user_id")], 10, "decile"
    ).select("cnt", "decile")
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("cnt").alias("events")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_users",
        "events",
        F.sum("events").over(wcum).alias("cum_events"),
        F.sum("events").over(wall).alias("total"),
    )
    return c.select(
        "decile",
        "n_users",
        "events",
        "cum_events",
        (F.col("cum_events").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
    )


@query(
    "text_rake_scores",
    # RAKE keyword scoring: phrases are maximal stopword-free token
    # runs (phrase_id = running stopword count per doc), deg(w) sums
    # the containing phrase lengths, freq(w) counts occurrences;
    # score = deg/freq is one IEEE division of exact integers
    oracle="""
    WITH toks AS (SELECT doc_id,
                         list_filter(string_split_regex(lower(trim(text)),
                                     '\\s+'), x -> x <> '') AS t
                  FROM documents),
    p AS (SELECT doc_id, u.tok, u.pos,
                 CASE WHEN u.tok IN ('the','a','of','and','to','in','is','it')
                      THEN 1 ELSE 0 END AS stop
          FROM toks, LATERAL (SELECT unnest(t) AS tok,
                                     generate_subscripts(t, 1) AS pos) u),
    s AS (SELECT doc_id, tok, stop,
                 SUM(stop) OVER (PARTITION BY doc_id
                                 ORDER BY pos)::BIGINT AS phrase_id
          FROM p),
    w AS (SELECT doc_id, tok, phrase_id,
                 COUNT(*) OVER (PARTITION BY doc_id, phrase_id)::BIGINT
                     AS phrase_len
          FROM s WHERE stop = 0),
    g AS (SELECT tok AS term, COUNT(*)::BIGINT AS freq,
                 SUM(phrase_len)::BIGINT AS deg
          FROM w GROUP BY tok)
    SELECT term, freq, deg,
           deg::DOUBLE / freq::DOUBLE AS score
    FROM g WHERE freq >= 5
    """,
)
def text_rake_scores(spark, sf_dir):
    """RAKE keyword scores (Rapid Automatic Keyword Extraction) —
    content words scored by deg/freq, where deg sums the lengths of
    the stopword-free phrases each occurrence sits in: words that
    travel in long content phrases score high, isolated filler scores
    1.0. The co-occurrence structure needs NO pair table: phrase
    membership is a running stopword count (one per-doc window over
    token positions), phrase length one more window, and deg/freq a
    vocabulary-grained aggregate — score is one IEEE division of exact
    integers. freq >= 5 bounds the output to real vocabulary. Shape:
    explode -> two doc-partitioned windows -> one hash aggregate; no
    join, nothing global."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "tok")
    ).select(
        "doc_id",
        "tok",
        "pos",
        F.when(F.col("tok").isin(*T.STOPWORDS), 1).otherwise(0).alias("stop"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    s = p.select(
        "doc_id",
        "tok",
        "stop",
        F.sum("stop").over(wdoc).alias("phrase_id"),
    )
    wphrase = Window.partitionBy("doc_id", "phrase_id")
    w = s.filter(F.col("stop") == 0).select(
        "tok", F.count(F.lit(1)).over(wphrase).alias("phrase_len")
    )
    g = w.groupBy(F.col("tok").alias("term")).agg(
        F.count(F.lit(1)).alias("freq"), F.sum("phrase_len").alias("deg")
    )
    return g.filter(F.col("freq") >= 5).select(
        "term",
        "freq",
        "deg",
        (F.col("deg").cast("double") / F.col("freq").cast("double")).alias("score"),
    )


@query(
    "stats_welch_ttest",
    # Welch's unequal-variance t-test on exact integer cents: each
    # group folds to (n, Sx, Sxx) int64 moments; mean and sample
    # variance are single divisions of exact integers ((n*Sxx - Sx^2)
    # / (n*(n-1))) and t / Welch-Satterthwaite df are fixed
    # correctly-rounded IEEE expression trees — identical cross-engine
    oracle="""
    WITH c AS (SELECT event_type,
                      CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
               FROM events WHERE event_type IN ('purchase', 'view')),
    s AS (SELECT
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n1,
            SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)::BIGINT AS sx1,
            SUM(CASE WHEN event_type = 'purchase' THEN cents * cents ELSE 0 END)::BIGINT AS sxx1,
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n2,
            SUM(CASE WHEN event_type = 'view' THEN cents ELSE 0 END)::BIGINT AS sx2,
            SUM(CASE WHEN event_type = 'view' THEN cents * cents ELSE 0 END)::BIGINT AS sxx2
          FROM c),
    e AS (SELECT n1, n2,
                 sx1::DOUBLE / n1::DOUBLE AS mean1,
                 sx2::DOUBLE / n2::DOUBLE AS mean2,
                 ((n1 * sxx1 - sx1 * sx1)::DOUBLE
                     / (n1 * (n1 - 1))::DOUBLE) / n1::DOUBLE AS a1,
                 ((n2 * sxx2 - sx2 * sx2)::DOUBLE
                     / (n2 * (n2 - 1))::DOUBLE) / n2::DOUBLE AS a2
          FROM s)
    SELECT n1, n2, mean1, mean2,
           (mean1 - mean2) / sqrt(a1 + a2) AS t_stat,
           ((a1 + a2) * (a1 + a2))
               / (a1 * a1 / (n1 - 1)::DOUBLE
                  + a2 * a2 / (n2 - 1)::DOUBLE) AS df
    FROM e
    """,
)
def stats_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test between purchase and view
    values (exact integer cents) — the parametric member of the A/B
    family (stats_srm_check gates the split, stats_mannwhitney /
    stats_ks_test are the nonparametric siblings). Each arm folds
    map-side to three int64 moments (n, sum, sum-of-squares); sample
    variance is ONE division of exact integers via n*Sxx - Sx^2, and
    t plus the Welch-Satterthwaite df are fixed expression trees of
    correctly-rounded IEEE ops — bit-identical cross-engine, no
    aggregation-order float hazard anywhere. One row out of one
    conditional aggregate: join-free, window-free. int64 headroom:
    n*Sxx stays under 2^63 through sf1; beyond that, split moments by
    day and combine (the sums stay exact)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    c = ev.select("event_type", cents.alias("cents"))

    def m(t, expr):
        return F.sum(F.when(F.col("event_type") == t, expr).otherwise(F.lit(0)))

    s = c.agg(
        m("purchase", F.lit(1)).alias("n1"),
        m("purchase", F.col("cents")).alias("sx1"),
        m("purchase", F.col("cents") * F.col("cents")).alias("sxx1"),
        m("view", F.lit(1)).alias("n2"),
        m("view", F.col("cents")).alias("sx2"),
        m("view", F.col("cents") * F.col("cents")).alias("sxx2"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    e = s.select(
        "n1",
        "n2",
        (d("sx1") / d("n1")).alias("mean1"),
        (d("sx2") / d("n2")).alias("mean2"),
        (
            (
                (F.col("n1") * F.col("sxx1") - F.col("sx1") * F.col("sx1")).cast(
                    "double"
                )
                / (F.col("n1") * (F.col("n1") - 1)).cast("double")
            )
            / d("n1")
        ).alias("a1"),
        (
            (
                (F.col("n2") * F.col("sxx2") - F.col("sx2") * F.col("sx2")).cast(
                    "double"
                )
                / (F.col("n2") * (F.col("n2") - 1)).cast("double")
            )
            / d("n2")
        ).alias("a2"),
    )
    se2 = F.col("a1") + F.col("a2")
    return e.select(
        "n1",
        "n2",
        "mean1",
        "mean2",
        ((F.col("mean1") - F.col("mean2")) / F.sqrt(se2)).alias("t_stat"),
        (
            (se2 * se2)
            / (
                F.col("a1") * F.col("a1") / (F.col("n1") - 1).cast("double")
                + F.col("a2") * F.col("a2") / (F.col("n2") - 1).cast("double")
            )
        ).alias("df"),
    )


@query(
    "dedup_impact_report",
    # ops report for exact dedup: per source, how many docs the
    # min-id-keeper rule drops and how many chars it saves — the
    # keeper is a per-fingerprint MIN window; all outputs int64
    oracle="""
    WITH f AS (SELECT doc_id, source, n_chars,
                      md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                          AS fp
               FROM documents),
    k AS (SELECT doc_id, source, n_chars,
                 CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY fp)
                      THEN 0 ELSE 1 END AS dropped
          FROM f)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           SUM(dropped)::BIGINT AS n_dropped,
           SUM(CASE WHEN dropped = 1 THEN n_chars ELSE 0 END)::BIGINT
               AS chars_saved
    FROM k GROUP BY source
    """,
)
def dedup_impact_report(spark, sf_dir):
    """Dedup impact report — the ops readout that justifies the dedup
    stage: per source, how many documents the exact-dedup keeper rule
    (min doc_id per canonical-text fingerprint, same canon as
    dedup_exact / operators/dedup.exact_dedup_survivors) would drop
    and how many chars it saves. Slices with outsized savings localize
    mirror/scraper sources. The keeper is a per-fingerprint MIN window
    — one shuffle on the fingerprint (document text never crosses the
    wire beyond its hash+size), then a source-grained aggregate. All
    outputs int64."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id", "source", "n_chars", T.fingerprint(F.col("text")).alias("fp")
    )
    keeper = F.min("doc_id").over(Window.partitionBy("fp"))
    k = f.select(
        "source",
        "n_chars",
        F.when(F.col("doc_id") == keeper, 0).otherwise(1).alias("dropped"),
    )
    return k.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dropped").alias("n_dropped"),
        F.sum(F.when(F.col("dropped") == 1, F.col("n_chars")).otherwise(0)).alias(
            "chars_saved"
        ),
    )


@query(
    "text_readability",
    # Flesch reading-ease from three exact integer counts per doc
    # (words, sentence-ending punctuation runs, vowel groups); the
    # score is a fixed IEEE tree over two exact-int divisions,
    # floor-gridded at 1e-4
    oracle="""
    WITH c AS (SELECT doc_id,
                      len(list_filter(string_split_regex(lower(trim(text)),
                          '\\s+'), x -> x <> ''))::BIGINT AS words,
                      GREATEST(len(regexp_extract_all(text, '[.!?]+')),
                               1)::BIGINT AS sentences,
                      GREATEST(len(regexp_extract_all(lower(text),
                               '[aeiouy]+')), 1)::BIGINT AS syllables
               FROM documents)
    SELECT doc_id, words, sentences, syllables,
           FLOOR((206.835
                  - 1.015 * (words::DOUBLE / sentences::DOUBLE)
                  - 84.6 * (syllables::DOUBLE / words::DOUBLE)) * 1e4
                 + 1e-6) / 1e4 AS fk_score
    FROM c WHERE words > 0
    """,
)
def text_readability(spark, sf_dir):
    """Flesch reading-ease per document — the classic readability
    screen for training-corpus curation (garbled OCR and template spam
    score far outside the human band). All three inputs are exact
    integer counts from single regex passes: words (whitespace
    tokens), sentences (runs of [.!?], floored at 1), syllables
    (vowel-group runs, the standard heuristic). The score is a fixed
    expression tree — two IEEE divisions of exact integers, literal
    multiplies, subtractions — identical cross-engine, floor-gridded
    at 1e-4. Pure map-side projection: no shuffle AT ALL until the
    consumer aggregates; the cheapest possible 100 TB shape."""
    from ..functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    words = F.size(T.tokens(F.col("text"))).cast("bigint")
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    syllables = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")), F.lit(1)
    ).cast("bigint")
    c = docs.select(
        "doc_id",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
    ).filter(F.col("words") > 0)
    fk = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words").cast("double") / F.col("sentences").cast("double"))
        - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words").cast("double"))
    )
    return c.select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        (F.floor(fk * 1e4 + 1e-6) / 1e4).alias("fk_score"),
    )


@query(
    "events_new_vs_returning",
    # growth decomposition: per day, users active for the first time
    # vs returning — first-day labels come from a per-user MIN window
    # over the (user, day) distinct table, join-free; all integers
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
    f AS (SELECT user_id, day,
                 CASE WHEN day = MIN(day) OVER (PARTITION BY user_id)
                      THEN 1 ELSE 0 END AS is_new
          FROM ud)
    SELECT day, COUNT(*)::BIGINT AS active_users,
           SUM(is_new)::BIGINT AS new_users,
           (COUNT(*) - SUM(is_new))::BIGINT AS returning_users
    FROM f GROUP BY day
    """,
)
def events_new_vs_returning(spark, sf_dir):
    """New-vs-returning decomposition — the growth-accounting daily
    split: how much of each day's active base is first-ever-seen vs
    retained. The first-day label is a per-user MIN window over the
    (user, day) DISTINCT table (never a join against a firsts table),
    so the whole query is two aggregates and one user-partitioned
    window, all int64. The (user, day) distinct grain bounds
    everything downstream by users x days, not by raw event volume —
    the standard first step for any activity accounting at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    is_new = F.when(
        F.col("day") == F.min("day").over(Window.partitionBy("user_id")), 1
    ).otherwise(0)
    f = ud.select("day", is_new.alias("is_new"))
    return f.groupBy("day").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum("is_new").alias("new_users"),
        (F.count(F.lit(1)) - F.sum("is_new")).alias("returning_users"),
    )


@query(
    "events_dow_profile",
    # weekday seasonality index per event type: observed share vs the
    # uniform 1/7 expectation, as (n*7)/total — one IEEE division of
    # exact integers per row. Monday-start weekday on both engines
    # (Spark weekday() == DuckDB isodow()-1)
    oracle="""
    WITH d AS (SELECT event_type,
                      (isodow(CAST(ts AS DATE)) - 1)::BIGINT AS weekday,
                      COUNT(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, SUM(n)::BIGINT AS total FROM d GROUP BY 1)
    SELECT d.event_type, d.weekday, d.n,
           (d.n * 7)::DOUBLE / t.total::DOUBLE AS dow_index
    FROM d JOIN t USING (event_type)
    """,
)
def events_dow_profile(spark, sf_dir):
    """Day-of-week seasonality index per event type — observed weekday
    volume against the uniform 1/7 expectation (index 1.0 = no weekly
    cycle; the complement to events_acf's lag-7 spike). Weekday is
    Monday-start on both engines (Spark weekday() == DuckDB
    isodow()-1 — dayofweek() is Sunday-start in Spark and a classic
    cross-engine trap). One (type, weekday) aggregate, a 5-row
    normalizer broadcast, and one IEEE division of exact integers per
    output row."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.weekday("ts").cast("bigint").alias("weekday")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = d.groupBy(F.col("event_type").alias("t_type")).agg(
        F.sum("n").alias("total")
    )
    return (
        d.join(F.broadcast(t), d["event_type"] == t["t_type"])
        .select(
            "event_type",
            "weekday",
            "n",
            ((F.col("n") * 7).cast("double") / F.col("total").cast("double")).alias(
                "dow_index"
            ),
        )
    )


@query(
    "events_stickiness",
    # DAU/MAU stickiness per day, EXACT: each (user, active-day) row
    # covers the next 30 candidate days, so trailing-30d MAU is a
    # distinct count over the exploded cover — day-grain work bounded
    # by users x days. The 100 TB swap is per-day HLL registers +
    # MAX-merge (sketch_hll_merge_days), identical query shape
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
    dau AS (SELECT day, COUNT(*)::BIGINT AS dau FROM ud GROUP BY day),
    cover AS (SELECT DISTINCT ud.user_id,
                     ud.day + unnest(range(0, 30))::INT AS cday
              FROM ud),
    mau AS (SELECT cday AS day, COUNT(*)::BIGINT AS mau
            FROM cover GROUP BY cday)
    SELECT dau.day, dau.dau, mau.mau,
           dau.dau::DOUBLE / mau.mau::DOUBLE AS stickiness
    FROM dau JOIN mau USING (day)
    """,
)
def events_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per day — the engagement-frequency ratio
    (1.0 = every monthly user is daily). Exact trailing-30-day MAU
    without a giant window: each (user, active-day) row COVERS the 30
    days it keeps the user 'monthly-active' for, so MAU(day) is a
    distinct count over the exploded cover — everything is bounded by
    users x days (activity grain), never raw event volume, and the
    30x explode happens at that reduced grain. Joining back to DAU
    restricts output to observed days. At 100 TB swap the exact
    distinct for per-day HLL registers MAX-merged over the trailing
    window (sketch_hll_merge_days is that exact machinery) — the
    query shape is unchanged. Integer counts; stickiness is one IEEE
    division."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    offsets = spark.range(0, 30).select(F.col("id").cast("int").alias("off"))
    cover = (
        ud.crossJoin(F.broadcast(offsets))
        .select("user_id", F.date_add("day", F.col("off")).alias("cday"))
        .distinct()
    )
    mau = cover.groupBy(F.col("cday").alias("m_day")).agg(
        F.count(F.lit(1)).alias("mau")
    )
    return (
        dau.join(mau, dau["day"] == mau["m_day"])
        .select(
            "day",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau").cast("double")).alias(
                "stickiness"
            ),
        )
    )
