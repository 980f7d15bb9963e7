"""Round-7 registry additions: interval-overlap join surface and
cross-document n-gram novelty attribution."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import load_table
from . import query

# whitespace tokenizer, shared verbatim with functions/text.py::tokens
_DTOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"


@query(
    "join_interval_overlap",
    # sessionize (30-min gap, the events_sessionize convention) in SQL,
    # then the textbook non-equi overlap join — the engine runs the
    # bucketized equi-join form instead
    oracle="""
    -- epoch_us // 1e6 floors like Spark's timestamp->long cast;
    -- epoch(ts)::BIGINT would ROUND fractional seconds and shift
    -- session boundaries by one
    WITH ev AS (SELECT user_id, (epoch_us(ts) // 1000000)::BIGINT AS t,
                       event_id
                FROM events WHERE user_id <= 40),
    g AS (SELECT user_id, t,
                 CASE WHEN t - LAG(t) OVER w IS NULL
                        OR t - LAG(t) OVER w > 1800 THEN 1 ELSE 0 END AS brk
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    s AS (SELECT user_id, t,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM g),
    sess AS (SELECT user_id, sess_id, MIN(t) AS lo, MAX(t) AS hi
             FROM s GROUP BY user_id, sess_id)
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*)::BIGINT AS n_overlaps
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
    GROUP BY a.user_id, b.user_id
    """,
)
def join_interval_overlap(spark, sf_dir):
    """Concurrent-session audit: how many session pairs of two users
    overlap in time (who is online together). Sessions are 30-min-gap
    islands per user; the pair search is the bucketized
    interval-overlap join (operators/joins.py::interval_overlap_join)
    — an equi-join on hour buckets with a first-shared-bucket
    emit-once guard, NEVER a nested-loop over |sessions|². The exact
    overlap predicate re-checks survivors, so bucket width only
    shapes the plan, not the result."""
    from ..operators.joins import interval_overlap_join

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 40)
        .select("user_id", F.col("ts").cast("long").alias("t"), "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gap = F.col("t") - F.lag("t").over(w)
    sess_id = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sess = (
        ev.withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    )
    a = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("lo").alias("b_lo"),
        F.col("hi").alias("b_hi"),
    )
    pairs = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=3600
    )
    return (
        pairs.filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )


@query(
    "text_trigram_novelty",
    # per-source novelty is a ratio of exact BIGINT sums — ONE IEEE
    # division feeds the floor grid, so the value is engine-identical
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_DTOKS} AS toks FROM documents),
    tri AS (SELECT DISTINCT doc_id, source,
                   unnest(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                       AS tg
            FROM d WHERE len(toks) >= 3),
    first AS (SELECT tg, MIN(doc_id) AS first_doc FROM tri GROUP BY tg)
    SELECT t.source,
           SUM(CASE WHEN t.doc_id = f.first_doc THEN 1 ELSE 0 END)::BIGINT
               AS novel_trigrams,
           COUNT(*)::BIGINT AS total_trigrams,
           floor((SUM(CASE WHEN t.doc_id = f.first_doc THEN 1 ELSE 0 END)::DOUBLE
                  / COUNT(*)) * 10000) / 10000 AS novelty_rate
    FROM tri t JOIN first f USING (tg)
    GROUP BY t.source
    """,
)
def text_trigram_novelty(spark, sf_dir):
    """Cross-document novelty attribution: for every source slice,
    the fraction of its distinct-per-doc token trigrams that appear
    FIRST (smallest doc_id corpus-wide) in that doc — the
    templated-content screen that complements dedup: a slice that
    keeps repeating earlier docs' phrasing scores low long before
    whole documents collide.

    Execution discipline (the naive explode->distinct->first-seen->
    join-back runs 9.5 s at sf0.1; this shape runs ~3x faster and is
    what survives 100 TB):

    - per-doc dedup is ``array_distinct`` BEFORE the explode —
      map-only, so no corpus-sized distinct shuffle exists;
    - trigrams shuffle as xxhash64 LONGS, not strings (the dedup
      family's hashed-set discipline; collision odds ~n²/2⁶⁴);
    - ONE (tg, source) aggregate feeds BOTH rollups: totals are
      SUM(n) by source, and first-seen attribution is an argmin over
      the per-source min doc_ids (doc ids are globally unique, so the
      argmin is deterministic) — the 5M-row join-back disappears and
      AQE reuses the single big exchange for both consumers.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks_expr = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != F.lit("")
    )
    # MATERIALIZE the token array as a projected column before any
    # element_at indexing: expression trees are not CSE'd inside HOF
    # lambdas, so indexing the raw split+filter expression re-splits
    # the whole text per element_at — O(tokens²) per doc, measured
    # 10 s vs 0.8 s at sf0.1 for this one projection boundary.
    toked = docs.select("doc_id", "source", toks_expr.alias("toks")).filter(
        F.size("toks") >= 3
    )
    toks = F.col("toks")
    tg = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ", F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2), F.element_at(toks, i + 3),
                )
            ),
        )
    )
    tri = toked.select("doc_id", "source", F.explode(tg).alias("tg"))
    # localCheckpoint (the cluster_kmeans discipline): totals and the
    # first-seen rollup both consume per_src, but column pruning gives
    # their exchanges different schemas so ReusedExchange never fires
    # — without the cut the whole trigram map+shuffle runs TWICE.
    # per_src is trigram-vocab × sources sized, far smaller than the
    # corpus pass it saves.
    per_src = (
        tri.groupBy("tg", "source")
        .agg(F.min("doc_id").alias("mdoc"), F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    totals = per_src.groupBy("source").agg(
        F.sum("n").alias("total_trigrams")
    )
    novel = (
        per_src.groupBy("tg")
        .agg(F.min_by("source", "mdoc").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("novel_trigrams"))
    )
    rate = F.floor(
        (F.col("novel_trigrams").cast("double") / F.col("total_trigrams"))
        * 10000
    ) / 10000
    return totals.join(novel, "source").select(
        "source", "novel_trigrams", "total_trigrams",
        rate.alias("novelty_rate"),
    )
